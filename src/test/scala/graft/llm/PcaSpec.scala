package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PcaSpec extends SparkSpec {

  private def embeddings = {
    tables()
    spark.table("embeddings")
  }

  test("eigendecomposition is exact on the covariance (residual check)") {
    val sq = spark; import sq.implicits._
    // planted low-rank data: 3 strong directions + small noise in 8 dims
    val rnd = new scala.util.Random(5)
    val dirs = Array.fill(3, 8)(rnd.nextGaussian())
    val rows = (1 to 2000).map { i =>
      val c = Array(rnd.nextGaussian() * 10, rnd.nextGaussian() * 5, rnd.nextGaussian() * 2)
      val v = Array.tabulate(8)(d =>
        (c(0) * dirs(0)(d) + c(1) * dirs(1)(d) + c(2) * dirs(2)(d) +
          rnd.nextGaussian() * 0.01).toFloat)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, dims = 8, k = 3)
    // 3 planted directions carry essentially all variance
    assert(m.varianceExplained(3) > 0.999, s"ve3=${m.varianceExplained(3)}")
    // reconstruction error == 1 - variance explained (cross-validates the
    // projection path against the eigenvalues)
    val re = Pca.reconstructionError(df, m)
    assert(math.abs(re - (1.0 - m.varianceExplained(3))) < 1e-6,
      s"re=$re ve=${m.varianceExplained(3)}")
    // eigenvalues descending, non-negative
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(m.eigenvalues.forall(_ > -1e-9))
    // components orthonormal
    for (a <- m.components; b <- m.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val expect = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"non-orthonormal: $dot")
    }
  }

  test("fit/project are deterministic and partition-count independent") {
    val e = embeddings
    val m1 = Pca.fit(e, 64, 8)
    val m2 = Pca.fit(e.repartition(7), 64, 8)
    // moment sums re-associate across partitionings: tiny float drift
    // allowed, ordering/selection identical
    m1.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
    val ve = m1.varianceExplained(8)
    println(f"[pca] embeddings fixture ve(8)=$ve%.4f ve(16)=${m1.varianceExplained(16)}%.4f " +
      f"re(8)=${Pca.reconstructionError(e, m1)}%.4f")
    val p = Pca.project(e, m1)
    assert(p.count() === e.count())
    assert(p.select("proj").head.getSeq[Double](0).length === 8)
  }
}

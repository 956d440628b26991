package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Pca

/** Scale probe for distributed PCA (test scope): the fit is ONE
  * mapPartitions moment pass (count/Σx/Σxxᵀ per partition — fixed ~17 KB
  * at d = 64) plus a driver-side 64×64 eigensolve, so wall time must be
  * ~linear in rows and the answer partitioning-independent. Synthetic
  * rank-3 vectors make the answer analytic: variance explained by 3
  * components ≳ 0.999 at every scale, eigenvalue ratios fixed.
  * Run: sbt "Test/runMain graft.PcaScaleProbe [maxDecade]" */
object PcaScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxDecade = args.headOption.map(_.toInt).getOrElse(6) // 10^6 rows
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // deterministic rank-3 data in 64 dims via hash-derived coefficients
    def vecs(n: Long) = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(63)), d => (
        sin(col("id") % 1000 / 7.0) * sin(d / 3.0) * 10.0 +
          cos(col("id") % 997 / 11.0) * cos(d / 5.0) * 5.0 +
          sin(col("id") % 991 / 13.0) * sin(d / 9.0 + 1.0) * 2.0
        ).cast("float")).as("embedding"))
      .withColumnRenamed("id", "vec_id")

    var prev = -1.0
    for (dec <- 4 to maxDecade) {
      val n = math.pow(10, dec).toLong
      val df = vecs(n).localCheckpoint()
      val (m, sec) = time(Pca.fit(df, dims = 64, k = 3))
      val ve = m.varianceExplained(3)
      val curve = if (prev > 0) f"${sec / prev}%.1fx" else "-"
      println(f"[pca-scale] n=$n%,d fit=$sec%.1fs (vs prev decade $curve) ve3=$ve%.6f")
      assert(ve > 0.999, s"rank-3 data must be 3-component-explained, got $ve")
      if (prev > 0) assert(sec / prev < 15.0,
        f"fit wall time grew ${sec / prev}%.1fx over a 10x decade")
      prev = sec
    }
    // partitioning independence at the top scale
    val df = vecs(math.pow(10, maxDecade).toLong)
    val e1 = Pca.fit(df, 64, 3).eigenvalues.take(3)
    val e2 = Pca.fit(df.repartition(11), 64, 3).eigenvalues.take(3)
    e1.zip(e2).foreach { case (a, b) =>
      assert(math.abs(a - b) / math.max(a, 1e-12) < 1e-9, s"$a vs $b") }
    println("[pca-scale] eigenvalues partitioning-independent at 1e-9 rel")
    spark.stop()
  }
}

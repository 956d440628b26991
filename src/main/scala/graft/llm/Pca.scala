package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA for embedding columns — the dimensionality-reduction
  * half of embedding compression (PQ quantizes; PCA truncates), and the
  * standard whitening/dedup-preprocessing step in training-data pipelines.
  *
  * Scale shape: ONE `mapPartitions` pass accumulates per-partition
  * (count, sum, gram) moment partials — d doubles + d(d+1)/2 gram cells of
  * fixed size per PARTITION, so 100 TB of vectors reduces to
  * #partitions × ~17 KB of moments (d = 64) before a driver-side combine.
  * The eigendecomposition runs on the driver over the d×d covariance
  * (metadata-scale — the classic "big n, small d" decomposition every
  * distributed PCA uses); a cyclic Jacobi sweep (public textbook
  * algorithm) is exact enough at d ≤ a few hundred and fully
  * deterministic (fixed sweep order, fixed iteration budget). Projection
  * is another narrow per-row pass.
  */
object Pca {

  /** Fitted model: mean vector, top-k eigenvectors (rows, descending
    * eigenvalue), all eigenvalues (descending). */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         eigenvalues: Array[Double]) {
    def varianceExplained(k: Int): Double = {
      val tot = eigenvalues.sum
      if (tot <= 0) 0.0 else eigenvalues.take(k).sum / tot
    }
  }

  /** Fit on `embedding` (Array[Float], fixed `dims`), keeping `k`
    * components. */
  def fit(embeddings: DataFrame, dims: Int, k: Int): Model = {
    require(k >= 1 && k <= dims, s"k=$k must be in [1, $dims]")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(col("embedding")).as[Seq[Float]]
    // moment partials per partition: n, Σx, Σ x xᵀ (upper triangle)
    val tri = dims * (dims + 1) / 2
    val partials = vecs.mapPartitions { it =>
      var n = 0L
      val s = new Array[Double](dims)
      val g = new Array[Double](tri)
      it.foreach { v =>
        require(v.length == dims, s"expected $dims-dim embedding, got ${v.length}")
        n += 1
        var i = 0
        var t = 0
        while (i < dims) {
          val vi = v(i).toDouble
          s(i) += vi
          var j = i
          while (j < dims) { g(t) += vi * v(j); t += 1; j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((n, s, g))
    }.collect() // ≤ #partitions rows of fixed-size moments — metadata
    require(partials.nonEmpty, "no embeddings to fit")
    val n = partials.map(_._1).sum
    val s = new Array[Double](dims)
    val g = new Array[Double](tri)
    partials.foreach { case (_, ps, pg) =>
      var i = 0
      while (i < dims) { s(i) += ps(i); i += 1 }
      var t = 0
      while (t < tri) { g(t) += pg(t); t += 1 }
    }
    val mean = s.map(_ / n)
    // covariance C = E[xxᵀ] − μμᵀ (population; the 1/n form — scaling does
    // not change eigenvectors or variance ratios)
    val c = Array.ofDim[Double](dims, dims)
    var t = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val v = g(t) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        t += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobi(c)
    val order = evals.indices.sortBy(idx => -evals(idx)).toArray
    Model(mean,
      order.take(k).map(idx => evecs.map(_(idx))),
      order.map(evals(_)))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotate away
    * the largest off-diagonal mass sweep by sweep. Deterministic (fixed
    * (p,q) sweep order, fixed budget); returns (eigenvalues, column
    * eigenvectors). */
  private def jacobi(a0: Array[Array[Double]], sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > 1e-12) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tt = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val cth = 1.0 / math.sqrt(tt * tt + 1.0)
            val sth = tt * cth
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = cth * aip - sth * aiq
              a(i)(q) = sth * aip + cth * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = cth * api - sth * aqi
              a(q)(i) = sth * api + cth * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = cth * vip - sth * viq
              v(i)(q) = sth * vip + cth * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project to k dims: `(vec_id, proj: Array[Double])` — a narrow
    * per-row pass against the broadcast-small model. */
  def project(embeddings: DataFrame, model: Model): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, v) =>
          val proj = m.components.map { comp =>
            var acc = 0.0
            var i = 0
            while (i < comp.length) { acc += (v(i) - m.mean(i)) * comp(i); i += 1 }
            acc
          }
          (id, proj)
        }
      }.toDF("vec_id", "proj")
  }

  /** Mean reconstruction MSE of the k-dim truncation, normalized by the
    * mean centered square norm — equals 1 − varianceExplained(k) up to
    * numerical error, measured the long way (decode and compare), so it
    * validates projection AND decomposition together. */
  def reconstructionError(embeddings: DataFrame, model: Model): Double = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val (se, tot) = embeddings.select(col("embedding")).as[Seq[Float]]
      .mapPartitions { it =>
        val m = bc.value
        var se = 0.0
        var tot = 0.0
        it.foreach { v =>
          val cent = Array.tabulate(v.length)(i => v(i).toDouble - m.mean(i))
          val coef = m.components.map { comp =>
            var acc = 0.0
            var i = 0
            while (i < comp.length) { acc += cent(i) * comp(i); i += 1 }
            acc
          }
          var i = 0
          while (i < cent.length) {
            var rec = 0.0
            var j = 0
            while (j < coef.length) { rec += coef(j) * m.components(j)(i); j += 1 }
            val d = cent(i) - rec
            se += d * d
            tot += cent(i) * cent(i)
            i += 1
          }
        }
        Iterator.single((se, tot))
      }.collect().foldLeft((0.0, 0.0)) { case ((a, b), (x, y)) => (a + x, b + y) }
    if (tot <= 0) 0.0 else se / tot
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segmented (parallel-prefix) exponential moving average.
  *
  * The EMA recurrence `y_i = decay * y_(i-1) + weight * x_i` is inherently
  * sequential, so the contract shape (TS-EMA) materializes each series as
  * ONE ordered array on ONE task and folds it — correct, but a monster
  * series (10^8+ points) caps out a single executor. The scale path here
  * exploits that each update step is an AFFINE map `y -> a*y + b`, and
  * affine maps compose associatively:
  *
  *   (a2, b2) ∘ (a1, b1) = (a2*a1, a2*b1 + b2)
  *
  * so a series can be split into ordered chunks, each chunk folded
  * INDEPENDENTLY to one (a, b) pair, and the pairs combined in chunk order
  * — a classic parallel prefix/scan decomposition (Blelloch-style), here
  * specialized to the suffix value the query needs:
  *
  *   1. range-bucket the order key (one min/max metadata pass — the same
  *      pass Spark's RangePartitioner pays): monotonic chunk id, so chunk
  *      order + in-chunk order = series order;
  *   2. per (series, chunk): sort locally (bounded by the chunk width, not
  *      the series) and fold to `a = decay^m`, `b = fold of weighted
  *      inputs` — ONE hash shuffle on (series, chunk), map-side partials;
  *   3. per series: combine the ≤ `buckets` chunk summaries in order —
  *      metadata-scale state, like GlobalWindow's boundary summaries.
  *
  * The first element seeds the fold (`y_1 = x_1`, matching TS-EMA), so the
  * first chunk also carries its tail-only (elements 2..m) coefficients.
  *
  * No window operator appears in the plan at all — two hash aggregates,
  * the second over metadata. PlanAuditSpec asserts the data-side aggregate
  * is (series, chunk)-grouped, never a whole-series collect.
  *
  * Floating point: the affine re-association is algebraically exact but
  * not bit-identical to the sequential fold; at the contract's 4-decimal
  * rounding the two agree (asserted at all three SFs by the oracle and on
  * random data by SegmentedEmaSpec).
  */
object SegmentedEma {

  private val B = "__se_b"

  /** EMA-final per series: for each group of `seriesCols`, the value of
    * `y_n` where `y_1 = x_1`, `y_i = decay*y_(i-1) + weight*x_i` over
    * `valueCol` ordered by `orderCols` (must be a deterministic total
    * order within a series; `rangeKey` must be a monotonic numeric image
    * of the leading order column).
    *
    * Output: seriesCols*, `n` (LONG count), `ema` (DOUBLE, unrounded).
    */
  def emaFinal(df: DataFrame, seriesCols: Seq[String], rangeKey: Column,
               orderCols: Seq[Column], valueCol: Column,
               decay: Double = 0.7, weight: Double = 0.3,
               buckets: Int = 0): DataFrame = {
    val nb = if (buckets > 0) buckets
             else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt * 4
    val (lo, hi) = GlobalWindow.keyRange(df, rangeKey)
    val width = math.max((hi - lo) / nb, 1e-9)
    val t = df.withColumn(B, GlobalWindow.bucketCol(rangeKey, lo, width, nb))

    // stage 1: per (series, chunk) — local sort (bounded by chunk width)
    // and two folds: all m elements, and the tail (2..m) for the seed chunk.
    // The collected struct is FLAT (order fields then value): array_sort
    // over nested structs drops out of codegen into an interpreted
    // comparator — measured 20× slower at 10M rows.
    val sortKey = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__se_o$i") } :+
      valueCol.cast("double").as("__se_v")
    val chunk = t
      .groupBy((seriesCols.map(col) :+ col(B)): _*)
      .agg(collect_list(struct(sortKey: _*)).as("raw"))
      .select((seriesCols.map(col) :+ col(B) :+
        transform(array_sort(col("raw")), _.getField("__se_v")).as("vals")): _*)
      .select((seriesCols.map(col) :+ col(B).as("b") :+
        size(col("vals")).cast("long").as("m") :+
        element_at(col("vals"), 1).as("first") :+
        pow(lit(decay), size(col("vals"))).as("a_full") :+
        aggregate(col("vals"), lit(0.0),
          (acc, x) => acc * decay + x * weight).as("b_full") :+
        pow(lit(decay), size(col("vals")) - 1).as("a_tail") :+
        aggregate(slice(col("vals"), lit(2), size(col("vals")) - 1), lit(0.0),
          (acc, x) => acc * decay + x * weight).as("b_tail")): _*)

    // stage 2: per series — combine the <= nb chunk summaries in chunk
    // order (metadata-scale rows). Seed = first chunk's first element run
    // through its own tail affine; every later chunk applies (a_full,
    // b_full).
    val chunks = array_sort(collect_list(struct(
      col("b"), col("m"), col("first"),
      col("a_full"), col("b_full"), col("a_tail"), col("b_tail"))))
    chunk
      .groupBy(seriesCols.map(col): _*)
      .agg(sum(col("m")).as("n"), chunks.as("cs"))
      .select((seriesCols.map(col) :+ col("n") :+
        aggregate(slice(col("cs"), lit(2), size(col("cs")) - 1),
          element_at(col("cs"), 1).getField("a_tail") *
            element_at(col("cs"), 1).getField("first") +
            element_at(col("cs"), 1).getField("b_tail"),
          (acc, c) => acc * c.getField("a_full") + c.getField("b_full"))
          .as("ema")): _*)
  }
}

/** Segmented Holt linear (double-exponential) smoothing — the 2×2
  * generalization of [[SegmentedEma]].
  *
  * Holt's recurrences over state s = (level, trend):
  * {{{
  *   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
  *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
  * }}}
  * are one AFFINE map of the state per input: s_t = M·s_{t−1} + c·x_t with
  * M = [[1−α, 1−α], [−αβ, 1−αβ]], c = (α, αβ). Affine maps over vectors
  * compose associatively exactly like the scalar case — (M₂,v₂)∘(M₁,v₁) =
  * (M₂M₁, M₂v₁+v₂) — so the same chunked decomposition applies: each
  * range-bucketed chunk folds independently to its composed (M, v)
  * (6 doubles), and the per-series combine applies the ≤`buckets` chunk
  * affines to the running 2-vector state in chunk order, metadata-scale.
  * Seed (the contract): s_1 = (x_1, 0).
  *
  * Same plan as [[SegmentedEma]]: two hash aggregates, no window, no
  * whole-series array on any task. Re-association is algebraically exact;
  * 4-decimal agreement with the sequential fold is oracle-asserted.
  */
object SegmentedHolt {

  private val B = "__sh_b"

  /** (seriesCols*, n LONG, level DOUBLE, trend DOUBLE) — Holt's final
    * state per series over `valueCol` ordered by `orderCols`. */
  def holtFinal(df: DataFrame, seriesCols: Seq[String], rangeKey: Column,
                orderCols: Seq[Column], valueCol: Column,
                alpha: Double = 0.3, beta: Double = 0.2,
                buckets: Int = 0): DataFrame = {
    val nb = if (buckets > 0) buckets
             else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt * 4
    val (lo, hi) = GlobalWindow.keyRange(df, rangeKey)
    val width = math.max((hi - lo) / nb, 1e-9)
    val t = df.withColumn(B, GlobalWindow.bucketCol(rangeKey, lo, width, nb))

    // one Holt step composed onto an accumulated affine [m11,m12,m21,m22,v1,v2]
    val (ma, mb2) = (1.0 - alpha, 1.0 - alpha)
    val (mc, md) = (-alpha * beta, 1.0 - alpha * beta)
    def step(acc: Column, x: Column): Column = array(
      lit(ma) * element_at(acc, 1) + lit(mb2) * element_at(acc, 3),
      lit(ma) * element_at(acc, 2) + lit(mb2) * element_at(acc, 4),
      lit(mc) * element_at(acc, 1) + lit(md) * element_at(acc, 3),
      lit(mc) * element_at(acc, 2) + lit(md) * element_at(acc, 4),
      lit(ma) * element_at(acc, 5) + lit(mb2) * element_at(acc, 6) + lit(alpha) * x,
      lit(mc) * element_at(acc, 5) + lit(md) * element_at(acc, 6) + lit(alpha * beta) * x)
    val identity6 = array(lit(1.0), lit(0.0), lit(0.0), lit(1.0), lit(0.0), lit(0.0))

    val sortKey = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__sh_o$i") } :+
      valueCol.cast("double").as("__sh_v")
    val chunk = t
      .groupBy((seriesCols.map(col) :+ col(B)): _*)
      .agg(collect_list(struct(sortKey: _*)).as("raw"))
      .select((seriesCols.map(col) :+ col(B) :+
        transform(array_sort(col("raw")), _.getField("__sh_v")).as("vals")): _*)
      .select((seriesCols.map(col) :+ col(B).as("b") :+
        size(col("vals")).cast("long").as("m") :+
        element_at(col("vals"), 1).as("first") :+
        aggregate(col("vals"), identity6, step).as("full") :+
        aggregate(slice(col("vals"), lit(2), size(col("vals")) - 1),
          identity6, step).as("tail")): _*)

    // per series: seed = first chunk's tail affine applied to (first, 0),
    // then each later chunk's full affine applied to the running state
    def applyAff(aff: Column, s: Column): Column = array(
      element_at(aff, 1) * element_at(s, 1) + element_at(aff, 2) * element_at(s, 2) +
        element_at(aff, 5),
      element_at(aff, 3) * element_at(s, 1) + element_at(aff, 4) * element_at(s, 2) +
        element_at(aff, 6))
    val chunks = array_sort(collect_list(struct(
      col("b"), col("m"), col("first"), col("full"), col("tail"))))
    chunk
      .groupBy(seriesCols.map(col): _*)
      .agg(sum(col("m")).as("n"), chunks.as("cs"))
      .select((seriesCols.map(col) :+ col("n") :+
        aggregate(slice(col("cs"), lit(2), size(col("cs")) - 1),
          applyAff(element_at(col("cs"), 1).getField("tail"),
            array(element_at(col("cs"), 1).getField("first"), lit(0.0))),
          (s, c) => applyAff(c.getField("full"), s)).as("hb")): _*)
      .select((seriesCols.map(col) :+ col("n") :+
        element_at(col("hb"), 1).as("level") :+
        element_at(col("hb"), 2).as("trend")): _*)
  }
}

/** Segmented fold for ANY linear time-invariant state recurrence
  * `s_t = M·s_{t−1} + c·x_t` (constant d×d matrix M, constant input
  * vector c, seed s_1 = (x_1, 0, …, 0)) — [[SegmentedEma]] is the d=1
  * case, [[SegmentedHolt]] the d=2 case; Holt-Winters additive is d=6
  * (level, trend, rotating m=4 seasonal vector). Composition is the same
  * algebra at every dimension — (M₂,v₂)∘(M₁,v₁) = (M₂M₁, M₂v₁+v₂) — so
  * the chunked decomposition and the two-hash-aggregate plan carry over
  * unchanged. Step expressions skip M's structural zeros (the HW matrix is
  * 2/3 permutation rows), keeping codegen size linear in nnz(M)·d, not d³.
  */
object SegmentedAffine {

  private val B = "__sa_b"

  /** (seriesCols*, n LONG, s ARRAY<DOUBLE> of length d) — the final state
    * per series. `m`/`cVec`: the per-step update. */
  def affineFinal(df: DataFrame, seriesCols: Seq[String], rangeKey: Column,
                  orderCols: Seq[Column], valueCol: Column,
                  m: Array[Array[Double]], cVec: Array[Double],
                  buckets: Int = 0): DataFrame = {
    val d = m.length
    require(m.forall(_.length == d) && cVec.length == d,
      s"step matrix must be ${d}x$d with a $d-vector input column")
    val nb = if (buckets > 0) buckets
             else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt * 4
    val (lo, hi) = GlobalWindow.keyRange(df, rangeKey)
    val width = math.max((hi - lo) / nb, 1e-9)
    val t = df.withColumn(B, GlobalWindow.bucketCol(rangeKey, lo, width, nb))

    // accumulated affine = array(d*d + d): M row-major, then v (1-based)
    def idx(i: Int, j: Int) = i * d + j + 1
    def vidx(i: Int) = d * d + i + 1
    val identity = array(
      ((0 until d).flatMap(i => (0 until d).map(j =>
        lit(if (i == j) 1.0 else 0.0))) ++ (0 until d).map(_ => lit(0.0))): _*)
    // ±1 coefficients compile to bare references/negations — permutation
    // rows (most of the HW matrix) cost zero multiplies per step
    def scaled(coef: Double, e: Column): Column =
      if (coef == 1.0) e else if (coef == -1.0) -e else lit(coef) * e
    def step(acc: Column, x: Column): Column = {
      val cells = for (i <- 0 until d; j <- 0 until d) yield {
        val terms = (0 until d).filter(k => m(i)(k) != 0.0)
          .map(k => scaled(m(i)(k), element_at(acc, idx(k, j))))
        if (terms.isEmpty) lit(0.0) else terms.reduce(_ + _)
      }
      val vs = (0 until d).map { i =>
        val terms = (0 until d).filter(k => m(i)(k) != 0.0)
          .map(k => scaled(m(i)(k), element_at(acc, vidx(k))))
        val base = if (terms.isEmpty) lit(0.0) else terms.reduce(_ + _)
        if (cVec(i) != 0.0) base + lit(cVec(i)) * x else base
      }
      array((cells ++ vs): _*)
    }
    def applyAff(aff: Column, s: Column): Column = array((0 until d).map { i =>
      (0 until d).map(j => element_at(aff, idx(i, j)) * element_at(s, j + 1))
        .reduce(_ + _) + element_at(aff, vidx(i))
    }: _*)

    val sortKey = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__sa_o$i") } :+
      valueCol.cast("double").as("__sa_v")
    val chunk = t
      .groupBy((seriesCols.map(col) :+ col(B)): _*)
      .agg(collect_list(struct(sortKey: _*)).as("raw"))
      .select((seriesCols.map(col) :+ col(B) :+
        transform(array_sort(col("raw")), _.getField("__sa_v")).as("vals")): _*)
      .select((seriesCols.map(col) :+ col(B).as("b") :+
        size(col("vals")).cast("long").as("m") :+
        element_at(col("vals"), 1).as("first") :+
        aggregate(col("vals"), identity, step).as("full") :+
        aggregate(slice(col("vals"), lit(2), size(col("vals")) - 1),
          identity, step).as("tail")): _*)

    val seed0 = array((lit(1.0) +: (1 until d).map(_ => lit(0.0))): _*)
    val chunks = array_sort(collect_list(struct(
      col("b"), col("m"), col("first"), col("full"), col("tail"))))
    chunk
      .groupBy(seriesCols.map(col): _*)
      .agg(sum(col("m")).as("n"), chunks.as("cs"))
      .select((seriesCols.map(col) :+ col("n") :+
        aggregate(slice(col("cs"), lit(2), size(col("cs")) - 1),
          applyAff(element_at(col("cs"), 1).getField("tail"),
            transform(seed0, e => e * element_at(col("cs"), 1).getField("first"))),
          (s, c) => applyAff(c.getField("full"), s)).as("s")): _*)
  }

  /** Holt-Winters additive step (α level, β trend, γ seasonal, m=4):
    * state (l, b, s_now, s+1, s+2, s+3), seasonal rotated to the back
    * after update — the (M, c) pair for [[affineFinal]]. */
  def holtWintersStep(alpha: Double, beta: Double,
                      gamma: Double): (Array[Array[Double]], Array[Double]) = {
    val m = Array(
      Array(1 - alpha, 1 - alpha, -alpha, 0.0, 0.0, 0.0),
      Array(-alpha * beta, 1 - alpha * beta, -alpha * beta, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
      Array(-gamma * (1 - alpha), -gamma * (1 - alpha),
        gamma * alpha + 1 - gamma, 0.0, 0.0, 0.0))
    val c = Array(alpha, alpha * beta, 0.0, 0.0, 0.0, gamma * (1 - alpha))
    (m, c)
  }
}

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

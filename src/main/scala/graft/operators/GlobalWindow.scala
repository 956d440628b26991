package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order window operators.
  *
  * `Window.orderBy(...)` with no partitionBy moves EVERY row to one
  * partition — fine for the declared contract shapes at test scale, fatal
  * at 100 TB (the one-executor sort is the whole job). These operators keep
  * the same semantics with a partitioned plan:
  *
  *   1. range-bucket the ordering key (monotonic bucket id from one
  *      min/max metadata pass — the same pass Spark's RangePartitioner
  *      pays to plan a global sort);
  *   2. run the window PARTITIONED by bucket (one hash shuffle, all
  *      executors participate);
  *   3. stitch bucket boundaries with metadata-scale state: a per-bucket
  *      summary (≤ `buckets` rows) whose own window/scan cost is
  *      negligible, broadcast back — or, for range frames, "halo" copies
  *      of the previous bucket's rows so every frame is locally complete.
  *
  * The only unpartitioned window in any of these plans runs over the
  * per-bucket AGGREGATE (bounded by the bucket count, i.e. metadata, not
  * data) — asserted by PlanAuditSpec.
  */
object GlobalWindow {

  private val B = "__gw_b"

  private def defaultBuckets(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt * 4

  /** Driver-side range metadata: ONE column-pruned min/max pass, O(1) rows
    * collected (RangePartitioner-style planning action). */
  private[operators] def keyRange(df: DataFrame, key: Column): (Double, Double) = {
    val r = df.agg(min(key.cast("double")).as("lo"), max(key.cast("double")).as("hi")).head()
    if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
  }

  /** Monotonic range-bucket id for `key`, clamped to [0, buckets). Any
    * k1 <= k2 gets b1 <= b2, so per-bucket order + bucket order = the
    * global order. */
  private[operators] def bucketCol(key: Column, lo: Double, width: Double, buckets: Int): Column =
    least(greatest(floor((key.cast("double") - lit(lo)) / lit(width)), lit(0L)),
      lit(buckets - 1L)).cast("long")

  /** lag(1)/lead(1) of `valueCol` over the GLOBAL order `orderCols`,
    * without a single-partition WindowExec.
    *
    * `rangeKey` must be a monotonic numeric image of the leading order
    * column (e.g. a timestamp cast to double). Bucket-local lag/lead is
    * exact except at bucket edges; the first/last row of each bucket is
    * patched from a broadcast per-bucket boundary summary (previous
    * non-empty bucket's last value / next non-empty bucket's first value —
    * adjacency over the summary skips empty buckets for free).
    *
    * One data shuffle (hash by bucket) + one metadata aggregate. Null-safe:
    * edge rows are detected by row_number, not by a null lag probe. */
  def lagLead(df: DataFrame, rangeKey: Column, orderCols: Seq[String], valueCol: String,
              buckets: Int = 0, prevName: String = "prev", nextName: String = "next"): DataFrame = {
    val nb = if (buckets > 0) buckets else defaultBuckets(df)
    val (lo, hi) = keyRange(df, rangeKey)
    val width = math.max((hi - lo) / nb, 1e-9)
    val t = df.withColumn(B, bucketCol(rangeKey, lo, width, nb))
    val ord = orderCols.map(col)
    val w = Window.partitionBy(B).orderBy(ord: _*)
    // one ordered WindowExec, offset/running frames only (no unbounded
    // frame, so no whole-partition buffering): last row detected by a
    // lead(1) null probe on a literal, not a partition count
    val local = t
      .withColumn("__gw_lag", lag(valueCol, 1).over(w))
      .withColumn("__gw_lead", lead(valueCol, 1).over(w))
      .withColumn("__gw_rn", row_number().over(w))
      .withColumn("__gw_last_row", lead(lit(1), 1).over(w).isNull)
    // boundary summary from the window output's EDGE rows (<= 2 per
    // bucket), not a second full-data aggregate — the shuffle by B is
    // shared with the main window via exchange reuse
    val summary = local
      .where(col("__gw_rn") === 1 || col("__gw_last_row"))
      .groupBy(col(B)).agg(
        max(when(col("__gw_rn") === 1, col(valueCol))).as("__gw_first"),
        max(when(col("__gw_last_row"), col(valueCol))).as("__gw_last"))
    // summary is <= nb rows: the unpartitioned window here is metadata work
    val sw = Window.orderBy(B)
    val bmap = summary.select(col(B),
      lag("__gw_last", 1).over(sw).as("__gw_prev_last"),
      lead("__gw_first", 1).over(sw).as("__gw_next_first"))
    local.join(broadcast(bmap), B)
      .withColumn(prevName,
        when(col("__gw_rn") === 1, col("__gw_prev_last")).otherwise(col("__gw_lag")))
      .withColumn(nextName,
        when(col("__gw_last_row"), col("__gw_next_first")).otherwise(col("__gw_lead")))
      .drop(B, "__gw_lag", "__gw_lead", "__gw_rn", "__gw_last_row",
        "__gw_prev_last", "__gw_next_first")
  }

  /** ntile(n) over the GLOBAL order `orderCols`, partitioned.
    *
    * Bucket-local row_number + broadcast cumulative per-bucket counts give
    * the exact global rank; the tile is then SQL ntile's closed form (the
    * first `total mod n` tiles hold `total div n + 1` rows, the rest
    * `total div n`), computed in exact long arithmetic. */
  def ntileGlobal(df: DataFrame, rangeKey: Column, orderCols: Seq[Column], n: Int,
                  buckets: Int = 0, tileName: String = "tile"): DataFrame = {
    require(n > 0, "ntile requires n > 0")
    val nb = if (buckets > 0) buckets else defaultBuckets(df)
    val (lo, hi) = keyRange(df, rangeKey)
    val width = math.max((hi - lo) / nb, 1e-9)
    val t = df.withColumn(B, bucketCol(rangeKey, lo, width, nb))
    val w = Window.partitionBy(B).orderBy(orderCols: _*)
    val local = t.withColumn("__gw_rn", row_number().over(w))
      .withColumn("__gw_last_row", lead(lit(1), 1).over(w).isNull)
    // per-bucket counts from the window output's LAST rows (rn of the
    // last row IS the count), sharing the bucket shuffle — not a second
    // full-data aggregate, and no unbounded-frame partition count
    val summary = local.where(col("__gw_last_row"))
      .select(col(B), col("__gw_rn").as("__gw_bcnt"))
    val sw = Window.orderBy(B)
    val off = summary.select(col(B),
      coalesce(sum("__gw_bcnt").over(sw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("__gw_off"),
      sum("__gw_bcnt").over(sw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("__gw_total"))
    local.join(broadcast(off), B)
      .withColumn("__gw_rank", col("__gw_off") + col("__gw_rn"))
      .withColumn(tileName, expr(
        s"""CASE WHEN __gw_rank <= (__gw_total DIV $n + 1) * (__gw_total % $n)
           |     THEN (__gw_rank - 1) DIV (__gw_total DIV $n + 1) + 1
           |     ELSE (__gw_total % $n)
           |          + (__gw_rank - 1 - (__gw_total DIV $n + 1) * (__gw_total % $n))
           |            DIV (__gw_total DIV $n) + 1
           |END""".stripMargin).cast("int"))
      .drop(B, "__gw_rn", "__gw_last_row", "__gw_off", "__gw_total", "__gw_rank")
  }

  /** count(*) OVER (ORDER BY key RANGE BETWEEN span PRECEDING AND CURRENT
    * ROW) on a global numeric order, partitioned.
    *
    * Bucket width is forced >= 1.5 * span, so every row's frame lies
    * entirely in its own bucket plus the previous one. Each bucket's rows
    * are also emitted as tagged "halo" copies into the next bucket (only
    * those close enough to matter survive the conservative prefilter), so
    * a bucket-partitioned range window sees every frame completely; halo
    * rows contribute to counts but produce no output. One hash shuffle,
    * <= 2x transient data, no metadata joins at all. */
  def rangeCount(df: DataFrame, key: Column, span: Long, buckets: Int = 0,
                 cntName: String = "cnt"): DataFrame =
    rangeAgg(df, key, span, count(lit(1)), buckets, cntName)

  /** Any distributive/algebraic aggregate over the same global range frame
    * (sum, avg, min, max, count — anything whose value is a function of
    * the frame's rows): same halo construction, same single shuffle. */
  def rangeAgg(df: DataFrame, key: Column, span: Long, agg: Column,
               buckets: Int = 0, outName: String = "agg"): DataFrame = {
    require(span > 0, "rangeAgg requires span > 0")
    val nb = if (buckets > 0) buckets else defaultBuckets(df)
    val (lo, hi) = keyRange(df, key)
    val width = math.max(1.5 * span, math.max((hi - lo) / nb, 1e-9))
    val t = df.withColumn(B, bucketCol(key, lo, width, nb))
    val orig = t.withColumn("__gw_halo", lit(false))
    // halo copy of bucket b into b+1, kept only if it can reach some frame
    // there: key >= lowerBound(b+1) - span (margin 0.1% against double
    // rounding — keeping an extra row is harmless, dropping one is not)
    val halo = t.withColumn(B, col(B) + 1)
      .where(col(B) < nb &&
        key.cast("double") >= lit(lo) + col(B) * lit(width) - lit(span * 1.001))
      .withColumn("__gw_halo", lit(true))
    val w = Window.partitionBy(B).orderBy(key).rangeBetween(-span, Window.currentRow)
    orig.unionByName(halo)
      .withColumn(outName, agg.over(w))
      .where(!col("__gw_halo"))
      .drop(B, "__gw_halo")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the scale path for range predicates
  * WITHOUT an equi key.
  *
  * `points JOIN intervals ON lo <= p AND p <= hi` has no equality
  * conjunct, so Spark plans a BroadcastNestedLoopJoin (or a cartesian) —
  * every point × every interval, the canonical 100 TB scale-killer
  * (JOIN-RANGE survives only because its predicate also carries an equi
  * key). The standard fix buckets the VALUE DOMAIN:
  *
  *   1. one metadata pass: the points' min/max (the RangePartitioner
  *      pass) and the intervals' max span;
  *   2. bucket width = max(domain/nb, max span) — so an interval covers
  *      at most 2 adjacent buckets and bucket count stays O(nb);
  *   3. each point hashes to floor(p/w); each interval EXPLODES to every
  *      bucket it covers (≤ 2 by construction);
  *   4. equi-join on the bucket id + the exact range residual. A point
  *      lives in exactly ONE bucket, so every qualifying (point,
  *      interval) pair meets exactly once — no dedup stage.
  *
  * One hash shuffle each side, key-equality all the way — at 1000
  * executors this is a plain shuffle join; the BNLJ shape is a full
  * broadcast of one side against every partition of the other. */
object RangeJoin {

  private val B = "__rj_b"

  /** Join `points` (column `pCol`) to `intervals` (columns `loCol`,
    * `hiCol`, both inclusive) on lo <= p <= hi. Output: all columns of
    * both inputs for every qualifying pair. Column names must be
    * distinct across the two frames. */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      buckets: Int = 0): DataFrame = {
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      "pointInInterval requires column names distinct across the two " +
        s"frames (the residual predicate would bind ambiguously); " +
        s"overlapping: ${overlap.toSeq.sorted.mkString(", ")}")
    val nb = if (buckets > 0) buckets
             else points.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt * 4
    val (lo, hi) = GlobalWindow.keyRange(points, col(pCol))
    val spanRow = intervals
      .agg(max(col(hiCol).cast("double") - col(loCol).cast("double"))).head()
    val maxSpan = if (spanRow.isNullAt(0)) 0.0 else math.max(spanRow.getDouble(0), 0.0)
    val width = math.max(math.max((hi - lo) / nb, maxSpan), 1e-9)
    val p = points.withColumn(B, floor(col(pCol).cast("double") / width).cast("long"))
    // an interval spans floor(lo/w)..floor(hi/w): <= 2 buckets since
    // width >= max span (degenerate hi < lo intervals produce an empty
    // sequence and drop out, matching the impossible predicate)
    val iv = intervals.withColumn(B,
      explode(sequence(floor(col(loCol).cast("double") / width).cast("long"),
        greatest(floor(col(hiCol).cast("double") / width).cast("long"),
          floor(col(loCol).cast("double") / width).cast("long")))))
    p.join(iv, Seq(B))
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop(B)
  }

  /** Join two INTERVAL sets on overlap (`aLo <= bHi AND bLo <= aHi`,
    * inclusive) — the no-equi-key shape interval×interval analytics hit
    * (sessions × incidents, presence × outages). Same grid idea as
    * [[pointInInterval]] with one extra trick: overlapping intervals
    * always share the cell of `greatest(aLo, bLo)` (the overlap's start),
    * so the join keeps only that CANONICAL cell and every qualifying pair
    * meets exactly once — no dedup pass. Width ≥ both sides' max span ⇒
    * each interval explodes to ≤ 2 cells. Column names must be distinct
    * across the two frames. */
  def intervalOverlap(a: DataFrame, aLoCol: String, aHiCol: String,
                      b: DataFrame, bLoCol: String, bHiCol: String,
                      buckets: Int = 0): DataFrame = {
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty,
      "intervalOverlap requires column names distinct across the two " +
        s"frames; overlapping: ${overlap.toSeq.sorted.mkString(", ")}")
    val nb = if (buckets > 0) buckets
             else a.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt * 4
    def maxSpan(df: DataFrame, lo: String, hi: String): Double = {
      val r = df.agg(max(col(hi).cast("double") - col(lo).cast("double"))).head()
      if (r.isNullAt(0)) 0.0 else math.max(r.getDouble(0), 0.0)
    }
    val (dLo, dHi) = GlobalWindow.keyRange(a, col(aLoCol))
    val width = math.max(math.max((dHi - dLo) / nb,
      math.max(maxSpan(a, aLoCol, aHiCol), maxSpan(b, bLoCol, bHiCol))), 1e-9)
    def cells(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn(B, explode(sequence(
        floor(col(lo).cast("double") / width).cast("long"),
        greatest(floor(col(hi).cast("double") / width).cast("long"),
          floor(col(lo).cast("double") / width).cast("long")))))
    cells(a, aLoCol, aHiCol).join(cells(b, bLoCol, bHiCol), Seq(B))
      .where(col(aLoCol) <= col(bHiCol) && col(bLoCol) <= col(aHiCol)
        && col(B) === floor(greatest(col(aLoCol), col(bLoCol)).cast("double") / width)
          .cast("long"))
      .drop(B)
  }
}

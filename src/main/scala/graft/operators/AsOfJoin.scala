package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each right-side row, the most recent left-side event at
  * or before its timestamp, per key.
  *
  * Spark has no native as-of join. The naive formulation (theta-join on
  * `l.ts <= r.ts` + max aggregate — what the JOIN-ASOF SQL twin does) is
  * O(|L|·|R|) per key: every purchase joins every earlier click before the
  * aggregate collapses them. This operator instead unions both sides and
  * takes a running `last(leftTs) ignore nulls` over one window sorted by
  * (ts, side) — O(n log n) in one shuffle by key, no pair blow-up. At equal
  * timestamps the left side sorts first, giving `<=` (as-of-or-equal)
  * semantics.
  *
  * At 100 TB this is the difference between a quadratic-per-key join and a
  * single sort-based window pass; for skewed keys the window sort spills
  * rather than materializing pairs.
  */
object AsOfJoin {

  /** For each row of `right`, attach `last_left_ts` = max left `tsCol` with
    * left.ts <= right.ts on the same `keyCol`. Output: right's `idCol`,
    * last_left_ts (timestamp, null when no left event precedes). */
  def lastBefore(left: DataFrame, right: DataFrame,
                 keyCol: String, tsCol: String, idCol: String): DataFrame = {
    // carry the right id through in its ORIGINAL type (the union's left
    // side nulls are cast to match) — a long round-trip would null out
    // non-castable ids and silently retype the output column
    val idType = right.schema(idCol).dataType
    val l = left.select(col(keyCol), col(tsCol),
      lit(null).cast(idType).as("__rid"), lit(0).as("__side"))
    val r = right.select(col(keyCol), col(tsCol),
      col(idCol).as("__rid"), lit(1).as("__side"))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("__last_left",
        last(when(col("__side") === 0, col(tsCol)), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__rid").as(idCol), col("__last_left").as("last_left_ts"))
  }

  /** [[lastBefore]] carrying a left-side payload (the practical attribution
    * form: WHICH click, not just when). The window additionally orders by
    * the payload so equal-timestamp left rows resolve deterministically —
    * the LARGEST payload at the latest qualifying timestamp wins, matching
    * the `max(struct(ts, payload))` theta-join contract formulation. Same
    * single sort-based pass, no pair blow-up. Payload must be long-castable
    * (ids). The (ts, payload) pair is carried in ONE `last(struct)` so both
    * fields always come from the SAME left row — a left row whose payload
    * is null (or fails the long cast) still wins attribution and reports a
    * null payload, exactly as `max(struct(ts, payload))` would.
    *
    * Optional `toleranceSec`: matches older than `right.ts − tolerance`
    * null out (both ts and payload) — the standard bounded attribution
    * window ("credit a click only within 24 h"). Applied as a residual on
    * the window result, so the plan is unchanged. */
  def lastBeforeWith(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, idCol: String, payloadCol: String,
                     toleranceSec: Option[Long] = None): DataFrame = {
    val idType = right.schema(idCol).dataType
    val l = left.select(col(keyCol), col(tsCol),
      lit(null).cast(idType).as("__rid"), lit(0).as("__side"),
      col(payloadCol).try_cast("long").as("__pay"))
    val r = right.select(col(keyCol), col(tsCol),
      col(idCol).as("__rid"), lit(1).as("__side"),
      lit(null).cast("long").as("__pay"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("__last",
        last(when(col("__side") === 0,
          struct(col(tsCol).as("ts"), col("__pay").as("pay"))),
          ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn("__ok", toleranceSec match {
        case Some(tol) =>
          col("__last").getField("ts").cast("double") >=
            col(tsCol).cast("double") - tol
        case None => col("__last").isNotNull
      })
      .select(col("__rid").as(idCol),
        when(col("__ok"), col("__last").getField("ts")).as("last_left_ts"),
        when(col("__ok"), col("__last").getField("pay")).as("last_payload"))
  }

  /** [[lastBefore]] served by the NATIVE physical operator
    * (`graft.plans.MergeAsOfJoinExec`): same contract — for each right
    * row, `last_left_ts` = greatest left ts at or before it per key —
    * but instead of union + running window, the exec declares
    * SortMergeJoin's distribution/ordering requirements and merges the
    * two sorted streams per partition in one O(|L|+|R|) pass with O(1)
    * state. No unioned row set, no window buffering; bucketed or
    * pre-sorted children join with no extra shuffle (EnsureRequirements
    * elides what the children already provide).
    *
    * Key must be long-castable; null keys/timestamps on the left are
    * dropped (they can match nothing), null right keys/timestamps yield
    * null. Registers the planner strategy on first use. */
  def mergeLastBefore(left: DataFrame, right: DataFrame,
                      keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies
        .exists(_ eq graft.plans.MergeAsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.MergeAsOfJoinStrategy
    val l = left
      .select(col(keyCol).cast("long").as("__lk"), col(tsCol).as("__lts"))
      .where(col("__lk").isNotNull && col("__lts").isNotNull)
    val lPlan = l.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val lKey = lPlan.output.find(_.name == "__lk").get
    val lTs = lPlan.output.find(_.name == "__lts").get
    val rKey = rPlan.output.find(_.name == keyCol).getOrElse(
      throw new IllegalArgumentException(s"right side has no column $keyCol"))
    val rTs = rPlan.output.find(_.name == tsCol).getOrElse(
      throw new IllegalArgumentException(s"right side has no column $tsCol"))
    require(rKey.dataType == org.apache.spark.sql.types.LongType,
      s"right $keyCol must be LONG (got ${rKey.dataType}); cast it first")
    val tsOut = AttributeReference("last_left_ts", lTs.dataType)()
    org.apache.spark.sql.GraftSqlShim.ofRows(spark,
      graft.plans.MergeAsOfJoin(lPlan, rPlan, lKey, lTs, rKey, rTs, tsOut))
  }

  /** Nearest-in-time join, BOTH directions: for each right row, the left
    * `tsCol` minimizing |Δt| on the same key — sensor/trade alignment,
    * where the closest reading matters and may come after. Ties (equal
    * distance before and after) resolve to the EARLIER left row.
    *
    * Same union trick, TWO running windows over one sort: a backward
    * `last(left ts)` (equal timestamps sort left-first, so `<=` lands
    * here and is never double-counted) and a forward `first(left ts)`
    * (strictly after). Still one shuffle by key, no pair blow-up — the
    * naive nearest formulation is the same O(|L|·|R|)-per-key theta join
    * as-of suffers, with abs() making the predicate even less pushable.
    *
    * Optional `toleranceSec` nulls matches farther than the tolerance.
    * Output: right's `idCol`, `nearest_left_ts` (null when nothing
    * qualifies). */
  def nearest(left: DataFrame, right: DataFrame,
              keyCol: String, tsCol: String, idCol: String,
              toleranceSec: Option[Long] = None): DataFrame = {
    val idType = right.schema(idCol).dataType
    val l = left.select(col(keyCol), col(tsCol),
      lit(null).cast(idType).as("__rid"), lit(0).as("__side"))
    val r = right.select(col(keyCol), col(tsCol),
      col(idCol).as("__rid"), lit(1).as("__side"))
    val ord = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val leftTs = when(col("__side") === 0, col(tsCol))
    val rts = col(tsCol).cast("double")
    val bef = col("__bef").cast("double")
    val aft = col("__aft").cast("double")
    val within: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      d => toleranceSec match {
        case Some(tol) => d <= lit(tol.toDouble)
        case None => d.isNotNull
      }
    l.union(r)
      .withColumn("__bef", last(leftTs, ignoreNulls = true).over(back))
      .withColumn("__aft", first(leftTs, ignoreNulls = true).over(fwd))
      .where(col("__side") === 1)
      .withColumn("__db", when(within(rts - bef), rts - bef))
      .withColumn("__da", when(within(aft - rts), aft - rts))
      .select(col("__rid").as(idCol),
        when(col("__db").isNotNull &&
            (col("__da").isNull || col("__db") <= col("__da")), col("__bef"))
          .when(col("__da").isNotNull, col("__aft"))
          .as("nearest_left_ts"))
  }
}

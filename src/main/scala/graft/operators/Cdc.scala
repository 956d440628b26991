package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: snapshot diffing and type-2 dimension
  * history. Both are single-shuffle plans — the diff is one key-partitioned
  * full outer join, the SCD2 build is windows over one (key, ord) sort —
  * so they scale with the key partitioning, never with pairwise comparison.
  */
object Cdc {

  /** Diff two snapshots of a keyed table into a change feed:
    * `(key…, change_type ∈ {insert, delete, update}, changed_cols)`.
    *
    * `changed_cols` is the comma-joined list of non-key columns whose values
    * differ null-safely (insert/delete rows carry the empty string — there
    * is no counterpart to compare against). Unchanged rows are dropped.
    *
    * One full outer join on the key — at scale this is one shuffle of each
    * snapshot, with AQE free to skew-split hot keys; the per-row column
    * compare is codegen'd (no UDF). Key columns must be non-null (the
    * standard CDC contract: a primary key identifies the row).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(oldSnap.columns.toSet == newSnap.columns.toSet,
      s"snapshot schemas differ: ${oldSnap.columns.toSet} vs ${newSnap.columns.toSet}")
    keys.foreach(k => require(oldSnap.columns.contains(k), s"missing key column $k"))
    val attrs = oldSnap.columns.filterNot(keys.contains).toSeq

    val o = oldSnap.select(oldSnap.columns.map(c => col(c).as(s"__o_$c")).toSeq: _*)
    val n = newSnap.select(newSnap.columns.map(c => col(c).as(s"__n_$c")).toSeq: _*)
    val joined = o.join(n,
      keys.map(k => col(s"__o_$k") === col(s"__n_$k")).reduce(_ && _), "full_outer")

    val inOld = col(s"__o_${keys.head}").isNotNull
    val inNew = col(s"__n_${keys.head}").isNotNull
    val colChanged = attrs.map(a => a -> !(col(s"__o_$a") <=> col(s"__n_$a"))).toMap
    val anyChanged =
      if (attrs.isEmpty) lit(false) else attrs.map(colChanged).reduce(_ || _)

    joined
      .where(!inOld || !inNew || anyChanged)
      .select(
        keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k)) ++ Seq(
          when(!inOld, "insert").when(!inNew, "delete").otherwise("update")
            .as("change_type"),
          concat_ws(",",
            attrs.map(a => when(inOld && inNew && colChanged(a), lit(a))): _*)
            .as("changed_cols")): _*)
  }

  /** Build a type-2 dimension history from a change log
    * `(key, ord, state…)`: collapse no-op changes, last-write-wins within a
    * tick, and emit validity intervals
    * `(key, valid_from, valid_to, state…, is_current)` (half-open;
    * `valid_to` NULL on the open current version).
    *
    * Three stacked windows on ONE (key, ord) sort — a single shuffle:
    * last-write-wins rank within (key, ord) by `tieBreak` desc, a lag to
    * drop rows equal to their predecessor state, a lead for the interval
    * end. Matches how dimension history is actually rebuilt from a CDC
    * stream at scale: per-key, never cross-key.
    */
  def scd2(log: DataFrame, key: String, ord: String, tieBreak: String,
           stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "scd2 needs at least one state column")
    val lww = Window.partitionBy(key, ord).orderBy(col(tieBreak).desc)
    val byOrd = Window.partitionBy(key).orderBy(ord)

    val latest = log
      .withColumn("__rn", row_number().over(lww))
      .where(col("__rn") === 1).drop("__rn", tieBreak)

    val withPrev = stateCols.foldLeft(latest) { (df, c) =>
      df.withColumn(s"__p_$c", lag(col(c), 1).over(byOrd))
    }
    // change row iff first version or any state column null-safely differs
    val isChange = col(s"__p_${stateCols.head}").isNull
      .||(stateCols.map(c => !(col(s"__p_$c") <=> col(c))).reduce(_ || _))

    withPrev.where(isChange)
      .select(
        Seq(col(key), col(ord).as("valid_from"),
          lead(col(ord), 1).over(byOrd).as("valid_to")) ++
          stateCols.map(col) :+
          lead(col(ord), 1).over(byOrd).isNull.as("is_current"): _*)
  }
}

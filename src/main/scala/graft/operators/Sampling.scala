package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the assignment step every training
  * pipeline runs before anything else.
  *
  * `randomSplit` re-rolls on every evaluation (and under task retries), so
  * a 100 TB pipeline built on it cannot reproduce yesterday's split, and
  * train/test leakage appears the first time a stage recomputes. Hashing a
  * STABLE id instead makes the split a pure per-row function: no state, no
  * shuffle, no sampling pass — reproducible forever, immune to retries,
  * and consistent across tables that share the id (join-free co-splitting
  * of features and labels). */
object Sampling {

  /** Assign each row a named split by hash bucket: `splits` are
    * (name, percent) pairs summing to 100; `hash` maps the id column to a
    * bucket in [0, 100) — default xxhash64 mod 100 (the scale path; pass
    * a portable hash for cross-engine-checked variants). Appends a
    * `split` column; rows flow through unchanged. */
  def hashSplit(df: DataFrame, id: Column, splits: Seq[(String, Int)],
                hash: Column => Column =
                  c => pmod(xxhash64(c), lit(100L))): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "each split needs a positive percentage")
    require(splits.map(_._2).sum == 100,
      s"split percentages must sum to 100, got ${splits.map(_._2).sum}")
    val b = hash(id)
    val cum = splits.map(_._2).scanLeft(0)(_ + _).tail
    val assigned = splits.zip(cum).drop(1)
      .foldLeft(when(b < cum.head, lit(splits.head._1))) {
        case (acc, ((name, _), hi)) => acc.when(b < hi, lit(name))
      }
    df.withColumn("split", assigned)
  }
}

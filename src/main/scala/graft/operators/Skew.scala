package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins.
  *
  * A hot key (one metric name carrying 30% of all datapoints, one document
  * cluster sharing a shingle) sends all its rows to ONE reducer in a
  * shuffled join. AQE's skew-join split handles sort-merge cases
  * adaptively; [[saltedJoin]] is the explicit, planner-independent
  * technique for when the build side is replicable: spread the hot key
  * over `salts` reducers by appending a salt column to the join key —
  * large side gets a pseudo-random salt per row, small side is replicated
  * once per salt value. Exact for equi-joins (every large-side row still
  * meets every matching small-side row exactly once).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * The small side is replicated `salts`× — size it accordingly (that is
    * the trade: replication vs reducer hot-spotting). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic per-row spread: hash of the whole row, not a RNG —
    // re-execution of a lost partition must re-salt identically
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*)), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

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

  /** Join types whose semantics survive salting: large-side rows each carry
    * ONE salt, small-side rows exist at EVERY salt, so every large row
    * meets every matching small row exactly once. Right/full outer would
    * emit an unmatched small-side row once per salt — rejected. */
  private val saltableJoinTypes =
    Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")

  /** Equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * The small side is replicated `salts`× — size it accordingly (that is
    * the trade: replication vs reducer hot-spotting). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(saltableJoinTypes(joinType.toLowerCase),
      s"saltedJoin supports ${saltableJoinTypes.mkString("/")} — '$joinType' would " +
        "replicate unmatched small-side rows once per salt")
    // deterministic per-row spread: hash of the row's hashable columns, not
    // a RNG — re-execution of a lost partition must re-salt identically.
    // Map/array/struct columns (e.g. datapoint dimension maps) are excluded:
    // Spark rejects hash() over MapType.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val hashable = large.schema.fields.collect {
      case f if !f.dataType.isInstanceOf[MapType]
        && !f.dataType.isInstanceOf[ArrayType]
        && !f.dataType.isInstanceOf[StructType] => col(f.name)
    }.toIndexedSeq
    val spreadSrc =
      if (hashable.nonEmpty) xxhash64(hashable: _*)
      // all-complex schema: fall back to a partition-layout-deterministic id
      else monotonically_increasing_id()
    val saltedLarge = large.withColumn("__salt",
      pmod(spreadSrc, lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Semi-join reduction for selective big-to-big equi-joins: build a
    * Bloom sketch of `small`'s join keys (one driver-side job; the sketch
    * is bits-sized metadata, NOT the rows — ~1.2 MB per 1M keys at 1%
    * fpp), then prune `large` with a codegen `mightContain` probe BEFORE
    * the shuffle. When the join matches few large-side rows, the shuffle
    * shrinks by ~the selectivity; false positives only waste shuffle,
    * false negatives cannot occur, so results are exactly the plain
    * join's. This is the explicit form of Spark's runtime bloom-filter
    * injection — for when the planner's version doesn't fire (derived
    * keys, non-broadcastable creation side) or the sketch is reused
    * across several joins.
    *
    * Only `inner`/`left_semi` survive pruning: an outer join must keep
    * unmatched large rows and an anti join must OUTPUT them — pruning
    * drops exactly those. Key column must be integral or string, hashed
    * compatibly with `DataFrameStatFunctions.bloomFilter`. */
  def bloomPrunedJoin(large: DataFrame, small: DataFrame,
                      largeKey: String, smallKey: String,
                      expectedItems: Long, fpp: Double = 0.03,
                      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi")(joinType.toLowerCase),
      s"bloomPrunedJoin supports inner/left_semi — '$joinType' needs the pruned rows")
    // the two keys must share a hash family: a sketch built with putLong
    // can NEVER match a probe hashing UTF-8 bytes, so a STRING⋈BIGINT join
    // (legal in Spark via implicit cast) would silently prune every match
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    def family(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case LongType | IntegerType => "integral"
      case StringType => "string"
      case other => other.catalogString
    }
    val lf = family(large.schema(largeKey).dataType)
    val sf = family(small.schema(smallKey).dataType)
    require(lf == sf && Set("integral", "string")(lf),
      s"bloomPrunedJoin keys must share a bloom hash family (both integral or " +
        s"both string) — got $largeKey: $lf vs $smallKey: $sf; cast one side first")
    graft.functions.expressions.GraftFunctions.register(large.sparkSession)
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val pruned = large.where(
      call_function("graft_bloom_might_contain", col(largeKey), lit(bos.toByteArray)))
    pruned.join(small, pruned(largeKey) === small(smallKey), joinType)
  }
}

package graft.core

import org.apache.spark.sql.SparkSession

/** Fixture-table registry.
  *
  * Registers the ten `/root/testdata/sf*` parquet tables as temp views on a
  * session, applying the one load-bearing normalization: `events.ts` is
  * physical parquet `timestamp[ns]`, which Spark 4 refuses to read unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` (the column then surfaces as
  * BIGINT nanos) — we re-derive a µs TIMESTAMP view so downstream operators
  * see normal timestamp semantics (see FIXTURES.md quirk #1).
  *
  * The registry is idempotent per (session, dir): query entry points call
  * [[register]] freely and only pay the parquet-footer read once.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Session configs correctness depends on (SURVEY.md §4c). Safe to set at
    * runtime; must happen before the events parquet footer is read. */
  def ensureConfigs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  /** Dataset.cube/rollup over a join-derived frame false-positives
    * DetectAmbiguousSelfJoin in Spark 4.1 (the Expand duplicates grouping
    * attributes carrying the join inputs' dataset tags — reproduced even
    * with projection/alias boundaries; no self-join exists). Scope the
    * workaround to plan CONSTRUCTION of those operators only (Dataset
    * analysis is eager, so the conf is read inside `f`), restoring the
    * previous value after — genuine self-joins elsewhere keep the guard. */
  def withoutAmbiguousSelfJoinCheck[T](spark: SparkSession)(f: => T): T =
    // serialized: concurrent plan construction on a shared session must not
    // interleave the set/restore (a sibling thread could lose the guard for
    // a genuine self-join, or "restore" the temporary false permanently)
    ambiguousSelfJoinLock.synchronized {
      val key = "spark.sql.analyzer.failAmbiguousSelfJoin"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "false")
      try f
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }

  private val ambiguousSelfJoinLock = new Object

  /** Spread a DataFrame over the configured shuffle-partition count by a
    * key column, for per-row-heavy work downstream. A small corpus often
    * arrives as ONE input split, serializing explodes/regexes/hashing on a
    * single core; the count is EXPLICIT because AQE re-coalesces a bare
    * repartition(col) of a byte-small exchange back to one partition. At
    * real scale the source has many splits and this is a cheap
    * co-location. */
  def spread(df: org.apache.spark.sql.DataFrame, key: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // the no-op gate reads df.rdd.getNumPartitions, which reports the
    // PRE-AQE count — for a frame whose lineage ends in a generic shuffle
    // (join/agg/bare repartition(col)) that is just
    // spark.sql.shuffle.partitions, and AQE can still coalesce the
    // byte-small exchange to ONE partition at runtime (the exact trap
    // spread exists to fix). So the no-op is trusted only when every
    // shuffle in the lineage is AQE-STABLE: scans are physical reality,
    // and an explicit-count Repartition/RepartitionByExpression is a
    // user-specified count AQE never coalesces. Anything else re-spreads.
    val aqeStable = df.queryExecution.optimizedPlan.find {
      case r: RepartitionByExpression => r.optNumPartitions.isEmpty
      case _: Repartition => false // repartition(n)/coalesce(n): explicit count
      case _: Join | _: Aggregate | _: Window | _: Sort | _: Distinct |
           _: Deduplicate | _: RepartitionOperation | _: GlobalLimit => true
      case _ => false
    }.isEmpty
    // adaptive: a source already scanned in >= parts/2 splits gains nothing
    // from an extra exchange — at real scale (thousands of native splits)
    // this is a no-op and the narrow plan is kept. The explicit partition
    // COUNT matters in the fallback: AQE does not coalesce a
    // repartition(n, col), but re-coalesces a bare repartition(col)
    if (aqeStable && df.rdd.getNumPartitions >= math.max(2, parts / 2)) df
    else df.repartition(parts, org.apache.spark.sql.functions.col(key))
  }

  /** Register all fixture tables from `dir` as temp views (idempotent). */
  def register(spark: SparkSession, dir: String): Unit = {
    val d = dir.stripSuffix("/")
    registered.synchronized {
      if (registered.get(spark) != d) {
        doRegister(spark, d)
        registered.put(spark, d)
      }
    }
  }

  private def doRegister(spark: SparkSession, dir: String): Unit = {
    ensureConfigs(spark)
    graft.functions.expressions.GraftFunctions.register(spark)
    names.foreach { t =>
      val raw = spark.read.parquet(s"$dir/$t.parquet")
      raw.createOrReplaceTempView(s"${t}_raw")
      if (t == "events") {
        // Normalize ts to a session-TZ TIMESTAMP whatever the fixture
        // generation wrote: timestamp[ns] physical surfaces as BIGINT nanos
        // under the legacy read mode (ns → µs derivation), while
        // timestamp[us] physical surfaces as TIMESTAMP_NTZ (cast is
        // wall-clock-preserving with the UTC session TZ ensureConfigs pins).
        val tsExpr = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            "timestamp_micros(CAST(ts DIV 1000 AS LONG))"
          case _ => "CAST(ts AS TIMESTAMP)"
        }
        spark.sql(
          s"""CREATE OR REPLACE TEMP VIEW events AS
            |SELECT event_id, $tsExpr AS ts,
            |       user_id, event_type, value, props
            |FROM events_raw""".stripMargin)
      } else {
        spark.sql(s"CREATE OR REPLACE TEMP VIEW $t AS SELECT * FROM ${t}_raw")
      }
    }
  }
}

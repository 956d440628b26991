package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling (Deequ-style column stats) in ONE aggregate pass.
  *
  * The naive shape — one `SELECT count/distinct/min/max FROM t` per column,
  * UNION ALL'd — scans the table once per column. [[profile]] instead folds
  * every column's metrics into a single aggregate row (count-distincts
  * share one Expand, so the scan and shuffle are paid once) and explodes it
  * back to the per-column layout. At 100 TB the difference is `cols`×
  * fewer scans.
  */
object Quality {

  /** Per-column stats: `(col, n_rows, n_nonnull, n_distinct, min_val,
    * max_val)` — min/max surfaced as DOUBLE for numeric columns, NULL
    * otherwise (a profile row is type-homogeneous across columns).
    * Output ordered by column name.
    *
    * `approxDistinct=true` swaps the exact count-distincts for HLL++ —
    * the 100 TB path: exact multi-column distinct shares one Expand that
    * multiplies the scan by the column count, while the sketches are
    * fixed-size buffers with map-side partials and NO Expand (the same
    * trade [[graft.plans.ApproxDistinctRewrite]] applies plan-wide). */
  def profile(df: DataFrame, numericCols: Seq[String], otherCols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    val all = numericCols.map(_ -> true) ++ otherCols.map(_ -> false)
    require(all.nonEmpty, "profile needs at least one column")
    all.foreach { case (c, _) => require(df.columns.contains(c), s"no column $c") }

    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ all.flatMap {
      case (c, isNum) =>
        val mm: Seq[Column] =
          if (isNum) Seq(round(min(col(c)).cast("double"), 4).as(s"__min_$c"),
            round(max(col(c)).cast("double"), 4).as(s"__max_$c"))
          else Seq(lit(null).cast("double").as(s"__min_$c"),
            lit(null).cast("double").as(s"__max_$c"))
        Seq(count(col(c)).as(s"__nn_$c"),
          (if (approxDistinct) approx_count_distinct(col(c))
           else count_distinct(col(c))).as(s"__nd_$c")) ++ mm
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    val rows = all.map { case (c, _) =>
      struct(lit(c).as("col"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.col").as("col"), col("r.n_rows").as("n_rows"),
        col("r.n_nonnull").as("n_nonnull"), col("r.n_distinct").as("n_distinct"),
        col("r.min_val").as("min_val"), col("r.max_val").as("max_val"))
      .orderBy("col")
  }

  /** One named data-quality check: a 1-row `(chk, violations)` frame.
    * Build with the constructors below, run with [[report]]. */
  final case class Check(name: String, violations: DataFrame)

  private def count1(name: String, df: DataFrame): Check =
    Check(name, df.agg(count(lit(1)).as("violations"))
      .select(lit(name).as("chk"), col("violations")))

  /** Rows where `c` is NULL. */
  def notNull(name: String, df: DataFrame, c: String): Check =
    count1(name, df.where(col(c).isNull))

  /** Extra rows beyond one per key tuple (0 = the key is unique). */
  def unique(name: String, df: DataFrame, keys: Seq[String]): Check =
    Check(name, df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0)).cast("long").as("violations"))
      .select(lit(name).as("chk"), col("violations")))

  /** Rows that FAIL `pred` (NULL evaluations count as failures only if
    * the negation is true — SQL three-valued logic, same as the WHERE a
    * hand-written violation count would use). */
  def satisfies(name: String, df: DataFrame, pred: Column): Check =
    count1(name, df.where(!pred))

  /** Rows whose `c` is outside the allowed value set. */
  def inSet(name: String, df: DataFrame, c: String, values: Seq[Any]): Check =
    count1(name, df.where(!col(c).isin(values: _*)))

  /** Child rows with no matching parent (referential-integrity orphans) —
    * one anti join, AQE/broadcast-eligible like any semi-family join. */
  def fkExists(name: String, child: DataFrame, childKey: String,
               parent: DataFrame, parentKey: String): Check =
    count1(name, child.join(parent.select(col(parentKey).as("__pk")),
      col(childKey) === col("__pk"), "left_anti"))

  /** Run checks into one `(chk, violations, ok)` report, ordered by name.
    * Each check is an independent aggregate; Spark runs them as one job
    * per branch under a shared scan when the frames align. */
  def report(checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    checks.map(_.violations).reduce(_ unionAll _)
      .select(col("chk"), col("violations"),
        (col("violations") === 0).as("ok"))
      .orderBy("chk")
  }

  /** Hot-key diagnostics for join/shuffle planning: the top-`k` values of
    * `keyCol` with count, rank, share of rows, and ratio-to-uniform
    * (`skew` = cnt·n_keys/total; 1.0 = perfectly even). Keys are
    * zero-padded to `pad` digits so the heap's string tie-break is numeric.
    *
    * The ranking is `graft_topk_by` — a bounded-heap aggregate shipping
    * ≤ k candidates per map partition — so no global sort of the key
    * counts happens even when distinct keys number in the billions; the
    * count frame aggregates once and feeds both the heap and the 1-row
    * totals broadcast. */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 5, pad: Int = 6): DataFrame = {
    // lpad TRUNCATES strings longer than `pad` — padding must be
    // conditional or distinct long keys silently merge into one bogus
    // hot key. Keys at or beyond `pad` digits pass through unpadded;
    // tie-break order is then plain LEXICOGRAPHIC across the boundary
    // ("1000000" sorts before padded "999999") — deterministic and
    // engine-consistent, numeric only within the padded range. Size
    // `pad` above the key width when numeric tie order matters.
    val k0 = col(keyCol).cast("string")
    val counts = df.groupBy(
        when(length(k0) >= pad, k0).otherwise(lpad(k0, pad, "0")).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").cast("long").as("total"),
      count(lit(1)).as("nkeys"))
    counts
      .agg(call_function("graft_topk_by",
        col("cnt").cast("double"), col("key"), lit(k)).as("arr"))
      .select(posexplode(col("arr")))
      .select(col("col.item").as("key"), col("col.ord").cast("long").as("cnt"),
        (col("pos") + 1).cast("int").as("rnk"))
      .crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"), col("rnk"),
        round(col("cnt") * 1.0 / col("total"), 4).as("share"),
        round(col("cnt") * 1.0 * col("nkeys") / col("total"), 4).as("skew"))
      .orderBy("rnk")
  }
}

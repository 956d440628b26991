package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The opt-in global-window rule: `agg() OVER ()` loses its Window node
  * (and the single-partition Exchange) and hash-matches the unrewritten
  * results; running frames, ranking functions and partitioned windows are
  * left untouched. */
class GlobalWindowRewriteSpec extends SparkSpec {

  private val Key = "spark.graft.rewrite.globalWindow"

  private def attachRule(): Unit =
    if (!spark.experimental.extraOptimizations.contains(GlobalWindowRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GlobalWindowRewrite

  private def df: DataFrame = {
    val sq = spark; import sq.implicits._
    Seq.tabulate(10000)(i => (i % 7, i.toDouble, i.toLong)).toDF("g", "v", "id")
  }

  private def hasWindow(q: DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  test("ratio-to-total rewrites: no Window node, identical rows") {
    attachRule()
    def q = df.select(col("id"), col("g"),
      (col("v") / sum("v").over(Window.partitionBy())).as("ratio"),
      count(lit(1)).over(Window.partitionBy()).as("n"),
      max("v").over(Window.partitionBy()).as("mx"))
    val exact = q.collect().map(_.toString).sorted
    try {
      spark.conf.set(Key, "true")
      val r = q
      assert(!hasWindow(r), s"Window survived:\n${r.queryExecution.optimizedPlan}")
      // the only single-partition exchange left feeds the FINAL aggregate
      // with map-side partial rows (metadata-scale, one row per task) —
      // the data-scale sort-everything-on-one-task WindowExec is gone
      val phys = r.queryExecution.executedPlan.toString
      assert(!phys.contains("WindowExec") && !phys.contains("Window ("),
        s"physical window survived:\n$phys")
      assert(phys.contains("partial_sum"),
        s"map-side partial aggregation missing:\n$phys")
      assert(r.collect().map(_.toString).sorted.sameElements(exact))
      assert(r.schema.fieldNames.toSeq == Seq("id", "g", "ratio", "n", "mx"))
    } finally spark.conf.unset(Key)
  }

  test("SQL over () shape rewrites too") {
    attachRule()
    df.createOrReplaceTempView("gw_t")
    def q = spark.sql(
      "SELECT id, v / sum(v) OVER () AS ratio FROM gw_t")
    val exact = q.collect().map(_.toString).sorted
    try {
      spark.conf.set(Key, "true")
      assert(!hasWindow(q))
      assert(q.collect().map(_.toString).sorted.sameElements(exact))
    } finally spark.conf.unset(Key)
  }

  test("running frames, ranking functions, partitioned windows untouched") {
    attachRule()
    try {
      spark.conf.set(Key, "true")
      // default frame under ORDER BY is a RUNNING sum — order-sensitive
      val running = df.select(col("id"),
        sum("v").over(Window.orderBy("id")).as("cum"))
      assert(hasWindow(running), "running frame was wrongly rewritten")
      // ranking function: not an aggregate
      val rk = df.select(col("id"),
        row_number().over(Window.orderBy("id")).as("rn"))
      assert(hasWindow(rk), "row_number was wrongly rewritten")
      // partitioned window: already scales
      val part = df.select(col("id"),
        sum("v").over(Window.partitionBy("g")).as("s"))
      assert(hasWindow(part), "partitioned window was wrongly rewritten")
      // a node mixing a rewritable and a non-rewritable spec keeps both
      val mixed = df.select(col("id"),
        sum("v").over(Window.partitionBy()).as("tot"),
        sum("v").over(Window.orderBy("id")).as("cum"))
      assert(mixed.collect().length == 10000)
    } finally spark.conf.unset(Key)
  }

  test("empty input still yields zero rows") {
    attachRule()
    try {
      spark.conf.set(Key, "true")
      val q = df.where(col("id") < 0).select(col("id"),
        sum("v").over(Window.partitionBy()).as("tot"))
      assert(!hasWindow(q))
      assert(q.collect().isEmpty)
    } finally spark.conf.unset(Key)
  }

  test("conf off: plan unchanged") {
    attachRule()
    val q = df.select(col("id"), sum("v").over(Window.partitionBy()).as("tot"))
    assert(hasWindow(q))
  }
}

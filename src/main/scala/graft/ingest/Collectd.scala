package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** collectd `write_http` JSON decode — the reference's collectd listener
  * (SURVEY.md §2a row 6, `protocol/collectd/listener.go` [P]) parses POST
  * bodies like
  * {{{
  * [{"values":[0.2,0.1],"dstypes":["gauge","derive"],"dsnames":["shortterm","longterm"],
  *   "time":1434477504.48,"interval":10.0,"host":"web1","plugin":"load",
  *   "plugin_instance":"","type":"load","type_instance":""}]
  * }}}
  * into one datapoint per (record, values[i]), deriving the metric name from
  * plugin/type/dsname segments and dimensions from host/instances.
  *
  * The HTTP surface is out of scope (SURVEY §7); this operator is the
  * decode itself as a narrow, codegen-friendly transform over a `body`
  * string column — compose it with any batch/streaming JSON source.
  */
object Collectd {

  /** One write_http record (fixed schema, like the reference's typed
    * JSONWriteBody decode [P]). */
  val recordSchema: StructType = StructType(Seq(
    StructField("values", ArrayType(DoubleType)),
    StructField("dstypes", ArrayType(StringType)),
    StructField("dsnames", ArrayType(StringType)),
    StructField("time", DoubleType),
    StructField("interval", DoubleType),
    StructField("host", StringType),
    StructField("plugin", StringType),
    StructField("plugin_instance", StringType),
    StructField("type", StringType),
    StructField("type_instance", StringType)))

  val bodySchema: ArrayType = ArrayType(recordSchema)

  /** collectd dstype → reference MetricType (collectd.go [P]: gauge is a
    * point-in-time value; derive/counter accumulate). */
  private def metricType(dstype: Column): Column =
    when(dstype === "gauge", "GAUGE")
      .when(dstype.isin("derive", "counter"), "CUMULATIVE_COUNTER")
      .when(dstype === "absolute", "COUNT")
      .otherwise("GAUGE")

  /** Dotted metric name: plugin[.plugin_instance].type[.type_instance][.dsname]
    * (dsname omitted when it is the collectd default "value"). */
  private def metricName(r: Column, dsname: Column): Column = {
    val seg = (c: Column) => when(c.isNull || c === "", null).otherwise(c)
    concat_ws(".",
      seg(r.getField("plugin")), seg(r.getField("plugin_instance")),
      seg(r.getField("type")), seg(r.getField("type_instance")),
      seg(when(dsname === "value", null).otherwise(dsname)))
  }

  /** Decode a `body` JSON-string column into datapoints:
    * (metric, dimensions map, value, metricType, ts). One output row per
    * value in each record (multi-value types like load emit several). */
  def decode(bodies: DataFrame, bodyCol: String = "body"): DataFrame = {
    val rec = explode(from_json(col(bodyCol), bodySchema)).as("r")
    val r = col("r")
    bodies.select(rec)
      .select(r, posexplode(r.getField("values")).as(Seq("i", "value")))
      .select(
        metricName(r, element_at(r.getField("dsnames"), col("i") + 1)).as("metric"),
        map_filter(
          map(
            lit("host"), r.getField("host"),
            lit("plugin"), r.getField("plugin"),
            lit("plugin_instance"), r.getField("plugin_instance"),
            lit("type_instance"), r.getField("type_instance")),
          (_, v) => v.isNotNull && v =!= "").as("dimensions"),
        col("value"),
        metricType(element_at(r.getField("dstypes"), col("i") + 1)).as("metricType"),
        timestamp_seconds(r.getField("time")).as("ts"))
  }
}

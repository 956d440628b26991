package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SignalFx `/v2/datapoint` JSON decode — the reference's signalfx listener
  * (SURVEY.md §2a row 7, `protocol/signalfx/signalfxlistener.go` [P])
  * accepts bodies keyed by metric type:
  * {{{
  * {"gauge":[{"metric":"m","value":1.5,"dimensions":{"host":"a"},"timestamp":1694000000000}],
  *  "counter":[...], "cumulative_counter":[...]}
  * }}}
  * (timestamps are millisecond-epoch on the wire [P] —
  * com_signalfx_metrics_protobuf uses int64 ms). The protobuf variant of
  * the same endpoint is [[SignalFxProto.decode]] (hand-rolled wire codec;
  * `from_protobuf` would need a compiled descriptor set this environment
  * cannot produce).
  *
  * Decode is a narrow transform over a `body` string column; the three
  * type arrays are exploded and unioned with their MetricType tag.
  */
object SignalFxJson {

  private val dpSchema = ArrayType(StructType(Seq(
    StructField("metric", StringType),
    StructField("value", DoubleType),
    StructField("dimensions", MapType(StringType, StringType)),
    StructField("timestamp", LongType)))) // epoch millis

  val bodySchema: StructType = StructType(Seq(
    StructField("gauge", dpSchema),
    StructField("counter", dpSchema),
    StructField("cumulative_counter", dpSchema)))

  private val eventSchema = ArrayType(StructType(Seq(
    StructField("eventType", StringType),
    StructField("category", StringType),
    StructField("dimensions", MapType(StringType, StringType)),
    StructField("properties", MapType(StringType, StringType)),
    StructField("timestamp", LongType)))) // epoch millis

  /** Decode a `/v2/event` JSON-string column (an ARRAY body of event
    * objects [P]) into events: (eventType, category, dimensions,
    * properties, ts). Same narrow single-parse shape as [[decode]]. */
  def decodeEvents(bodies: DataFrame, bodyCol: String = "body"): DataFrame =
    bodies.select(explode(from_json(col(bodyCol), eventSchema)).as("e"))
      .select(
        col("e.eventType").as("eventType"),
        coalesce(col("e.category"), lit("USER_DEFINED")).as("category"),
        coalesce(col("e.dimensions"), map().cast("map<string,string>")).as("dimensions"),
        coalesce(col("e.properties"), map().cast("map<string,string>")).as("properties"),
        timestamp_millis(col("e.timestamp")).as("ts"))

  /** Decode a `/v2/datapoint` JSON-string column into datapoints:
    * (metric, dimensions, value, metricType, ts).
    *
    * Single-parse: one from_json per body, the three metric-type arms
    * tagged and concatenated as arrays inside one projection, then one
    * explode. A union of three branches would re-run from_json per arm —
    * 3× the dominant per-row cost on the ingest hot path. */
  def decode(bodies: DataFrame, bodyCol: String = "body"): DataFrame = {
    import org.apache.spark.sql.Column
    val parsed = bodies.select(from_json(col(bodyCol), bodySchema).as("b"))
    def arm(field: String, mtype: String): Column =
      transform(coalesce(col("b").getField(field), array().cast(dpSchema)),
        d => struct(
          d.getField("metric").as("metric"),
          coalesce(d.getField("dimensions"),
            map().cast("map<string,string>")).as("dimensions"),
          d.getField("value").as("value"),
          lit(mtype).as("metricType"),
          d.getField("timestamp").as("timestamp")))
    parsed
      .select(explode(concat(
        arm("gauge", "GAUGE"),
        arm("counter", "COUNT"),
        arm("cumulative_counter", "CUMULATIVE_COUNTER"))).as("d"))
      .select(
        col("d.metric").as("metric"),
        col("d.dimensions").as("dimensions"),
        col("d.value").as("value"),
        col("d.metricType").as("metricType"),
        timestamp_millis(col("d.timestamp")).as("ts"))
  }
}

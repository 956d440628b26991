package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Carbon/graphite line codec and metric deconstruction.
  *
  * The reference accepts `metric value timestamp\n` plaintext lines and can
  * deconstruct dotted metric names into dimensions via pluggable
  * deconstructors (identity / commakeys `name[k1=v1,k2=v2]` / positional
  * delimiter templates) — see SURVEY.md §2a rows 1–5
  * (`protocol/carbon/carbonlistener.go`, `protocol/carbon/carbon.go`,
  * `protocol/carbon/metricdeconstructor/` [P]).
  *
  * Here both codec directions are pure column expressions (codegen'd, narrow,
  * no shuffle) so they compose with any batch or streaming source.
  */
object Carbon {

  /** The engine's datapoint record (reference: golib/datapoint [P]). */
  final case class Datapoint(metric: String, dimensions: Map[String, String],
                             value: Double, metricType: String,
                             ts: java.sql.Timestamp)

  /** Serialize (metric, value, ts-seconds) columns into a graphite line. */
  def toLine(metric: Column, value: Column, epochSec: Column): Column =
    concat_ws(" ", metric, value.cast("string"), epochSec.cast("long").cast("string"))

  /** Parse a graphite line column into (metric, value, epoch). Malformed
    * lines yield nulls (filter with `.where(col("value").isNotNull)`). */
  def parseLines(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val parts = split(col(lineCol), " ")
    lines.select(
      try_element_at(parts, lit(1)).as("metric"),
      try_element_at(parts, lit(2)).try_cast("double").as("value"),
      try_element_at(parts, lit(3)).try_cast("long").as("epoch"))
  }

  /** Pluggable metric-name deconstruction: produces (base, dims map). */
  sealed trait MetricDeconstructor {
    /** Metric name with any dimension syntax stripped. */
    def base(metric: Column): Column
    /** Extracted dimensions as a map<string,string> column. */
    def dimensions(metric: Column): Column
  }

  /** Leaves the name as-is; no dimensions (identitymetricdeconstructor [P]). */
  case object IdentityDeconstructor extends MetricDeconstructor {
    def base(metric: Column): Column = metric
    def dimensions(metric: Column): Column = map().cast("map<string,string>")
  }

  /** Parses `name[k1=v1,k2=v2]` (commakeysmetricdeconstructor [P]). */
  case object CommaKeysDeconstructor extends MetricDeconstructor {
    def base(metric: Column): Column =
      regexp_extract(metric, "^([^\\[]+)", 1)
    def dimensions(metric: Column): Column = {
      val inner = regexp_extract(metric, "\\[(.*)\\]$", 1)
      when(inner === "", map())
        .otherwise(str_to_map(inner, lit(","), lit("=")))
    }
  }

  /** Maps dotted segments to named dimensions positionally, e.g. template
    * Seq("svc", "endpoint", "stat"): `api.latency.p99` →
    * {svc→api, endpoint→latency, stat→p99}
    * (delimitermetricdeconstructor [P]). Segments beyond the template are
    * ignored; missing segments are absent from the map. */
  final case class DelimiterDeconstructor(template: Seq[String], sep: String = "\\.")
      extends MetricDeconstructor {
    def base(metric: Column): Column = metric
    def dimensions(metric: Column): Column = {
      val parts = split(metric, sep)
      val entries = template.zipWithIndex.flatMap { case (name, i) =>
        Seq(lit(name), try_element_at(parts, lit(i + 1)))
      }
      map_filter(map(entries: _*), (_, v) => v.isNotNull)
    }
  }

  /** Full ingest parse: lines → datapoints with deconstructed dimensions. */
  def ingest(lines: DataFrame, deconstructor: MetricDeconstructor,
             lineCol: String = "line"): DataFrame = {
    val parsed = parseLines(lines, lineCol)
    parsed.select(
      deconstructor.base(col("metric")).as("metric"),
      deconstructor.dimensions(col("metric")).as("dimensions"),
      col("value"),
      lit("GAUGE").as("metricType"),
      timestamp_seconds(col("epoch")).as("ts"))
  }

  /** Typed ingest (SURVEY.md §1b): the same parse surfaced as
    * `Dataset[Datapoint]` — compile-time schema for callers that transform
    * datapoints with typed lambdas; malformed lines are dropped (the
    * untyped [[ingest]] leaves them as nulls for the caller). */
  def ingestTyped(lines: DataFrame, deconstructor: MetricDeconstructor,
                  lineCol: String = "line"): Dataset[Datapoint] = {
    val session = lines.sparkSession
    import session.implicits._
    ingest(lines, deconstructor, lineCol)
      .where(col("value").isNotNull && col("ts").isNotNull && col("metric").isNotNull)
      .as[Datapoint]
  }
}

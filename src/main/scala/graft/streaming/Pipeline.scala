package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.ingest.Carbon
import graft.ingest.Carbon.MetricDeconstructor

/** Config-driven pipeline assembly — the reference wires listeners to
  * forwarders from a JSON config at boot (`config/config.go`, `main.go`,
  * `exampleSfdbproxy.conf` [P]). Here the config is typed case classes and
  * assembly returns a started-ready `DataStreamWriter`.
  */
object Pipeline {

  /** One listener (reference ListenFrom[]): where lines come from. */
  final case class ListenFrom(kind: String, // "file" | "socket" | "rate"
                              path: String = "", host: String = "localhost",
                              port: Int = 2003,
                              deconstructor: MetricDeconstructor = Carbon.IdentityDeconstructor)

  /** One forwarder target (reference ForwardTo[]). */
  final case class ForwardTo(kind: String, // "csv" | "carbon"
                             name: String, dir: String)

  /** Engine pipeline config (reference config.go [P]). */
  final case class GraftConfig(listenFrom: ListenFrom, forwardTo: Seq[ForwardTo],
                               triggerMillis: Long = 1000)

  /** Build the line source stream for a listener. */
  def source(spark: SparkSession, lf: ListenFrom): DataFrame = lf.kind match {
    case "file" =>
      spark.readStream.text(lf.path).withColumnRenamed("value", "line")
    case "socket" =>
      spark.readStream.format("socket")
        .option("host", lf.host).option("port", lf.port).load()
        .withColumnRenamed("value", "line")
    case other => throw new IllegalArgumentException(s"unknown listener kind '$other'")
  }

  private def forwarder(ft: ForwardTo): StreamingOps.Forwarder = ft.kind match {
    case "csv"    => StreamingOps.CsvForwarder(ft.name, ft.dir)
    case "carbon" => StreamingOps.CarbonForwarder(ft.name, ft.dir)
    case other    => throw new IllegalArgumentException(s"unknown forwarder kind '$other'")
  }

  /** Assemble listener → parse/deconstruct → demux(forwarders). Caller
    * `.start()`s (and names/checkpoints) the returned writer. */
  def assemble(spark: SparkSession, cfg: GraftConfig): DataStreamWriter[Row] = {
    import org.apache.spark.sql.functions.col
    val lines = source(spark, cfg.listenFrom)
    // bad lines are dropped at the listener, as the reference does
    // (carbonlistener.go logs-and-skips unparseable lines [P])
    val points = Carbon.ingest(lines, cfg.listenFrom.deconstructor)
      .where(col("value").isNotNull && col("ts").isNotNull)
      .withColumn("epoch", col("ts").cast("long"))
    StreamingOps.demux(points, cfg.forwardTo.map(forwarder),
      Trigger.ProcessingTime(cfg.triggerMillis))
  }
}

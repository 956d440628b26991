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

  /** One listener (reference ListenFrom[]): where input comes from and how
    * it decodes. codec "carbon" parses graphite lines (with the pluggable
    * deconstructor); "collectd" / "signalfx" parse the respective JSON
    * bodies, one per input line; "sfxproto" decodes binary
    * `DataPointUploadMessage` payloads (kind = "binary") — §2a rows 6–7b.
    * kind "partitioned" is the Kafka-shaped replay source (see
    * [[source]]). */
  final case class ListenFrom(kind: String, // "file" | "socket" | "binary" | "partitioned" | "kafka" | "http"
                              path: String = "", host: String = "localhost",
                              port: Int = 2003,
                              codec: String = "carbon",
                              deconstructor: MetricDeconstructor = Carbon.IdentityDeconstructor,
                              // bounded per-batch drain (BufferedForwarder's
                              // maxDrainSize analog [P]): cap files ingested
                              // per micro-batch so one listener backlog
                              // cannot monopolize a trigger
                              maxFilesPerTrigger: Option[Int] = None)

  /** One forwarder target (reference ForwardTo[]). */
  final case class ForwardTo(kind: String, // "csv" | "carbon" | "sfxproto"
                             name: String, dir: String)

  /** Engine pipeline config (reference config.go [P]). stateStore
    * "rocksdb" backs streaming state (windows, dedup, counterToRate) with
    * the RocksDB provider — at 100 TB/day state no longer fits the
    * default in-memory HDFS-backed store; RocksDB spills to local disk
    * with incremental checkpointing. */
  final case class GraftConfig(listenFrom: ListenFrom, forwardTo: Seq[ForwardTo],
                               triggerMillis: Long = 1000,
                               stateStore: String = "memory")

  /** Parse a JSON pipeline config — the reference boots from a JSON file
    * (`exampleSfdbproxy.conf` [P]) with ListenFrom[]/ForwardTo[] blocks;
    * ours mirrors that shape:
    * {{{
    * {"listenFrom": {"kind":"file", "path":"/in", "codec":"carbon",
    *                 "deconstructor":"delimiter", "template":["ns","ep","stat"]},
    *  "forwardTo": [{"kind":"csv", "name":"debug", "dir":"/out/csv"}],
    *  "triggerMillis": 1000}
    * }}} */
  def fromJson(json: String): GraftConfig = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val lf = j \ "listenFrom"
    val decon = (lf \ "deconstructor").extractOpt[String].getOrElse("identity") match {
      case "identity"  => Carbon.IdentityDeconstructor
      case "commakeys" => Carbon.CommaKeysDeconstructor
      case "delimiter" =>
        Carbon.DelimiterDeconstructor((lf \ "template").extract[Seq[String]])
      case other => throw new IllegalArgumentException(s"unknown deconstructor '$other'")
    }
    GraftConfig(
      listenFrom = ListenFrom(
        kind = (lf \ "kind").extract[String],
        path = (lf \ "path").extractOpt[String].getOrElse(""),
        host = (lf \ "host").extractOpt[String].getOrElse("localhost"),
        port = (lf \ "port").extractOpt[Int].getOrElse(2003),
        codec = (lf \ "codec").extractOpt[String].getOrElse("carbon"),
        deconstructor = decon,
        maxFilesPerTrigger = (lf \ "maxFilesPerTrigger").extractOpt[Int]),
      forwardTo = (j \ "forwardTo").extract[Seq[JValue]].map { ft =>
        ForwardTo((ft \ "kind").extract[String], (ft \ "name").extract[String],
          (ft \ "dir").extract[String])
      },
      triggerMillis = (j \ "triggerMillis").extractOpt[Long].getOrElse(1000L),
      stateStore = (j \ "stateStore").extractOpt[String].getOrElse("memory"))
  }

  /** Apply the configured state-store backend to the session (must happen
    * before the query starts; the provider is read at query planning). */
  def applyStateStore(spark: SparkSession, cfg: GraftConfig): Unit = cfg.stateStore match {
    case "rocksdb" => spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    case "memory" => () // default HDFSBackedStateStoreProvider
    case other => throw new IllegalArgumentException(s"unknown stateStore '$other'")
  }

  /** Build the source stream for a listener: text lines for the line
    * codecs, whole binary files (column `payload`) for "binary" —
    * the protobuf POST-body stand-in. */
  def source(spark: SparkSession, lf: ListenFrom): DataFrame = lf.kind match {
    case "file" =>
      val r = spark.readStream
      lf.maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
      r.text(lf.path).withColumnRenamed("value", "line")
    case "binary" =>
      // binaryFile's schema is fixed, but streaming sources require it
      // stated explicitly
      import org.apache.spark.sql.types._
      val r = spark.readStream.format("binaryFile")
        .schema(StructType(Seq(
          StructField("path", StringType), StructField("modificationTime", TimestampType),
          StructField("length", LongType), StructField("content", BinaryType))))
      lf.maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
      r.load(lf.path)
        .select(org.apache.spark.sql.functions.col("content").as("payload"))
    case "socket" =>
      spark.readStream.format("socket")
        .option("host", lf.host).option("port", lf.port).load()
        .withColumnRenamed("value", "line")
    case "partitioned" =>
      // Kafka-shaped partitioned replay (SURVEY §1b's "Kafka source
      // (prod)" without a broker): the topic is a directory of
      // `partition=P` groups whose files are named `offset=<zero-padded>`
      // (a file is the fetch unit, like a Kafka record batch). Files
      // drain oldest-first, bounded by maxFilesPerTrigger — so a replay
      // produced in offset order is consumed in per-partition offset
      // order, N partition groups draining in parallel. Each row carries
      // (src_partition, src_offset) metadata, the authoritative order.
      // The production swap-in is `format("kafka")` with the same
      // downstream decode.
      import org.apache.spark.sql.functions._
      val r = spark.readStream
      lf.maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
      r.text(lf.path.stripSuffix("/") + "/partition=*")
        .select(col("value").as("line"), input_file_name().as("__f"))
        .withColumn("src_partition",
          regexp_extract(col("__f"), "partition=(\\d+)", 1).cast("int"))
        .withColumn("src_offset",
          regexp_extract(col("__f"), "offset=(\\d+)", 1).cast("long"))
        .drop("__f")
    case "kafka" =>
      // PRODUCTION mapping onto the spark-sql-kafka-0-10 connector — the
      // `partitioned` replay source above mimics exactly this contract
      // broker-free, so the two kinds are drop-in swaps:
      //   path "host1:9092,host2:9092/topic" → kafka.bootstrap.servers +
      //     subscribe;
      //   maxFilesPerTrigger (BufferedForwarder's bounded drain [P]) →
      //     maxOffsetsPerTrigger (records, the Kafka fetch unit);
      //   (line, src_partition, src_offset) ← (CAST(value AS STRING),
      //     partition, offset) — the same authoritative-order metadata.
      // This sandbox ships no connector jar and no broker, so load()
      // fails; the error says exactly what to add.
      import org.apache.spark.sql.functions._
      val sep = lf.path.lastIndexOf('/')
      require(sep > 0 && sep < lf.path.length - 1,
        s"kafka listener path must be '<bootstrap-servers>/<topic>', got '${lf.path}'")
      val (servers, topic) = (lf.path.substring(0, sep), lf.path.substring(sep + 1))
      val r = spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
      lf.maxFilesPerTrigger.foreach(n => r.option("maxOffsetsPerTrigger", n.toLong))
      // only a MISSING data source gets the "add the connector" message —
      // with the connector present, genuine load() errors (bad option,
      // version conflict) must surface as themselves
      def missingSource(e: Throwable): Boolean = e != null && (
        e.isInstanceOf[ClassNotFoundException] ||
          (e.getMessage != null && (e.getMessage.contains("Failed to find data source") ||
            e.getMessage.contains("DATA_SOURCE_NOT_FOUND"))) ||
          missingSource(e.getCause))
      val raw =
        try r.load()
        catch {
          case e: Exception if missingSource(e) =>
            throw new IllegalStateException(
              "listener kind 'kafka' requires the spark-sql-kafka-0-10 connector on the " +
                "classpath (this sandbox has no connector jar and no broker). The option " +
                "mapping above is complete; use kind 'partitioned' as the broker-free " +
                "stand-in — it exposes the identical (line, src_partition, src_offset) " +
                "contract.", e)
        }
      raw.select(col("value").cast("string").as("line"),
        col("partition").as("src_partition"), col("offset").as("src_offset"))
    case "http" =>
      // the reference's listeners are HTTP POST endpoints [P,
      // protocol/signalfx/signalfxlistener.go] — HttpIngest accepts the
      // POSTs (gzip-aware) and spools each body as an immutable file in
      // lf.path, which the file/binary sources then stream exactly like
      // any other arrival. Line codecs expect newline-delimited bodies
      // (one JSON body or carbon line per line); "sfxproto" takes the
      // whole body as one binary payload. The bridge is idempotent per
      // port (source() may be invoked more than once while planning).
      graft.ingest.HttpIngest.ensure(lf.host, lf.port, lf.path)
      if (lf.codec == "sfxproto") source(spark, lf.copy(kind = "binary"))
      else source(spark, lf.copy(kind = "file"))
    case other => throw new IllegalArgumentException(s"unknown listener kind '$other'")
  }

  private def forwarder(ft: ForwardTo): StreamingOps.Forwarder = ft.kind match {
    case "csv"      => StreamingOps.CsvForwarder(ft.name, ft.dir)
    case "carbon"   => StreamingOps.CarbonForwarder(ft.name, ft.dir)
    case "sfxproto" => StreamingOps.SignalFxProtoForwarder(ft.name, ft.dir)
    case other      => throw new IllegalArgumentException(s"unknown forwarder kind '$other'")
  }

  /** Decode listener lines to datapoints per the configured codec. Bad
    * input is dropped at the listener, as the reference does
    * (carbonlistener.go logs-and-skips unparseable lines [P]). */
  def decode(lines: DataFrame, lf: ListenFrom): DataFrame = {
    import org.apache.spark.sql.functions.col
    val points = lf.codec match {
      case "carbon" => Carbon.ingest(lines, lf.deconstructor)
      case "collectd" =>
        graft.ingest.Collectd.decode(lines.withColumnRenamed("line", "body"))
      case "signalfx" =>
        graft.ingest.SignalFxJson.decode(lines.withColumnRenamed("line", "body"))
      case "sfxproto" =>
        // binary upload payloads (ListenFrom kind = "binary"); normalize to
        // the same datapoint shape as the signalfx JSON arm. Lenient: a
        // truncated/corrupt payload is dropped (MalformedPayloadException),
        // not allowed to fail the micro-batch — same contract as the line
        // codecs' log-and-skip
        graft.ingest.SignalFxProto.decodeLenient(lines).toDF()
          .select(col("metric"), col("dimensions"),
            org.apache.spark.sql.functions.coalesce(
              col("doubleValue"), col("intValue").cast("double")).as("value"),
            col("metricType"),
            org.apache.spark.sql.functions.timestamp_millis(col("timestamp")).as("ts"))
      case other => throw new IllegalArgumentException(s"unknown codec '$other'")
    }
    points
      .where(col("value").isNotNull && col("ts").isNotNull)
      .withColumn("epoch", col("ts").cast("long"))
  }

  /** Assemble listener → decode/deconstruct → demux(forwarders). Caller
    * `.start()`s (and names/checkpoints) the returned writer. */
  def assemble(spark: SparkSession, cfg: GraftConfig): DataStreamWriter[Row] = {
    applyStateStore(spark, cfg)
    val points = decode(source(spark, cfg.listenFrom), cfg.listenFrom)
    StreamingOps.demux(points, cfg.forwardTo.map(forwarder),
      Trigger.ProcessingTime(cfg.triggerMillis))
  }
}

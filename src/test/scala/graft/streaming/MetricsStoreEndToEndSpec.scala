package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ingest.Carbon
import graft.storage.{SnapshotSink, SnapshotTable}

/** The complete metrics store the north star describes, in one test:
  *
  *   HTTP POST (carbon lines) → ingest bridge (atomic spool) →
  *   Structured Streaming file listener → carbon parse →
  *   per-(metric, minute) rollup → exactly-once SnapshotSink →
  *   ACID snapshot table → time-travel-able reads.
  *
  * Every hop is a production component from this engine — nothing is
  * mocked. The final assertions check the STORE's content against the
  * analytically known input, that a second POST lands as a NEW table
  * version (the append path), and that version 1 still shows the
  * pre-second-batch state.
  */
class MetricsStoreEndToEndSpec extends SparkSpec {

  private def post(port: Int, body: String): Int =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(new URI(s"http://localhost:$port/ingest"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()

  test("HTTP carbon ingest → rollup → ACID snapshot store, end to end") {
    val root = Files.createTempDirectory("metricstore").toString
    val store = s"$root/store"
    val bridge = graft.ingest.HttpIngest.ensure("localhost", 0, s"$root/spool")
    try {
      // batch 1: two metrics, two minutes, values with known sums
      val b1 = (1 to 60).map { i =>
        val m = if (i % 2 == 0) "svc.api.latency" else "svc.web.latency"
        s"$m ${i.toDouble} ${59 + i}" // ts 60..119 — all inside minute 60
      }.mkString("", "\n", "\n")
      assert(post(bridge.port, b1) === 200)

      val lines = Pipeline.source(spark,
        Pipeline.ListenFrom("file", path = s"$root/spool"))
      val rollup = Carbon.parseLines(lines)
        .where(col("value").isNotNull)
        .withColumn("minute", (floor(col("epoch").cast("double") / 60) * 60).cast("long"))
        .groupBy(col("metric"), col("minute"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"), max("value").as("mx"))
        .select(col("metric"), col("minute"), col("n"), col("sv"), col("mx"))
      val q = rollup.writeStream
        .outputMode("complete")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          // complete-mode rollup: each batch is the WHOLE current rollup,
          // so the store commit is a keyed merge (last write wins per
          // (metric, minute)); versionCol = the batch id itself
          SnapshotSink.commitBatch(df.sparkSession, store, id,
            df.withColumn("bid", lit(id)), Seq("metric", "minute"), "bid")
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        val v1 = SnapshotTable.read(spark, store)
        // 30 even i → api, 30 odd → web, all in minute 60
        assert(v1.count() === 2)
        val api = v1.where(col("metric") === "svc.api.latency").head
        assert(api.getAs[Long]("n") === 30)
        assert(api.getAs[Double]("sv") === (2 to 60 by 2).sum.toDouble)
        val storeV1 = SnapshotTable.versions(spark, store).max

        // batch 2: late traffic for a NEW minute bucket
        val b2 = (1 to 10).map(i => s"svc.api.latency ${100.0 + i} ${120 + i}")
          .mkString("", "\n", "\n")
        assert(post(bridge.port, b2) === 200)
        q.processAllAvailable()

        val now = SnapshotTable.read(spark, store)
        assert(now.count() === 3) // the new (api, minute=120) bucket appeared
        val m2 = now.where(col("minute") === 120).head
        assert(m2.getAs[Long]("n") === 10)
        assert(m2.getAs[Double]("mx") === 110.0)
        // the store is versioned: the pre-batch-2 state still time-travels
        assert(SnapshotTable.versions(spark, store).max > storeV1)
        assert(SnapshotTable.readVersion(spark, store, storeV1).count() === 2)
      } finally q.stop()
    } finally bridge.stop()
  }
}

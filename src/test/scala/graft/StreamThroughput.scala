package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Streaming throughput probe (test scope): datapoints/second through the
  * full listener → carbon parse+deconstruct → demux → sink spine, driven
  * by the rate source. The reference is a datapoint proxy, so sustained
  * points/sec through the pipeline is ITS headline number — this measures
  * ours. Run: sbt "Test/runMain graft.StreamThroughput [rowsPerSec] [secs]" */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
    val rps = args.headOption.map(_.toInt).getOrElse(2000000)
    val secs = args.drop(1).headOption.map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // rate source → synthesized graphite lines (commakeys dims) → full parse
    val lines = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).option("numPartitions", 32).load()
      .select(concat(
        lit("svc.api.latency[host=web"), col("value") % 64,
        lit(",dc=iad] "), (col("value") % 1000).cast("string"),
        lit(" "), unix_timestamp(col("timestamp")).cast("string")).as("line"))
    val points = graft.ingest.Carbon.ingest(lines,
      graft.ingest.Carbon.CommaKeysDeconstructor)

    val total = new java.util.concurrent.atomic.AtomicLong()
    val dir = Files.createTempDirectory("graft_tp").toString
    val q = points.writeStream
      .trigger(Trigger.ProcessingTime("1 second"))
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        total.addAndGet(batch.count())
        ()
      }
      .start()
    val t0 = System.nanoTime()
    Thread.sleep(secs * 1000L)
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val n = total.get()
    println(f"[stream] parsed+deconstructed+demuxed $n points in $wall%.1fs = ${n / wall / 1e6}%.2fM points/sec (offered ${rps / 1e6}%.1fM/s)")
    spark.stop()
  }
}

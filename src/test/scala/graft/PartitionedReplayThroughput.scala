package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Pipeline

/** Throughput probe for the Kafka-shaped partitioned replay source:
  * generates an N-partition topic on disk, then drains it through the full
  * partitioned-source → carbon parse+deconstruct spine, reporting
  * points/second. The reference proxy's headline is sustained datapoints/s
  * across partitioned listeners — this measures ours with real file IO.
  * Run: sbt "Test/runMain graft.PartitionedReplayThroughput [totalPoints]" */
object PartitionedReplayThroughput {
  def main(args: Array[String]): Unit = {
    // default sized so stream startup (~3s of listing/planning) amortizes
    // and the number reflects the sustained drain rate
    val total = args.headOption.map(_.toLong).getOrElse(16000000L)
    val nParts = 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft_topic_tp").toString
    spark.range(total).select(
        concat(lit("svc.api.latency[host=web"), col("id") % 64,
          lit(",dc=iad] "), (col("id") % 1000).cast("string"),
          lit(" "), (lit(1700000000L) + col("id") % 100000).cast("string")).as("value"),
        (col("id") % nParts).cast("int").as("partition"))
      .repartition(32)
      .write.partitionBy("partition").mode("overwrite").text(root)

    val lf = Pipeline.ListenFrom("partitioned", path = root,
      deconstructor = graft.ingest.Carbon.CommaKeysDeconstructor)
    val counted = new java.util.concurrent.atomic.AtomicLong()
    val q = Pipeline.decode(Pipeline.source(spark, lf), lf).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root-ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        counted.addAndGet(batch.count())
        ()
      }.start()
    val t0 = System.nanoTime()
    q.processAllAvailable()
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val n = counted.get()
    println(f"[preplay] $nParts-partition replay: parsed+deconstructed $n points in $wall%.1fs = ${n / wall / 1e6}%.2fM points/sec")
    spark.stop()
  }
}

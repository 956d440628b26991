package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end smoke of the config-driven pipeline: file listener →
  * carbon parse + commakeys deconstruction → demux → csv + carbon sinks.
  * Run: sbt "Test/runMain graft.streaming.PipelineSmoke" */
object PipelineSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("graft_pipeline").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    // 200 good lines with commakeys dims + 3 malformed
    val lines = (1 to 200).map(i =>
      s"api.latency[host=web${i % 4},dc=iad] ${i * 0.25} ${1700000000L + i}") ++
      Seq("garbage", "short 1", "bad.value[x=y] notanumber 123")
    Files.write(Paths.get(s"$root/in/batch1.txt"),
      String.join("\n", lines: _*).getBytes)

    val cfg = Pipeline.GraftConfig(
      listenFrom = Pipeline.ListenFrom("file", path = s"$root/in",
        deconstructor = graft.ingest.Carbon.CommaKeysDeconstructor),
      forwardTo = Seq(
        Pipeline.ForwardTo("csv", "debug", s"$root/csv"),
        Pipeline.ForwardTo("carbon", "fwd", s"$root/carbon")))

    val q = Pipeline.assemble(spark, cfg)
      .option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    q.stop()

    val csv = spark.read.csv(s"$root/csv")
    val carbon = spark.read.text(s"$root/carbon")
    println(s"CSV_ROWS=${csv.count()}")
    csv.show(3, truncate = false)
    println(s"CARBON_LINES=${carbon.count()}")
    carbon.show(3, truncate = false)
    val parsedBack = graft.ingest.Carbon.parseLines(
      carbon.withColumnRenamed("value", "line"))
    println(s"CARBON_PARSEABLE=${parsedBack.where(col("value").isNotNull).count()}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the STREAM-TUMBLE watch item (BENCH ~1.45× the
  * BASELINE.md column since round 4): times the identical query under the
  * baseline's config (local[2], 4 shuffle partitions) and the Bench config
  * (local[32], 32) to separate plan cost from fixed per-task scheduling
  * overhead. Run: sbt "Test/runMain graft.TumbleProbe" */
object TumbleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for ((cpus, parts) <- Seq(("2", "4"), ("32", "32"))) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      graft.core.Tables.register(spark, dir)
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.dsl.Relational.impls("STREAM-TUMBLE")(spark).collect()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run() // warm
      val times = (1 to 5).map(_ => run())
      println(f"TUMBLE cpus=$cpus%-3s parts=$parts%-3s min=${times.min}%.3f med=${times.sorted.apply(2)}%.3f")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

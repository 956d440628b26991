package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-query timer (test scope): warm min-of-N wall seconds for the
  * named SparkEntry queries, same session shape as Bench. Not driver
  * contract. usage: Test/runMain graft.QueryTimer ID1,ID2[,...] [passes] */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val ids = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ids.foreach { id =>
      val fn = SparkEntry.queries(id)
      fn(spark, sfDir).collect() // warm-up
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qt] $id min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

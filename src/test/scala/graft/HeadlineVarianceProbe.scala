package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the r7-verdict headline-variance watch item: the
  * judge-measured 39-query headline drifted 10.87 s (r6) → 13.68 s (r7) on
  * the same box class with NO plan or code change in any headline query —
  * the r6 verdict read the same drift as box variance. This probe makes the
  * attribution concrete before anyone churns plans: it re-times the FIVE
  * slowest headline queries (per BASELINE.md's Spark column) under the
  * baseline harness config (local[2], 4 shuffle partitions) AND the Bench
  * config (local[32], 32) on today's box, min + median of 5 warm runs each.
  * If the baseline's own config cannot reproduce the baseline column on
  * this box, the drift is environmental, not a regression.
  * Run: sbt "Test/runMain graft.HeadlineVarianceProbe" */
object HeadlineVarianceProbe {
  // the 5 slowest rows of BASELINE.md's Spark column (sf0.1, warm)
  private val targets = Seq(
    "STREAM-SESSION" -> 1.423, "AGG-TPCH-Q1" -> 1.320,
    "WIN-FRAME-RANGE" -> 0.937, "FN-MATH" -> 0.771,
    "JOIN-LEFT-OUTER" -> 0.648)

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
      println(s"== cpus=$cpus shuffle.partitions=$parts ==")
      var total = 0.0
      targets.foreach { case (id, baseCol) =>
        def run(): Double = {
          val t0 = System.nanoTime()
          graft.dsl.Relational.impls(id)(spark).collect()
          (System.nanoTime() - t0) / 1e9
        }
        run(); run() // warm
        val times = (1 to 5).map(_ => run()).sorted
        total += times.min
        println(f"$id%-16s base=$baseCol%.3f  min=${times.min}%.3f  med=${times(2)}%.3f  ratio=${times.min / baseCol}%.2fx")
      }
      println(f"5-query total (min): $total%.3f vs baseline ${targets.map(_._2).sum}%.3f")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

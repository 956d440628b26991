package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-evidence dump (test scope): writes `.explain("formatted")` output
  * for the named queries to plans/<round>/<id>_<suffix>.txt so plan-shape
  * claims in OPTIMIZATION_r*.md are auditable offline. Not driver contract.
  *
  * usage: Test/runMain graft.PlanDump r15 before ID1,ID2,...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val round = args(0)
    val suffix = args(1)
    val ids = args(2).split(',').map(_.trim).filter(_.nonEmpty)
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
    val outDir = Paths.get(s"plans/$round")
    Files.createDirectories(outDir)
    ids.foreach { id =>
      SparkEntry.queries.get(id) match {
        case None => System.err.println(s"[plandump] unknown query id: $id")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(FormattedMode)
            Files.writeString(outDir.resolve(s"${id}_$suffix.txt"), txt)
            println(s"[plandump] wrote plans/$round/${id}_$suffix.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $id failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites; sf0.001 fixtures via graft.core.Tables. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSpec.session

  def tables(): Unit = graft.core.Tables.register(spark, sfDir)

  /** Canonical row dump for determinism / equality assertions. */
  def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case d: Double => f"$d%.4f"
      case f: Float => f"$f%.4f"
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case s: Seq[_] => s.mkString("[", ",", "]")
      case m: scala.collection.Map[_, _] =>
        m.toSeq.map { case (k, v) => s"$k=$v" }.sorted.mkString("{", ",", "}")
      case v => v.toString
    }.mkString("|"))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

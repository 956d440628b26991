package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The snapshot table's SQL surface through the session catalog: DDL
  * (`CREATE TABLE ... USING graft-snapshot`), reads with pushdown, DML
  * (`INSERT INTO` routes through the connector's BatchWrite as an
  * append), and `REFRESH TABLE` picking up externally-committed
  * versions. */
class SnapshotSqlSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapsql").toString + "/t"
  private var n = 0
  private def newTable(): String = { n += 1; s"snap_sql_spec_$n" }

  test("CREATE TABLE USING graft-snapshot + SELECT + INSERT INTO + REFRESH") {
    val root = newRoot()
    val tbl = newTable()
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v")
      .write.format("graft-snapshot").mode("append").save(root)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 2)
      assert(spark.sql(s"SELECT s FROM $tbl WHERE k = 2").head.getString(0) === "b")
      // INSERT INTO = connector append: a NEW snapshot version
      spark.sql(s"INSERT INTO $tbl VALUES (3, 'c', 2)")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 3)
      assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L))
      // an EXTERNAL commit (library API) becomes visible after REFRESH
      SnapshotTable.append(spark, root, Seq((9L, "x", 3L)).toDF("k", "s", "v"))
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 4)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL predicates reach the connector's file pruning") {
    val root = newRoot()
    val tbl = newTable()
    spark.range(8000).select(col("id").as("k"), (col("id") % 97).as("x"), lit(1L).as("v"))
      .repartitionByRange(8, col("k"))
      .write.format("graft-snapshot").option("statsCols", "k")
      .mode("append").save(root)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      val df = spark.sql(s"SELECT sum(k) AS sk FROM $tbl WHERE k BETWEEN 1000 AND 1999")
      assert(df.head.getLong(0) === (1000L to 1999L).sum)
      // the executed plan carries the pruned-file evidence
      val scans = df.queryExecution.executedPlan.toString()
      assert(df.queryExecution.executedPlan.exists(
        _.toString.contains("graft-snapshot")), s"no connector scan in:\n$scans")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}

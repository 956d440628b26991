package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.Similarity

/** Scratch probe: candidate connected-components rewrites, timed + verified
  * identical to Dedup.connectedComponentsStar. Not driver contract. */
object CcVariantsProbe {

  /** Variant B/C: star contraction with (a) the per-round fingerprint fused
    * into the checkpoint materialization (lazy localCheckpoint; the
    * fingerprint action materializes it, THEN the previous generation is
    * released), and (b) the intermediate large-star distinct dropped
    * (min() downstream is duplicate-insensitive; the round-final distinct
    * still bounds the edge set). */
  def starFused(pairs: DataFrame, maxIter: Int = 40,
                dropLargeDistinct: Boolean = true): DataFrame = {
    val Seq(ca, cb) = pairs.columns.take(2).toSeq
    val spark = pairs.sparkSession
    var prevRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    def nextWith(df: DataFrame): (DataFrame, Seq[Any]) = {
      val out = df.localCheckpoint(false)
      val rdd = out.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      val fp = out.agg(count(lit(1)), sum(col("a").cast("decimal(38,0)")),
          sum(col("b").cast("decimal(38,0)")),
          sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")))
        .collect()(0).toSeq
      prevRdd.foreach(_.unpersist(blocking = false))
      prevRdd = rdd
      (out, fp)
    }
    var (edges, prev) = nextWith(pairs
      .select(greatest(col(ca).cast("long"), col(cb).cast("long")).as("a"),
        least(col(ca).cast("long"), col(cb).cast("long")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct())
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      val minsL = sym.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val large0 = sym.join(minsL, "a").where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      val large = if (dropLargeDistinct) large0 else large0.distinct()
      val minsS = large.groupBy("a").agg(min("b").as("m"))
      val small = large.join(minsS, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .union(minsS.select(col("a"), col("m").as("b")))
        .where(col("a") =!= col("b"))
        .distinct()
      val (e2, s) = nextWith(small)
      edges = e2
      converged = s == prev
      prev = s
      it += 1
    }
    println(s"[probe] starFused rounds=$it")
    edges.select(col("b").as("cluster_id"), col("a").as("doc_id"))
      .union(edges.select(col("b").as("cluster_id"), col("b").as("doc_id")).distinct())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    val e = spark.table("embeddings")
    val model = Similarity.kmeansCentroids(e, k = 4, iters = 3)
    val pairs = Similarity.cellNearDupPairs(e, 0.35, model).cache()
    pairs.count()

    val ref = graft.llm.Dedup.connectedComponentsStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def check(tag: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        val got = f.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $tag round$r: $dt%.3fs match=${got == ref}")
      }
    }
    check("star-current")(graft.llm.Dedup.connectedComponentsStar(pairs))
    check("star-fused")(starFused(pairs, dropLargeDistinct = false))
    check("star-fused-nodist")(starFused(pairs, dropLargeDistinct = true))
    spark.stop()
  }
}

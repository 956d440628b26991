package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Pq, Similarity}

/** Scratch stage-timing probe (test scope): where do LLM-SEMDEDUP /
  * LLM-ANN-INDEXED actually spend their seconds at sf0.1? Not driver
  * contract. */
object SemDedupPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    val e = spark.table("embeddings")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val model = time("kmeans k=4 iters=3")(
        Similarity.kmeansCentroids(e, k = 4, iters = 3))
      val pairs = time("cellNearDupPairs count") {
        val p = Similarity.cellNearDupPairs(e, 0.35, model).cache()
        p.count(); p
      }
      val kept = time("semanticDedupFromPairs count") {
        val k = Similarity.semanticDedupFromPairs(e, pairs).cache()
        k.count(); k
      }
      time("three check-counts") {
        val keptIds = kept.select(col("vec_id"))
        pairs.join(keptIds.withColumnRenamed("vec_id", "va"), Seq("va"))
          .join(keptIds.withColumnRenamed("vec_id", "vb"), Seq("vb")).count()
        val linked = pairs.select(col("va").as("vid"))
          .union(pairs.select(col("vb").as("vid"))).distinct()
        e.select("vec_id")
          .join(keptIds, Seq("vec_id"), "left_anti")
          .join(linked, col("vec_id") === col("vid"), "left_anti").count()
        e.count()
      }
      pairs.unpersist(); kept.unpersist()

      // ANN-INDEXED components
      val path = java.nio.file.Files.createTempDirectory("graft_probe_ivfpq")
        .toString + "/idx"
      time("writeIvfPqIndex")(Pq.writeIvfPqIndex(e, path, cells = 8, iters = 5))
      time("3 probes (head + ann + exact)") {
        Seq(0L, 1L, 2L).foreach { pid =>
          val pvec = e.where(col("vec_id") === pid)
            .select("embedding").head.getSeq[Float](0).toArray
          Pq.ivfPqTopKIndexed(spark, path, pvec, kTop = 10, nprobe = 4, rerank = 64)
            .select("vec_id").collect()
          Similarity.cosineTopK(e, pid, 10).select("vec_id").collect()
        }
      }
    }
    spark.stop()
  }
}
// (appended) CC round-count probe
object CcRoundsProbe {
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
    println(s"[probe] n_pairs=${pairs.count()}")
    (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val cc = graft.llm.Dedup.connectedComponentsStar(pairs)
      val n = cc.count()
      println(f"[probe] star round$r: ${(System.nanoTime()-t0)/1e9}%.3fs rows=$n rounds=${graft.llm.Dedup.lastCcRounds}")
      val t1 = System.nanoTime()
      val cc2 = graft.llm.Dedup.connectedComponents(pairs)
      val n2 = cc2.count()
      println(f"[probe] labelprop round$r: ${(System.nanoTime()-t1)/1e9}%.3fs rows=$n2 rounds=${graft.llm.Dedup.lastCcRounds}")
    }
    spark.stop()
  }
}
// (appended) config-sensitivity probe for tiny iterative loops
object CcConfigProbe {
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
    def run(tag: String, confs: Map[String, String]): Unit = {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        (1 to 2).foreach { r =>
          val t0 = System.nanoTime()
          val n = graft.llm.Dedup.connectedComponentsStar(pairs).count()
          println(f"[probe] $tag round$r: ${(System.nanoTime()-t0)/1e9}%.3fs rows=$n")
        }
      } finally prev.foreach { case (k, vo) =>
        vo.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    run("default", Map.empty)
    run("nocodegen", Map("spark.sql.codegen.wholeStage" -> "false"))
    run("noaqe", Map("spark.sql.adaptive.enabled" -> "false"))
    run("nocodegen+noaqe", Map(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.adaptive.enabled" -> "false"))
    run("shufflep1", Map("spark.sql.shuffle.partitions" -> "1"))
    run("codegenfactory-nocode", Map("spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
      "spark.sql.codegen.wholeStage" -> "false"))
    run("default-again", Map.empty)
    spark.stop()
  }
}
// (appended) pageRank phase probe
object PrPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    // replicate Extensions.tradeEdges(k=3)
    def tradeEdges(k: Int) = {
      val li = Tables.spread(spark.table("lineitem"), "l_orderkey")
        .select("l_orderkey", "l_suppkey")
      val ord = spark.table("orders").select("o_orderkey", "o_custkey")
      val cust = spark.table("customer").select("c_custkey", "c_nationkey")
      val supp = spark.table("supplier").select("s_suppkey", "s_nationkey")
      val trade = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
      trade.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")
            .orderBy(col("cnt").desc, col("dst"))))
        .where(col("rn") <= k).select("src", "dst")
    }
    (1 to 2).foreach { r =>
      time(s"tradeEdges r$r")(tradeEdges(3).collect().length)
      time(s"pageRank-full r$r")(
        graft.operators.Graph.pageRank(tradeEdges(3), "src", "dst", 10, 0.85, 12)
          .orderBy("node").collect().length)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Measures the LLM-SEMDEDUP contract quantities across all fixture SFs —
  * the evidence behind the oracle's kept-fraction band (run before ever
  * widening/narrowing the bound): prints n, kept, frac, and both
  * post-condition counters (expected 0 / 0). */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val e = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val thr = 0.35
      val model = Similarity.kmeansCentroids(e, k = 4, iters = 3)
      val kept = Similarity.semanticDedupWithModel(e, thr, model)
      val pairs = Similarity.cellNearDupPairs(e, thr, model)
      val n = e.count()
      val nk = kept.count()
      val keptND = Similarity.cellNearDupPairs(kept, thr, model).count()
      val linked = pairs.select(col("va").as("vid"))
        .union(pairs.select(col("vb").as("vid"))).distinct()
      val unlinked = e.select("vec_id")
        .join(kept.select("vec_id"), Seq("vec_id"), "left_anti")
        .join(linked, col("vec_id") === col("vid"), "left_anti").count()
      println(f"SEMDEDUP sf$sf%s n=$n%d kept=$nk%d frac=${nk.toDouble / n}%.4f " +
        f"keptNearDups=$keptND%d unlinkedDropped=$unlinked%d")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.Dedup

/** Scale probe (test scope): runs the dedup pipelines on a corpus
  * replicated N× (with distinct doc_ids) to expose super-linear behavior
  * before real scale does. A replicated corpus is the dedup worst case —
  * every document has N-1 exact near-duplicates, so candidate generation
  * is maximally stressed. Run: sbt "Test/runMain graft.ScaleProbe [N]" */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, "/root/testdata/sf0.1")
    val base = spark.table("documents")
    val n = base.count()
    val big: DataFrame = (0 until mult).map { i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionAll _)
    println(s"[scale] corpus: ${n * mult} docs (${mult}x sf0.1)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$rows")
    }

    time("exact-dedup")(Dedup.exactDuplicates(big).count())
    time("neardup-collapsed")(Dedup.nearDupPairs(big, 3, 16, 8, 0.5).count())
    // OR-amplified (4 tables) over the collapsed corpus: candidate volume
    // must stay O(tables x single-table), never quadratic
    time("neardup-collapsed-K4")(
      Dedup.minhashPairsK(Dedup.representatives(big), 4, 3, 16, 8, 0.5).count())
    time("minhash-pairs")(Dedup.minhashPairs(big, 3, 16, 8, 0.5).count())
    time("simhash-pairs")(Dedup.simhashPairs(big, 3, 3).count())
    time("jaccard-pairs")(Dedup.jaccardPairs(big, 3, 0.8).count())

    // embedding near-dup: replicate with remapped ids; more hyperplane bits
    // shrink the candidate buckets as the corpus grows (the scale knob)
    val ebase = spark.table("embeddings")
    val ebig = (0 until mult).map { i =>
      ebase.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding"))
    }.reduce(_ unionAll _)
    time("embneardup-4bit")(
      graft.llm.Similarity.nearDupEmbPairs(ebig, 0.35, bits = 4).count())
    time("embneardup-8bit")(
      graft.llm.Similarity.nearDupEmbPairs(ebig, 0.35, bits = 8).count())
    time("embneardup-8bit-K4")(
      graft.llm.Similarity.nearDupEmbPairsK(ebig, 0.35, bits = 8, tables = 4).count())
    spark.stop()
  }
}

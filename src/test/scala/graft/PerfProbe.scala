package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.llm.Dedup

/** Scratch timing probe (test scope): stage-level timings for the dedup
  * pipelines at an arbitrary SF. Not part of the driver contract. */
object PerfProbe {
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
    val docs = spark.table("documents")

    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }

    time("shingles")(Dedup.shingles(docs, 3).count())
    time("polyhash")(Dedup.shingles(docs, 3)
      .select(Dedup.portableHash(org.apache.spark.sql.functions.col("s"))).count())
    time("minhash-sigs-portable")(
      Dedup.minhashSignatures(docs, 3, 16, Dedup.portableHash).count())
    time("minhash-pairs-portable")(
      Dedup.minhashPairs(docs, 3, 16, 8, 0.5, Dedup.portableHash).count())
    time("simhash-portable")(Dedup.simhashPortable(docs, 3).count())
    time("simhash-pairs-portable")(Dedup.simhashPairsPortable(docs, 3, 3).count())
    time("jaccard-pairs")(Dedup.jaccardPairs(docs, 3, 0.8).count())
    spark.stop()
  }
}

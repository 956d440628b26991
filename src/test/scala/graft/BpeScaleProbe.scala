package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.TextAnalysis

/** Scale probe for BPE merge training depth (test scope): a real vocabulary
  * has tens of thousands of merges, so training cost must scale with
  * MERGES LEARNED, not scans — the classic trap is one full corpus
  * scan + driver round-trip PER MERGE. `bpeMerges(batch = m)` learns up to
  * m symbol-disjoint merges per scan; this probe trains ≥30 merges on the
  * sf0.1 documents corpus at batch sizes 1 / 8 / 16 and reports wall time
  * and per-merge cost. Expected: batched per-merge cost a large factor
  * below sequential (scan count drops ~m×), and both produce the SAME
  * leading merge (the per-scan top pair is batch-independent).
  * Run: sbt "Test/runMain graft.BpeScaleProbe [merges]" */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val merges = args.headOption.map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, "/root/testdata/sf0.1")
    val docs = Tables.spread(spark.table("documents"), "doc_id")
      .select(col("doc_id"), col("text"))

    def time(name: String)(f: => Seq[String]): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val rules = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-scale] $name: $s%.1fs merges=${rules.size} " +
        f"per-merge=${s / rules.size}%.2fs first='${rules.head}'")
      (s, rules)
    }

    def train(batch: Int): Seq[String] =
      TextAnalysis.bpeMerges(docs, "text", merges, batch = batch)
        .orderBy("r").collect().map(_.getString(1)).toSeq

    // warm the JVM/scan path once so the comparison is plan cost, not JIT
    TextAnalysis.bpeMerges(docs, "text", 2, batch = 2).collect()

    val (tSeq, rSeq) = time(s"sequential batch=1 x$merges")(train(1))
    val (t8, r8) = time(s"batched    batch=8 x$merges")(train(8))
    val (t16, r16) = time(s"batched   batch=16 x$merges")(train(16))

    assert(rSeq.size == merges && r8.size == merges && r16.size == merges,
      "all modes must reach the requested merge count")
    assert(rSeq.head == r8.head && rSeq.head == r16.head,
      "the first learned merge is batch-independent")
    println(f"[bpe-scale] speedup vs sequential: batch8=${tSeq / t8}%.1fx " +
      f"batch16=${tSeq / t16}%.1fx")
    // batching must actually cut scan rounds: demand >2x at batch=8
    assert(t8 < tSeq / 2.0,
      f"batch=8 must run >2x faster than merge-per-scan (got ${tSeq / t8}%.1fx)")
    spark.stop()
  }
}

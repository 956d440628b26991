package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.cosineNative

/** OR-amplification (multi-table LSH) recall assertions.
  *
  * Single-table LSH detection probability 1 − (1 − j^rows)^bands is weak
  * exactly where dedup matters: borderline pairs. K independent tables
  * drive the miss rate to miss₁^K. The corpus here is constructed so pair
  * Jaccards sit in the borderline band (0.3–0.7); everything is
  * deterministic (hash families, not sampling), so the recall numbers are
  * exact and the assertions are hard. */
class AmplificationSpec extends SparkSpec {

  /** 40 (base, variant) doc pairs sharing a 30..48-token prefix of 60 →
    * shingle Jaccards ≈ 0.32..0.66. */
  private def corpus: DataFrame = {
    val sq = spark
    import sq.implicits._
    (0 until 40).flatMap { i =>
      val m = 30 + (i % 19)
      val base = (0 until 60).map(j => s"w${i}_$j")
      val variant = base.take(m) ++ (m until 60).map(j => s"v${i}_$j")
      Seq((i.toLong, base.mkString(" ")), ((i + 1000).toLong, variant.mkString(" ")))
    }.toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] = {
    val Seq(x, y) = df.columns.take(2).toSeq
    df.select(x, y).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhashPairsK(tables=1) candidates equal single-table minhashPairs") {
    tables()
    val c = corpus
    val one = pairSet(Dedup.minhashPairs(c, n = 3, numHashes = 16, bands = 4,
      estThreshold = 0.0))
    val k1 = pairSet(Dedup.minhashPairsK(c, tables = 1, n = 3, numHashes = 16,
      bands = 4, estThreshold = 0.0))
    assert(k1 === one)
  }

  test("OR-amplification lifts borderline recall: K=4 tables beat one") {
    tables()
    val c = corpus
    val truth = pairSet(Dedup.jaccardPairs(c, n = 3, threshold = 0.3))
    assert(truth.size >= 30, s"expected a borderline ground truth, got ${truth.size}")
    def recall(tables: Int): Double = {
      val got = pairSet(Dedup.minhashPairsK(c, tables = tables, n = 3,
        numHashes = 16, bands = 4, estThreshold = 0.0))
      (got & truth).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    info(f"single-table recall=$r1%.3f, 4-table recall=$r4%.3f over ${truth.size} true pairs")
    assert(r4 > r1, f"amplification must lift recall ($r1%.3f -> $r4%.3f)")
    assert(r4 - r1 >= 0.10, f"expected a material lift, got ${r4 - r1}%.3f")
  }

  test("minhashPairsK plan stays key-equality joins — no cartesian blowup") {
    tables()
    val d = Dedup.minhashPairsK(corpus, tables = 4, n = 3, numHashes = 16,
      bands = 4, estThreshold = 0.0)
    d.collect()
    val p = d.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "candidate join degenerated to all-pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "candidate join degenerated to all-pairs")
  }

  test("nearDupEmbPairsK contains the single-table pairs and lifts recall vs exact") {
    tables()
    val emb = spark.table("embeddings")
    // exact ground truth: all-pairs cosine >= threshold (tiny at sf0.001)
    val a = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val exact = pairSet(a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"), cosineNative(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= 0.35))
    assert(exact.nonEmpty)
    val one = pairSet(Similarity.nearDupEmbPairs(emb, 0.35, bits = 8))
    val k4 = pairSet(Similarity.nearDupEmbPairsK(emb, 0.35, bits = 8, tables = 4))
    // table 0 of the K-table family IS the single-table family
    assert(one.subsetOf(k4), "K-table result must contain the single-table result")
    val r1 = (one & exact).size.toDouble / exact.size
    val r4 = (k4 & exact).size.toDouble / exact.size
    info(f"emb recall: 1 table=$r1%.3f, 4 tables=$r4%.3f over ${exact.size} true pairs")
    assert(r4 >= r1)
    assert(k4.subsetOf(exact), "precision must stay exact (cosine-verified)")
  }
}

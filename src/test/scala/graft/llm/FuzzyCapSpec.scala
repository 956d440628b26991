package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The per-block cap on blocked fuzzy joins: one ubiquitous blocking key
  * must not go quadratic. Mirrors jaccardPairs' maxPostingList contract —
  * opt-in, recall-only, exact when no block exceeds the cap. */
class FuzzyCapSpec extends SparkSpec {

  // 500 rows sharing ONE blocking key (the "ubiquitous noun" pathology) +
  // two small healthy blocks. Names are near-identical inside each block so
  // with a loose maxEdit every candidate survives — observed pair count ==
  // candidate count, making the quadratic directly visible.
  private def fixture = {
    val sq = spark; import sq.implicits._
    val hot = (1 to 500).map(i => (i.toLong, s"widget $i", "box"))
    val small = Seq((1001L, "alpha a", "alpha"), (1002L, "alpha b", "alpha"),
      (1003L, "alpha c", "alpha"), (2001L, "beta a", "beta"), (2002L, "beta b", "beta"))
    (hot ++ small).toDF("k", "nm", "blk")
  }

  test("uncapped hot block is quadratic; cap bounds candidates to ~C(cap,2)") {
    val df = fixture
    def pairs(cap: Int): Long =
      Dedup.fuzzyPairs(df, "k", "nm", "blk", maxEdit = 99, lengthBand = 99,
        maxBlock = cap).count()
    val exact = pairs(0)
    // C(500,2) + C(3,2) + C(2,2-ish): the hot block dominates
    assert(exact === 500L * 499 / 2 + 3 + 1, s"exact candidate count drifted: $exact")
    val capped = pairs(20)
    // hash-thinning keeps an EXPECTED 20 of 500 hot rows (deterministic
    // given the fixture); candidates collapse from 124750 to O(cap²)
    assert(capped < 2000, s"cap did not bound the hot block: $capped pairs")
    // healthy blocks are under-cap: untouched, still exact
    val cappedSmall = Dedup.fuzzyPairs(df, "k", "nm", "blk", 99, 99, 20)
      .where(col("blk") =!= "box").count()
    assert(cappedSmall === 4L, "under-cap blocks must stay exact")
  }

  test("capped output is a subset of exact output (recall-only trade-off)") {
    val df = fixture
    def set(cap: Int): Set[(Long, Long)] =
      Dedup.fuzzyPairs(df, "k", "nm", "blk", maxEdit = 3, lengthBand = 2,
        maxBlock = cap)
        .select("ka", "kb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = set(0)
    val capped = set(20)
    assert(exact.nonEmpty)
    assert((capped -- exact).isEmpty, "cap invented pairs")
    assert(capped.size < exact.size, "cap should thin the hot block's pairs")
  }

  test("declared LLM-FUZZY-PAIRS path (exact mode) matches the inline shape it replaced") {
    tables()
    val p = spark.table("part")
      .where(col("p_partkey") <= 5000)
      .select(col("p_partkey").as("k"), col("p_name").as("nm"),
        element_at(split(col("p_name"), " "), -1).as("noun"))
    val viaOp = Dedup.fuzzyPairs(p, "k", "nm", "noun", 2, 2)
      .groupBy(col("blk")).agg(count(lit(1)).as("n_pairs"))
    val a = p.select(col("k").as("ka"), col("nm").as("na"), col("noun"))
    val b = p.select(col("k").as("kb"), col("nm").as("nb"), col("noun").as("noun_b"))
    val inline = a.join(b, col("noun") === col("noun_b") && col("ka") < col("kb") &&
        abs(length(col("na")) - length(col("nb"))) <= 2)
      .where(levenshtein(col("na"), col("nb")) <= 2)
      .groupBy(col("noun")).agg(count(lit(1)).as("n_pairs"))
    val opMap = viaOp.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val inMap = inline.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(opMap === inMap)
  }
}

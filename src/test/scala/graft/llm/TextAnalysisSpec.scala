package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  private def docs = { tables(); spark.table("documents") }

  test("quality: ratios bounded, n_chars matches the fixture's n_chars column") {
    val q = TextAnalysis.quality(docs)
    assert(q.filter(col("ttr") > 1.0 || col("ttr") <= 0.0).count() === 0)
    assert(q.filter(col("stop_ratio") > 1.0 || col("stop_ratio") < 0.0).count() === 0)
    assert(q.filter(col("avg_tok_len") <= 0.0).count() === 0)
    // documents carries its own n_chars column (= length(text), FIXTURES.md);
    // rename to avoid self-join ambiguity with our computed column
    val d2 = docs.select(col("doc_id").as("did"), col("n_chars").as("fixture_chars"))
    val bad = q.join(d2, q("doc_id") === d2("did"))
      .filter(col("n_chars") =!= col("fixture_chars"))
    assert(bad.count() === 0)
  }

  test("langId: guesses come from the closed label set") {
    val labels = TextAnalysis.langId(docs).select("guess").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "de", "es", "fr", "zh", "und")))
  }

  test("fingerprint: deterministic, within mod range, sensitive to token order") {
    val fp1 = canon(TextAnalysis.fingerprint(docs).orderBy("doc_id").limit(20))
    val fp2 = canon(TextAnalysis.fingerprint(docs).orderBy("doc_id").limit(20))
    assert(fp1 === fp2)
    val range = TextAnalysis.fingerprint(docs)
      .filter(col("fp") < 0 || col("fp") >= 1000000007L)
    assert(range.count() === 0)

    import spark.implicits._
    val two = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(two).collect().map(_.getLong(1)).toSet
    assert(fps.size === 2, "order-swapped tokens must fingerprint differently")
  }

  test("tokenCounts matches size(split())") {
    val bad = TextAnalysis.tokenCounts(docs).join(docs, "doc_id")
      .filter(col("n_tokens") =!= size(split(col("text"), " ")))
    assert(bad.count() === 0)
  }

  test("bpeTokenCounts: BPE-ish units cover known shapes; n_bpe >= n_ws on word text") {
    val sq = spark
    import sq.implicits._
    val t = Seq((1L, "hello world don't stop 42 times!"), (2L, "a b c"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.bpeTokenCounts(t).orderBy("doc_id").collect()
    // "hello"," world"," don","'t"," stop"," 42"," times","!" → 8 BPE units, 6 words
    assert(rows(0).getInt(1) === 6 && rows(0).getInt(2) === 8)
    assert(rows(1).getInt(1) === 3 && rows(1).getInt(2) === 3)
    // on the fixture corpus, subword-ish units never undercount words
    val bad = TextAnalysis.bpeTokenCounts(docs).filter(col("n_bpe") < col("n_ws"))
    assert(bad.count() === 0)
  }

  test("compressionRatio separates repetition, prose, and noise; deterministic") {
    val sq = spark
    import sq.implicits._
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(4000)((33 + rnd.nextInt(94)).toChar).mkString
    val t = Seq(
      (1L, "spam ham " * 500),                         // pathological repetition
      (2L, ("the quick brown fox jumps over the lazy dog and then " +
        "wanders toward a distant river bank looking for supper ") * 40),
      (3L, noise))
      .toDF("doc_id", "text")
    val m = TextAnalysis.compressionRatio(t).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(1L) < 0.05, s"repetition should crush: ${m(1L)}")
    assert(m(2L) > m(1L) && m(2L) < 0.5, s"prose in between: ${m(2L)}")
    assert(m(3L) > 0.8, s"noise barely compresses: ${m(3L)}")
    // deterministic across evaluations
    val again = TextAnalysis.compressionRatio(t).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === m)
    // total on the real corpus, no nulls
    assert(TextAnalysis.compressionRatio(docs).filter(col("deflate_ratio").isNull).count() === 0)
  }

  test("bpeMerges learns deterministic rules and applies them greedily") {
    val sq = spark; import sq.implicits._
    // "b c" is the most frequent pair (3); after merging, "a b@c" leads
    val docs = Seq("a b c d", "x b c y", "a b c").toDF("text")
    val rules = TextAnalysis.bpeMerges(docs, "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rules.head === ((1, "b c", 3L)))
    assert(rules(1) === ((2, "a b@c", 2L)))

    // greedy leftmost non-overlap: "a b a b a" merges pairs 1 and 3 only
    val tricky = Seq("a b a b a").toDF("text")
    val r2 = TextAnalysis.bpeMerges(tricky, "text", rounds = 1)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    // pairs: "a b"x2, "b a"x2 -> tie broken to the smaller pair "a b"
    assert(r2 === Seq(("a b", 2L)))
  }

  test("applyBpe re-tokenizes training text exactly as training did") {
    val sq = spark; import sq.implicits._
    val docs = Seq("a b c d", "x b c y", "a b c", "a b a b a").toDF("text")
    val rules = TextAnalysis.bpeMerges(docs, "text", rounds = 3)
    val applied = docs.select(TextAnalysis.applyBpe(rules, col("text")).as("t"))
      .collect().map(_.getString(0)).toSet
    // replaying the merges on the training corpus must reproduce the
    // final training state (same greedy application order)
    var d = docs
    rules.collect().sortBy(_.getInt(0)).map(_.getString(1)).foreach { pair =>
      d = d.select(org.apache.spark.sql.functions.replace(col("text"),
        lit(pair), lit(pair.replace(' ', '@'))).as("text"))
    }
    assert(applied === d.collect().map(_.getString(0)).toSet)
    // merged units are single tokens now
    assert(applied.exists(_.contains("@")))
  }
}

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
    val rules = TextAnalysis.bpeMerges(docs, "text", merges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rules.head === ((1, "b c", 3L)))
    assert(rules(1) === ((2, "a b@c", 2L)))

    // greedy leftmost non-overlap: both "a b" occurrences merge (they
    // don't overlap); "b a" loses the tie to the smaller pair "a b"
    val tricky = Seq("a b a b a").toDF("text")
    val r2 = TextAnalysis.bpeMerges(tricky, "text", merges = 1)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(r2 === Seq(("a b", 2L)))
  }

  test("bpe merge application is token-boundary anchored") {
    val sq = spark; import sq.implicits._
    // rule "a b" must NOT fire inside ["xa", "b"] (suffix collision) nor
    // inside ["a", "bx"], and adjacent runs merge pairwise like true BPE
    val train = Seq("a b", "a b").toDF("text")
    val rules = TextAnalysis.bpeMerges(train, "text", merges = 1)
    val applied = Seq("xa b", "a bx", "a b a b", "q a b q")
      .toDF("text")
      .select(TextAnalysis.applyBpe(rules, col("text")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(applied === Seq("xa b", "a bx", "a@b a@b", "q a@b q"))
  }

  test("applyBpe re-tokenizes training text exactly as training did") {
    val sq = spark; import sq.implicits._
    val docs = Seq("a b c d", "x b c y", "a b c", "a b a b a").toDF("text")
    val rules = TextAnalysis.bpeMerges(docs, "text", merges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // round 1: "a b" (4: docs 1,3 + doc4 twice, beats "b c" 3);
    // round 2: "a@b c" (2); round 3: all pairs count 1 -> smallest is
    // "a@b a" ("a@b a" < "a@b a@b": a proper prefix sorts first)
    assert(rules === Seq((1, "a b", 4L), (2, "a@b c", 2L), (3, "a@b a", 1L)))
    val rulesDf = TextAnalysis.bpeMerges(docs, "text", merges = 3)
    val applied = docs.select(TextAnalysis.applyBpe(rulesDf, col("text")).as("t"))
      .collect().map(_.getString(0)).toSet
    // the exact final training state, by hand:
    //   "a b c d"   -> "a@b c d" -> "a@b@c d"
    //   "x b c y"   stays (b c never merged as a pair of raw tokens)
    //   "a b c"     -> "a@b c"  -> "a@b@c"
    //   "a b a b a" -> "a@b a@b a" -> (rule "a@b a", anchored: only the
    //   [a@b, a] adjacency at the END matches) "a@b a@b@a"
    assert(applied === Set("a@b@c d", "x b c y", "a@b@c", "a@b a@b@a"))
    // merged units are single tokens now
    assert(applied.exists(_.contains("@")))
  }

  test("bpeMerges batch mode learns disjoint merges per scan") {
    val sq = spark; import sq.implicits._
    // two independent hot pairs: batch=2 learns both in ONE scan round
    val docs = Seq("a b a b", "c d c d", "a b c d").toDF("text")
    val batched = TextAnalysis.bpeMerges(docs, "text", merges = 2, batch = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // pre-scan counts: "a b" x3 ... (doc1 has 2 + doc3 has 1), "c d" x3,
    // "b a" 1, "d c" 1, "b c" 1 — picks "a b" then "c d" (disjoint)
    assert(batched === Seq((1, "a b", 3L), (2, "c d", 3L)))
    // overlapping runner-up is skipped within a batch: "b c" shares
    // symbol b with the winner "a b", so round 1 learns only "a b" and a
    // SECOND scan (post-merge counts) learns "a@b c"
    val docs2 = Seq("a b c", "a b c", "a b").toDF("text")
    val b2 = TextAnalysis.bpeMerges(docs2, "text", merges = 2, batch = 2)
      .collect().map(_.getString(1)).toSeq
    assert(b2 === Seq("a b", "a@b c"))
  }
}

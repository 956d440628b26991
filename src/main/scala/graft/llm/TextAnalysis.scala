package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, heuristic language ID, and document fingerprinting.
  *
  * All operators are per-row narrow transformations (no shuffle) except the
  * final ORDER BY the caller adds — at 100 TB they scale linearly with input
  * splits and stay inside whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BM25 relevance scores (Robertson/Spärck Jones) for a fixed term set:
    * `(idCol, bm25)` for every document matching ≥ 1 term.
    *
    * One shared token explode feeds document lengths, corpus stats, term
    * frequencies and document frequencies; `terms` is query-sized, so the
    * tf/df frames stay tiny and every join is key-equality (df and the
    * 1-row corpus stats broadcast themselves). idf uses the +1 form, so
    * scores stay positive at any df. At 100 TB the cost is the token
    * explode — the same single pass TEXT-TFIDF pays — never a search-index
    * build. */
  def bm25(documents: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = documents.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val lens = toks.groupBy(idCol).agg(count(lit(1)).as("len"))
    val st = lens.agg(count(lit(1)).as("n"), sum("len").as("tl"))
    val hit = toks.where(col("tok").isin(terms: _*))
    val tf = hit.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("f"))
    val dfq = hit.groupBy("tok").agg(count_distinct(col(idCol)).as("d"))
    val idf = log((col("n") - col("d") + 0.5) / (col("d") + 0.5) + 1.0)
    val norm = col("f") +
      (lit((1 - b)) + lit(b) * col("len") * col("n") / col("tl").cast("double")) * k1
    tf.join(broadcast(dfq), "tok")
      .join(lens, idCol)
      .crossJoin(broadcast(st))
      .groupBy(idCol)
      .agg(sum(idf * col("f") * (k1 + 1) / norm).as("bm25"))
  }

  /** Apply ONE learned merge rule to a space-joined token text, exactly as
    * greedy leftmost non-overlapping BPE does, ANCHORED TO TOKEN
    * BOUNDARIES. A plain substring replace of "A B" would also match
    * inside unrelated tokens — ["XA", "B"] renders as "XA B" and would
    * corrupt to "X" + "A@B". The anchor trick: double every separator
    * (each token boundary owns TWO spaces, one per side), pad the ends,
    * replace the doubled " A  B " with " A@B " — adjacent occurrences never
    * compete for a shared boundary space, so ["A","B","A","B"] merges to
    * ["A@B","A@B"] exactly as token-level greedy BPE does — then collapse
    * space runs and trim. Pure codegen'd string expressions. */
  private def applyMerge(c: Column, pair: String): Column = {
    val fns = org.apache.spark.sql.functions
    val doubled = concat(lit(" "), fns.replace(c, lit(" "), lit("  ")), lit(" "))
    val applied = fns.replace(doubled,
      lit(" " + pair.replace(" ", "  ") + " "),
      lit(" " + pair.replace(' ', '@') + " "))
    // EXACT inverse of the doubling, not a blanket collapse: every space
    // run is even (2n) after doubling — a match consumes one boundary
    // space and its replacement restores one — so pairwise "  "→" "
    // halves each run back to its original width, and stripping exactly
    // the one padding space per end finishes the inverse. (trim +
    // collapse-all-runs would MUTATE documents that already contained
    // space runs or leading/trailing spaces even when no rule matched,
    // making later training rounds see adjacencies the corpus never had.)
    regexp_replace(fns.replace(applied, lit("  "), lit(" ")), "^ | $", "")
  }

  /** The token symbols a merge rule touches — two rules with disjoint
    * symbol sets commute (a merge only creates NEW '@'-joined symbols, so
    * it can never create an adjacency of two other rules' raw symbols). */
  private def pairSymbols(pair: String): Set[String] = pair.split(" ").toSet

  /** Distributed BPE merge training (Sennrich et al. 2016, at the token
    * level): count adjacent-token pairs corpus-wide, pick the most
    * frequent (ties to the lexicographically smallest — fully
    * deterministic), apply the merge greedily left-to-right anchored to
    * token boundaries ([[applyMerge]]). Returns `(r, pair, cnt)`, one row
    * per merge rule learned, `r` the 1-based merge index.
    *
    * `merges` is the TOTAL number of merge rules to learn. `batch` scales
    * training depth: each corpus scan learns up to `batch` rules at once —
    * the top pairs by count whose symbol sets are mutually DISJOINT
    * (disjointness makes the batch's applications commute, so each rule
    * applies exactly as it would alone). batch=1 is classic sequential
    * BPE; batch=m cuts scan rounds ~m× at the standard batched-trainer
    * approximation (later rules in a batch are ranked by pre-batch
    * counts). A 30k-merge vocab at batch=64 is ~470 scans instead of 30k.
    *
    * Scale shape per scan: ONE explode + groupBy over the corpus and a
    * top-(4·batch) driver collect (metadata-scale, like a centroid
    * fetch); merges apply map-side; `localCheckpoint` per ROUND bounds
    * lineage. Never a corpus collect. Merged tokens join with '@' so
    * later rounds merge merged units without retokenizing. */
  def bpeMerges(documents: DataFrame, textCol: String, merges: Int,
                batch: Int = 1): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val spark = documents.sparkSession
    var d = documents.select(col(textCol).as("text"))
    val learned = Seq.newBuilder[(Int, String, Long)]
    var n = 0
    var rounds = 0
    var dry = false
    while (n < merges && !dry) {
      val toks = split(col("text"), " ")
      val pairs = d.where(size(toks) >= 2)
        .select(explode(transform(sequence(lit(0), size(toks) - 2),
          j => concat(element_at(toks, j + 1), lit(" "),
            element_at(toks, j + 2)))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
      val want = math.min(batch, merges - n)
      val top = pairs.orderBy(col("cnt").desc, col("pair"))
        .limit(math.max(want * 4, 8)).collect()
      if (top.isEmpty) dry = true
      else {
        // greedy prefix of the count-ordered candidates with mutually
        // disjoint symbols — commuting, so one pass applies them all
        var used = Set.empty[String]
        val picked = top.iterator.map(r => (r.getString(0), r.getLong(1)))
          .filter { case (p, _) =>
            val s = pairSymbols(p)
            if ((s & used).isEmpty) { used ++= s; true } else false
          }.take(want).toSeq
        var c: Column = col("text")
        picked.foreach { case (p, cnt) =>
          n += 1
          learned += ((n, p, cnt))
          c = applyMerge(c, p)
        }
        d = d.select(c.as("text"))
        rounds += 1
        // bound lineage across rounds — but only every few rounds: merges
        // are cheap map-side replaces, so replaying a handful from the
        // source beats materializing a full corpus copy per round (the
        // eager checkpoint was one extra corpus-wide job per merge; at
        // cluster scale it is a corpus copy into executor storage per
        // round). 8 keeps the replayed chain short and the plan small.
        if (rounds % 8 == 0) d = d.localCheckpoint()
      }
    }
    import spark.implicits._
    learned.result().toDF("r", "pair", "cnt")
  }

  /** Apply a learned merge table (the [[bpeMerges]] output, in rule order)
    * to a text column — BPE inference: each rule replaces greedily
    * left-to-right with the same token-boundary anchoring as training
    * ([[applyMerge]]), so training-corpus text re-tokenizes identically
    * and a rule "A B" can never fire inside an unrelated token like "XA".
    * A pure codegen'd column expression (chained replaces), no shuffle —
    * the rules frame is collected once (vocabulary-sized metadata, like a
    * broadcast dictionary). */
  def applyBpe(rules: DataFrame, text: Column): Column = {
    val ordered = rules.select("r", "pair").collect()
      .sortBy(_.getInt(0)).map(_.getString(1))
    ordered.foldLeft(text)(applyMerge)
  }

  private val stopwordsEn = Seq("the", "a", "of", "and", "is")
  private val stopwordsDe = Seq("der", "die", "das", "und", "ist")
  private val stopwordsEs = Seq("el", "la", "que", "los", "y")
  private val stopwordsFr = Seq("le", "les", "des", "et", "est")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Canonical text normalization — the standard cleanup applied BEFORE
    * exact/near dedup so trivial variants (case, punctuation, whitespace
    * runs) collapse to the same form: lowercase → strip non-alphanumerics
    * (keeping spaces) → collapse whitespace runs → trim. Pure codegen'd
    * string expressions; no shuffle. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** PII redaction — the standard scrub pass training pipelines run
    * before anything else ships: emails, IPv4 addresses, phone-shaped
    * and long digit runs are replaced by typed placeholder tokens. One
    * chained codegen `regexp_replace` per pattern, narrow (no shuffle);
    * patterns restricted to the regex subset Java and RE2 share
    * (character classes, bounded repetition — no backrefs/lookaround),
    * so the DuckDB oracle replays them byte-for-byte. Order matters and
    * is part of the contract: emails before digit runs (an email's
    * digits must not be half-eaten first), IPs before digit runs,
    * phones before generic digit runs. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]")
    val phone = regexp_replace(ip,
      "[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]")
    regexp_replace(phone, "[0-9]{6,}", "[NUM]")
  }

  /** Per-document normalized text with before/after sizes:
    * (doc_id, norm, n_raw, n_norm). */
  def normalized(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), normalize(col("text")).as("norm"),
      length(col("text")).as("n_raw"),
      length(normalize(col("text"))).as("n_norm"))

  /** Per-document quality metrics: char/token counts, mean token length,
    * type-token ratio, stopword ratio. Columns: doc_id, n_chars, n_tokens,
    * avg_tok_len, ttr, stop_ratio. */
  def quality(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    documents
      .withColumn("n_chars", length(col("text")))
      .withColumn("n_tokens", size(toks))
      .select(
        col("doc_id"), col("n_chars"), col("n_tokens"),
        // chars minus the (n-1) separating spaces, over token count
        round((col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"), 4)
          .as("avg_tok_len"),
        round(size(array_distinct(toks)).cast("double") / col("n_tokens"), 4).as("ttr"),
        round(hits(toks, stopwordsEn).cast("double") / col("n_tokens"), 4).as("stop_ratio"))
  }

  /** Heuristic language ID: CJK-codepoint check, then function-word votes
    * with a fixed priority order (en > de > es > fr), 'und' when no vote.
    * Columns: doc_id, guess, v_en, v_de, v_es, v_fr. */
  def langId(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val vEn = hits(toks, stopwordsEn)
    val vDe = hits(toks, stopwordsDe)
    val vEs = hits(toks, stopwordsEs)
    val vFr = hits(toks, stopwordsFr)
    documents.select(
      col("doc_id"),
      when(col("text").rlike("[一-鿿]"), "zh")
        .when(vEn >= greatest(vDe, vEs, vFr) && vEn > 0, "en")
        .when(vDe >= greatest(vEs, vFr) && vDe > 0, "de")
        .when(vEs >= vFr && vEs > 0, "es")
        .when(vFr > 0, "fr")
        .otherwise("und").as("guess"),
      vEn.as("v_en"), vDe.as("v_de"), vEs.as("v_es"), vFr.as("v_fr"))
  }

  /** Deterministic positional rolling fingerprint:
    * Σ (ascii(tok[0])·31 + len(tok)) · pos  mod 1e9+7, pos 1-based.
    * (Per-term magnitude ≤ ~500k·pos, so the un-modded sum stays far from
    * BIGINT overflow for any realistic document length.)
    * Columns: doc_id, fp. */
  def fingerprint(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .groupBy("doc_id")
      .agg((sum((ascii(substring(col("tok"), 1, 1)) * 31 + length(col("tok")))
        .cast("long") * (col("pos") + 1)) % 1000000007L).as("fp"))
  }

  /** Token counts per document (the LLM-TOKENIZE shape, as an API). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))

  /** BPE-style pre-tokenizer regex (GPT-2-family shape, minus lookahead —
    * portable to RE2, so the DuckDB oracle can run the identical pattern):
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs. */
  val BpePattern: String = "'[a-z]+| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  /** Whitespace AND BPE-ish token counts per document — the two token
    * budgets a training pipeline tracks (raw words vs subword-ish units).
    * Codegen'd regexp over a narrow projection, no shuffle. */
  def bpeTokenCounts(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      size(tokens(col("text"))).as("n_ws"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe"))

  /** Deflate length of a byte string — the building block of the
    * compression-ratio quality signal (Gopher/C4 lineage: highly
    * compressible ≈ repetitive/boilerplate; barely compressible ≈ random
    * noise; natural prose sits in between). Deterministic: fixed level,
    * fresh Deflater per value. */
  private val deflateLen = udf { (bytes: Array[Byte]) =>
    val d = new java.util.zip.Deflater(6, /*nowrap=*/ true)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](1024)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  /** Per-document compression ratio: deflate(text)/len(text), rounded 4dp.
    * Map-side only (a UDF is the honest choice here — deflate is a
    * stateful native-ish loop no Catalyst expression expresses; it stays
    * inside one projection, so the plan around it is unchanged). Filter
    * downstream on BOTH tails: ratio < ~0.25 flags pathological
    * repetition, ratio > ~0.9 flags binary/noise payloads. */
  def compressionRatio(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), length(col("text")).as("n_chars"),
      round(deflateLen(encode(col("text"), "UTF-8"))
        / greatest(length(col("text")), lit(1)).cast("double"), 4).as("deflate_ratio"))
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup is a hash-groupBy — one shuffle on the digest, map-side
  *    partial aggregation;
  *  - all-pairs Jaccard is inherently quadratic, so [[jaccardPairs]] joins on
  *    shared shingles first (candidate generation, plus an exact size-ratio
  *    prefilter) — documents with no common shingle never meet; still
  *    O(Σ posting-list²) worst case, which is why [[minhashPairs]] exists:
  *    LSH banding bounds candidate generation to documents agreeing on a
  *    signature band, making the join key-equality (shuffle-friendly)
  *    rather than all-pairs;
  *  - SimHash reduces each document to one 64-bit fingerprint; candidate
  *    pairs come from equality on 16-bit chunks (Hamming ≤ 3 ⇒ at least one
  *    of 4 chunks equal — pigeonhole), again a plain equi-join;
  *  - clone-heavy corpora (the web-crawl norm) collapse exact duplicates
  *    FIRST via [[representatives]]/[[nearDupPairs]] — a k-clone cluster
  *    otherwise costs C(k,2) candidates in every band/posting list;
  *  - residual hot keys in any of these equi-joins can be spread with
  *    [[graft.operators.Skew.saltedJoin]] or AQE's skew-join split.
  */
object Dedup {

  /** Prime modulus shared by the portable hash family and its DuckDB oracle
    * twins. */
  val P: Long = 1000000007L

  /** Affine universal-hash constants (a_k odd, b_k), deterministically
    * derived — h_k(x) = (a_k·x + b_k) mod P. The same Scala values are
    * interpolated into the DuckDB oracle SQL, so both engines use the
    * identical family. Single source of truth:
    * [[graft.functions.expressions.AffineFamily]] (shared with the codegen
    * HyperplaneBuckets expression). */
  val AB: IndexedSeq[(Long, Long)] =
    (0 until 64).map(graft.functions.expressions.AffineFamily.ab)

  /** Portable polynomial string hash: fold acc = (acc·31 + codepoint) mod P
    * over the characters — the codegen'd
    * [[graft.functions.expressions.PolyHash]] expression (bit-identical to
    * the DuckDB list_reduce twin; both engines' ascii/substr are
    * codepoint-based). Use for oracle-checked query variants; [[fastHash]]
    * (xxhash64) is the 64-bit scale path. Requires GraftFunctions.register
    * (graft.core.Tables.register does it; so do the Dedup entry points). */
  def portableHash(s: Column): Column = call_function("graft_poly_hash", s)

  /** Default base hash for signatures: xxhash64 reduced into [0, P). */
  def fastHash(s: Column): Column = pmod(xxhash64(s), lit(P))

  /** Token n-gram shingles (space-joined), one row per distinct shingle:
    * (doc_id, s). Documents with fewer than n tokens yield zero shingles
    * (guard required: sequence(1, size-(n-1)) DESCENDS when size<n, and
    * slice(toks, 0, n) throws at runtime — matches the oracle's
    * generate_series(1, len-(n-1)) empty-list semantics). */
  def shingles(documents: DataFrame, n: Int = 3): DataFrame = {
    val toks = split(col("text"), " ")
    val starts = when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    // spread first: the explode and every downstream join/agg would
    // otherwise run on one core for a single-split corpus (see Tables.spread)
    graft.core.Tables.spread(documents, "doc_id").select(
      col("doc_id"),
      explode(array_distinct(
        transform(starts, i => concat_ws(" ", slice(toks, i, lit(n)))))).as("s"))
  }

  /** Exact duplicate groups by content digest: (digest, n_docs, doc_ids)
    * for groups with more than one document. */
  def exactDuplicates(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(lower(col("text"))).as("digest"))
      .agg(count("*").as("n_docs"), sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      .filter(col("n_docs") > 1)

  /** All document pairs (da < db) with shingle-set Jaccard ≥ threshold:
    * (da, db, jac — rounded 4dp). Exact by default, pruned two ways:
    *  - candidate generation joins on shared shingles, so disjoint
    *    documents never meet;
    *  - a size-ratio prefilter inside the join condition — J(A,B) ≤
    *    min(|A|,|B|)/max(|A|,|B|), so J ≥ t requires t·max ≤ min — drops
    *    unbalanced pairs BEFORE the per-pair intersection count (exact for
    *    the declared threshold; a no-op when threshold = 0).
    *
    * `maxPostingList > 0` enables the STOP-SHINGLE cut (the standard
    * web-scale dedup defense): shingles whose posting list exceeds the cap
    * (boilerplate headers, license blocks, ubiquitous phrases) are dropped
    * from candidate generation, bounding the per-shingle join fan-out at
    * cap² instead of the hot list's |posting|². The trade-off is
    * one-sided: the intersection count can only shrink, so the reported
    * jac is a LOWER BOUND and the threshold filter loses recall for pairs
    * whose overlap is concentrated in stop shingles — precision is never
    * lost (no pair is reported above its true similarity). Denominators
    * stay the FULL shingle-set sizes. Costs one extra aggregate pass over
    * the shingle stream. Keep 0 (exact) for oracle-checked variants. */
  def jaccardPairs(documents: DataFrame, n: Int = 3, threshold: Double = 0.8,
                   maxPostingList: Int = 0): DataFrame = {
    val sh = shingles(documents, n)
    val card = sh.groupBy(col("doc_id")).agg(count("*").as("c"))
    val shc0 = sh.join(card, "doc_id")
    val shc =
      (if (maxPostingList > 0)
        // posting lists from the SAME shingle frame (not a second
        // shingling scan of the corpus) — the cap costs one aggregate
        shc0.join(hotFrom(sh, maxPostingList).select("s"), Seq("s"), "left_anti")
      else shc0)
        // both candidate-join sides consume this frame and Catalyst plans
        // them as separate subtrees (no exchange reuse across the alias
        // asymmetry) — without the checkpoint the corpus is shingled and
        // carded TWICE per side, four explode passes in the plan
        .localCheckpoint()
    val a = shc.select(col("doc_id").as("da"), col("s"), col("c").as("ca"))
    val b = shc.select(col("doc_id").as("db"), col("s").as("s2"), col("c").as("cb"))
    a.join(b,
        col("s") === col("s2") && col("da") < col("db")
          && greatest(col("ca"), col("cb")) * threshold <= least(col("ca"), col("cb")))
      .groupBy("da", "db", "ca", "cb").agg(count("*").as("i"))
      .withColumn("jacx", col("i").cast("double") / (col("ca") + col("cb") - col("i")))
      .filter(col("jacx") >= threshold)
      .select(col("da"), col("db"), round(col("jacx"), 4).as("jac"))
  }

  /** [[jaccardPairs]] with PREFIX FILTERING (Chaudhuri et al. ICDE'06 /
    * Xiao et al. PPJoin) — the exact-similarity-join optimization that
    * cuts candidate generation WITHOUT the stop-shingle recall loss.
    *
    * Lemma: if J(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, and two sets ordered by
    * one global token order must then share a token within their first
    * |A| − ⌈t·|A|⌉ + 1 positions. So only each document's PREFIX shingles
    * (its (1−t)·|A|+1 rarest, by global document frequency, ties by
    * shingle text — a deterministic total order) generate candidates, and
    * the rare-first order makes those exactly the shingles with the
    * SHORTEST posting lists: the boilerplate header that explodes
    * jaccardPairs' candidate join sits at the back of every prefix order
    * and never generates a pair. Survivors are verified EXACTLY against
    * the full shingle sets (two key-equality joins + a count), so output
    * equals jaccardPairs bit-for-bit (DedupSpec asserts it) — recall is
    * never traded, unlike `maxPostingList`.
    *
    * 100 TB story: the df table is vocabulary-sized; the prefix rank is a
    * doc-partitioned window; candidate fan-out is Σ(prefix posting)² over
    * the RAREST tokens instead of Σ(posting)² over all of them; exact
    * verification touches candidate pairs only. */
  def jaccardPairsPrefix(documents: DataFrame, n: Int = 3,
                         threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    import org.apache.spark.sql.expressions.Window
    val sh = shingles(documents, n).localCheckpoint()
    val card = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfreq, "s").join(card, "doc_id")
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
      .where(col("r") <= col("c") - ceil(lit(threshold) * col("c")) + 1)
      // prefix-bounded (≈(1−t)·tokens rows); both candidate-join sides
      // read it — materialize once instead of re-running the df join +
      // per-doc rank window per side
      .localCheckpoint()
    val a = ranked.select(col("doc_id").as("da"), col("s"), col("c").as("ca"))
    val b = ranked.select(col("doc_id").as("db"), col("s").as("s2"),
      col("c").as("cb"))
    val cand = a.join(b,
        col("s") === col("s2") && col("da") < col("db")
          && greatest(col("ca"), col("cb")) * threshold <= least(col("ca"), col("cb")))
      .select("da", "db", "ca", "cb").distinct()
    val fa = sh.select(col("doc_id").as("da"), col("s"))
    val fb = sh.select(col("doc_id").as("db2"), col("s").as("s2"))
    cand.join(fa, "da")
      .join(fb, col("db") === col("db2") && col("s") === col("s2"))
      .groupBy("da", "db", "ca", "cb").agg(count(lit(1)).as("i"))
      .withColumn("jacx", col("i").cast("double") / (col("ca") + col("cb") - col("i")))
      .filter(col("jacx") >= threshold)
      .select(col("da"), col("db"), round(col("jacx"), 4).as("jac"))
  }

  /** The stop-shingle set for [[jaccardPairs]]' cap: shingles whose
    * posting list exceeds `cap`, as (s, pl). One hash aggregate over the
    * shingle stream. */
  def hotShingles(documents: DataFrame, n: Int = 3, cap: Int): DataFrame =
    hotFrom(shingles(documents, n), cap)

  private def hotFrom(sh: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    sh.groupBy("s").agg(count("*").as("pl")).where(col("pl") > cap)
  }

  /** Blocked fuzzy (edit-distance) near-duplicate pairs with an opt-in
    * per-block cap — the [[jaccardPairs]] `maxPostingList` idea applied to
    * blocking-key joins.
    *
    * Candidate generation is a key-equality self-join on `blockCol` with a
    * length band inside the join condition and the codegen `levenshtein`
    * residual after it — never all-pairs. But a blocked join's worst case
    * is quadratic WITHIN a block: one ubiquitous blocking key (think a
    * stop-word noun shared by 1% of a 100 TB corpus) makes its block
    * C(n,2) internally. `maxBlock > 0` bounds that: rows of an over-cap
    * block are deterministically hash-thinned to an EXPECTED `maxBlock`
    * rows (keep iff `pmod(xxhash64(id), n_block) < maxBlock`), so hot-block
    * candidates are O(cap²) instead of O(n²). Thinning beats the window
    * alternative (row_number ≤ cap) because it needs no per-block sort and
    * never serializes a hot block onto one task — the filter is a scalar
    * predicate after a count join, fully parallel at any skew. Recall-only
    * trade-off, and ONLY on over-cap blocks: under-cap blocks are exact
    * (the predicate short-circuits on `n_block <= maxBlock`), so the
    * default `maxBlock = 0` path is the exact oracle shape.
    *
    * Returns (blk, ka, kb, d): pair ids ordered ka < kb, edit distance d.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String, blockCol: String,
                 maxEdit: Int = 2, lengthBand: Int = 2,
                 maxBlock: Int = 0): DataFrame = {
    val base = df.select(col(idCol).as("k"), col(strCol).as("nm"),
      col(blockCol).as("blk"))
    val thinned =
      if (maxBlock > 0) {
        val counts = base.groupBy("blk").agg(count(lit(1)).as("__bc"))
        base.join(counts, "blk")
          .where(col("__bc") <= maxBlock ||
            pmod(xxhash64(col("k")), col("__bc")) < maxBlock)
          .drop("__bc")
      } else base
    val a = thinned.select(col("k").as("ka"), col("nm").as("na"), col("blk"))
    val b = thinned.select(col("k").as("kb"), col("nm").as("nb"),
      col("blk").as("blk_b"))
    a.join(b, col("blk") === col("blk_b") && col("ka") < col("kb") &&
        abs(length(col("na")) - length(col("nb"))) <= lengthBand)
      // thresholded levenshtein (Spark 3.5+): computes only the
      // (2·maxEdit+1)-wide diagonal band and returns -1 past the
      // threshold — O(d·n) per candidate instead of O(n²), the Ukkonen
      // cut that matters when blocked candidates are long strings.
      // Values ≤ maxEdit are the exact distance, so results (and the
      // oracle hash) are unchanged.
      .withColumn("d", levenshtein(col("na"), col("nb"), maxEdit))
      .where(col("d") >= 0)
      .select(col("blk"), col("ka"), col("kb"), col("d"))
  }

  /** Cross-document repeated-span detection — the substring-level dedup
    * step AFTER doc-level dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"): near-distinct documents that
    * still share boilerplate passages (licenses, headers, quoted blocks)
    * keep those spans over-represented unless they are found and removed
    * span-wise.
    *
    * Shape: positioned k-token shingle hashes over the corpus → hashes
    * seen in ≥ `minDocs` DISTINCT documents mark their positions as
    * repeated → per-document overlapping/adjacent repeated positions merge
    * to MAXIMAL spans (gaps-and-islands: a new island starts when the gap
    * to the previous repeated position exceeds k, i.e. the k-wide spans no
    * longer touch). 100 TB story: everything is key-equality — the
    * repeated-bucket set is a hash-groupBy (map-side partial distinct),
    * the mark-back is an equi-join on the hash, and the merge window
    * partitions by doc_id; nothing is ever all-pairs and no state exceeds
    * a document's own positions.
    *
    * Returns (doc_id, span_start, span_end, n_shingles): 1-based token
    * positions, span_end inclusive (`span_end - span_start + 1` tokens
    * would be removed or down-weighted downstream).
    *
    * `keepFirst = true` applies the Lee et al. keep-one-occurrence policy:
    * each repeated bucket's canonical document (min doc_id among its
    * carriers) is NOT flagged, so [[removeSpans]] preserves exactly one
    * copy of every repeated passage corpus-wide instead of deleting it
    * everywhere. Same plan shape — the canonical id rides the existing
    * bucket aggregate, the mark-back join stays hash-equality.
    */
  def repeatedSpans(documents: DataFrame, k: Int = 8, minDocs: Int = 2,
                    baseHash: Column => Column = portableHash,
                    keepFirst: Boolean = false): DataFrame = {
    require(k >= 2, s"span shingle width must be >= 2, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2 (a repeat needs two docs), got $minDocs")
    graft.functions.expressions.GraftFunctions.register(documents.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val starts = when(size(toks) >= k, sequence(lit(1), size(toks) - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val pos = graft.core.Tables.spread(documents, "doc_id")
      .select(col("doc_id"), explode(transform(starts, i =>
        struct(i.as("p"),
          baseHash(concat_ws(" ", slice(toks, i, lit(k)))).as("h")))).as("ph"))
      .select(col("doc_id"), col("ph.p").as("p"), col("ph.h").as("h"))
      // feeds BOTH the repeated-bucket aggregate and the mark-back join —
      // materialize once instead of tokenizing + hashing the corpus twice
      .localCheckpoint()
    val repAll = pos.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"),
        min(col("doc_id")).as("__keeper"))
      .where(col("nd") >= minDocs)
    // semi join: rep is already distinct on h, so this is pure filtering —
    // the semi shape can never duplicate a position and stays eligible for
    // runtime bloom/broadcast reduction of the pos side (keepFirst needs
    // the keeper id, so it joins inner — still unique on h, no fan-out)
    val marked =
      if (keepFirst)
        pos.join(repAll.select("h", "__keeper"), Seq("h"))
          .where(col("doc_id") =!= col("__keeper")).select("doc_id", "p")
      else pos.join(repAll.select("h"), Seq("h"), "left_semi")
        .select("doc_id", "p")
    val w = Window.partitionBy("doc_id").orderBy("p")
    val prev = lag(col("p"), 1).over(w)
    marked
      .withColumn("brk", when(prev.isNull || col("p") - prev > k, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).cast("long").as("span_start"),
        (max(col("p")) + (k - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .select("doc_id", "span_start", "span_end", "n_shingles")
  }

  /** The removal half of substring-level dedup: scrub the token spans
    * flagged by [[repeatedSpans]] out of the documents. Returns only the
    * AFFECTED documents as (doc_id, clean_text, n_spans) — unaffected
    * documents pass through a pipeline untouched, so emitting them here
    * would only re-shuffle the corpus. A document whose entire text is
    * flagged (a whole-doc near-dup) yields clean_text = "".
    *
    * Policy note: spans are removed from EVERY document carrying them
    * ("strip boilerplate everywhere"). The keep-one-occurrence policy from
    * Lee et al. 2022 is a downstream choice: filter the span frame to
    * all-but-one doc per repeated bucket before calling this.
    *
    * 100 TB story: spans collapse to one array per doc (bounded by the
    * doc's own token count), the join is doc_id-equality, and the scrub is
    * a codegen higher-order filter over the token array — no explode, no
    * window, no extra shuffle beyond the span groupBy. */
  def removeSpans(documents: DataFrame, spans: DataFrame): DataFrame = {
    val sp = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__sp"))
    documents.join(sp, Seq("doc_id"))
      .select(col("doc_id"),
        concat_ws(" ", filter(split(col("text"), " "), (_, i) =>
          !exists(col("__sp"), s =>
            i + 1 >= s.getField("span_start") &&
              i + 1 <= s.getField("span_end")))).as("clean_text"),
        size(col("__sp")).cast("long").as("n_spans"))
  }

  /** Benchmark-contamination detection: for each (probe, document) pair,
    * the CONTAINMENT of the probe's shingle set in the document —
    * |S(probe) ∩ S(doc)| / |S(probe)| — the asymmetric measure that
    * catches a document QUOTING an eval passage even when resemblance
    * (Jaccard) is tiny because the document is much longer. This is the
    * standard decontamination primitive for training corpora: `probes` =
    * the benchmark suite, `documents` = the corpus; any pair at high
    * containment means the benchmark leaks into training data.
    *
    * Returns (probe_id, doc_id, containment ≥ threshold, 4dp); a probe
    * never pairs with the same doc_id. Scale shape: benchmark suites are
    * SMALL, so the probe shingle set broadcasts into a key-equality join
    * against the corpus shingle stream — per-pair state is one count,
    * never an all-pairs comparison. */
  def containmentPairs(documents: DataFrame, probes: DataFrame, n: Int = 3,
                       threshold: Double = 0.5): DataFrame = {
    val dsh = shingles(documents, n)
    val psh = shingles(probes, n).select(col("doc_id").as("probe_id"), col("s"))
    val pcard = psh.groupBy("probe_id").agg(count("*").as("pc"))
    dsh.join(broadcast(psh), "s")
      .where(col("doc_id") =!= col("probe_id"))
      .groupBy("probe_id", "doc_id").agg(count("*").as("i"))
      .join(broadcast(pcard), "probe_id")
      .withColumn("cont", col("i").cast("double") / col("pc"))
      .filter(col("cont") >= threshold)
      .select(col("probe_id"), col("doc_id"), round(col("cont"), 4).as("containment"))
  }

  /** MinHash signatures: numHashes min-hashes per document over its shingle
    * set, as (doc_id, sig array<bigint>). One base hash per shingle plus an
    * affine family h_k = (a_k·H + b_k) mod P — 16× cheaper than 16
    * independent string hashes, and the family is portable: with
    * baseHash = [[portableHash]] the signatures (and everything built on
    * them) hash-match the DuckDB oracle. */
  def minhashSignatures(documents: DataFrame, n: Int = 3, numHashes: Int = 16,
                        baseHash: Column => Column = fastHash,
                        abOffset: Int = 0): DataFrame = {
    require(abOffset + numHashes <= AB.length, s"at most ${AB.length} hash slots")
    graft.functions.expressions.GraftFunctions.register(documents.sparkSession)
    val sh = shingles(documents, n).select(col("doc_id"), baseHash(col("s")).as("hr"))
    val mins = (0 until numHashes).map { k =>
      val (a, b) = AB(abOffset + k)
      min((col("hr") * a + b) % P).as(s"h$k")
    }
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
  }

  /** LSH candidate pairs from banded signatures, verified with the estimated
    * Jaccard (fraction of agreeing hash positions, rounded 4dp):
    * (da, db, est_jac). bands × rowsPerBand must equal the signature length.
    *
    * Banding default 8×2: detection probability 1-(1-j²)^8 ≈ 0.9997 at
    * j = 0.8 (4×4 banding would miss ~12% of 0.8-Jaccard pairs). Band key =
    * the slice rendered as text (portable to the oracle; at 100 TB swap in
    * xxhash64(bkey) to shrink shuffle keys — same candidates). */
  def minhashPairs(documents: DataFrame, n: Int = 3, numHashes: Int = 16,
                   bands: Int = 8, estThreshold: Double = 0.5,
                   baseHash: Column => Column = fastHash): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // per-doc signatures (corpus-row-bounded, 16 longs each) feed both
    // banded self-join sides — materialize once, not one shingle pass each
    val sigs = minhashSignatures(documents, n, numHashes, baseHash)
      .localCheckpoint()
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * rows + lit(1), lit(rows)))))
        .as(Seq("band", "bkey")))
    // est is a pure function of the pair, so compute it per band hit (≤bands
    // cheap zip_with evaluations) and dedup band hits with a primitive-key
    // groupBy — distinct() over the 16-long signature ARRAYS was the
    // bottleneck on clone-heavy corpora (non-codegen array comparisons on
    // every duplicated candidate row)
    banded.select(col("doc_id").as("da"), col("sig").as("siga"), col("band"), col("bkey"))
      .join(banded.select(col("doc_id").as("db"), col("sig").as("sigb"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        (aggregate(zip_with(col("siga"), col("sigb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes).as("est0"))
      .groupBy("da", "db").agg(min("est0").as("est_jac"))
      .filter(col("est_jac") >= estThreshold)
      .select(col("da"), col("db"), round(col("est_jac"), 4).as("est_jac"))
  }

  /** OR-amplified MinHash LSH: `tables` independent hash families (disjoint
    * [[AB]] slices), a pair is a candidate if ANY table's banding catches
    * it — detection probability 1 − (1 − p₁)^tables where p₁ is the
    * single-table probability 1 − (1 − j^rows)^bands. This is the
    * shippable recall knob: one table's (1 − (1 − j^rows)^bands) is not a
    * guarantee at corpus scale; K tables drive the miss rate to (miss₁)^K.
    *
    * Cost discipline: ONE shingle + signature pass computes all
    * tables·numHashes slots (the affine family makes extra slots nearly
    * free), the banded self-join stays key-equality on (band, bkey) with
    * the table id folded into the band index, and candidate dedup across
    * tables is a primitive-key (da, db) groupBy. est_jac = the detecting
    * table's best agreement fraction. */
  def minhashPairsK(documents: DataFrame, tables: Int = 4, n: Int = 3,
                    numHashes: Int = 16, bands: Int = 8,
                    estThreshold: Double = 0.5,
                    baseHash: Column => Column = fastHash): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(tables * numHashes <= AB.length,
      s"tables*numHashes must be <= ${AB.length}")
    val rows = numHashes / bands
    val sigs = minhashSignatures(documents, n, tables * numHashes, baseHash)
      .localCheckpoint()
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(tables * bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * rows + lit(1), lit(rows)))))
        .as(Seq("band", "bkey")))
    // per-hit est over the DETECTING table's slice of the signature; the
    // band index encodes the table (band div bands)
    val start = (col("band").cast("int") / bands).cast("int") * numHashes + 1
    banded.select(col("doc_id").as("da"), col("sig").as("siga"), col("band"), col("bkey"))
      .join(banded.select(col("doc_id").as("db"), col("sig").as("sigb"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        (aggregate(zip_with(
            slice(col("siga"), start, lit(numHashes)),
            slice(col("sigb"), start, lit(numHashes)),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes).as("est0"))
      .filter(col("est0") >= estThreshold)
      .groupBy("da", "db").agg(max("est0").as("est_jac"))
      .select(col("da"), col("db"), round(col("est_jac"), 4).as("est_jac"))
  }

  /** Connected components over a duplicate-pair graph — the dedup endgame:
    * pair generators ([[jaccardPairs]], [[minhashPairs]], [[simhashPairs]])
    * emit EDGES, but the keep/drop decision needs CLUSTERS (a≈b and b≈c must
    * collapse to one kept document even when a≉b directly). Returns
    * (cluster_id, doc_id) — cluster_id is the component's minimum member,
    * so the canonical representative is the row where cluster_id == doc_id.
    * Documents that appear in no pair are absent (they keep themselves).
    *
    * Algorithm: iterative min-label propagation — each round every node
    * takes the minimum label among itself and its neighbors, converging in
    * O(graph diameter) rounds. Each round is one key-equality join + one
    * groupBy (shuffle-friendly, never all-pairs), and `localCheckpoint`
    * truncates the plan lineage so iteration N doesn't replay rounds 1..N-1
    * (the classic iterative-DataFrame trap). Near-dup cluster graphs are
    * dense blobs with tiny diameter, so rounds ≈ 2–4 in practice; if the
    * round budget runs out (a long-path graph — linked-page chains,
    * adversarial inputs), the call hands off to
    * [[connectedComponentsStar]], the O(log n) small-star/large-star
    * contraction with the same contract. On a real cluster prefer
    * `checkpoint` (reliable storage) over `localCheckpoint` for fault
    * tolerance on long chains.
    *
    * First two columns of `pairs` are taken as the edge endpoints. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 12): DataFrame = {
    val Seq(ca, cb) = pairs.columns.take(2).toSeq
    val fwd = pairs.select(col(ca).cast("long").as("a"), col(cb).cast("long").as("b"))
    // symmetrize: min-labels must flow both directions along every edge.
    // No dedup — min() is idempotent under duplicate edges, and the pair
    // generators emit unique pairs anyway; a distinct() here would shuffle
    // the whole edge set once before the first round.
    val edgeChain = new CheckpointChain(pairs.sparkSession)
    val labelChain = new CheckpointChain(pairs.sparkSession)
    // cluster the loop-static edge set by the per-round join key: the bare
    // union is a narrow op that inherits (2× the parent's) partitions, so
    // every round would scan that many tasks however small the graph; a
    // keyed repartition lets AQE size it to the data (and at scale
    // co-locates the join side)
    val edges = edgeChain.next(
      fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
        .repartition(col("b")))
    // convergence detector: labels only ever DECREASE, so the label sum
    // strictly decreases iff any label changed — one scalar aggregate per
    // round instead of a join+count. decimal(38,0) keeps the sum exact for
    // any Long ids at any node count. The sum rides the SAME job that
    // materializes the round's checkpoint (CheckpointChain.nextWith): one
    // Spark job per round, not two.
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).collect()(0).getDecimal(0)
    var (labels, prevSum) = labelChain.nextWith(
      edges.select(col("a").as("node")).distinct()
        .select(col("node"), col("node").as("lbl")))(lblSum)
    var changed = true
    var it = 0
    while (changed && it < maxIter) {
      val prop = edges.select(col("a").as("node"), col("b"))
        .join(labels.select(col("node").as("b"), col("lbl")), "b")
        .select(col("node"), col("lbl"))
      val (nl, s) = labelChain.nextWith(labels.unionByName(prop)
        .groupBy("node").agg(min("lbl").as("lbl")))(lblSum)
      labels = nl
      // null sums (empty graph) compare equal — nothing to propagate
      changed =
        if (s == null || prevSum == null) s != prevSum
        else s.compareTo(prevSum) != 0
      prevSum = s
      it += 1
    }
    edgeChain.release()
    lastCcRounds = it
    if (changed) {
      // O(diameter) label propagation hit its round budget — a long-path
      // graph (linked-page chains, adversarial inputs). Hand off to the
      // O(log n) star contraction instead of failing: same contract, same
      // join/groupBy primitives, round count independent of diameter.
      labelChain.release()
      return connectedComponentsStar(pairs)
    }
    labels.select(col("lbl").as("cluster_id"), col("node").as("doc_id"))
  }

  /** Connected components by alternating small-star/large-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the long-diameter scale path. Same contract as
    * [[connectedComponents]]: returns (cluster_id, doc_id), cluster_id =
    * the component's minimum member; isolated nodes absent.
    *
    * Each round is two contraction steps over a canonical (child > parent)
    * edge set:
    *  - LARGE-STAR: every node connects its strictly-larger neighbors to
    *    the minimum of its neighborhood (incl. itself);
    *  - SMALL-STAR: every node connects its smaller neighbors (its
    *    parents) and itself to the smallest of them.
    * Both are one key-equality join against a per-node min aggregate —
    * the identical shuffle shape as one label-propagation round — but the
    * edge set contracts toward a star forest in O(log n) rounds regardless
    * of graph diameter (propagation needs O(diameter)). Preferred when the
    * pair graph may contain long paths; for the dedup norm (dense
    * diameter-≈2 blobs) plain propagation converges in fewer, cheaper
    * rounds.
    *
    * Convergence = the (count, id-sums, hash-sum) fingerprint of the edge
    * set reaching a fixpoint — the star forest is a fixpoint of both
    * steps; the 64-bit hash-sum makes a false positive vanishingly
    * unlikely without a per-round except() over the full edge set. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 40): DataFrame = {
    val Seq(ca, cb) = pairs.columns.take(2).toSeq
    val chain = new CheckpointChain(pairs.sparkSession)
    // the convergence fingerprint rides the SAME job that materializes each
    // round's checkpoint (CheckpointChain.nextWith): one job per round
    def fingerprint(df: DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("a").cast("decimal(38,0)")),
          sum(col("b").cast("decimal(38,0)")),
          sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")))
        .collect()(0).toSeq
    var (edges, prev) = chain.nextWith(pairs
      .select(greatest(col(ca).cast("long"), col(cb).cast("long")).as("a"),
        least(col(ca).cast("long"), col(cb).cast("long")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct())(fingerprint)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // large-star over the symmetrized graph: emit (v, m(u)) for v > u,
      // where m(u) = min(Γ(u) ∪ {u}); output is (child > parent) canonical.
      // NOT distinct()ed: each sym row emits at most one (v, m) row, so the
      // large set is bounded by 2·|edges| with or without the dedup, min()
      // downstream is duplicate-insensitive, and the round-final distinct
      // canonicalizes — dropping it removes a full shuffle per round.
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      val minsL = sym.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val large = sym.join(minsL, "a").where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      // small-star on (child, parents): connect parents ∪ {child} to the
      // minimum parent
      val minsS = large.groupBy("a").agg(min("b").as("m"))
      val small = large.join(minsS, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .union(minsS.select(col("a"), col("m").as("b")))
        .where(col("a") =!= col("b"))
        .distinct()
      val (ne, s) = chain.nextWith(small)(fingerprint)
      edges = ne
      converged = s == prev
      prev = s
      it += 1
    }
    lastCcRounds = it
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxIter rounds")
    // star forest: every child points at its component minimum; centers
    // keep themselves
    edges.select(col("b").as("cluster_id"), col("a").as("doc_id"))
      .union(edges.select(col("b").as("cluster_id"), col("b").as("doc_id")).distinct())
  }

  /** Rounds taken by the most recent connectedComponents/Star call on this
    * JVM — probe/test instrumentation, not part of the operator contract. */
  @volatile private[graft] var lastCcRounds: Int = 0

  /** localCheckpoint chained across loop rounds: materializes the new
    * checkpoint, then unpersists the previous round's — bounding cached
    * blocks at one generation per chain instead of one per round (a
    * long-diameter CC run otherwise accumulates every round's labels for
    * the life of the session). The checkpoint's backing RDD is read
    * straight out of the returned frame's plan (the LogicalRDD leaf), so
    * tracking is exact and safe under concurrent use of the session —
    * never a diff of the SparkContext-global persistent-RDD registry,
    * which could adopt (and later destroy) another thread's checkpoint.
    * `release()` drops the last generation once the caller no longer
    * needs it. The FINAL checkpoint backing a returned DataFrame must NOT
    * be released — localCheckpoint truncates lineage, so its blocks are
    * the only copy. */
  private type CheckpointChain = graft.core.CheckpointChain

  /** The user-facing dedup endgame: the corpus with every non-representative
    * near-duplicate removed. Composes the full pipeline — exact-clone
    * collapse ([[representatives]]) → near-dup pair generation over unique
    * texts (`pairGen`, default MinHash LSH) → [[connectedComponents]] →
    * drop every clustered document except its cluster's minimum id. A
    * document with no duplicate keeps itself. Every stage is key-equality
    * joins and hash aggregations — the whole pipeline is the 100 TB shape.
    *
    * Returns the KEPT documents (same schema as the input). */
  def dedupCorpus(documents: DataFrame,
                  pairGen: DataFrame => DataFrame = nearDupPairs(_)): DataFrame = {
    // the representative set feeds BOTH the pair-generation graph and the
    // final keep-list anti-join; localCheckpoint materializes the collapse
    // once instead of re-deriving it through each consumer's lineage (the
    // returned frame references the checkpoint, so it stays persisted —
    // one O(unique-texts) generation per call, like connectedComponents'
    // final labels)
    val reps = representatives(documents).localCheckpoint()
    val clustered = connectedComponents(pairGen(reps).select("da", "db"))
    val dropReps = clustered.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    // keep: exact-clone representatives minus non-representative cluster
    // members (anti join on the primitive doc_id key)
    reps.join(dropReps, Seq("doc_id"), "left_anti")
  }

  /** Scale pipeline: exact-duplicate collapse → near-dup pair generation
    * over unique texts only. Web-scale corpora are dominated by EXACT
    * copies; a k-clone cluster contributes C(k,2) candidate pairs to every
    * LSH band and every shared-shingle posting, turning candidate
    * generation quadratic in clone count. Collapsing to one representative
    * per content digest first (a single cheap hash-groupBy) makes the
    * expensive near-dup join see each distinct text once. Returns pairs
    * over representative doc_ids (min doc_id per digest, deterministic);
    * join with [[exactDuplicates]] to expand back to full clusters. */
  def nearDupPairs(documents: DataFrame, n: Int = 3, numHashes: Int = 16,
                   bands: Int = 8, estThreshold: Double = 0.5,
                   baseHash: Column => Column = fastHash): DataFrame =
    minhashPairs(representatives(documents), n, numHashes, bands, estThreshold, baseHash)

  /** One representative document per content digest: the ROW with the
    * minimum doc_id (min_by keeps id and text from the same document —
    * independent min(doc_id)/min(text) aggregates could stitch one doc's
    * id to a case-variant clone's text, since the digest lowercases).
    * Compose with ANY pair generator ([[jaccardPairs]], [[simhashPairs]],
    * …) the same way [[nearDupPairs]] does for MinHash: collapse exact
    * clones BEFORE the quadratic-candidate stage. */
  def representatives(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(lower(col("text"))).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("text"), col("doc_id")).as("text"))
      .select("doc_id", "text")

  /** 64-bit SimHash fingerprint per document: bitᵢ = sign of Σ(±1) over
    * shingle hashes' i-th bits. (doc_id, simhash).
    *
    * Uses the graft_simhash_agg TypedImperativeAggregate (fixed 256-byte
    * buffer, map-side partial agg) — requires GraftFunctions.register,
    * which graft.core.Tables.register performs. */
  def simhash(documents: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(documents.sparkSession)
    shingles(documents, n)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .groupBy("doc_id")
      .agg(call_function("graft_simhash_agg", col("h")).as("simhash"))
  }

  /** Portable 60-bit SimHash: two affine projections g1, g2 of the portable
    * shingle hash give 30 bits each; bitᵢ = 1 iff Σ(±1) over shingles > 0.
    * (doc_id, simhash). Unlike [[simhash]] (xxhash64, the scale path) this
    * is reproducible in the DuckDB oracle. Implementation: the
    * graft_simhash_balance TypedImperativeAggregate — one fixed 240-byte
    * buffer folding all 60 balance counters, map-side partial agg (the
    * previous 60-separate-`sum()` formulation paid 60 aggregate buffers +
    * 60 shift/mask expression trees per row). */
  def simhashPortable(documents: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(documents.sparkSession)
    val (a1, b1) = AB(0)
    val (a2, b2) = AB(1)
    val g = shingles(documents, n)
      .select(col("doc_id"), portableHash(col("s")).as("hr"))
      .select(col("doc_id"),
        ((col("hr") * a1 + b1) % P).as("g1"),
        ((col("hr") * a2 + b2) % P).as("g2"))
    g.groupBy("doc_id")
      .agg(call_function("graft_simhash_balance", col("g1"), col("g2")).as("simhash"))
  }

  /** Near-duplicate pairs by portable-SimHash Hamming distance ≤ maxDist,
    * 15-bit chunk equality as the LSH (pigeonhole over 60 bits: dist ≤ 3 ⇒
    * ≥ 1 of 4 chunks equal): (da, db, dist). Oracle-checkable twin of
    * [[simhashPairs]]. */
  def simhashPairsPortable(documents: DataFrame, n: Int = 3, maxDist: Int = 3): DataFrame = {
    // one fingerprint row per doc; both chunk-join sides read it —
    // materialize once, not one shingle+aggregate pass per side
    val fp = simhashPortable(documents, n).localCheckpoint()
    val chunked = fp.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("simhash"), c * 15).bitwiseAND(lit(32767L))))
        .as(Seq("chunk", "ckey")))
    chunked.select(col("doc_id").as("da"), col("simhash").as("fa"), col("chunk"), col("ckey"))
      .join(chunked.select(col("doc_id").as("db"), col("simhash").as("fb"), col("chunk"), col("ckey")),
        Seq("chunk", "ckey"))
      .filter(col("da") < col("db"))
      .select("da", "db", "fa", "fb").distinct()
      .withColumn("dist", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("dist") <= maxDist)
      .select("da", "db", "dist")
  }

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxDist, using
    * 16-bit chunk equality as the LSH (pigeonhole: dist ≤ 3 ⇒ ≥ 1 of 4
    * chunks equal): (da, db, dist). */
  def simhashPairs(documents: DataFrame, n: Int = 3, maxDist: Int = 3): DataFrame = {
    val fp = simhash(documents, n).localCheckpoint()
    val chunked = fp.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("chunk", "ckey")))
    chunked.select(col("doc_id").as("da"), col("simhash").as("fa"), col("chunk"), col("ckey"))
      .join(chunked.select(col("doc_id").as("db"), col("simhash").as("fb"), col("chunk"), col("ckey")),
        Seq("chunk", "ckey"))
      .filter(col("da") < col("db"))
      .select("da", "db", "fa", "fb").distinct()
      .withColumn("dist", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("dist") <= maxDist)
      .select("da", "db", "dist")
  }
}

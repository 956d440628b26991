package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup is a hash-groupBy — one shuffle on the digest, map-side
  *    partial aggregation;
  *  - all-pairs Jaccard is inherently quadratic, so [[jaccardPairs]] joins on
  *    shared shingles first (candidate generation) — documents with no
  *    common shingle never meet; still O(Σ posting-list²) worst case, which
  *    is why [[minhashPairs]] exists: LSH banding bounds candidate
  *    generation to documents agreeing on a 4-hash band, making the join
  *    key-equality (shuffle-friendly, skew-salted by band index) rather
  *    than all-pairs;
  *  - SimHash reduces each document to one 64-bit fingerprint; candidate
  *    pairs come from equality on 16-bit chunks (Hamming ≤ 3 ⇒ at least one
  *    of 4 chunks equal — pigeonhole), again a plain equi-join.
  */
object Dedup {

  /** Token n-gram shingles (space-joined), one row per distinct shingle:
    * (doc_id, s). Documents with fewer than n tokens yield zero shingles
    * (guard required: sequence(1, size-(n-1)) DESCENDS when size<n, and
    * slice(toks, 0, n) throws at runtime — matches the oracle's
    * generate_series(1, len-(n-1)) empty-list semantics). */
  def shingles(documents: DataFrame, n: Int = 3): DataFrame = {
    val toks = split(col("text"), " ")
    val starts = when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    documents.select(
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
    * (da, db, jac — rounded 4dp). Joins on shared shingles, so disjoint
    * documents never form a candidate pair. */
  def jaccardPairs(documents: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(documents, n)
    val card = sh.groupBy(col("doc_id")).agg(count("*").as("c"))
    val inter = sh.toDF("da", "s").join(sh.toDF("db", "s2"),
        col("s") === col("s2") && col("da") < col("db"))
      .groupBy("da", "db").agg(count("*").as("i"))
    inter
      .join(card.toDF("da2", "ca"), col("da") === col("da2"))
      .join(card.toDF("db2", "cb"), col("db") === col("db2"))
      .withColumn("jacx", col("i").cast("double") / (col("ca") + col("cb") - col("i")))
      .filter(col("jacx") >= threshold)
      .select(col("da"), col("db"), round(col("jacx"), 4).as("jac"))
  }

  /** MinHash signatures: numHashes independent min-hashes per document over
    * its shingle set, as (doc_id, sig array<bigint>). Hash family:
    * xxhash64(seedᵢ, shingle). */
  def minhashSignatures(documents: DataFrame, n: Int = 3, numHashes: Int = 16): DataFrame = {
    val sh = shingles(documents, n)
    val mins = (0 until numHashes).map(k => min(xxhash64(lit(k), col("s"))).as(s"h$k"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
  }

  /** LSH candidate pairs from banded signatures, verified with the estimated
    * Jaccard (fraction of agreeing hash positions): (da, db, est_jac).
    * bands × rowsPerBand must equal the signature length. */
  /** Banding default 8×2: detection probability 1-(1-j²)^8 ≈ 0.9997 at
    * j = 0.8 (4×4 banding would miss ~12% of 0.8-Jaccard pairs). */
  def minhashPairs(documents: DataFrame, n: Int = 3, numHashes: Int = 16,
                   bands: Int = 8, estThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minhashSignatures(documents, n, numHashes)
    // band keys: hash of each signature slice — candidate iff some band agrees
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, concat_ws(",", slice(col("sig"), b * rows + lit(1), lit(rows))))))
        .as(Seq("band", "bkey")))
    val cands = banded.select(col("doc_id").as("da"), col("sig").as("siga"), col("band"), col("bkey"))
      .join(banded.select(col("doc_id").as("db"), col("sig").as("sigb"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select("da", "db", "siga", "sigb").distinct()
    cands
      .withColumn("est_jac",
        aggregate(zip_with(col("siga"), col("sigb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jac") >= estThreshold)
      .select("da", "db", "est_jac")
  }

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

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxDist, using
    * 16-bit chunk equality as the LSH (pigeonhole: dist ≤ 3 ⇒ ≥ 1 of 4
    * chunks equal): (da, db, dist). */
  def simhashPairs(documents: DataFrame, n: Int = 3, maxDist: Int = 3): DataFrame = {
    val fp = simhash(documents, n)
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

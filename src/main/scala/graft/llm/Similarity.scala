package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineNative

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: brute force is the correctness baseline — a broadcast of
  * the (small) probe set against a map-side scan of the corpus, no shuffle
  * until top-k. The bucketed variant ([[ivfTopK]]) is the 100 TB path: a
  * deterministic coarse quantizer (sign pattern of leading dimensions)
  * partitions the corpus; probes only scan their own cell, cutting the
  * scanned fraction to ~1/2^bits, and the cell id is a plain column — so it
  * can be a partition key at write time (partition pruning does the rest).
  */
object Similarity {

  /** Brute-force cosine top-k of `corpus` against one probe row
    * (vec_id = probeId): (vec_id, cos rounded 3dp), best first. */
  def cosineTopK(embeddings: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("p"))
    embeddings.filter(col("vec_id") =!= probeId)
      .join(broadcast(probe))
      .select(col("vec_id"), round(cosineNative(col("embedding"), col("p")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Brute-force top-k for EACH of several probes, via per-probe window
    * rank: (probe_id, rank, vec_id, cos). */
  def multiProbeTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int): DataFrame = {
    val probes = embeddings.filter(col("vec_id").isInCollection(probeIds))
      .select(col("vec_id").as("probe_id"), col("embedding").as("p"))
    val scored = embeddings.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), round(cosineNative(col("embedding"), col("p")), 3).as("cos"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "vec_id", "cos")
  }

  /** Deterministic IVF-style cell id: sign pattern of the first `bits`
    * dimensions packed into an INT. */
  def ivfCell(embeddings: DataFrame, bits: Int = 3): DataFrame = {
    val cell = (0 until bits).map { d =>
      when(element_at(col("embedding"), d + 1) > 0f, 1 << (bits - 1 - d)).otherwise(0)
    }.reduce(_ + _)
    embeddings.withColumn("cell", cell)
  }

  /** Bucketed ANN: search only the probe's IVF cell: (vec_id, cell, cos). */
  def ivfTopK(embeddings: DataFrame, probeId: Long, k: Int, bits: Int = 3): DataFrame = {
    val cells = ivfCell(embeddings, bits)
    val probe = cells.filter(col("vec_id") === probeId)
      .select(col("embedding").as("p"), col("cell").as("pcell"))
    cells.join(broadcast(probe), col("cell") === col("pcell") && col("vec_id") =!= probeId)
      .select(col("vec_id"), col("cell"),
        round(cosineNative(col("embedding"), col("p")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Persist an IVF index: the corpus written parquet-partitioned BY CELL
    * (so a probe read scans only its cell's files — at 100 TB the cell id
    * is the partition key and Spark's partition pruning turns an ANN probe
    * into a ~1/2^bits scan with no shuffle), PLUS a probe-resolution
    * SIDECAR: (vec_id, cell, embedding) range-partitioned and sorted by
    * vec_id, so resolving a probe id is a row-group-pruned point lookup
    * (vec_id equality pushed to the parquet footer stats), never a full
    * index scan. */
  def writeIvfIndex(embeddings: DataFrame, path: String, bits: Int = 3): Unit = {
    val cells = ivfCell(embeddings, bits)
    cells.write.mode("overwrite").partitionBy("cell").parquet(path)
    cells.select("vec_id", "cell", "embedding")
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").parquet(sidecarPath(path))
  }

  /** Probe-resolution sidecar location for an index at `path`. */
  def sidecarPath(path: String): String = path.stripSuffix("/") + "_probes"

  /** Probe a persisted IVF index by probe id: resolve the probe against
    * the vec_id-sorted SIDECAR (a pushdown point lookup — file- and
    * row-group-pruned by the parquet min/max stats, O(one row group) at
    * any index size), then scan ONLY the probe's cell via partition
    * pruning (verify with `PartitionFilters` in the plan):
    * (vec_id, cell, cos). */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     probeId: Long, k: Int): DataFrame = {
    val probeRow = spark.read.parquet(sidecarPath(path))
      .filter(col("vec_id") === probeId)
      .select("embedding", "cell").collect().headOption
      .getOrElse(throw new NoSuchElementException(
        s"probe vec_id=$probeId not found in IVF index at $path"))
    val pcell = probeRow.getInt(probeRow.fieldIndex("cell"))
    val p = probeRow.getSeq[Float](probeRow.fieldIndex("embedding")).toArray
    ivfTopKIndexed(spark, path, p, pcell, probeId, k)
  }

  /** Probe a persisted IVF index with an EXPLICIT query vector (no lookup
    * at all — the shape for out-of-corpus queries): the cell comes from
    * the same deterministic quantizer used at write time. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     probe: Array[Float], k: Int, bits: Int): DataFrame = {
    val pcell = (0 until bits).map { d =>
      if (probe(d) > 0f) 1 << (bits - 1 - d) else 0
    }.sum
    ivfTopKIndexed(spark, path, probe, pcell, excludeId = -1L, k)
  }

  private def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                             probe: Array[Float], pcell: Int, excludeId: Long,
                             k: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("cell") === pcell && col("vec_id") =!= excludeId)
      .select(col("vec_id"), col("cell"),
        round(cosineNative(col("embedding"),
          lit(probe).cast("array<float>")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)

  /** Spherical k-means centroids over the embedding column (Lloyd's
    * algorithm), the LEARNED coarse quantizer for IVF — unlike [[ivfCell]]
    * (fixed sign-bit cells) the cells adapt to the corpus, which is what a
    * production IVF index uses (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", the IVF part).
    *
    * Scale shape per iteration:
    *  - ASSIGN is a pure map-side pass: the k centroids (k × dims doubles —
    *    tiny by construction) are collected to the driver and inlined as a
    *    literal array of (score, cid) structs; `array_max` picks the argmax
    *    centroid per row in codegen. No shuffle, no window, no join.
    *  - UPDATE shuffles only (cell, dim) partial sums — k·dims keys, with
    *    map-side partial aggregation — never the embeddings themselves.
    *  - centroids re-normalize on the driver (spherical k-means: argmax
    *    dot == argmax cosine once centroids are unit-norm).
    * Deterministic init (the k lowest-vec_id vectors), argmax ties break
    * on centroid id (struct comparison), fixed iteration count; results
    * are repeatable up to the fp merge order of the averaging shuffle
    * (why this is a ScalaTest-gated operator, not a DuckDB-oracle query).
    * Empty cells keep their previous centroid. Returns (cell, centroid). */
  def kmeansCentroids(embeddings: DataFrame, k: Int = 8,
                      iters: Int = 5): Array[(Int, Array[Double])] = {
    graft.functions.expressions.GraftFunctions.register(embeddings.sparkSession)
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var centroids = embeddings.orderBy("vec_id").limit(k)
      .select(col("embedding")).collect()
      .zipWithIndex
      .map { case (r, i) => i -> normalize(r.getSeq[Float](0).map(_.toDouble).toArray) }
    val dims = centroids.headOption.map(_._2.length).getOrElse(0)
    for (_ <- 1 to iters) {
      val assigned = assignCells(embeddings, centroids)
      // UPDATE as ONE hash aggregate keyed by cell: a single fixed-buffer
      // vector-mean aggregate (k·(dims+1) doubles of partial state,
      // map-side partial agg) — the posexplode formulation shuffled n·dims
      // exploded rows through TWO exchanges plus a collect_list
      // re-assembly per cell
      val means = assigned
        .groupBy("cell")
        .agg(call_function("graft_vec_mean", col("embedding"), lit(dims))
          .as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> normalize(r.getSeq[Double](1).toArray))
        .toMap
      centroids = centroids.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    }
    centroids
  }

  /** Assign every row its nearest centroid (max cosine, ties to the lower
    * cell id) as a `cell` column. Map-side only: centroids are inlined as
    * a literal (score, cid) struct array and `array_max` does the argmax
    * in codegen — the assignment of a 100 TB corpus is one scan. */
  def assignCells(embeddings: DataFrame,
                  centroids: Array[(Int, Array[Double])]): DataFrame = {
    val scored = array(centroids.map { case (cid, c) =>
      struct(
        cosineNative(col("embedding"),
          lit(c.map(_.toFloat)).cast("array<float>")).as("s"),
        lit(-cid).as("negcid")) // struct max = lexicographic: score, then LOWER cid
    }: _*)
    embeddings.withColumn("cell", -array_max(scored).getField("negcid"))
  }

  /** IVF ANN over LEARNED cells: k-means quantizer, probe scans only its
    * own cell, exact-cosine rerank: (vec_id, cell, cos). Same downstream
    * shape as [[ivfTopK]] — the cell id is a plain int column, so at write
    * time it's a parquet partition key and probing is partition-pruned. */
  def ivfTopKKmeans(embeddings: DataFrame, probeId: Long, k: Int,
                    cells: Int = 8, iters: Int = 5): DataFrame = {
    val model = kmeansCentroids(embeddings, cells, iters)
    val assigned = assignCells(embeddings, model)
    val probe = assigned.filter(col("vec_id") === probeId)
      .select(col("embedding").as("p"), col("cell").as("pcell"))
    assigned.join(broadcast(probe), col("cell") === col("pcell") && col("vec_id") =!= probeId)
      .select(col("vec_id"), col("cell"),
        round(cosineNative(col("embedding"), col("p")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF ANN with nprobe > 1 (the standard IVF recall knob): scan the
    * `nprobe` cells whose centroids are nearest the probe, not just the
    * top one — recall rises toward exact as nprobe → cells while the
    * scanned fraction stays ≈ nprobe/cells. The cell set is computed
    * driver-side from the tiny centroid model; the scan is a single
    * `cell IN (...)` filter, so on a cell-partitioned index it stays
    * partition-pruned. Probe excluded from results: (vec_id, cell, cos). */
  def ivfTopKKmeansMultiProbe(embeddings: DataFrame, probeId: Long, k: Int,
                              cells: Int = 8, iters: Int = 5,
                              nprobe: Int = 2): DataFrame = {
    val model = kmeansCentroids(embeddings, cells, iters)
    val assigned = assignCells(embeddings, model)
    val probeRows = assigned.filter(col("vec_id") === probeId)
      .select(col("embedding").as("p"), col("cell").as("pcell")).collect()
    if (probeRows.isEmpty)
      // sibling semantics (ivfTopKKmeans, hyperplaneTopK): an absent probe
      // id yields an empty result through the join, not an exception
      return assigned.select(col("vec_id"), col("cell"), lit(0.0).as("cos")).limit(0)
    val pvec = probeRows(0).getSeq[Float](0).toArray
    val assignedCell = probeRows(0).getInt(1)
    val np = math.sqrt(pvec.map(x => x.toDouble * x).sum)
    def cos(c: Array[Double]) =
      pvec.map(_.toDouble).zip(c.map(_.toFloat.toDouble))
        .map { case (a, b) => a * b }.sum / np
    // the probe's OWN cell is pinned into the scan set: this driver-side
    // ranking re-accumulates the dot in a different fp order than the
    // codegen argmax in assignCells, so on a near-tie the ranking alone
    // could exclude the cell the probe actually lives in
    val ranked = model.map { case (cid, c) => (cos(c), cid) }
      .sortBy { case (s, cid) => (-s, cid) }.map(_._2)
    val probeCells =
      if (ranked.take(nprobe).contains(assignedCell)) ranked.take(nprobe)
      else ranked.take(nprobe - 1) :+ assignedCell
    val probe = assigned.filter(col("vec_id") === probeId)
      .select(col("embedding").as("p"))
    assigned.filter(col("cell").isInCollection(probeCells.toSeq) && col("vec_id") =!= probeId)
      .join(broadcast(probe))
      .select(col("vec_id"), col("cell"),
        round(cosineNative(col("embedding"), col("p")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Persist a LEARNED-quantizer IVF index: k-means cells as the parquet
    * partition key (same pruned-probe layout as [[writeIvfIndex]]), the
    * vec_id-sorted probe sidecar, and a `_centroids` sidecar holding the
    * model — everything a probe needs without re-learning. */
  def writeIvfIndexKmeans(embeddings: DataFrame, path: String,
                          cells: Int = 8, iters: Int = 5): Unit = {
    val model = kmeansCentroids(embeddings, cells, iters)
    val assigned = assignCells(embeddings, model)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    assigned.select("vec_id", "cell", "embedding")
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").parquet(sidecarPath(path))
    val spark = embeddings.sparkSession
    import spark.implicits._
    model.toSeq.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(centroidsPath(path))
  }

  /** Centroid-model sidecar location for a k-means IVF index at `path`. */
  def centroidsPath(path: String): String = path.stripSuffix("/") + "_centroids"

  /** Probe a persisted k-means IVF index with an explicit query vector:
    * the probe's cell is the argmax-cosine centroid from the `_centroids`
    * sidecar (tiny driver-side read — the same assignment rule as
    * [[assignCells]]), then ONLY that cell is scanned via partition
    * pruning: (vec_id, cell, cos). */
  def ivfTopKIndexedKmeans(spark: org.apache.spark.sql.SparkSession, path: String,
                           probe: Array[Float], k: Int): DataFrame = {
    val model = spark.read.parquet(centroidsPath(path)).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val np = math.sqrt(probe.map(x => x.toDouble * x).sum)
    // float-cast the centroids like assignCells does (cosineNative sees
    // float literals), so the probe lands in the same cell on near-ties
    def cos(c: Array[Double]) =
      probe.map(_.toDouble).zip(c.map(_.toFloat.toDouble))
        .map { case (a, b) => a * b }.sum / np
    val pcell = model.map { case (cid, c) => (cos(c), cid) }
      .reduceLeft((p, q) => if (q._1 > p._1 || (q._1 == p._1 && q._2 < p._2)) q else p)._2
    spark.read.parquet(path)
      .filter(col("cell") === pcell)
      .select(col("vec_id"), col("cell"),
        round(cosineNative(col("embedding"), lit(probe).cast("array<float>")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Random-hyperplane (SimHash-for-cosine) LSH bucket id: `bits` sign
    * bits of dot products with deterministic pseudo-random hyperplanes.
    * Plane k's component for dimension d is ((a_k·(d+1)+b_k) mod P)/P − 0.5
    * (the [[Dedup.AB]] affine family — portable, so the DuckDB oracle can
    * build the identical planes). Unlike [[ivfCell]] (leading-dimension
    * signs), hyperplane buckets use EVERY dimension, so bucket collision
    * probability tracks cosine similarity — the textbook LSH guarantee.
    *
    * REGISTRATION CONTRACT: the returned Column calls the codegen
    * `graft_hyperplane_bucket` function (one fused loop over all bits —
    * the HOF formulation it replaced was interpreted per element), which
    * must be registered on the session that analyzes the plan:
    * `GraftFunctions.register(spark)` (done by `graft.core.Tables
    * .register` and by every Similarity/Dedup entry point). Composing the
    * bare Column on a fresh session without registering fails analysis
    * with "undefined function" — use [[withHyperplaneBucket]] when you
    * hold a DataFrame, which registers for you. */
  def hyperplaneBucket(emb: org.apache.spark.sql.Column, bits: Int = 8,
                       dims: Int = 64, planeOffset: Int = 0): org.apache.spark.sql.Column =
    call_function("graft_hyperplane_bucket", emb, lit(bits), lit(dims), lit(planeOffset))

  /** [[hyperplaneBucket]] with the registration handled: appends the
    * bucket column to `df`, registering the codegen function on df's own
    * session first (the same pattern as `Sketches.frequentItems`). */
  def withHyperplaneBucket(df: DataFrame, embCol: String, out: String = "bucket",
                           bits: Int = 8, dims: Int = 64,
                           planeOffset: Int = 0): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(df.sparkSession)
    df.withColumn(out, hyperplaneBucket(col(embCol), bits, dims, planeOffset))
  }

  /** Hyperplane-LSH ANN: score only the probe's bucket, exact-cosine
    * rerank: (vec_id, bucket, cos). The 100 TB shape matches [[ivfTopK]]
    * (bucket id is a plain column → partition key at write time; probe
    * broadcast; no shuffle before top-k) with ~1/2^bits of the corpus
    * scanned per probe and collision probability (1 − θ/π)^bits. */
  def hyperplaneTopK(embeddings: DataFrame, probeId: Long, k: Int,
                     bits: Int = 8): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(embeddings.sparkSession)
    val bucketed = embeddings.withColumn("bucket", hyperplaneBucket(col("embedding"), bits))
    val probe = bucketed.filter(col("vec_id") === probeId)
      .select(col("embedding").as("p"), col("bucket").as("pb"))
    bucketed.join(broadcast(probe), col("bucket") === col("pb") && col("vec_id") =!= probeId)
      .select(col("vec_id"), col("bucket"),
        round(cosineNative(col("embedding"), col("p")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Multi-probe hyperplane LSH: additionally search every bucket one sign
    * flip away from the probe's (the 1-bit Hamming neighbors) — the
    * standard recall booster that trades bits+1 bucket scans for extra
    * hash tables. Same broadcast/no-shuffle shape as [[hyperplaneTopK]]:
    * (vec_id, bucket, cos). */
  def hyperplaneMultiProbeTopK(embeddings: DataFrame, probeId: Long, k: Int,
                               bits: Int = 4): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(embeddings.sparkSession)
    val bucketed = embeddings.withColumn("bucket", hyperplaneBucket(col("embedding"), bits))
    val probeBuckets = array(
      (col("bucket") +: (0 until bits).map(j =>
        col("bucket").bitwiseXOR(lit(1 << j)))): _*)
    val probe = bucketed.filter(col("vec_id") === probeId)
      .select(col("embedding").as("p"), explode(probeBuckets).as("pb"))
    bucketed.join(broadcast(probe), col("bucket") === col("pb") && col("vec_id") =!= probeId)
      .select(col("vec_id"), col("bucket"),
        round(cosineNative(col("embedding"), col("p")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding near-duplicate pairs at scale: hyperplane-LSH bucketing →
    * within-bucket pairs (va < vb) → exact-cosine verify ≥ threshold:
    * (va, vb, cos). The candidate join is BUCKET-equality (never
    * all-pairs), so at 100 TB it shuffles on a primitive int key and each
    * bucket's pair expansion is local — the same collapse-then-candidate
    * shape as [[Dedup.nearDupPairs]] for text. Recall is tunable via
    * `bits` (collision prob (1 − θ/π)^bits); multi-table OR-amplification
    * composes by unioning calls with different plane offsets. */
  def nearDupEmbPairs(embeddings: DataFrame, threshold: Double,
                      bits: Int = 4): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(embeddings.sparkSession)
    val bucketed = graft.core.Tables.spread(embeddings, "vec_id")
      .withColumn("bucket", hyperplaneBucket(col("embedding"), bits))
    val a = bucketed.select(col("bucket"), col("vec_id").as("va"), col("embedding").as("ea"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, Seq("bucket"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(cosineNative(col("ea"), col("eb")), 3).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("cos").desc, col("va"), col("vb"))
  }

  /** OR-amplified embedding near-dup pairs: `tables` independent
    * hyperplane families (disjoint [[Dedup.AB]] slices). A pair is a
    * candidate if it collides in ANY table, so the miss probability drops
    * from (1 − (1 − θ/π)^bits) complement to its `tables`-th power — the
    * published guarantee for multi-table LSH. Candidates are deduped on
    * the primitive (va, vb) key BEFORE the exact-cosine verify (one
    * cosine per pair, not per table hit); the join stays
    * (table, bucket)-equality — never all-pairs. */
  def nearDupEmbPairsK(embeddings: DataFrame, threshold: Double,
                       bits: Int = 4, tables: Int = 4): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(embeddings.sparkSession)
    require(tables * bits <= Dedup.AB.length,
      s"tables*bits must be <= ${Dedup.AB.length}")
    val bucketed = graft.core.Tables.spread(embeddings, "vec_id")
      .select(col("vec_id"), col("embedding"),
        posexplode(array((0 until tables).map(t =>
          hyperplaneBucket(col("embedding"), bits, planeOffset = t * bits)): _*))
          .as(Seq("tbl", "bucket")))
    val a = bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("va"), col("embedding").as("ea"))
    val b = bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("vb"), col("embedding").as("eb"))
    // verify map-side, dedup after: the cosine is identical for every
    // table hit of a pair, so computing it per hit (cheap codegen over
    // rows the join already materialized) and shuffling only the
    // surviving (va, vb, cos) triples beats carrying 2 x 256-byte
    // embeddings through the dedup groupBy — and the threshold filter
    // runs BEFORE the shuffle, dropping most candidates map-side
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(cosineNative(col("ea"), col("eb")), 3).as("cos0"))
      .filter(col("cos0") >= threshold)
      .groupBy("va", "vb").agg(max("cos0").as("cos"))
      .orderBy(col("cos").desc, col("va"), col("vb"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540 — public paper): k-means-cluster the embeddings, find
    * cosine-≥-threshold pairs WITHIN each cluster only, connected-component
    * the pair graph, keep one document per component (minimum vec_id —
    * deterministic; the paper found keep-policy choice barely matters).
    *
    * Scale shape: cluster assignment is one map-side scan (centroids are a
    * broadcast literal), pair generation is a key-equality self-join on the
    * cell id — per-cell work is (n/k)² instead of n², which is exactly the
    * paper's reason for clustering first; scale `cells` with the corpus so
    * cells stay bounded. Components use the O(log n)-round star contraction.
    * Cross-cluster near-dups are invisible by design (the paper's stated
    * recall trade-off); [[nearDupEmbPairsK]] is the OR-amplified alternative
    * when cross-bucket recall matters more than cost.
    *
    * Returns the KEPT rows (input schema unchanged). */
  def semanticDedup(embeddings: DataFrame, threshold: Double,
                    cells: Int = 8, iters: Int = 5): DataFrame =
    semanticDedupWithModel(embeddings, threshold,
      kmeansCentroids(embeddings, cells, iters))

  /** [[semanticDedup]] with a caller-supplied quantizer model — lets the
    * caller share ONE trained model between the dedup and any
    * post-condition verification (the LLM-SEMDEDUP oracle re-checks
    * "no two kept docs in a cell are near-dups" against the exact
    * centroids the dedup used). */
  def semanticDedupWithModel(embeddings: DataFrame, threshold: Double,
                             model: Array[(Int, Array[Double])]): DataFrame =
    semanticDedupFromPairs(embeddings,
      cellNearDupPairs(embeddings, threshold, model))

  /** The component/keep half on a PRECOMPUTED (va, vb) edge list — lets
    * a caller cache the pairs once and share them between the dedup and
    * its verification (the LLM-SEMDEDUP oracle runs three checks over
    * the same edges; recomputing the cell self-join per check tripled
    * the query's cost). */
  def semanticDedupFromPairs(embeddings: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = Dedup.connectedComponentsStar(pairs)
    val drop = cc.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"))
    embeddings.join(drop, Seq("vec_id"), "left_anti")
  }

  /** The within-cell near-dup edge list (va < vb) SemDeDup components
    * are built from — exposed so verification can reuse it. */
  def cellNearDupPairs(embeddings: DataFrame, threshold: Double,
                       model: Array[(Int, Array[Double])]): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(embeddings.sparkSession)
    val assigned = assignCells(graft.core.Tables.spread(embeddings, "vec_id"), model)
    val a = assigned.select(col("cell"), col("vec_id").as("va"), col("embedding").as("ea"))
    val b = assigned.select(col("cell"), col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, Seq("cell"))
      .filter(col("va") < col("vb"))
      .filter(cosineNative(col("ea"), col("eb")) >= threshold)
      .select(col("va"), col("vb"))
  }

  /** Top-n most similar corpus pairs (va < vb) by cosine: (va, vb, cos).
    * All-pairs — correctness baseline; the LSH/IVF operators above are the
    * scale path for this shape too. */
  def topPairs(embeddings: DataFrame, n: Int): DataFrame = {
    // spread the stream side: the broadcast-nested-loop pair scan would
    // otherwise run on one core for a single-split corpus (Tables.spread)
    val a = graft.core.Tables.spread(embeddings, "vec_id")
      .select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = embeddings.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(broadcast(b), col("va") < col("vb"))
      .select(col("va"), col("vb"), round(cosineNative(col("ea"), col("eb")), 3).as("cos"))
      .orderBy(col("cos").desc, col("va"), col("vb"))
      .limit(n)
  }
}

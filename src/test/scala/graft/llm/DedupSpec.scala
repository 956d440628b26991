package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def docs = { tables(); spark.table("documents") }

  test("exact duplicates: none at sf0.001 (FIXTURES.md quirk #4)") {
    assert(Dedup.exactDuplicates(docs).count() === 0)
  }

  test("shingles: count = max(n_tokens - 2, ...) distinct 3-grams") {
    val sh = Dedup.shingles(docs, 3).groupBy("doc_id").agg(count("*").as("c"))
    val n = docs.select(size(split(col("text"), " ")).as("nt"))
    // distinct-shingle count can be below n-2 (repeats) but never above
    val bad = sh.join(docs.select(col("doc_id"), size(split(col("text"), " ")).as("nt")), "doc_id")
      .filter(col("c") > col("nt") - 2)
    assert(bad.count() === 0)
  }

  test("shingles: documents shorter than n tokens yield zero shingles") {
    import spark.implicits._
    val short = Seq((1L, "one"), (2L, "two words"), (3L, "exactly three tokens"),
      (4L, "now four whole tokens")).toDF("doc_id", "text")
    val sh = Dedup.shingles(short, 3).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.get(1L).isEmpty && sh.get(2L).isEmpty)
    assert(sh(3L) === 1L && sh(4L) === 2L)
    // and the pair pipelines survive a short-doc corpus end-to-end
    assert(Dedup.jaccardPairs(short, 3, 0.0).count() === 0)
    assert(Dedup.simhash(short, 3).count() === 2)
  }

  test("MinHash-LSH recall: finds every exact-Jaccard pair >= 0.8") {
    val truth = Dedup.jaccardPairs(docs, 3, 0.8).select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minhashPairs(docs, 3, 16, 8, 0.5).select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dup pairs")
    val missed = truth -- found
    assert(missed.isEmpty, s"LSH missed ${missed.size} of ${truth.size} true pairs: $missed")
  }

  test("MinHash estimate tracks exact Jaccard within 0.35") {
    val est = Dedup.minhashPairs(docs, 3, 16, 8, 0.5)
    val exact = Dedup.jaccardPairs(docs, 3, 0.0)
    val joined = est.join(exact, Seq("da", "db"))
      .select(abs(col("est_jac") - col("jac")).as("err"))
      .agg(max("err")).collect()(0).getDouble(0)
    assert(joined <= 0.35, s"worst |est - exact| = $joined")
  }

  test("SimHash: pair distances verified, near-dups separate from random pairs") {
    val fps = Dedup.simhash(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(fps(a) ^ fps(b))

    // every returned pair's distance matches the direct fingerprint XOR
    val pairs = Dedup.simhashPairs(docs, 3, 3).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getInt(2) === dist(r.getLong(0), r.getLong(1)))
      assert(r.getInt(2) <= 3)
    }

    // statistical separation: >=0.9-Jaccard near-dups sit far below the
    // ~32-bit expectation of unrelated pairs (no hard Hamming<=3 guarantee
    // at 0.9 — ~10% differing shingles flips more than 3 of 64 bits)
    val truth = Dedup.jaccardPairs(docs, 3, 0.9).select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(truth.nonEmpty)
    val nearAvg = truth.map { case (a, b) => dist(a, b) }.sum.toDouble / truth.length
    val ids = fps.keys.toArray.sorted
    val randomAvg = ids.take(50).flatMap(a => ids.takeRight(50).filter(_ > a).take(2)
      .map(b => dist(a, b))).sum.toDouble / 100
    assert(nearAvg < 12, s"near-dup avg Hamming $nearAvg too high")
    assert(nearAvg < randomAvg / 2, s"no separation: near=$nearAvg random=$randomAvg")
  }

  test("nearDupPairs: exact-dup collapse yields the unique-corpus pairs") {
    // 5 exact clones of every document (distinct ids) — the clone-cluster
    // candidate blow-up case
    val cloned = (0 until 5).map { i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionAll _)
    val viaCollapse = Dedup.nearDupPairs(cloned, 3, 16, 8, 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unique = Dedup.minhashPairs(docs, 3, 16, 8, 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // representatives are the original ids (min per digest), so the pair
    // set over representatives equals the unique-corpus pair set
    assert(viaCollapse === unique)
  }

  test("SimHashBalanceAgg: partial-buffer merge across partitions equals single-partition result") {
    // spread-by-doc keeps each doc's shingles partition-local, so the
    // oracle path may never exercise merge()/serialize(). Force it: the
    // same projected-hash rows round-robin across 16 partitions must
    // produce identical fingerprints to a single partition.
    import org.apache.spark.sql.functions._
    tables()
    graft.functions.expressions.GraftFunctions.register(spark)
    val g = Dedup.shingles(spark.table("documents"), 3)
      .select(col("doc_id"), Dedup.portableHash(col("s")).as("hr"))
      .select(col("doc_id"),
        ((col("hr") * Dedup.AB(0)._1 + Dedup.AB(0)._2) % Dedup.P).as("g1"),
        ((col("hr") * Dedup.AB(1)._1 + Dedup.AB(1)._2) % Dedup.P).as("g2"))
    def fps(df: org.apache.spark.sql.DataFrame) = df.groupBy("doc_id")
      .agg(call_function("graft_simhash_balance", col("g1"), col("g2")).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val spanned = fps(g.repartition(16)) // doc rows span partitions → merge path
    val local = fps(g.coalesce(1))       // single buffer per doc → update path only
    assert(spanned === local)
    assert(spanned.nonEmpty)
  }

  test("deterministic across runs") {
    val a = canon(Dedup.minhashSignatures(docs).orderBy("doc_id").limit(10))
    val b = canon(Dedup.minhashSignatures(docs).orderBy("doc_id").limit(10))
    assert(a === b)
  }

  test("connected components: transitive clusters with min-member ids") {
    import spark.implicits._
    // two components: {1,2,3,4} via a path (1≈2, 2≈3, 3≈4 — 1 and 4 never
    // pair directly) and {10,11}; 99 is isolated (no pair → absent)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("da", "db")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long path needs diameter rounds, still converges") {
    import spark.implicits._
    // a 12-node path, edges listed high-to-low so labels must walk the
    // whole chain; plus reversed-endpoint edges (db < da) to prove the
    // symmetrization isn't order-sensitive
    val edges = (1L until 12L).map(i => if (i % 2 == 0) (i + 1, i) else (i, i + 1))
    val got = Dedup.connectedComponents(edges.toDF("da", "db"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 12 && got.forall(_._1 === 1L))
  }

  test("connected components: empty pair set yields empty clustering") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Dedup.connectedComponents(empty).count() === 0)
  }

  test("connected components: random graphs match a driver-side union-find") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // reference implementation: classic union-find with path compression
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // root = min of component by construction (always parent the larger)
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      touched.map(x => x -> find(x.toInt).toLong).toMap
    }
    val n = 60
    val genEdges = Gen.listOf(for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
    } yield (a.toLong, b.toLong))
    (0 until 8).foreach { i =>
      val edges = genEdges.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong))
        .getOrElse(Nil)
      if (edges.nonEmpty) {
        val got = Dedup.connectedComponents(edges.toDF("da", "db"))
          .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
        assert(got === unionFind(n, edges), s"seed $i, ${edges.length} edges")
      }
    }
  }

  test("stop-shingle cap: hot shingles cut from candidates, recall-only trade-off") {
    import spark.implicits._
    // every doc ends with the same boilerplate phrase — one ubiquitous
    // shingle with a posting list of 42 (the hot-key shape: 42² candidate
    // rows from that single posting without the cap)
    val boiler = "common legal boilerplate"
    val corpus = ((1 to 40).map(i => (i.toLong, s"u${i}a u${i}b u${i}c u${i}d $boiler")) ++ Seq(
      (100L, s"x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 $boiler"),
      (101L, s"x1 x2 x3 x4 x5 x6 x7 x8 x9 y10 $boiler"))).toDF("doc_id", "text")

    // the ubiquitous shingle is flagged; nothing else reaches the cap
    val hot = Dedup.hotShingles(corpus, n = 3, cap = 10).collect()
    assert(hot.map(_.getString(0)).toSeq === Seq(boiler))
    assert(hot.head.getLong(1) === 42L)

    val uncapped = Dedup.jaccardPairs(corpus, n = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val capped = Dedup.jaccardPairs(corpus, n = 3, threshold = 0.4, maxPostingList = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the true near-dup pair survives the cut (its overlap is private
    // shingles), every boilerplate-only pair stays absent
    assert(uncapped.map(p => (p._1, p._2)).toSet === Set((100L, 101L)))
    assert(capped.map(p => (p._1, p._2)).toSet === Set((100L, 101L)))
    // lower-bound property: the capped jac can only shrink (the pair's
    // shared boilerplate shingle no longer counts toward the intersection)
    assert(capped.head._3 <= uncapped.head._3)
    assert(capped.head._3 >= 0.4)
  }

  test("prefix-filtered jaccard equals the posting-list join bit-for-bit") {
    for (t <- Seq(0.8, 0.5)) {
      val full = Dedup.jaccardPairs(docs, 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.jaccardPairsPrefix(docs, 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref === full, s"t=$t: prefix variant diverged")
    }
  }

  test("prefix filter: boilerplate corpus — identical pairs, and the hot shingle never generates candidates") {
    import spark.implicits._
    val boiler = "common header boilerplate"
    val corpus = ((1 to 40).map(i =>
      (i.toLong, s"p${i}a p${i}b p${i}c p${i}d $boiler")) ++ Seq(
      (100L, s"z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 $boiler"),
      (101L, s"z1 z2 z3 z4 z5 z6 z7 z8 z9 w10 $boiler"))).toDF("doc_id", "text")
    val full = Dedup.jaccardPairs(corpus, 3, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.jaccardPairsPrefix(corpus, 3, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref === full && pref.map(p => (p._1, p._2)) === Set((100L, 101L)))
    // the ubiquitous shingle has the LARGEST df, so it sorts to the back
    // of every prefix order — with t=0.4 the docs' prefixes stop well
    // before it, and no boilerplate-only candidate pair is ever generated
    // (the equality above plus this structural check pin the mechanism)
    val sh = Dedup.shingles(corpus, 3)
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val hot = dfreq.orderBy(col("df").desc).select("s").limit(1)
      .collect()(0).getString(0)
    assert(hot.contains("common") || hot.contains("header"))
  }

  test("prefix filter: short docs and threshold 1.0 behave") {
    import spark.implicits._
    val short = Seq((1L, "one"), (2L, "two words"),
      (3L, "exactly three tokens here"), (4L, "exactly three tokens here"))
      .toDF("doc_id", "text")
    // exact clones at t=1.0: prefix length = |A| - |A| + 1 = 1, still found
    val got = Dedup.jaccardPairsPrefix(short, 3, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((3L, 4L, 1.0)))
  }

  test("containment: catches a quoted probe inside a long doc that Jaccard misses") {
    import spark.implicits._
    val probeText = "the quick brown fox jumps over the lazy dog"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, probeText),                       // the benchmark probe
      (2L, s"$filler $probeText"),           // long doc QUOTING the probe
      (3L, filler),                          // unrelated long doc
      (4L, "the quick brown fox naps")       // small partial overlap
    ).toDF("doc_id", "text")
    val probes = corpus.filter(col("doc_id") === 1L)
    val got = Dedup.containmentPairs(corpus, probes, n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 2 contains EVERY probe shingle -> containment 1.0; Jaccard for
    // the same pair is small (probe 7 shingles vs doc 67)
    assert(got.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(got.head._3 === 1.0)
    val jac = Dedup.jaccardPairs(corpus, n = 3, threshold = 0.0)
      .where(col("da") === 1L && col("db") === 2L)
      .collect().headOption.map(_.getDouble(2)).getOrElse(0.0)
    assert(jac < 0.2, s"expected tiny Jaccard for the quoted pair, got $jac")
    // asymmetry: the probe never pairs with itself, and thresholds hold
    assert(Dedup.containmentPairs(corpus, probes, n = 3, threshold = 0.5)
      .where(col("doc_id") === 3L).count() === 0)
  }

  test("star CC: transitive clusters, long path, reversed edges, empty set") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("da", "db")
    val got = Dedup.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))

    // 12-node path with mixed edge orientation: star contraction must not
    // need diameter rounds — log-ish round count
    val edges = (1L until 12L).map(i => if (i % 2 == 0) (i + 1, i) else (i, i + 1))
    val path = Dedup.connectedComponentsStar(edges.toDF("da", "db"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(path.length === 12 && path.forall(_._1 === 1L))
    assert(Dedup.lastCcRounds <= 6,
      s"star contraction took ${Dedup.lastCcRounds} rounds on a 12-path")

    val empty = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Dedup.connectedComponentsStar(empty).count() === 0)
  }

  test("star CC: random graphs match a driver-side union-find") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      touched.map(x => x -> find(x.toInt).toLong).toMap
    }
    val n = 60
    val genEdges = Gen.listOf(for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
    } yield (a.toLong, b.toLong))
    (0 until 8).foreach { i =>
      val edges = genEdges.apply(Gen.Parameters.default.withSize(40), Seed(100L + i))
        .getOrElse(Nil)
      if (edges.nonEmpty) {
        val got = Dedup.connectedComponentsStar(edges.toDF("da", "db"))
          .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
        assert(got === unionFind(n, edges), s"seed $i, ${edges.length} edges")
      }
    }
  }

  test("propagation CC falls back to star contraction when maxIter is too small") {
    import spark.implicits._
    // 30-node path: diameter 29 >> maxIter 3 — propagation alone cannot
    // converge; the fallback must still produce the exact clustering
    val edges = (1L until 30L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(edges.toDF("da", "db"), maxIter = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 30 && got.forall(_._1 === 1L))
  }

  test("dedupCorpus: keeps one representative per near-dup cluster, all singletons") {
    import spark.implicits._
    // exact clones (1,2), near-dups via transitive chain (3,4,5), singleton 6
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // exact clone of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near 3
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),     // near 3/4
      (6L, "completely different text about spark engines and parquet files")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(corpus,
        pairGen = d => Dedup.jaccardPairs(d, n = 3, threshold = 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 6L))
    // schema preserved
    assert(Dedup.dedupCorpus(corpus, d => Dedup.jaccardPairs(d, 3, 0.5))
      .columns.toSeq === Seq("doc_id", "text"))
  }

  test("connected components over jaccard pairs: every cluster member shares a pair chain") {
    val pairs = Dedup.jaccardPairs(docs, 3, 0.8).select("da", "db")
    val cc = Dedup.connectedComponents(pairs)
    // every paired node appears exactly once, and cluster_id is a member
    val nodes = pairs.select(col("da").as("n")).union(pairs.select(col("db").as("n"))).distinct()
    assert(cc.count() === nodes.count())
    assert(cc.join(nodes, cc("doc_id") === nodes("n")).count() === cc.count())
    val badRep = cc.select(col("cluster_id").as("n")).distinct()
      .join(nodes, Seq("n"), "left_anti")
    assert(badRep.count() === 0)
  }
}

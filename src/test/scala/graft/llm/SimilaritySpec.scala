package graft.llm

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private def embs = { tables(); spark.table("embeddings") }

  test("cosineTopK matches the SQL inventory twin (LLM-COSINE-TOPK)") {
    val dsl = canon(Similarity.cosineTopK(embs, 0L, 5))
    val sql = canon(spark.sql(graft.queries.Inventory.byId("LLM-COSINE-TOPK").sparkSql))
    assert(dsl === sql)
  }

  test("ivfTopK results all share the probe's cell and are cos-descending") {
    val rows = Similarity.ivfTopK(embs, 0L, 5).collect()
    assert(rows.nonEmpty)
    val cells = rows.map(_.getInt(1)).toSet
    assert(cells.size === 1)
    val cos = rows.map(_.getDouble(2))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }

  test("ivfTopK is a subset of brute-force ranking restricted to the cell") {
    val cells = Similarity.ivfCell(embs)
    val probeCell = cells.filter(cells("vec_id") === 0L).collect()(0).getAs[Int]("cell")
    val brute = Similarity.cosineTopK(embs, 0L, Int.MaxValue / 2)
    // brute-force ids that live in the probe cell, in order, top 5
    val cellIds = cells.filter(cells("cell") === probeCell).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val expect = brute.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(p => cellIds.contains(p._1)).take(5).map(_._1).toSeq
    val got = Similarity.ivfTopK(embs, 0L, 5).collect().map(_.getLong(0)).toSeq
    assert(got === expect)
  }

  test("hyperplaneTopK is brute-force ranking restricted to the probe's bucket") {
    import org.apache.spark.sql.functions.col
    val bucketed = embs.withColumn("bucket", Similarity.hyperplaneBucket(col("embedding"), 4))
    val probeBucket = bucketed.filter(col("vec_id") === 0L).collect()(0).getAs[Int]("bucket")
    val bucketIds = bucketed.filter(col("bucket") === probeBucket).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val expect = Similarity.cosineTopK(embs, 0L, Int.MaxValue / 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(p => bucketIds.contains(p._1)).take(5).map(_._1).toSeq
    val got = Similarity.hyperplaneTopK(embs, 0L, 5, bits = 4).collect()
    assert(got.map(_.getInt(1)).toSet === Set(probeBucket))
    assert(got.map(_.getLong(0)).toSeq === expect)
  }

  test("multiProbeTopK ranks are 1..k per probe") {
    val rows = Similarity.multiProbeTopK(embs, Seq(0L, 1L, 2L), 3).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.keySet === Set(0L, 1L, 2L))
    byProbe.values.foreach(g => assert(g.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3)))
  }

  test("topPairs is symmetric-safe: va < vb and ordered by cos desc") {
    val rows = Similarity.topPairs(embs, 10).collect()
    assert(rows.length === 10)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val cos = rows.map(_.getDouble(2))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }

  test("persisted IVF index: probe scans only its cell via partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.writeIvfIndex(embs, dir)
    val probed = Similarity.ivfTopKIndexed(spark, dir, probeId = 0L, k = 5)
    // same results as the in-memory cell-filtered scan
    assert(canon(probed) === canon(Similarity.ivfTopK(embs, 0L, 5)))
    // and the scan is partition-pruned to the probe's cell at the source
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "cell filter not pushed to partition pruning")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell not in PartitionFilters")

    // probe RESOLUTION goes through the vec_id-sorted sidecar with the
    // equality pushed to the parquet scan (row-group-pruned point lookup),
    // not a full scan of the cell-partitioned index
    import org.apache.spark.sql.functions.col
    val lookup = spark.read.parquet(Similarity.sidecarPath(dir))
      .filter(col("vec_id") === 0L)
    lookup.collect()
    val lplan = lookup.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(vec_id".r.findFirstIn(lplan).isDefined,
      s"vec_id point lookup not pushed down:\n$lplan")

    // the explicit-vector overload (out-of-corpus probe) agrees with the
    // id-resolved path up to the self-exclusion
    val probeVec = embs.filter(col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val byVec = Similarity.ivfTopKIndexed(spark, dir, probeVec, k = 6, bits = 3)
    val byVecIds = byVec.collect().map(_.getLong(0)).filterNot(_ == 0L).take(5)
    assert(byVecIds.toSeq === probed.collect().map(_.getLong(0)).toSeq)
  }

  test("k-means centroids: unit-norm, deterministic, objective improves with iterations") {
    val k = 4
    val m1 = Similarity.kmeansCentroids(embs, k, iters = 1)
    val m5 = Similarity.kmeansCentroids(embs, k, iters = 5)
    assert(m5.length === k)
    m5.foreach { case (_, c) =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    // repeatable up to fp merge order of the averaging shuffle: same data,
    // same init, same iterations -> same model within tolerance
    val m5b = Similarity.kmeansCentroids(embs, k, iters = 5)
    m5.zip(m5b).foreach { case ((_, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    // Lloyd's monotonicity: mean cosine to the assigned centroid never
    // degrades with more iterations
    def objective(model: Array[(Int, Array[Double])]): Double = {
      val cents = model.toMap
      embs.select("vec_id", "embedding").collect().map { r =>
        val x = r.getSeq[Float](1).map(_.toDouble).toArray
        val nx = math.sqrt(x.map(v => v * v).sum)
        cents.values.map(c => x.zip(c).map { case (a, b) => a * b }.sum / nx).max
      }.sum
    }
    assert(objective(m5) >= objective(m1) - 1e-9)
  }

  test("assignCells: every row gets its argmax-cosine centroid (ties to lower cell)") {
    val model = Similarity.kmeansCentroids(embs, 4, iters = 3)
    val assigned = Similarity.assignCells(embs, model)
      .select("vec_id", "embedding", "cell").collect()
    val cents = model.toMap
    assigned.foreach { r =>
      val x = r.getSeq[Float](1).map(_.toDouble).toArray
      val nx = math.sqrt(x.map(v => v * v).sum)
      def cos(c: Array[Double]) = x.zip(c).map { case (a, b) => a * b }.sum / nx
      val best = model.map { case (cid, c) => (cos(c), cid) }
        .reduceLeft((p, q) => if (q._1 > p._1 || (q._1 == p._1 && q._2 < p._2)) q else p)
      assert(r.getInt(2) === best._2,
        s"vec ${r.getLong(0)}: got cell ${r.getInt(2)}, want ${best._2}")
    }
  }

  test("persisted k-means IVF: pruned probe equals in-memory cell scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kivf").toString
    Similarity.writeIvfIndexKmeans(embs, dir, cells = 4, iters = 3)
    val probeVec = embs.filter(col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val probed = Similarity.ivfTopKIndexedKmeans(spark, dir, probeVec, k = 5)
    val rows = probed.collect()
    assert(rows.nonEmpty && rows.head.getLong(0) === 0L && rows.head.getDouble(2) === 1.0,
      "probe's own vector (cos 1.0) should rank first in its own cell")
    // same as scanning the stored cell in memory
    val pcell = rows.head.getInt(1)
    val model = Similarity.kmeansCentroids(embs, 4, iters = 3)
    val expected = Similarity.assignCells(embs, model)
      .filter(col("cell") === pcell)
      .select(col("vec_id"), col("cell"),
        org.apache.spark.sql.functions.round(
          graft.functions.VectorFunctions.cosineNative(col("embedding"),
            org.apache.spark.sql.functions.lit(probeVec).cast("array<float>")), 3).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
    assert(canon(probed) === canon(expected))
    // and the scan is partition-pruned to the probe's cell
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell not in PartitionFilters:\n$plan")
  }

  test("ivfTopKKmeansMultiProbe: nprobe=cells recovers brute force; recall never drops") {
    val k = 5
    val exact = Similarity.cosineTopK(embs, 0L, k).collect().map(_.getLong(0)).toSet
    def recallAt(nprobe: Int): Double = {
      val got = Similarity.ivfTopKKmeansMultiProbe(embs, 0L, k,
        cells = 4, iters = 3, nprobe = nprobe).collect().map(_.getLong(0)).toSet
      got.intersect(exact).size.toDouble / k
    }
    val r = (1 to 4).map(recallAt)
    // monotone non-decreasing recall in nprobe, and full scan == exact
    r.zip(r.tail).foreach { case (a, b) => assert(b >= a, s"recall dropped: $r") }
    assert(r.last === 1.0, s"nprobe=cells must equal brute force, got $r")
  }

  test("ivfTopKKmeansMultiProbe: absent probe id yields empty, own cell always scanned") {
    // sibling semantics: unknown id → empty frame, not an exception
    assert(Similarity.ivfTopKKmeansMultiProbe(embs, probeId = -999L, k = 5,
      cells = 4, iters = 3, nprobe = 2).count() === 0)
    // nprobe=1 must still scan the cell the probe is ASSIGNED to (codegen
    // argmax), whatever the driver-side fp ranking says — so the result
    // equals single-cell ivfTopKKmeans exactly
    val single = Similarity.ivfTopKKmeans(embs, probeId = 3L, k = 5, cells = 4, iters = 3)
    val multi1 = Similarity.ivfTopKKmeansMultiProbe(embs, probeId = 3L, k = 5,
      cells = 4, iters = 3, nprobe = 1)
    assert(canon(multi1) === canon(single))
  }

  test("withHyperplaneBucket registers the codegen function on the frame's session") {
    val bucketed = Similarity.withHyperplaneBucket(embs, "embedding", bits = 6)
    val direct = embs.withColumn("bucket",
      Similarity.hyperplaneBucket(col("embedding"), bits = 6))
    assert(canon(bucketed.select("vec_id", "bucket").orderBy("vec_id")) ===
      canon(direct.select("vec_id", "bucket").orderBy("vec_id")))
  }

  test("ivfTopKKmeans: exact within the probe's learned cell") {
    val model = Similarity.kmeansCentroids(embs, 4, iters = 3)
    val assigned = Similarity.assignCells(embs, model)
    val pcell = assigned.filter(col("vec_id") === 0L).select("cell").collect()(0).getInt(0)
    val expected = Similarity.cosineTopK(
      assigned.filter(col("cell") === pcell).drop("cell"), 0L, 5)
    val got = Similarity.ivfTopKKmeans(embs, probeId = 0L, k = 5, cells = 4, iters = 3)
    assert(canon(got.select("vec_id", "cos")) === canon(expected.select("vec_id", "cos")))
  }
}

package graft.llm

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {

  /** 4 well-separated cluster directions; per cluster, 3 near-dup groups of
    * 3 vectors (in-group cosine ≈ 1) plus 2 singletons. vec_ids 0..3 are one
    * per cluster direction so the deterministic k-means init starts from
    * diverse seeds. */
  private def fixture(): Seq[(Long, Array[Float])] = {
    val dims = 8
    def unit(i: Int): Array[Double] = Array.tabulate(dims)(d => if (d == i) 1.0 else 0.0)
    def norm(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    // seeds: ids 0..3, exactly the four directions
    for (c <- 0 until 4) rows += ((c.toLong, norm(unit(c))))
    var id = 4L
    for (c <- 0 until 4) {
      for (g <- 0 until 3) {
        // near-dup group: direction + tiny unique wiggle per member
        for (m <- 0 until 3) {
          val v = unit(c)
          v((c + g + 1) % dims) += 0.004 * (m + 1) + 0.02 * g
          // group g=0 in each cluster also duplicates the id-(c) seed
          rows += ((id, norm(v))); id += 1
        }
      }
      // singletons: clearly inside the cluster, clearly outside any group
      for (x <- 0 until 2) {
        val v = unit(c).map(_ * 1.0)
        v((c + 4 + x) % dims) += 0.45
        rows += ((id, norm(v))); id += 1
      }
    }
    rows.toSeq
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    s / math.sqrt(na * nb)
  }

  /** Exact keep-set: all-pairs cosine >= tau, union-find, keep min id. */
  private def bruteKeep(rows: Seq[(Long, Array[Float])], tau: Double): Set[Long] = {
    val ids = rows.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- rows.indices; j <- i + 1 until rows.length)
      if (cos(rows(i)._2, rows(j)._2) >= tau) {
        val (a, b) = (find(rows(i)._1), find(rows(j)._1))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
    val byComp = ids.groupBy(find)
    byComp.values.map(_.min).toSet
  }

  test("cluster-scoped dedup matches the all-pairs keep-set on separated clusters") {
    val rows = fixture()
    val tau = 0.99
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(df, tau, cells = 4, iters = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = bruteKeep(rows, tau)
    assert(kept === expected)
    // sanity on the fixture itself: dedup really removed something, and
    // every near-dup group of 3 collapsed to exactly one survivor
    assert(kept.size < rows.size)
    assert(rows.size - kept.size >= 4 * 3 * 2) // >= 2 dropped per group
  }

  test("threshold above every pairwise cosine keeps everything") {
    val rows = fixture()
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(df, 1.1, cells = 4, iters = 3).count()
    assert(kept === rows.size.toLong)
  }
}

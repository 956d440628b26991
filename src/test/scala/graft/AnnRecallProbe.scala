package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Measured recall@k of every ANN variant against brute-force cosine
  * ranking, averaged over the first `nProbes` corpus vectors — the
  * accuracy/cost table for the ANN inventory (numbers in BASELINE.md).
  * Run: sbt "Test/runMain graft.AnnRecallProbe [nProbes] [k]" */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val nProbes = args.headOption.map(_.toInt).getOrElse(20)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.register(spark, dir)
    val embs = spark.table("embeddings").cache()
    val total = embs.count()
    val probes = (0L until nProbes.toLong)

    // exact ground truth for all probes in one pass
    val exact = Similarity.multiProbeTopK(embs, probes, k).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.map(_.getLong(2)).toSet }

    def recall(name: String, fn: Long => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val hits = probes.map { p =>
        val got = fn(p).collect().map(_.getLong(0)).toSet
        got.intersect(exact(p)).size.toDouble / k
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ANN $name%-28s recall@$k=${hits.sum / hits.size}%.3f  (${sec / nProbes}%.2f s/probe)")
    }

    println(s"ANN corpus=$total probes=$nProbes k=$k sf=$dir")
    recall("ivf-signbit b=3", p => Similarity.ivfTopK(embs, p, k, bits = 3))
    // learn the k-means model ONCE (a real index build), then probe it —
    // per-probe scan of nprobe nearest cells, same shape as the operators
    val model = Similarity.kmeansCentroids(embs, k = 8, iters = 3)
    val assigned = Similarity.assignCells(embs, model).cache()
    assigned.count()
    def kmeansProbe(p: Long, nprobe: Int) = {
      val probe = assigned.filter(col("vec_id") === p).select(col("embedding").as("pv"))
      val pvec = probe.collect()(0).getSeq[Float](0).toArray
      val np = math.sqrt(pvec.map(x => x.toDouble * x).sum)
      def cos(c: Array[Double]) =
        pvec.map(_.toDouble).zip(c.map(_.toFloat.toDouble)).map { case (a, b) => a * b }.sum / np
      val pcells = model.map { case (cid, c) => (cos(c), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.take(nprobe).map(_._2).toSeq
      assigned.filter(col("cell").isInCollection(pcells) && col("vec_id") =!= p)
        .join(broadcast(probe))
        .select(col("vec_id"),
          graft.functions.VectorFunctions.cosineNative(col("embedding"), col("pv")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(k)
    }
    recall("ivf-kmeans c=8 np=1", p => kmeansProbe(p, 1))
    recall("ivf-kmeans c=8 np=2", p => kmeansProbe(p, 2))
    recall("ivf-kmeans c=8 np=4", p => kmeansProbe(p, 4))
    // IVF+PQ: same nprobe-cell scan, but candidates are scored from
    // 8-byte ADC codes (1/32 the in-cell bytes of the 256 B floats) with
    // an exact rerank of the 4k short list
    val pqModel = graft.llm.Pq.train(embs, dims = 64)
    recall("ivf-pq c=8 np=4 rr=4k", p =>
      graft.llm.Pq.ivfPqTopK(embs, pqModel, model, p, kTop = k, nprobe = 4, rerank = 4 * k))
    recall("ivf-pq c=8 np=4 rr=10k", p =>
      graft.llm.Pq.ivfPqTopK(embs, pqModel, model, p, kTop = k, nprobe = 4, rerank = 10 * k))
    recall("hyperplane b=4", p => Similarity.hyperplaneTopK(embs, p, k, bits = 4))
    recall("hyperplane-mp b=4", p => Similarity.hyperplaneMultiProbeTopK(embs, p, k, bits = 4))
    spark.stop()
  }
}

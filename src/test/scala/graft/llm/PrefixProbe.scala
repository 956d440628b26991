package graft.llm

import org.apache.spark.sql.SparkSession

/** A/B probe for prefix-filtered exact Jaccard: a boilerplate-heavy corpus
  * (every doc shares a 12-token header, otherwise distinct) where the
  * posting-list join pays |corpus|² candidates PER hot shingle and the
  * prefix join pays ~none — same exact output. Run manually:
  *   sbt "Test/runMain graft.llm.PrefixProbe [docs]"
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 3000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 24 private tokens per doc + a 12-token shared header: cross-doc
    // Jaccard ≈ 10/55 ≈ 0.18 < t, so TRUE pairs are only the planted
    // near-dup — but the header's shingles still hand the posting-list
    // join |corpus|² candidates apiece, while the prefix order puts them
    // at the very back of every doc and generates none
    val boiler = "standard license header text common to every file in the corpus here"
    def priv(i: Int) = (1 to 24).map(j => s"u${i}x$j").mkString(" ")
    val qs = (1 to 24).map(j => s"q$j").mkString(" ")
    val corpus = ((1 to nDocs).map(i => (i.toLong, s"${priv(i)} $boiler")) ++ Seq(
      (900001L, s"$qs $boiler"),
      (900002L, s"${qs.replace("q24", "r24")} $boiler")))
      .toDF("doc_id", "text").cache()
    corpus.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (tPref, nPref) = time(Dedup.jaccardPairsPrefix(corpus, 3, 0.4).count())
    val (tFull, nFull) = time(Dedup.jaccardPairs(corpus, 3, 0.4).count())
    println(f"docs=$nDocs full=$tFull%.1fs prefix=$tPref%.1fs " +
      f"speedup=${tFull / tPref}%.1fx pairs=$nFull/$nPref agree=${nFull == nPref}")
  }
}

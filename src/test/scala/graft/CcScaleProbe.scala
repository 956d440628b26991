package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for Dedup.connectedComponents: synthetic pair graphs far
  * bigger than any oracle SF.
  *
  *  - STAR graphs (the dedup-realistic shape: one representative, many
  *    clones, diameter 2) — label propagation should converge in ~2 rounds
  *    regardless of graph size.
  *  - CHAIN graphs (the adversarial shape: diameter = chain length) — shows
  *    the documented O(diameter) behavior that motivates the
  *    small-star/large-star alternative for pathological graphs.
  *
  * Run: sbt "Test/runMain graft.CcScaleProbe [nClusters] [size]" */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val nClusters = args.headOption.map(_.toInt).getOrElse(100000)
    val size = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Dedup

    // node ids: cluster c owns [c*size, (c+1)*size)
    val ids = spark.range(nClusters.toLong * size)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // star: every member pairs with its cluster's first node (diameter 2)
    val star = ids.filter(col("id") % size =!= 0)
      .select((col("id") - col("id") % size).as("da"), col("id").as("db"))
    val (starClusters, starSec) = time {
      Dedup.connectedComponents(star).select("cluster_id").distinct().count()
    }
    println(f"CC star  n=${nClusters * size}%d edges=${nClusters * (size - 1)}%d clusters=$starClusters%d sec=$starSec%.1f")
    assert(starClusters == nClusters, s"expected $nClusters star clusters")

    // chain: member i pairs with i+1 (diameter = size-1, worst case)
    val chain = ids.filter(col("id") % size =!= (size - 1))
      .select(col("id").as("da"), (col("id") + 1).as("db"))
    val (chainClusters, chainSec) = time {
      Dedup.connectedComponents(chain).select("cluster_id").distinct().count()
    }
    // lastCcRounds reports the FINAL algorithm's rounds: propagation if it
    // converged, the star fallback's count if the budget ran out
    val propRounds = Dedup.lastCcRounds
    println(f"CC chain n=${nClusters * size}%d edges=${nClusters * (size - 1)}%d clusters=$chainClusters%d sec=$chainSec%.1f rounds=$propRounds%d (auto: propagation, star fallback past budget)")
    assert(chainClusters == nClusters, s"expected $nClusters chain clusters")

    // same chain through the small-star/large-star contraction: round
    // count is O(log n), independent of the diameter
    val (starChainClusters, starChainSec) = time {
      Dedup.connectedComponentsStar(chain).select("cluster_id").distinct().count()
    }
    println(f"CC chain (star contraction) clusters=$starChainClusters%d sec=$starChainSec%.1f rounds=${Dedup.lastCcRounds}%d")
    assert(starChainClusters == nClusters, s"expected $nClusters chain clusters (star)")

    spark.stop()
  }
}

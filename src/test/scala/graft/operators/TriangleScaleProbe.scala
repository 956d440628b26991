package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for degree-oriented triangle counting: a hub-heavy graph
  * where the naive neighbor join pays hub-degree² wedges and the
  * orientation pays O(√m) per node. Run manually:
  *   sbt "Test/runMain graft.operators.TriangleScaleProbe [hubDeg] [randEdges]"
  */
object TriangleScaleProbe {
  def main(args: Array[String]): Unit = {
    val hubDeg = if (args.length > 0) args(0).toInt else 8000
    val nRand = if (args.length > 1) args(1).toInt else 100000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(5)
    val hub = (1 to hubDeg).map(i => (0L, i.toLong))
    val rest = Seq.fill(nRand)(
      (rnd.nextInt(hubDeg).toLong + 1, rnd.nextInt(hubDeg).toLong + 1))
      .filter { case (a, b) => a != b }
    val edges = (hub ++ rest).toDF("s", "t").cache()
    edges.count()

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val v = f
      ((System.nanoTime() - t0) / 1e9, v)
    }
    // naive: undirected wedges at EVERY node (the hub contributes deg²),
    // closed against the edge set — same joins, no orientation
    def naive(): Long = {
      val und = edges.select(least($"s", $"t").as("u"), greatest($"s", $"t").as("v"))
        .where($"u" =!= $"v").distinct()
      val sym = und.union(und.select($"v".as("u"), $"u".as("v")))
      val w = sym.select($"u".as("a"), $"v".as("b"))
        .join(sym.select($"u".as("a2"), $"v".as("c")),
          $"a" === $"a2" && $"b" < $"c")
        .select("b", "c")
      // each triangle has 3 apexes under no orientation → count/3
      w.join(und, $"b" === $"u" && $"c" === $"v", "left_semi")
        .count() / 3
    }
    val (tOrt, nOrt) = time(
      Graph.triangleCount(edges, "s", "t").collect()(0).getLong(0))
    val (tNv, nNv) = time(naive())
    println(f"hubDeg=$hubDeg rand=$nRand naive=$tNv%.1fs oriented=$tOrt%.1fs " +
      f"speedup=${tNv / tOrt}%.1fx triangles=$nNv/$nOrt agree=${nNv == nOrt}")
  }
}

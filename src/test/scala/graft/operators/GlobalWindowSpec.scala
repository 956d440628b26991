package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** Direct operator-vs-global-window equivalence for GlobalWindow, beyond
  * the oracle-checked query shapes: other aggregates, sparse key domains
  * (mostly-empty buckets), and degenerate sizes. */
class GlobalWindowSpec extends SparkSpec {

  private val dec = DecimalType(18, 2)

  test("rangeAgg(sum) equals the single-partition range window") {
    tables()
    val o = spark.table("orders")
    val key = col("o_totalprice").cast(dec)
    val op = GlobalWindow.rangeAgg(o, key, 1000L, sum(key), outName = "s")
      .select(col("o_orderkey"), col("s"))
    val w = Window.orderBy(key).rangeBetween(-1000, Window.currentRow)
    val global = o.select(col("o_orderkey"), sum(key).over(w).as("s"))
    assert(canon(op.orderBy("o_orderkey")) === canon(global.orderBy("o_orderkey")))
  }

  test("lagLead survives a sparse key domain (mostly-empty buckets)") {
    val sq = spark
    import sq.implicits._
    // huge gaps → nearly all range buckets empty; adjacency must skip them
    val t = Seq((1L, 0.0), (2L, 1e6), (3L, 5e6), (4L, 5e6 + 1), (5L, 9e6))
      .toDF("id", "k")
    val op = GlobalWindow.lagLead(t, col("k"), Seq("k", "id"), "id",
      buckets = 64, prevName = "p", nextName = "n")
      .select("id", "p", "n")
    val w = Window.orderBy("k", "id")
    val global = t.select(col("id"), lag("id", 1).over(w).as("p"),
      lead("id", 1).over(w).as("n"))
    assert(canon(op.orderBy("id")) === canon(global.orderBy("id")))
  }

  test("lagLead on a single row and ntile with n > rows") {
    val sq = spark
    import sq.implicits._
    val one = Seq((7L, 1.0)).toDF("id", "k")
    val r = GlobalWindow.lagLead(one, col("k"), Seq("k", "id"), "id",
      prevName = "p", nextName = "n").select("id", "p", "n").collect()
    assert(r.length === 1 && r(0).isNullAt(1) && r(0).isNullAt(2))

    val five = Seq.tabulate(5)(i => (i.toLong, i * 10.0)).toDF("id", "k")
    val tiles = GlobalWindow.ntileGlobal(five, col("k"), Seq(col("k")), n = 8,
        tileName = "t")
      .select("id", "t")
    val w = Window.orderBy("k")
    val global = five.select(col("id"), ntile(8).over(w).as("t"))
    assert(canon(tiles.orderBy("id")) === canon(global.orderBy("id")))
  }

  test("ntileGlobal matches ntile across several n") {
    tables()
    val o = spark.table("orders")
    Seq(2, 3, 7).foreach { n =>
      val op = GlobalWindow.ntileGlobal(o,
          negate(col("o_totalprice").cast("double")),
          Seq(col("o_totalprice").cast(dec).desc, col("o_orderkey")), n,
          tileName = "t")
        .select(col("o_orderkey"), col("t"))
      val w = Window.orderBy(col("o_totalprice").cast(dec).desc, col("o_orderkey"))
      val global = o.select(col("o_orderkey"), ntile(n).over(w).as("t"))
      assert(canon(op.orderBy("o_orderkey")) === canon(global.orderBy("o_orderkey")),
        s"ntile($n) diverged")
    }
  }
}

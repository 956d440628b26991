package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}

import graft.SparkSpec

/** The optimizer rule that turns theta-join + max() as-of SQL into the
  * union + running-window plan: result-identical on every edge the join
  * semantics have (ties, matchless left rows, null keys, inner vs left
  * outer, strict vs inclusive), fires only on the exact shape, and leaves
  * every non-as-of aggregate-over-join untouched. */
class AsOfJoinRewriteSpec extends SparkSpec {

  private val Key = "spark.graft.asofJoin.rewrite"

  private def attachRule(): Unit =
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinRewrite

  private def fixture(): Unit = {
    val sq = spark; import sq.implicits._
    // clicks: (user, ts, click_id) — u1 has a tie at the purchase ts, u2
    // has no clicks, one click has a null user (matches nothing)
    Seq((Some("u1"), 10L, 101L), (Some("u1"), 20L, 102L), (Some("u1"), 20L, 103L),
        (Some("u1"), 30L, 104L), (Some("u3"), 7L, 301L), (None, 50L, 999L))
      .toDF("user_id", "ts", "click_id").createOrReplaceTempView("cc")
    // purchases: u2 matchless, one null-user purchase
    Seq((1L, Some("u1"), 20L), (2L, Some("u1"), 25L), (3L, Some("u2"), 5L),
        (4L, Some("u3"), 7L), (5L, None, 60L))
      .toDF("pid", "user_id", "ts").createOrReplaceTempView("pp")
  }

  private def q(join: String, cmp: String, agg: String): DataFrame = spark.sql(
    s"""SELECT p.pid, $agg FROM pp p $join JOIN cc c
       |  ON p.user_id = c.user_id AND c.ts $cmp p.ts
       |GROUP BY p.pid ORDER BY p.pid""".stripMargin)

  private def assertRewritten(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case j: LJoin => j }.isEmpty,
      s"as-of shape not rewritten:\n$opt")
    assert(opt.collect { case w: LWindow => w }.nonEmpty)
  }

  test("left outer / inner, <= / <, ts and struct payload forms all match") {
    attachRule(); fixture()
    for {
      join <- Seq("LEFT", "INNER")
      cmp <- Seq("<=", "<")
      agg <- Seq("max(c.ts) AS last_ts",
        "max(named_struct('ts', c.ts, 'id', c.click_id)).id AS last_click",
        "max(CAST(c.ts AS DOUBLE)) AS last_d")
    } {
      spark.conf.unset(Key)
      val expected = canon(q(join, cmp, agg))
      try {
        spark.conf.set(Key, "true")
        val rewritten = q(join, cmp, agg)
        assertRewritten(rewritten)
        assert(canon(rewritten) === expected, s"mismatch for $join/$cmp/$agg")
      } finally spark.conf.unset(Key)
    }
  }

  test("declared contract queries JOIN-ASOF and EVENT-ATTRIBUTION rewrite, hashes unchanged") {
    attachRule(); tables()
    for (id <- Seq("JOIN-ASOF", "EVENT-ATTRIBUTION")) {
      val sql = graft.queries.Inventory.byId(id).sparkSql
      spark.conf.unset(Key)
      val expected = canon(spark.sql(sql))
      try {
        spark.conf.set(Key, "true")
        val rewritten = spark.sql(sql)
        assertRewritten(rewritten)
        assert(canon(rewritten) === expected, s"$id drifted under the rewrite")
      } finally spark.conf.unset(Key)
    }
  }

  test("rewritten contract SQL matches the oracle-verified DSL at all three SFs") {
    attachRule()
    // expected side = the DSL as-of operator (the path the correctness
    // gate hash-verifies against DuckDB at every SF) — so this closes the
    // loop: rule-on SQL == DSL == DuckDB, without paying the naive theta
    // join at sf0.1
    try {
      for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
        graft.core.Tables.register(spark, dir)
        for (id <- Seq("JOIN-ASOF", "EVENT-ATTRIBUTION")) {
          val expected = canon(graft.dsl.Relational.impls(id)(spark))
          spark.conf.set(Key, "true")
          val rewritten = spark.sql(graft.queries.Inventory.byId(id).sparkSql)
          assertRewritten(rewritten)
          assert(canon(rewritten) === expected, s"$id drifted at $dir")
          spark.conf.unset(Key)
        }
      }
    } finally {
      spark.conf.unset(Key)
      tables() // restore the shared sf0.001 views for later suites
    }
  }

  test("no-fire: conf off, non-monotone max, extra aggregates, extra conjuncts") {
    attachRule(); fixture()
    def joins(df: DataFrame) =
      df.queryExecution.optimizedPlan.collect { case j: LJoin => j }
    // conf unset → untouched
    spark.conf.unset(Key)
    assert(joins(q("LEFT", "<=", "max(c.ts) AS last_ts")).nonEmpty)
    try {
      spark.conf.set(Key, "true")
      // max over a non-ts-monotone value: NOT last-row semantics — keep join
      assert(joins(q("LEFT", "<=", "max(c.click_id) AS worst")).nonEmpty)
      assert(joins(q("LEFT", "<=", "max(-c.ts) AS neg")).nonEmpty)
      // a second non-max aggregate changes per-pair semantics — keep join
      assert(joins(q("LEFT", "<=", "max(c.ts) AS last_ts, count(c.ts) AS n")).nonEmpty)
      // a non-equi extra conjunct is not the as-of shape — keep join
      assert(joins(spark.sql(
        """SELECT p.pid, max(c.ts) AS last_ts FROM pp p LEFT JOIN cc c
          |  ON p.user_id = c.user_id AND c.ts <= p.ts AND c.click_id != p.pid
          |GROUP BY p.pid ORDER BY p.pid""".stripMargin)).nonEmpty)
      // grouping on a right-side column — keep join
      assert(joins(spark.sql(
        """SELECT c.click_id, max(c.ts) AS last_ts FROM pp p JOIN cc c
          |  ON p.user_id = c.user_id AND c.ts <= p.ts
          |GROUP BY c.click_id ORDER BY c.click_id""".stripMargin)).nonEmpty)
    } finally spark.conf.unset(Key)
  }
}

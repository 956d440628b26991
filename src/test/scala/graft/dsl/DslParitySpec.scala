package graft.dsl

import graft.SparkSpec
import graft.queries.Inventory

/** Every DataFrame-DSL implementation must be hash-equal to its SQL twin —
  * the DSL is what SparkEntry serves, the SQL is what the survey validated
  * cross-engine. */
class DslParitySpec extends SparkSpec {

  test("DSL covers the full SQL inventory") {
    val sqlIds = Inventory.all.map(_.id).toSet
    assert(Relational.impls.keySet === sqlIds)
  }

  Inventory.all.foreach { q =>
    test(s"${q.id}: DSL == SQL") {
      tables()
      val dsl = canon(Relational(q.id, spark))
      val sql = canon(spark.sql(q.sparkSql))
      assert(dsl === sql, s"${q.id} DSL diverges from SQL twin")
    }
  }
}

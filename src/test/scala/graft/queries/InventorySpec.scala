package graft.queries

import graft.{SparkEntry, SparkSpec}

class InventorySpec extends SparkSpec {

  test("every declared query executes at sf0.001 and repeats deterministically") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (id, fn) =>
      val first = canon(fn(spark, sfDir))
      val second = canon(fn(spark, sfDir))
      assert(first === second, s"$id not deterministic")
      // emptiness is SF-dependent for these (JOIN-ANTI empty at sf0.001 —
      // FIXTURES.md #3; LLM-DEDUP-NORM has duplicate docs only at sf0.1+,
      // same corpus quirk as LLM-DEDUP's zero count below sf0.1)
      if (id != "JOIN-ANTI" && id != "LLM-DEDUP-NORM")
        assert(first.nonEmpty, s"$id returned no rows")
    }
  }

  test("oracle map covers every declared query, with matching keys") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle keys without query: ${ok -- qk}")
    assert((qk -- ok).isEmpty, s"queries without oracle: ${qk -- ok}")
  }

  test("flagship entry returns the 6 Q1 groups") {
    assert(SparkEntry.entry(spark).count() === 6)
  }
}

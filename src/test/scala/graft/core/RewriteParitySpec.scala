package graft.core

import graft.{SparkEntry, SparkSpec}

/** The scale profile must never change answers: run EVERY declared query
  * once under default configs and once under `GraftConf.scaleDefaults`
  * (all opt-in rewrite rules armed — as-of join, global-window bucketing,
  * range-join gridding, interval overlap; approx rewrites stay OFF, they
  * change results by contract) and demand identical row CONTENT.
  *
  * This is the engine's biggest residual correctness exposure closed: a
  * silent rewrite bug on any of the 250+ shapes now fails CI instead of
  * waiting for a user to flip the profile on. Comparison is
  * order-insensitive (sorted canonical rows): a rewrite legitimately
  * changes the physical plan, and tie order inside an ORDER BY is not a
  * SQL guarantee — content equality is the rewrite contract.
  *
  * One suite-level test (not per-query) keeps the double sweep to a
  * single pass over the inventory at sf0.001; failures list every
  * diverging query id.
  */
class RewriteParitySpec extends SparkSpec {

  test("all declared queries: scaleDefaults rewrites preserve content") {
    val ids = SparkEntry.queries.keys.toSeq.sorted
    def sweep(): Map[String, Either[String, Seq[String]]] =
      ids.map { id =>
        id -> (try Right(canon(SparkEntry.queries(id)(spark, sfDir)).sorted)
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") })
      }.toMap

    GraftConf.reset(spark)
    val base = sweep()
    val diverged =
      try {
        GraftConf.scaleDefaults(spark)
        val rewritten = sweep()
        ids.filter(id => base(id) != rewritten(id)).map { id =>
          s"$id: default=${brief(base(id))} vs scale=${brief(rewritten(id))}"
        }
      } finally GraftConf.reset(spark)

    val baseErrs = ids.filter(id => base(id).isLeft)
    assert(baseErrs.isEmpty, s"queries failing under DEFAULT config: $baseErrs")
    assert(diverged.isEmpty,
      s"${diverged.size} queries change content under scaleDefaults:\n" +
        diverged.mkString("\n"))
  }

  private def brief(r: Either[String, Seq[String]]): String = r match {
    case Left(err) => s"ERROR($err)"
    case Right(rows) => s"${rows.size} rows, head=${rows.headOption.getOrElse("-")}"
  }
}

package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteSpec extends SparkSpec {

  private def points = {
    val sq = spark
    import sq.implicits._
    Seq(
      ("svc.api.latency", 1.0, Map("host" -> "h1")),
      ("svc.api.errors", 2.0, Map.empty[String, String]),
      ("jvm.gc.pause", 3.0, Map("env" -> "prod")) // env already set: must win
    ).toDF("metric", "value", "dimensions")
  }

  test("addDimensions decorates without clobbering existing keys") {
    val out = Rewrite.addDimensions(points, Map("env" -> "staging", "dc" -> "us1"))
      .select(col("metric"), col("dimensions")).collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1).toMap).toMap
    assert(out("svc.api.latency") === Map("host" -> "h1", "env" -> "staging", "dc" -> "us1"))
    assert(out("svc.api.errors") === Map("env" -> "staging", "dc" -> "us1"))
    // per-point value wins over the static config
    assert(out("jvm.gc.pause")("env") === "prod")
    // empty config is the identity
    assert(Rewrite.addDimensions(points, Map.empty).collect().length === 3)
  }

  test("addDimensions decorates a NULL dimensions map (no null propagation)") {
    val sq = spark
    import sq.implicits._
    val withNull = Seq(("m.a", 1.0, Map("k" -> "v")), ("m.b", 2.0, null))
      .toDF("metric", "value", "dimensions")
    val out = Rewrite.addDimensions(withNull, Map("dc" -> "us1"))
      .select(col("metric"), col("dimensions")).collect()
      .map(r => r.getString(0) -> Option(r.getMap[String, String](1)).map(_.toMap)).toMap
    assert(out("m.a") === Some(Map("k" -> "v", "dc" -> "us1")))
    // a null map gains exactly the static dims — it must not stay null
    assert(out("m.b") === Some(Map("dc" -> "us1")))
  }

  test("filterMetrics applies allow then deny") {
    def metrics(df: org.apache.spark.sql.DataFrame) =
      df.select("metric").collect().map(_.getString(0)).toSet
    assert(metrics(Rewrite.filterMetrics(points, allow = Some("^svc\\."))) ===
      Set("svc.api.latency", "svc.api.errors"))
    assert(metrics(Rewrite.filterMetrics(points, deny = Some("errors"))) ===
      Set("svc.api.latency", "jvm.gc.pause"))
    assert(metrics(Rewrite.filterMetrics(points,
      allow = Some("^svc\\."), deny = Some("latency"))) === Set("svc.api.errors"))
    assert(metrics(Rewrite.filterMetrics(points)) === metrics(points))
  }

  test("renameMetric regex-rewrites names") {
    val out = Rewrite.renameMetric(points, "^svc\\.", "service.")
      .select("metric").collect().map(_.getString(0)).toSet
    assert(out === Set("service.api.latency", "service.api.errors", "jvm.gc.pause"))
  }

  test("rewrites compose and stay codegen (no shuffle in the plan)") {
    val composed = Rewrite.renameMetric(
      Rewrite.filterMetrics(
        Rewrite.addDimensions(points, Map("dc" -> "us1")),
        allow = Some("^svc\\.")),
      "\\.api\\.", ".web.")
    assert(composed.collect().length === 2)
    val plan = composed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"rewrite middleware must not shuffle:\n$plan")
  }
}

package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecoderSpec extends SparkSpec {

  test("collectd write_http body decodes to one datapoint per value") {
    val sq = spark
    import sq.implicits._
    val body =
      """[{"values":[0.2,0.4],"dstypes":["gauge","derive"],"dsnames":["shortterm","longterm"],
        |  "time":1434477504.0,"interval":10.0,"host":"web1","plugin":"load",
        |  "plugin_instance":"","type":"load","type_instance":""},
        | {"values":[98.5],"dstypes":["gauge"],"dsnames":["value"],
        |  "time":1434477514.0,"interval":10.0,"host":"web2","plugin":"cpu",
        |  "plugin_instance":"0","type":"percent","type_instance":"idle"}]"""
        .stripMargin.replace("\n", "")
    val out = Collectd.decode(Seq(body).toDF("body"))
      .orderBy("metric").collect()

    assert(out.length === 3)
    val byMetric = out.map(r => r.getString(0) -> r).toMap
    // multi-value record: dsname suffixes the metric
    assert(byMetric.contains("load.load.shortterm"))
    assert(byMetric.contains("load.load.longterm"))
    // default dsname "value" omitted; instances join the dotted name
    assert(byMetric.contains("cpu.0.percent.idle"))

    val cpu = byMetric("cpu.0.percent.idle")
    assert(cpu.getMap[String, String](1) ===
      Map("host" -> "web2", "plugin" -> "cpu", "plugin_instance" -> "0",
        "type_instance" -> "idle"))
    assert(cpu.getDouble(2) === 98.5)
    assert(cpu.getString(3) === "GAUGE")
    assert(cpu.getTimestamp(4).toInstant.getEpochSecond === 1434477514L)

    // dstype mapping: derive accumulates
    assert(byMetric("load.load.longterm").getString(3) === "CUMULATIVE_COUNTER")
    // empty instances dropped from dimensions
    assert(byMetric("load.load.shortterm").getMap[String, String](1) ===
      Map("host" -> "web1", "plugin" -> "load"))
  }

  test("collectd decode drops malformed bodies to zero rows") {
    val sq = spark
    import sq.implicits._
    assert(Collectd.decode(Seq("not json", "{}").toDF("body")).count() === 0)
  }

  test("signalfx /v2/datapoint JSON decodes all three metric-type arms") {
    val sq = spark
    import sq.implicits._
    val body =
      """{"gauge":[{"metric":"cpu.idle","value":98.5,"dimensions":{"host":"a"},"timestamp":1694000000000}],
        | "counter":[{"metric":"req.count","value":3,"dimensions":{"ep":"/v2"},"timestamp":1694000001000}],
        | "cumulative_counter":[{"metric":"bytes.total","value":12345,"timestamp":1694000002000}]}"""
        .stripMargin.replace("\n", "")
    val out = SignalFxJson.decode(Seq(body).toDF("body"))
      .orderBy("metric").collect()

    assert(out.length === 3)
    val byMetric = out.map(r => r.getString(0) -> r).toMap
    assert(byMetric("cpu.idle").getString(3) === "GAUGE")
    assert(byMetric("req.count").getString(3) === "COUNT")
    assert(byMetric("bytes.total").getString(3) === "CUMULATIVE_COUNTER")
    // ms-epoch wire timestamps surface as TIMESTAMP
    assert(byMetric("cpu.idle").getTimestamp(4).getTime === 1694000000000L)
    // absent dimensions → empty map, not null
    assert(byMetric("bytes.total").getMap[String, String](1) === Map.empty)
    assert(byMetric("req.count").getMap[String, String](1) === Map("ep" -> "/v2"))
  }

  test("signalfx decode: missing arms and malformed bodies yield zero rows") {
    val sq = spark
    import sq.implicits._
    assert(SignalFxJson.decode(Seq("""{"gauge":[]}""", "nope").toDF("body")).count() === 0)
  }
}

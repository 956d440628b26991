package graft.ingest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class CarbonSpec extends SparkSpec {
  import Carbon._

  private lazy val sq = spark

  test("line codec round-trips metric/value/epoch (property)") {
    import sq.implicits._
    val metricGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const('.'), Gen.const('_'))).map(_.mkString)
      .suchThat(m => !m.contains(" "))
    val rows = Gen.listOfN(40, for {
      m <- metricGen
      v <- Gen.chooseNum(-1e6, 1e6).map(x => math.rint(x * 100) / 100)
      e <- Gen.chooseNum(0L, 4102444800L)
    } yield (m, v, e)).sample.get

    val df = rows.toDF("metric", "value", "epoch")
    val lines = df.select(toLine(col("metric"), col("value"), col("epoch")).as("line"))
    val back = parseLines(lines).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(back === rows.toSet)
  }

  test("identity deconstructor: base unchanged, empty dims") {
    import sq.implicits._
    val df = Seq("svc.api.latency").toDF("m")
    val r = df.select(
      IdentityDeconstructor.base(col("m")).as("b"),
      IdentityDeconstructor.dimensions(col("m")).as("d")).collect()(0)
    assert(r.getString(0) === "svc.api.latency")
    assert(r.getMap[String, String](1).isEmpty)
  }

  test("commakeys deconstructor parses name[k1=v1,k2=v2]") {
    import sq.implicits._
    val df = Seq("cpu.load[host=web01,dc=iad]", "plain.metric").toDF("m")
    val rows = df.select(
      CommaKeysDeconstructor.base(col("m")).as("b"),
      CommaKeysDeconstructor.dimensions(col("m")).as("d")).collect()
    assert(rows(0).getString(0) === "cpu.load")
    assert(rows(0).getMap[String, String](1) === Map("host" -> "web01", "dc" -> "iad"))
    assert(rows(1).getString(0) === "plain.metric")
    assert(rows(1).getMap[String, String](1).isEmpty)
  }

  test("delimiter deconstructor maps positional segments, short names truncate") {
    import sq.implicits._
    val df = Seq("svc.api.latency.p99", "svc.api").toDF("m")
    val d = DelimiterDeconstructor(Seq("ns", "endpoint", "stat"))
    val rows = df.select(d.dimensions(col("m")).as("d")).collect()
    assert(rows(0).getMap[String, String](0) ===
      Map("ns" -> "svc", "endpoint" -> "api", "stat" -> "latency"))
    assert(rows(1).getMap[String, String](0) === Map("ns" -> "svc", "endpoint" -> "api"))
  }

  test("ingest: malformed lines yield null value and are filterable") {
    import sq.implicits._
    val lines = Seq("ok.metric 1.5 1700000000", "garbage", "also bad line here")
      .toDF("line")
    val dp = Carbon.ingest(lines, IdentityDeconstructor)
    assert(dp.count() === 3)
    assert(dp.where(col("value").isNotNull && col("ts").isNotNull).count() === 1)
  }
}

package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.expressions.PolyHash

class PolyHashSpec extends SparkSpec {

  /** Reference semantics: fold (acc·31 + codepoint) mod P over code points
    * — what the HOF formulation and the DuckDB oracle twin compute. */
  private def reference(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * 31L + cp) % PolyHash.P
    }
    acc
  }

  test("PolyHash.hash matches the code-point fold on arbitrary unicode") {
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.asciiPrintableChar.map(_.toString),
      2 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("一", "鿿", "é", "ß", "θ", "я", "ع"),
      1 -> Gen.oneOf("😀", "🚀", "𝕊"), // non-BMP: surrogate pairs
      1 -> Gen.const(" "))).map(_.mkString)
    // deterministic sampling (scalatestplus bridge not on the classpath)
    (0 until 500).foreach { i =>
      val s = gen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse("")
      assert(PolyHash.hash(UTF8String.fromString(s)) === reference(s), s"sample $i: '$s'")
    }
    // fixed anchors incl. the ASCII fast-path/restart boundary
    Seq("", "a", "abc def", "π", "aπ", "πa", "😀", "a😀b",
        "the quick brown fox", "一二三").foreach { s =>
      assert(PolyHash.hash(UTF8String.fromString(s)) === reference(s), s"anchor '$s'")
    }
  }

  test("expression and HOF-SQL formulation agree end-to-end on fixture shingles") {
    tables()
    val df = graft.llm.Dedup.shingles(spark.table("documents"), 3).limit(500)
    df.createOrReplaceTempView("ph_shingles")
    val rows = spark.sql(
      """SELECT s, graft_poly_hash(s) AS fast,
        |  aggregate(transform(sequence(1, length(s)), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT)),
        |            CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007) AS slow
        |FROM ph_shingles""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2), s"shingle '${r.getString(0)}'"))
  }
}

package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = { tables(); Multimodal.documentsAsMedia(spark, spark.table("documents")) }

  test("binaryMeta: n_bytes equals text length (ascii fixture), digest = md5") {
    val meta = Multimodal.binaryMeta(media.toDF())
    val joined = meta.join(spark.table("documents"),
      meta("media_id") === col("doc_id"))
    assert(joined.filter(col("n_bytes") =!= length(col("text"))).count() === 0)
    assert(joined.filter(col("digest") =!= md5(col("text").cast("binary"))).count() === 0)
  }

  test("decodeFeatures: partition-parallel stub decode is deterministic and total") {
    val feats = Multimodal.decodeFeatures(media).cache()
    assert(feats.count() === media.count())
    val r = feats.filter(col("width") < 1 || col("width") > 1920 ||
      col("height") < 1 || col("height") > 1080)
    assert(r.count() === 0)
    val a = canon(feats.orderBy("media_id").limit(10).toDF())
    val b = canon(Multimodal.decodeFeatures(media).orderBy("media_id").limit(10).toDF())
    assert(a === b)
    feats.unpersist()
  }
}

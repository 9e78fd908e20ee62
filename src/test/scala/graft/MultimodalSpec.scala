package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, determinism, partition behavior, and
  * transform shapes (decode / features / resize / frame-sample) over
  * the deterministic fake corpus.
  */
class MultimodalSpec extends SparkTestBase {
  quiet()

  private def media = Multimodal.mediaFromDocuments(Q.t(spark, sf, "documents"))

  test("media corpus: binary payload + typed columns") {
    val schema = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") === "binary")
    assert(schema("kind") === "string")
    assert(media.count() === 500)
    assert(media.select("kind").distinct().count() === 3)
  }

  test("decode: metadata populated, payload untouched, deterministic") {
    val d1 = Multimodal.decode(spark, media).toDF()
    val d2 = Multimodal.decode(spark, media).toDF()
    assert(d1.exceptAll(d2).count() === 0)
    assert(d1.filter(col("width") < 64 || col("height") < 64).count() === 0)
    assert(d1.agg(sum(length(col("payload")))).head().getLong(0) ===
      media.agg(sum(length(col("payload")))).head().getLong(0))
  }

  test("decode is a narrow transform (partition count preserved)") {
    val repart = media.repartition(7)
    assert(Multimodal.decode(spark, repart).rdd.getNumPartitions === 7)
  }

  test("feature extraction: fixed dim, deterministic") {
    val f = Multimodal.extractFeatures(spark, media, dim = 16).toDF()
    assert(f.filter(size(col("feature")) =!= 16).count() === 0)
    val f2 = Multimodal.extractFeatures(spark, media, dim = 16).toDF()
    assert(f.exceptAll(f2).count() === 0)
  }

  test("fused decodeWithFeatures ≡ decode ⋈ extractFeatures (all codec paths)") {
    // the fake corpus exercises every fallback path (stub meta + hash
    // features); add real PPM/PNG/WAV payloads so the fused parse is
    // compared against the unfused stages on the REAL codec paths too
    import spark.implicits._
    import graft.multimodal.Codecs
    val real = Seq(
      (9001L, "image", Codecs.encodePpm(4, 3, Array.fill(36)(7.toByte)), "image/x-portable-pixmap"),
      (9002L, "image", Codecs.encodePng(5, 2, Array.fill(30)(9.toByte)), "image/png"),
      (9003L, "audio", Codecs.encodeWavPcm16(8000, Array.fill(1600)(3.toShort)), "audio/wav"))
      .toDF("media_id", "kind", "payload", "mime")
    val corpus = media.unionByName(real)
    val fused = Multimodal.decodeWithFeatures(spark, corpus).toDF()
    val unfused = Multimodal.decode(spark, corpus).toDF()
      .select("media_id", "kind", "mime", "width", "height", "duration_ms")
      .join(Multimodal.extractFeatures(spark, corpus).toDF()
        .select("media_id", "feature"), "media_id")
      .select(fused.columns.map(col): _*)
    assert(fused.exceptAll(unfused).count() === 0)
    assert(unfused.exceptAll(fused).count() === 0)
  }

  test("resize: payload fits the byte budget, metadata updated") {
    val resized = Multimodal.resize(spark,
      Multimodal.decode(spark, media), 128, 128).toDF()
    assert(resized.filter(length(col("payload")) =!= 128 * 128 / 64).count() === 0)
    assert(resized.select("width").distinct().collect().map(_.getInt(0)).toSeq === Seq(128))
  }

  test("frame sampling: only videos, ceil(n/stride) frames each") {
    val frames = Multimodal.sampleFrames(spark, media).toDF()
    val perMedia = frames.groupBy("media_id").count()
    val expected = Q.t(spark, sf, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"), ceil(length(col("text")) / 64.0).cast("long").as("exp"))
    val joined = perMedia.join(expected, perMedia("media_id") === expected("doc_id"))
    assert(joined.filter(col("count") =!= col("exp")).count() === 0)
    assert(perMedia.count() === expected.count())
  }
}

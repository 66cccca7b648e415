package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def items() = {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "abc"), (3L, "x" * 1000))
      .toDF("id", "text")
    Multimodal.fromText(df, "id", "text", kind = "image")
  }

  test("feature extraction: deterministic, normalized, batch-shaped") {
    val feats = Multimodal.extractFeatures(items()).collect()
    assert(feats.length === 3)
    assert(feats.forall(_.feature.length === 16))
    // L1 normalization: bins sum to ~1
    feats.foreach(f => assert(math.abs(f.feature.sum - 1f) < 1e-5))
    // deterministic: same input → same feature
    val again = Multimodal.extractFeatures(items()).collect()
    assert(feats.sortBy(_.media_id).map(_.feature.toSeq).toSeq ===
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
    // content-dependent byte accounting
    assert(feats.find(_.media_id == 3L).get.n_bytes === 1000L)
  }

  test("frame sampling splits payload and strides") {
    val out = Multimodal.extractFrameFeatures(items(), stride = 2)
    val byId = out.groupBy(col("media_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id=3: 1000 bytes → n_frames = 1000/64 = 15 → ceil(15/2) = 8 kept
    assert(byId(3L) === 8L)
    assert(byId(1L) === 1L)
  }

  test("codec stubs: resize strides bytes") {
    assert(Multimodal.Codecs.resize(Array[Byte](1, 2, 3, 4, 5), 2).toSeq
      === Seq[Byte](1, 3, 5))
    assert(Multimodal.Codecs.resize(Array.empty[Byte], 3).toSeq === Seq())
    intercept[IllegalArgumentException] {
      Multimodal.Codecs.resize(Array[Byte](1), 0)
    }
  }
}

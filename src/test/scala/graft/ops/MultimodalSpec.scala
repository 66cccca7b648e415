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

  test("REAL PNG codec: lossless pixel round-trip, loud on garbage") {
    val f = (x: Int, y: Int) =>
      (((x * 37 + y) % 256) << 16) | (((y * 91 + x) % 256) << 8) |
        ((x * y) % 256)
    val png = Multimodal.Codecs.encodePng(23, 17, f)
    // a real PNG container, not a fake: magic bytes
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte)
    val (w, h, px) = Multimodal.Codecs.decodeImage(png)
    assert(w == 23 && h == 17)
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) == f(x, y), s"pixel ($x,$y)")
    intercept[IllegalArgumentException] {
      Multimodal.Codecs.decodeImage("not an image".getBytes)
    }
  }

  test("REAL WAV codec: lossless PCM round-trip, loud on garbage") {
    val samples = Array.tabulate(300)(i =>
      (((i * 7919 + 13) % 65536) - 32768).toShort)
    val wav = Multimodal.Codecs.encodeWav(samples, 16000)
    // a real RIFF/WAVE container, not a fake: magic bytes
    assert(wav(0) == 'R'.toByte && wav(1) == 'I'.toByte &&
      wav(2) == 'F'.toByte && wav(3) == 'F'.toByte &&
      wav(8) == 'W'.toByte && wav(9) == 'A'.toByte)
    val (rate, channels, got) = Multimodal.Codecs.decodeWav(wav)
    assert(rate == 16000 && channels == 1)
    assert(got.toSeq == samples.toSeq, "sample-exact round-trip")
    // extremes round-trip (sign + endianness pinned at the edges)
    val edge = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue)
    val (_, _, got2) =
      Multimodal.Codecs.decodeWav(Multimodal.Codecs.encodeWav(edge, 8000))
    assert(got2.toSeq == edge.toSeq)
    intercept[Exception] {
      Multimodal.Codecs.decodeWav("not audio".getBytes)
    }
  }

  test("wavSampleStats computes exact stats over the decoded samples") {
    import spark.implicits._
    val items = spark.createDataset(Seq(1L, 2L).map { id =>
      val s = Array.tabulate(10)(i => (id * 100 + i).toShort)
      Multimodal.MediaItem(id, "audio",
        Multimodal.Codecs.encodeWav(s, 44100), 0, 0, 44100, 1)
    })
    val got = Multimodal.wavSampleStats(items).orderBy("media_id").collect()
    assert(got.length == 2)
    val r1 = got(0)
    assert(r1.getInt(1) == 44100) // sample_rate
    assert(r1.getLong(2) == 10L) // n_samples
    assert(r1.getLong(3) == (0 until 10).map(_ + 100).sum.toLong) // s_sum
    assert(r1.getInt(4) == 100 && r1.getInt(5) == 109) // min/max
  }

  test("pngChannelStats computes exact stats over the decoded raster") {
    import spark.implicits._
    val items = spark.createDataset(Seq(1L, 2L).map { id =>
      Multimodal.MediaItem(id, "image",
        Multimodal.Codecs.encodePng(4, 2, (x, y) =>
          (((id.toInt * 10 + x) % 256) << 16) | (y << 8) | 7),
        4, 2, 0, 1)
    })
    val got = Multimodal.pngChannelStats(items)
      .orderBy("media_id").collect()
    assert(got.length == 2)
    val r1 = got(0)
    assert(r1.getLong(1) == 8L) // n_px
    // r channel for id=1: values 10,11,12,13 twice → sum 92
    assert(r1.getLong(2) == 92L)
    assert(r1.getLong(4) == 7L * 8) // b_sum: constant 7
    assert(r1.getInt(5) == 10 && r1.getInt(6) == 13) // r min/max
  }

  test("REAL BMP codec + 2x2 average pool: exact integer arithmetic " +
    "on decoded pixels") {
    import spark.implicits._
    // BMP is 24-bit uncompressed — byte-exact round trip
    val bytes = Multimodal.Codecs.encodeBmp(4, 2, (x, y) =>
      ((x * 50) << 16) | ((y * 100) << 8) | 200)
    val (w, h, px) = Multimodal.Codecs.decodeImage(bytes)
    assert((w, h) == (4, 2))
    assert(((px(1) >> 16) & 0xff) == 50 && (px(4) >> 8 & 0xff) == 100)
    val items = spark.createDataset(Seq(
      Multimodal.MediaItem(1L, "image", bytes, 4, 2, 0, 1)))
    val r = Multimodal.pooledChannelStats(items).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L) // out 2x1
    // block (0,0): r values 0,50,0,50 → sum 100 → 100/4 = 25
    // block (1,0): r values 100,150,100,150 → 500/4 = 125
    assert(r.getLong(3) == 25L + 125L) // r_sum over pooled pixels
    // g: rows y=0 (0) and y=1 (100) in every block → 200/4 = 50
    assert(r.getLong(4) == 50L + 50L)
    assert(r.getLong(5) == 200L * 2) // b constant
    assert(r.getInt(6) == 25 && r.getInt(7) == 125) // pooled r min/max
    // odd dimensions refuse loudly instead of silently cropping
    val odd = spark.createDataset(Seq(Multimodal.MediaItem(2L, "image",
      Multimodal.Codecs.encodeBmp(3, 2, (_, _) => 0), 3, 2, 0, 1)))
    intercept[org.apache.spark.SparkException] {
      Multimodal.pooledChannelStats(odd).collect()
    }
  }

  test("REAL JPEG codec: bounded-error round-trip on smooth rasters, " +
    "deterministic within a JVM, loud on garbage") {
    def raster(x: Int, y: Int): Int = {
      val r = math.min(255, x * 16)
      val g = math.min(255, y * 21)
      val b = math.min(255, (x + y) * 9)
      (r << 16) | (g << 8) | b
    }
    val p1 = Multimodal.Codecs.encodeJpeg(16, 12, 0.9f, raster)
    // JPEG magic
    assert((p1(0) & 0xff) == 0xff && (p1(1) & 0xff) == 0xd8)
    // bounded error: the verifiable claim for a LOSSY codec — smooth
    // gradients decode within a small band (a stride/channel-order
    // defect reads ~100+)
    val err = Multimodal.maxAbsChannelError(p1, 16, 12, raster)
    assert(err <= 48, s"JPEG round-trip error out of band: $err")
    assert(err >= 0)
    // deterministic within one JVM: same input → same bytes (the m08
    // oracle leans on the decoder being a fixed function)
    val p2 = Multimodal.Codecs.encodeJpeg(16, 12, 0.9f, raster)
    assert(java.util.Arrays.equals(p1, p2),
      "JPEG encode must be deterministic")
    // a SWAPPED-CHANNEL expectation must blow the band — the check
    // actually discriminates (r and b differ by up to 240 here)
    def swapped(x: Int, y: Int): Int = {
      val v = raster(x, y)
      ((v & 0xff) << 16) | (v & 0xff00) | ((v >> 16) & 0xff)
    }
    assert(Multimodal.maxAbsChannelError(p1, 16, 12, swapped) > 48,
      "the error bound must catch a channel swap")
    intercept[Exception] {
      Multimodal.maxAbsChannelError("not a jpeg".getBytes, 16, 12, raster)
    }
  }
}

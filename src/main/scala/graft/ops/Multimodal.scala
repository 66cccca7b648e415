package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The Spark-side design is real — schema, partitioning, batch iteration,
  * feature schema. Codecs come in two tiers: PNG/BMP/GIF/JPEG are REAL
  * (the JDK's javax.imageio, no external jars — [[Codecs.encodePng]] /
  * [[Codecs.decodeImage]], exercised with pixel-exact oracles by m05);
  * formats the JDK cannot decode (video, audio, JPEG2000…) are STUBBED
  * with deterministic byte-level fakes (a deployment swaps those for
  * JNI/FFI decoders without touching the pipeline).
  *
  * Scale notes: payloads stay in executor memory only for the partition
  * batch being mapped (`mapPartitions` streams the iterator — no
  * `collect`, no whole-partition materialization); decode is map-only and
  * embarrassingly parallel, so throughput scales with executors; outputs
  * are narrow feature rows, so the expensive bytes are dropped before any
  * shuffle.
  */
object Multimodal {

  /** A media row: payload + metadata (the lakehouse schema for media). */
  case class MediaItem(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  /** Extracted features: fixed-width vector + provenance. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])

  /** Deterministic stand-ins for the real codecs. Each consumes the raw
    * payload exactly like a decoder would (full scan of the bytes) and
    * produces a stable, content-dependent result — so pipeline tests
    * exercise realistic data flow and stay reproducible.
    */
  object Codecs {
    // ImageIO wraps every read/write — even over ByteArray streams — in a
    // FileCache stream by default (useCache=true): one temp FILE created,
    // written and deleted per encode/decode call. On the codec hot path
    // (tens of thousands of 16×12 rasters per query) that is pure disk
    // churn whose cost tracks /tmp state, measured as a 4-8× erratic
    // slowdown of m05/m07/m08 inside the full suite. These rasters are
    // hundreds of bytes — memory-cached streams are the only sane mode.
    // JVM-global, executor-side (the object initializes in every JVM
    // that calls a codec).
    javax.imageio.ImageIO.setUseCache(false)

    /** "Decode" = 16-bin byte histogram, L1-normalized — the stub for
      * image decode + embed. A real impl calls the codec here.
      */
    def decodeToFeature(payload: Array[Byte]): Array[Float] = {
      val bins = new Array[Float](16)
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xff) >> 4) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      bins.map(_ / n)
    }

    /** "Resize" = keep every k-th byte (stride sampling). Allocation-free
      * stride copy — this runs per payload on the decode hot path, where
      * boxing every byte into a tuple would dominate the work.
      */
    def resize(payload: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, s"resize factor must be >= 1, got $factor")
      val out = new Array[Byte]((payload.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) {
        out(i) = payload(i * factor)
        i += 1
      }
      out
    }

    /** "Frame sample" = split payload into n_frames equal chunks, take
      * every `stride`-th chunk. Frames whose start offset is past the end
      * of the payload (inconsistent metadata, e.g. n_frames > bytes) are
      * dropped rather than emitted as phantom empty frames.
      */
    def sampleFrames(payload: Array[Byte], nFrames: Int,
        stride: Int): Seq[Array[Byte]] = {
      if (nFrames <= 0) return Seq.empty
      val frameLen = math.max(payload.length / nFrames, 1)
      (0 until nFrames by stride)
        .filter(f => f * frameLen < payload.length)
        .map { f =>
          payload.slice(f * frameLen,
            math.min((f + 1) * frameLen, payload.length))
        }
    }

    // ——— REAL codecs (not stubs): PNG via the JDK's javax.imageio ———
    //
    // The stock JDK ships ImageIO readers/writers for PNG, BMP, GIF and
    // JPEG — no external jars, works headless. These two functions are
    // an actual pixel codec in the plan: m05 generates deterministic
    // rasters, round-trips them through a REAL PNG encode/decode
    // executor-side, and hash-checks per-channel pixel statistics
    // against an oracle that computes the same stats arithmetically
    // (PNG is lossless, so decoded == generated). Formats the JDK
    // lacks (JPEG2000, video, audio) remain behind the stub seam
    // above, documented in SURVEY §8.1.

    /** Encode a width×height RGB raster (row-major packed 0xRRGGBB ints
      * from `rgb(x, y)`) as a real PNG via ImageIO.
      */
    def encodePng(width: Int, height: Int,
        rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "png", out),
        "JDK PNG writer missing")
      out.toByteArray
    }

    /** Encode a width×height RGB raster as a real JPEG via ImageIO at
      * an explicit quality. JPEG is LOSSY, so unlike PNG/BMP/WAV the
      * decoded raster cannot equal the generator — the verifiable
      * claim is BOUNDED ERROR ([[Multimodal.maxAbsChannelError]]): on
      * a smooth raster the JDK decoder's output stays within a small
      * per-channel band of the input, while any stride / channel-order
      * / color-profile defect blows the band by an order of magnitude.
      * m08 oracle-checks exactly that claim (SURVEY §8.1, round 11).
      */
    def encodeJpeg(width: Int, height: Int, quality: Float,
        rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
      require(writers.hasNext, "JDK JPEG writer missing")
      val w = writers.next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      try {
        val p = w.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { w.dispose(); ios.close() }
      out.toByteArray
    }

    /** Encode a width×height RGB raster as a real BMP (24-bit
      * uncompressed — lossless for ANY raster, unlike GIF's ≤256-color
      * palette) via ImageIO. The third real-codec tier next to PNG and
      * WAV.
      */
    def encodeBmp(width: Int, height: Int,
        rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "bmp", out),
        "JDK BMP writer missing")
      out.toByteArray
    }

    /** Decode a PNG/BMP/GIF/JPEG payload to (width, height, packed RGB
      * pixels row-major) via ImageIO. Throws on undecodable bytes — a
      * corrupt payload must fail loudly, not feature-extract garbage.
      */
    def decodeImage(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      // one bulk raster fetch, not per-pixel getRGB calls
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < px.length) { px(i) = px(i) & 0xffffff; i += 1 }
      (w, h, px)
    }

    // ——— REAL audio codec: WAV PCM via the JDK's javax.sound.sampled ———
    //
    // WAV file read/write is pure JDK (AudioSystem over byte streams —
    // no audio device, headless-safe), so like PNG it gets a REAL codec
    // tier: m06 synthesizes deterministic 16-bit PCM, encodes an actual
    // RIFF/WAVE file, decodes it back executor-side and hash-checks
    // sample statistics against an oracle recomputing the generator
    // arithmetic (PCM is lossless). Compressed audio (MP3/AAC/Opus)
    // stays behind the stub seam (SURVEY §8.1).

    // AudioSystem.write / getAudioInputStream route EVERY call through
    // JDK13Services.getProviders — a SYNCHRONIZED, TTL-cached provider
    // scan. On the codec hot path (thousands of tiny clips across 32
    // task threads) that global lock serializes the whole stage: m06
    // measured 46-52 s of summed task time for ~2 s of single-threaded
    // byte work (tasks "running" but blocked on the registry lock).
    // Resolve the WAVE provider ONCE per JVM and call it directly —
    // the SAME JDK codec object AudioSystem would pick, minus the
    // per-call synchronized lookup (guide §4.5: heavyweight init once).
    private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .asScala
        .find(_.isFileTypeSupported(
          javax.sound.sampled.AudioFileFormat.Type.WAVE))
        .getOrElse(throw new IllegalStateException(
          "JDK WAVE writer missing"))
    }
    private lazy val wavReaders
        : Seq[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      val all = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.toSeq
      // probe-order ONCE: registry order tries SoftMidiAudioFileReader
      // before the RIFF reader, and ITS header probe re-enters the
      // synchronized MIDI provider registry on EVERY call — thread dumps
      // showed 27/32 task threads BLOCKED on that class lock (this is
      // true of the stock AudioSystem path too). The reader that accepts
      // a minimal RIFF/WAVE payload serves the hot path first; the rest
      // stay as fallbacks so non-WAV payloads keep the full contract.
      val probe = encodeWav(Array[Short](0), 8000)
      val (wav, rest) = all.partition { r =>
        try { r.getAudioInputStream(
          new java.io.ByteArrayInputStream(probe)).close(); true }
        catch { case _: Exception => false }
      }
      wav ++ rest
    }

    /** Encode signed 16-bit mono PCM samples as a real WAV
      * (RIFF/WAVE, PCM16LE) via AudioSystem.
      */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, /* signed */ true,
        /* bigEndian */ false)
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      wavWriter.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode a WAV payload to (sampleRate, channels, interleaved signed
      * 16-bit samples) via AudioSystem. Throws on undecodable bytes or
      * non-16-bit formats — same fail-loudly contract as the image
      * decoder.
      */
    def decodeWav(payload: Array[Byte]): (Int, Int, Array[Short]) = {
      // same provider-iteration contract as AudioSystem.getAudioInputStream
      // (first reader that accepts the header wins), minus its per-call
      // synchronized registry scan
      val ais = wavReaders.iterator.flatMap { r =>
        try Iterator.single(r.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload)))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
            Iterator.empty
        }
      }.nextOption().getOrElse(throw
        new javax.sound.sampled.UnsupportedAudioFileException(
          "no JDK reader accepts this audio payload"))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 &&
        fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"unsupported WAV format: $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val samples = new Array[Short](n)
      val le = !fmt.isBigEndian
      var i = 0
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        samples(i) =
          (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, samples)
    }
  }

  /** Per-image RGB channel statistics through the REAL PNG decode:
    * (media_id, n_px, r_sum, g_sum, b_sum, and per-channel min/max).
    * Map-only, payloads dropped before any shuffle — the same scale
    * shape as [[extractFeatures]], with an actual codec in the middle.
    */
  /** Decode `payload` and return the MAX absolute per-channel error
    * against the expected packed-RGB raster — the bounded-loss claim a
    * LOSSY codec can be oracle-checked on (m08): a healthy JPEG
    * round-trip of a smooth raster stays within a small band; a
    * stride, channel-order or color-profile defect blows it by an
    * order of magnitude. Throws on dimension mismatch or undecodable
    * bytes — fail-loudly, like every codec here.
    */
  def maxAbsChannelError(payload: Array[Byte], width: Int, height: Int,
      expected: (Int, Int) => Int): Int = {
    val (w, h, px) = Codecs.decodeImage(payload)
    require(w == width && h == height,
      s"decoded ${w}x$h != expected ${width}x$height")
    var worst = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val got = px(y * w + x)
        val exp = expected(x, y)
        def ch(v: Int, s: Int): Int = (v >> s) & 0xff
        var e = math.abs(ch(got, 16) - ch(exp, 16))
        e = math.max(e, math.abs(ch(got, 8) - ch(exp, 8)))
        e = math.max(e, math.abs(ch(got, 0) - ch(exp, 0)))
        if (e > worst) worst = e
        x += 1
      }
      y += 1
    }
    worst
  }

  def pngChannelStats(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = Codecs.decodeImage(m.payload)
        var (rs, gs, bs) = (0L, 0L, 0L)
        var (rmin, gmin, bmin) = (255, 255, 255)
        var (rmax, gmax, bmax) = (0, 0, 0)
        var i = 0
        while (i < px.length) {
          val r = (px(i) >> 16) & 0xff
          val g = (px(i) >> 8) & 0xff
          val b = px(i) & 0xff
          rs += r; gs += g; bs += b
          if (r < rmin) rmin = r; if (r > rmax) rmax = r
          if (g < gmin) gmin = g; if (g > gmax) gmax = g
          if (b < bmin) bmin = b; if (b > bmax) bmax = b
          i += 1
        }
        (m.media_id, (w * h).toLong, rs, gs, bs,
          rmin, rmax, gmin, gmax, bmin, bmax)
      }
    }.toDF("media_id", "n_px", "r_sum", "g_sum", "b_sum",
      "r_min", "r_max", "g_min", "g_max", "b_min", "b_max")
  }

  /** REAL image RESIZE on REAL decoded pixels: decode the payload
    * (BMP/PNG — any lossless ImageIO format), 2×2 AVERAGE-POOL each
    * channel with exact integer floor (the canonical box downsample),
    * and report channel statistics of the RESIZED raster —
    * (media_id, out_w, out_h, r_sum, g_sum, b_sum, min/max per
    * channel). This swaps the byte-level resize stub (m04's seam) for
    * an actual raster operation behind an actual codec, with
    * arithmetic an oracle can recompute exactly. Map-only; payloads
    * and full-resolution rasters never cross a shuffle — at 100 TB the
    * resize runs where the bytes already are and only the pooled
    * statistics move.
    */
  def pooledChannelStats(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = Codecs.decodeImage(m.payload)
        require(w % 2 == 0 && h % 2 == 0,
          s"2x2 pool needs even dims, got ${w}x$h")
        val (ow, oh) = (w / 2, h / 2)
        var (rs, gs, bs) = (0L, 0L, 0L)
        var (rmin, gmin, bmin) = (255, 255, 255)
        var (rmax, gmax, bmax) = (0, 0, 0)
        var by = 0
        while (by < oh) {
          var bx = 0
          while (bx < ow) {
            var (r4, g4, b4) = (0, 0, 0)
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val p = px((by * 2 + dy) * w + bx * 2 + dx)
                r4 += (p >> 16) & 0xff
                g4 += (p >> 8) & 0xff
                b4 += p & 0xff
                dx += 1
              }
              dy += 1
            }
            val (r, g, b) = (r4 / 4, g4 / 4, b4 / 4)
            rs += r; gs += g; bs += b
            if (r < rmin) rmin = r; if (r > rmax) rmax = r
            if (g < gmin) gmin = g; if (g > gmax) gmax = g
            if (b < bmin) bmin = b; if (b > bmax) bmax = b
            bx += 1
          }
          by += 1
        }
        (m.media_id, ow.toLong, oh.toLong, rs, gs, bs,
          rmin, rmax, gmin, gmax, bmin, bmax)
      }
    }.toDF("media_id", "out_w", "out_h", "r_sum", "g_sum", "b_sum",
      "r_min", "r_max", "g_min", "g_max", "b_min", "b_max")
  }

  /** Per-clip PCM sample statistics through the REAL WAV decode:
    * (media_id, sample_rate, n_samples, s_sum, s_min, s_max). Map-only,
    * payloads dropped before any shuffle — m05's scale shape with an
    * audio codec in the middle.
    */
  def wavSampleStats(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val (rate, channels, samples) = Codecs.decodeWav(m.payload)
        require(channels == 1, s"mono contract: $channels channels")
        var sum = 0L
        var mn = Int.MaxValue
        var mx = Int.MinValue
        var i = 0
        while (i < samples.length) {
          val v = samples(i).toInt
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        (m.media_id, rate, samples.length.toLong, sum, mn, mx)
      }
    }.toDF("media_id", "sample_rate", "n_samples", "s_sum", "s_min",
      "s_max")
  }

  /** Batch feature extraction: binary in, features out, per partition. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          Codecs.decodeToFeature(m.payload))
      }
    }
  }

  /** Resize-then-decode: stride-sample each payload (the "thumbnail" step)
    * before feature extraction — the remaining codec stub driven through
    * the same batch pipeline shape.
    */
  def extractResizedFeatures(items: Dataset[MediaItem],
      factor: Int): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val resized = Codecs.resize(m.payload, factor)
        MediaFeatures(m.media_id, m.kind, resized.length.toLong,
          Codecs.decodeToFeature(resized))
      }
    }
  }

  /** Frame-sampled video → one feature row per kept frame, with the
    * frame's byte length (provenance a downstream consumer needs, and what
    * makes the histogram invertible for the m03 oracle).
    */
  def extractFrameFeatures(items: Dataset[MediaItem],
      stride: Int): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.flatMap { m =>
        Codecs.sampleFrames(m.payload, m.n_frames, stride).zipWithIndex.map {
          case (frame, idx) =>
            (m.media_id, idx * stride, frame.length.toLong,
              Codecs.decodeToFeature(frame))
        }
      }
    }.toDF("media_id", "frame_no", "frame_bytes", "feature")
  }

  /** Synthesize a MediaItem table from any (id, text) source — lets the
    * plumbing run against the testdata `documents` table.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String,
      kind: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        MediaItem(id, kind, bytes, width = bytes.length, height = 1,
          sample_rate = 16000, n_frames = math.max(bytes.length / 64, 1))
      }
  }
}

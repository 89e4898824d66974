package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches. IMAGE decode/resize is REAL — `javax.imageio` PNG codec (in
  * the JDK, so present in any executor) runs inside `mapPartitions`;
  * image fixtures are deterministic synthesized PNGs (no media files ship
  * in this environment). AUDIO decode is REAL too — `javax.sound.sampled`
  * WAV/PCM parser (also in the JDK), over deterministic synthesized RIFF
  * containers. Only VIDEO decode stays a clearly-marked stub (H.264 has
  * no JDK codec and is genuinely impossible offline); the plumbing —
  * schema, partitioning, batch shape, feature layout — is identical.
  *
  * Layout mirrors production multimodal pipelines: assets stay binary
  * through the plan (no driver collect), decode/feature-extract runs
  * inside `mapPartitions` so further codecs drop in without touching the
  * dataflow, and features come back as fixed-width `Array[Float]` columns
  * ready for the Similarity operators.
  */
object Multimodal {

  /** An opaque media asset: bytes + typed metadata. */
  case class MediaAsset(asset_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  /** Decoded features: fixed-width embedding + sampled frame offsets. */
  case class MediaFeatures(asset_id: Long, media_type: String, n_bytes: Int,
      embedding: Array[Float], frame_offsets: Array[Int])

  /** Build a synthetic asset table from `documents` (payload = UTF-8 bytes;
    * stands in for real image/audio blobs with the same schema shape). */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int").as("width"),
        (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"))
      .as[MediaAsset]
  }

  /** Thread-local PNG codec with RASTER REUSE — the fix for the per-image
    * allocation pressure SCALE.md measured on the m1 rehearsal (a fresh
    * BufferedImage + raster per decode → GC churn at corpus scale):
    * repeated dimensions decode into the SAME destination raster
    * (`ImageReadParam.setDestination`). A returned image is valid only
    * until the thread's next decode — every caller here walks the raster
    * immediately. Any fast-path mismatch (non-PNG payload, incompatible
    * destination raster) falls back to a plain `ImageIO.read`. (Fixture
    * ENCODE goes through `encodeGrayPng` below — the decode side here is
    * the real javax.imageio codec and validates those streams.) */
  private final class PngCodec {
    PngCodec.disableFileCache
    private val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private var dest: java.awt.image.BufferedImage = null

    private def isPng(p: Array[Byte]): Boolean =
      p.length > 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte

    /** Decode, reusing the previous destination raster when dims match;
      * null when the payload is not a decodable image. */
    def decode(payload: Array[Byte]): java.awt.image.BufferedImage =
      if (!isPng(payload))
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      else try {
        // MemoryCache explicitly: the default createImageInputStream wraps
        // an InputStream in a FileCacheImageInputStream — a TEMP FILE
        // written per decode (r16 probe: the hidden I/O in the m1/m4
        // per-asset cost). The payload is already an in-memory array;
        // nothing about the decode should touch a disk.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          reader.setInput(iis, true, true)
          val param = reader.getDefaultReadParam
          if (dest != null && dest.getWidth == reader.getWidth(0) &&
              dest.getHeight == reader.getHeight(0))
            param.setDestination(dest)
          dest = reader.read(0, param)
          dest
        } finally iis.close()
      } catch {
        case _: Exception =>
          dest = null // destination type mismatch — drop it and re-read plainly
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      }

  }
  private object PngCodec {
    /** Process-wide, once: the `ImageIO.read(InputStream)` fallback paths
      * otherwise spool every in-memory payload through a temp FILE
      * (FileCacheImageInputStream is ImageIO's default wrapping). */
    lazy val disableFileCache: Unit = javax.imageio.ImageIO.setUseCache(false)
    private val tl = new ThreadLocal[PngCodec] {
      override def initialValue(): PngCodec = new PngCodec
    }
    def get(): PngCodec = tl.get()
  }

  /** Thread-local cache of the JDK's `AudioFileReader` SPI instances.
    * `AudioSystem.getAudioInputStream` re-resolves the provider list on
    * EVERY call through a synchronized static registry — with 32 executor
    * threads in the m1/m4 decode loops, the r16 probe's thread dumps
    * showed 28/32 threads convoyed on that lock. The readers are
    * stateless; resolving them once per thread through the same public
    * `ServiceLoader` SPI keeps the decode the REAL JDK codec with zero
    * shared state on the hot path (the audio analogue of `PngCodec`). */
  private object WavCodec {
    private val tl = new ThreadLocal[Seq[javax.sound.sampled.spi.AudioFileReader]] {
      override def initialValue(): Seq[javax.sound.sampled.spi.AudioFileReader] = {
        import scala.jdk.CollectionConverters._
        val all = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .iterator().asScala.toSeq
        // RIFF/WAVE readers first: the registry order probes AIFF (9 µs
        // reject), AU (8 µs), and Gervill's SoftMidi reader (89 µs
        // reject — it attempts a full MIDI parse) before WaveFileReader
        // accepts in 0.6 µs (measured, SCALE.md r16). Audio formats have
        // disjoint magics, so the accepting reader — and thus the
        // result — is identical under any order; non-WAV payloads (the
        // video arm) still fall through the full list to a rejection.
        val (wave, rest) = all.partition(_.getClass.getSimpleName.startsWith("Wave"))
        wave ++ rest
      }
    }

    /** AudioSystem.getAudioInputStream semantics: first provider that
      * accepts the stream wins; UnsupportedAudioFileException when none
      * does (ByteArrayInputStream supports the mark/reset the SPI
      * contract requires between attempts). */
    def stream(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val readers = tl.get()
      val in = new java.io.ByteArrayInputStream(payload)
      if (readers.isEmpty) // no SPI visible (exotic runtime): registry path
        return javax.sound.sampled.AudioSystem.getAudioInputStream(in)
      val it = readers.iterator
      while (it.hasNext) {
        val r = it.next()
        try return r.getAudioInputStream(in)
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => in.reset()
        }
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        s"no AudioFileReader accepts this ${payload.length}-byte payload")
    }
  }

  /** Minimal 8-bit-grayscale PNG ENCODER (sig + IHDR + one IDAT + IEND,
    * filter 0 scanlines, BEST_SPEED deflate) — the FIXTURE side of the
    * image gates, ~10× faster than the ImageIO writer per tiny image
    * (the writer's per-call stream/metadata setup dominated the m3
    * rehearsal: 650k frame encodes at 10×). Everything the OPERATORS do —
    * the decode path — still goes through the real javax.imageio codec,
    * which also validates these streams (the codec round-trip specs pin
    * decoded == arithmetic). Chunk layout is the public PNG spec. */
  private def encodeGrayPng(w: Int, h: Int, sample: (Int, Int) => Int): Array[Byte] = {
    val raw = new Array[Byte](h * (w + 1))
    var p = 0
    var y = 0
    while (y < h) {
      raw(p) = 0 // filter type None per scanline
      p += 1
      var x = 0
      while (x < w) { raw(p) = sample(x, y).toByte; p += 1; x += 1 }
      y += 1
    }
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    defl.setInput(raw); defl.finish()
    val zBuf = new Array[Byte](raw.length + 64)
    var zLen = 0
    while (!defl.finished()) {
      if (zLen == zBuf.length) sys.error("deflate overflow") // tiny rasters never grow
      zLen += defl.deflate(zBuf, zLen, zBuf.length - zLen)
    }
    defl.end()
    val bos = new java.io.ByteArrayOutputStream(zLen + 64)
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(typ: String, data: Array[Byte], len: Int): Unit = {
      def be32(v: Int): Array[Byte] =
        Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      bos.write(be32(len))
      val t = typ.getBytes("US-ASCII")
      bos.write(t)
      bos.write(data, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data, 0, len)
      bos.write(be32(crc.getValue.toInt))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    chunk("IHDR", ihdr, 13)
    chunk("IDAT", zBuf, zLen)
    chunk("IEND", Array.emptyByteArray, 0)
    bos.toByteArray
  }

  /** Deterministic tiny grayscale PNG: pixel (x, y) carries sample
    * (seed + x + y) % 256. A REAL PNG — decoded by the JDK's ImageIO
    * codec — whose decoded statistics are arithmetically predictable, so
    * the decode path is oracle-checkable without shipping image files. */
  def pngPayload(seed: Long, w: Int, h: Int): Array[Byte] =
    encodeGrayPng(w, h, (x, y) => ((seed + x + y) % 256).toInt)

  /** REAL image decode (javax.imageio, runs on executors inside
    * mapPartitions): parses the payload's actual PNG structure and reads
    * the pixel raster. Returns (width, height, sum of band-0 samples), or
    * None when the payload is not a decodable image (ImageIO returns null
    * — the video arm). */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Long)] = {
    val img = PngCodec.get().decode(payload)
    if (img == null) None
    else {
      val r = img.getRaster
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += r.getSample(x, y, 0); x += 1 }
        y += 1
      }
      Some((img.getWidth, img.getHeight, sum))
    }
  }

  /** Byte-histogram fallback "embedding" for payloads without a JDK codec
    * (video bytes; audio assets whose payload is not a RIFF container):
    * deterministic, same signature and batch discipline as the real image
    * path in extractFeatures. */
  def decodeStub(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xFF) % dim) += 1f; i += 1 }
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** Canonical 44-byte RIFF/WAVE container around 16-bit mono LE PCM —
    * the FIXTURE side of the audio gates, the audio analogue of
    * `encodeGrayPng`: `AudioSystem.write` resolves its writer through the
    * same synchronized registry as the read side and serialized the m4
    * synthesis loop (r16 probe: 87 µs/asset with 28/32 threads parked).
    * Chunk layout is the public WAV spec; byte-identical to the JDK
    * writer's output for this format (a spec pins that), and the REAL
    * `javax.sound.sampled` codec still parses every byte on the decode
    * side. */
  private def riffWav(data: Array[Byte], sampleRate: Int): Array[Byte] = {
    val out = new Array[Byte](44 + data.length)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, 36 + data.length); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16) // PCM fmt chunk is 16 bytes
    le16(20, 1) // audio format 1 = PCM
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate * 2) // byte rate = rate × blockAlign
    le16(32, 2) // blockAlign = channels × bytesPerSample
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Deterministic 16-bit mono PCM WAV: sample i = ((seed + i) % 65536) −
    * 32768, in a REAL RIFF/WAVE container (`riffWav`) — the audio
    * analogue of `pngPayload`: the decoded sample statistics are
    * arithmetically predictable, so the decode path is oracle-checkable
    * without shipping audio files. */
  def wavPayload(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((seed + i) % 65536) - 32768).toInt
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    riffWav(data, sampleRate)
  }

  /** REAL audio decode (javax.sound.sampled, executor-side): parses the
    * payload's actual RIFF/WAVE structure, streams the PCM frames, and
    * returns (sampleRateHz, nSamples, Σ|sample|) for 16-bit mono
    * little-endian PCM — None when the payload is not a decodable WAV
    * (the video arm: H.264 has no JDK codec and stays a marked stub). */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val ais = WavCodec.stream(payload)
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian) None
        else {
          val bytes = ais.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < bytes.length) {
            // little-endian signed 16-bit: sign-extended high byte | low
            val s = (bytes(i + 1).toInt << 8) | (bytes(i) & 0xFF)
            sum += math.abs(s)
            i += 2
          }
          Some((fmt.getSampleRate.toInt, bytes.length / 2, sum))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }

  /** REAL audio decode to the full sample array (javax.sound.sampled,
    * executor-side): (sampleRateHz, samples) for 16-bit mono LE PCM, None
    * when the payload is not a decodable WAV. The per-sample form the
    * quality stats (m4) need — `decodeAudio` keeps the cheaper
    * running-sum shape for m1. */
  def decodePcm(payload: Array[Byte]): Option[(Int, Array[Int])] =
    try {
      val ais = WavCodec.stream(payload)
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian) None
        else {
          val bytes = ais.readAllBytes()
          val out = new Array[Int](bytes.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)
            i += 1
          }
          Some((fmt.getSampleRate.toInt, out))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }

  /** Wrap raw 16-bit mono samples in a REAL RIFF/WAVE container. */
  def wavOf(samples: Array[Int], sampleRate: Int = 8000): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    riffWav(data, sampleRate)
  }

  /** m4 fixture samples: s(i) = (id·131 + i·997) % 65536 − 32768 — an
    * affine stride that SWEEPS the 16-bit range, so clipping counts,
    * peaks, and zero crossings genuinely vary per asset (the m1 gradient
    * formula parks every small-id asset near −32768, which would make the
    * quality columns constant). */
  def m4Samples(assetId: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i => ((assetId * 131 + i.toLong * 997) % 65536).toInt - 32768)

  /** m4 row: per-asset audio quality stats from DECODED PCM. */
  case class AudioQuality(asset_id: Long, sample_rate_hz: Int, n_samples: Int,
      peak_abs: Int, clip_ppm: Long, energy: Long, zero_crossings: Int)

  /** m4 gate: audio QUALITY stats — the filters an audio-curation pass
    * drops assets on (clipped masters, digital silence, DC-stuck
    * captures), computed from javax.sound.sampled's ACTUAL parse of the
    * deterministic synthesized WAV (`wavPayload`, the m1 fixtures):
    *  - peak_abs = max |s|            (digital-silence / level check)
    *  - clip_ppm = ⌊#{|s| ≥ 32000}·10⁶ / n⌋   (clipping detector)
    *  - energy   = Σ s²               (loudness proxy, exact integer —
    *    an RMS needs a √ the oracle can't match bit-for-bit; rank order
    *    is identical, which is all a threshold filter uses)
    *  - zero_crossings = #{i : sign(sᵢ₋₁) ≠ sign(sᵢ)} with sign = [s<0]
    *    (the classic voiced/noise discriminator)
    * All-integer arithmetic end-to-end, so the DuckDB oracle predicts
    * every column from the fixture formula (`m4Samples`:
    * s(i) = (id·131 + i·997) % 65536 − 32768, n = id%50+10).
    * Map-only: one scan, no shuffle — at lake scale this rides the same
    * per-asset codec economics as m1 (measured linear in SCALE.md). */
  def audioQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir)
      .filter(col("media_type") === "audio")
      .mapPartitions(_.map { a =>
        val n = (a.asset_id % 50 + 10).toInt
        val (rate, s) = decodePcm(wavOf(m4Samples(a.asset_id, n)))
          .getOrElse(sys.error(s"asset ${a.asset_id}: synthesized WAV failed to decode"))
        var peak = 0; var clip = 0L; var energy = 0L; var zc = 0
        var i = 0
        while (i < s.length) {
          val v = s(i); val av = math.abs(v)
          if (av > peak) peak = av
          if (av >= 32000) clip += 1
          energy += v.toLong * v
          if (i > 0 && (s(i - 1) < 0) != (v < 0)) zc += 1
          i += 1
        }
        AudioQuality(a.asset_id, rate, s.length, peak,
          clip * 1000000L / s.length, energy, zc)
      }).toDF()
      .orderBy("asset_id")
  }

  /** Pixel-histogram embedding from a DECODED image: 16 buckets over the
    * 8-bit gray range, normalized by pixel count. */
  def imageEmbedding(payload: Array[Byte], dim: Int = 16): Option[Array[Float]] = {
    val img = PngCodec.get().decode(payload)
    if (img == null) None
    else {
      val r = img.getRaster
      val hist = new Array[Float](dim)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { hist(r.getSample(x, y, 0) * dim / 256) += 1f; x += 1 }
        y += 1
      }
      val n = math.max(1, img.getWidth * img.getHeight).toFloat
      Some(hist.map(_ / n))
    }
  }

  /** Frame sampling STUB: every `stride` bytes = one "frame" offset. */
  def sampleFrames(payloadLen: Int, stride: Int = 64, maxFrames: Int = 8): Array[Int] =
    (0 until payloadLen by stride).take(maxFrames).toArray

  /** Target dimensions: longest side to `maxSide`, preserving aspect
    * ratio. Floor-scaled, the SAME rule as the column-expressed
    * `mediaResize` gate (round-half would both diverge from it and be
    * engine-ambiguous). */
  def resizeDims(width: Int, height: Int, maxSide: Int = 512): (Int, Int) = {
    val longest = math.max(width, height)
    if (longest <= maxSide) (width, height)
    else {
      val scale = maxSide.toDouble / longest
      (math.max(1, math.floor(width * scale).toInt), math.max(1, math.floor(height * scale).toInt))
    }
  }

  /** REAL pixel resize of a decodable image payload: decode, scale the
    * raster through Graphics2D (bilinear), re-encode as PNG. Returns None
    * for payloads without a JDK codec. */
  def resizeImage(payload: Array[Byte], maxSide: Int = 512): Option[Array[Byte]] = {
    val img = PngCodec.get().decode(payload)
    if (img == null) None
    else {
      val (tw, th) = resizeDims(img.getWidth, img.getHeight, maxSide)
      val imgType =
        if (img.getType == java.awt.image.BufferedImage.TYPE_CUSTOM)
          java.awt.image.BufferedImage.TYPE_INT_RGB
        else img.getType
      val out = new java.awt.image.BufferedImage(tw, th, imgType)
      val g2 = out.createGraphics()
      try {
        g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(img, 0, 0, tw, th, null)
      } finally g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** Resize over the asset table: image payloads are REALLY re-encoded
    * (decode → raster scale → PNG encode, all executor-side in this
    * mapPartitions); payloads without a JDK codec pass through with the
    * metadata transform only. */
  def resize(in: Dataset[MediaAsset], maxSide: Int = 512): Dataset[MediaAsset] = {
    import in.sparkSession.implicits._
    in.mapPartitions(_.map { a =>
      val (w, h) = resizeDims(a.width, a.height, maxSide)
      resizeImage(a.payload, maxSide) match {
        case Some(p) => a.copy(width = w, height = h, payload = p)
        case None    => a.copy(width = w, height = h)
      }
    })
  }

  /** Feature extraction: batched per-partition map — the Scala analogue of
    * a pandas-batch UDF (mapInPandas): assets stream through in
    * `batchSize` groups, the shape a vectorized codec/model inference
    * wants, and nothing leaves the executor. Decodable images get a REAL
    * pixel-histogram embedding (ImageIO decode); other payloads fall back
    * to the byte-histogram stub. A real model would run ONE batched
    * forward pass per group. grouped() is lazy over the partition
    * iterator, so peak memory is one batch of payloads, not the
    * partition. */
  def extractFeatures(in: Dataset[MediaAsset], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import in.sparkSession.implicits._
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { a =>
          val emb = imageEmbedding(a.payload).getOrElse(decodeStub(a.payload))
          MediaFeatures(a.asset_id, a.media_type, a.payload.length,
            emb, sampleFrames(a.payload.length))
        }
      }
    }
  }

  /** m2 gate: the resize metadata transform, column-expressed so the
    * whole asset→resize pipeline is oracle-checkable (the payload
    * re-encode is the stubbed part; the dimension arithmetic is the part
    * Spark's planner sees). floor-based scaling: identical integer
    * results in both engines (no round-half ambiguity). */
  def mediaResize(spark: SparkSession, dir: String, maxSide: Int = 512): DataFrame = {
    val a = assets(spark, dir).toDF()
    val longest = greatest(col("width"), col("height"))
    def scaled(c: org.apache.spark.sql.Column) =
      greatest(lit(1), floor(c * maxSide / longest).cast("int"))
    a.select(col("asset_id"), col("width"), col("height"),
        when(longest <= maxSide, col("width")).otherwise(scaled(col("width"))).as("new_width"),
        when(longest <= maxSide, col("height")).otherwise(scaled(col("height"))).as("new_height"))
      .orderBy("asset_id")
  }

  /** Motion-PNG toy video container: one REAL PNG per frame tick
    * (`frameIntervalMs` apart) covering [0, min(duration, maxWindowMs)],
    * concatenated — the MJPEG layout with a lossless per-frame codec, so
    * decoded frame statistics stay arithmetically predictable (JPEG's
    * lossy DCT would not be). Frame f carries pixel (x, y) =
    * (seed + 7·f + x + y) % 256 — frames genuinely differ, so a demuxer
    * that returns the wrong frame for a timestamp cannot hash-match. */
  def videoPayload(seed: Long, w: Int, h: Int, durationMs: Long,
      frameIntervalMs: Int = 250, maxWindowMs: Int = 9500): Array[Byte] = {
    val n = (math.min(durationMs, maxWindowMs.toLong) / frameIntervalMs).toInt + 1
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < n) { bos.write(pngPayload(seed + 7L * f, w, h)); f += 1 }
    bos.toByteArray
  }

  /** Chunk-walking demuxer for the motion-PNG container: each frame is
    * located by PARSING its actual structure — verify the 8-byte PNG
    * signature, then walk (length, type, data, crc) chunks to IEND —
    * never by scanning for byte patterns (the signature can occur inside
    * a zlib stream). Returns (offset, length) per frame; a real
    * fixed-rate container would expose the same seekable frame index. */
  private[llm] def demuxMotionPng(payload: Array[Byte]): IndexedSeq[(Int, Int)] = {
    def be32(p: Int): Int =
      ((payload(p) & 0xFF) << 24) | ((payload(p + 1) & 0xFF) << 16) |
        ((payload(p + 2) & 0xFF) << 8) | (payload(p + 3) & 0xFF)
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var off = 0
    while (off < payload.length) {
      require(off + 8 <= payload.length &&
        (0 until 8).forall(i => (payload(off + i) & 0xFF) == sig(i)),
        s"no PNG signature at frame boundary $off")
      var p = off + 8
      var done = false
      while (!done) {
        // a truncated final frame (cut-off chunk header or body) must
        // surface as the same structured failure as a bad signature —
        // carrying the offending offset — never a raw array-bounds throw
        require(p + 8 <= payload.length,
          s"truncated chunk header at offset $p (frame starting at $off)")
        val len = be32(p)
        // compare in Long: a crafted len near Int.MaxValue would wrap
        // p + 12 + len negative and sail past an int-typed guard, turning
        // the NEXT iteration into the raw array-bounds throw this guard
        // exists to prevent
        require(len >= 0 && p + 12L + len <= payload.length,
          s"truncated chunk body at offset $p (len=$len, frame starting at $off)")
        val isEnd = payload(p + 4) == 'I' && payload(p + 5) == 'E' &&
          payload(p + 6) == 'N' && payload(p + 7) == 'D'
        p += 12 + len
        if (isEnd) done = true
      }
      out += ((off, p - off))
      off = p
    }
    out.toIndexedSeq
  }

  /** m3 row: a REALLY-decoded sampled frame. */
  case class FrameRow(asset_id: Long, duration_ms: Long, frame_idx: Int,
      frame_ts_ms: Long, width_px: Int, height_px: Int, gray_sum: Long)

  /** m3 gate: video frame sampling with REAL per-frame decode — per video
    * asset, synthesize its motion-PNG container (`videoPayload`, frames
    * every `frameIntervalMs`), DEMUX it by walking actual PNG chunk
    * structure, pick every `strideMs` (skipping the in-between frames, as
    * a seeking sampler would), and ImageIO-DECODE exactly the sampled
    * frames, emitting each frame's true raster dimensions and band-0
    * pixel sum. The oracle predicts the decoded values arithmetically
    * from the fixture formula, so a broken container writer, demuxer,
    * frame seek, or decoder all hash-diverge. The `maxFrames` cap bounds
    * per-asset fan-out (≤ 20 rows per video regardless of duration).
    *
    * 100 TB: map-only (no join, no shuffle) — demux + decode run
    * executor-side inside mapPartitions, reading only sampled frames,
    * which is exactly how a container with a frame index behaves; the
    * real-world H.264/VP9 arm stays out of scope (no JDK codec — the
    * decode CALL here swaps for a JNI codec binding, the dataflow does
    * not change). */
  def frameSample(spark: SparkSession, dir: String, strideMs: Int = 500,
      maxFrames: Int = 20, frameIntervalMs: Int = 250): DataFrame = {
    require(strideMs > 0 && maxFrames > 0, "need positive stride and frame cap")
    require(strideMs % frameIntervalMs == 0,
      "sample stride must land on container frame ticks")
    import spark.implicits._
    val step = strideMs / frameIntervalMs
    assets(spark, dir)
      .filter(col("media_type") === "video")
      .mapPartitions(_.flatMap { a =>
        // tiny true raster dims (the x72 trick): metadata width/height
        // stay the declared asset dims; the ENCODED frames are small so
        // the real codec round-trip stays cheap at corpus scale
        val w = (a.asset_id % 16 + 1).toInt
        val h = (a.asset_id % 9 + 1).toInt
        // the container window must cover the last sampled timestamp for
        // ANY (strideMs, maxFrames) — the hard-coded 9500 default only
        // matched the default arguments; non-defaults indexed past the
        // demuxed frame table. (With the defaults (500, 20) this expression
        // IS 9500, so every existing oracle/spec hash is unchanged.)
        val windowMs = (maxFrames - 1) * strideMs
        val payload = videoPayload(a.asset_id, w, h, a.duration_ms,
          frameIntervalMs, maxWindowMs = windowMs)
        val frames = demuxMotionPng(payload)
        val lastTs = math.min(a.duration_ms, (maxFrames - 1).toLong * strideMs)
        (0 to (lastTs / strideMs).toInt).iterator.map { k =>
          val (o, l) = frames(k * step)
          val (fw, fh, sum) = decodeImage(
            java.util.Arrays.copyOfRange(payload, o, o + l))
            .getOrElse(sys.error(s"asset ${a.asset_id}: frame ${k * step} failed to decode"))
          FrameRow(a.asset_id, a.duration_ms, k, k.toLong * strideMs, fw, fh, sum)
        }
      }).toDF()
      .orderBy("asset_id", "frame_idx")
  }

  /** 64-bit perceptual average-hash of a decodable image (the pHash
    * family's cheapest member — the standard first pass of image near-dup
    * detection in multimodal training-data pipelines): sample the raster
    * on a fixed 8×8 grid (cell (i, j) reads pixel (⌊i·w/8⌋, ⌊j·h/8⌋) of
    * band 0), threshold every sample against the grid mean, pack the 64
    * bits. All-integer: bit(i, j) = [64·s(i, j) ≥ Σ samples] avoids the
    * mean division, so the hash is bit-identical to an arithmetic
    * recomputation (the oracle's). Returned as (hi, lo) 32-bit halves in
    * [0, 2³²) — avoids the sign bit of a packed 64-bit long in engines
    * whose BIGINT overflows at 2⁶³. None when the payload has no JDK
    * codec. */
  def aHash64(payload: Array[Byte]): Option[(Long, Long)] = {
    val img = PngCodec.get().decode(payload)
    if (img == null) None
    else {
      val r = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      val s = new Array[Long](64)
      var sum = 0L
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          val v = r.getSample(i * w / 8, j * h / 8, 0).toLong
          s(j * 8 + i) = v; sum += v
          i += 1
        }
        j += 1
      }
      var hi = 0L; var lo = 0L
      var idx = 0
      while (idx < 64) {
        if (64L * s(idx) >= sum) {
          if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
        }
        idx += 1
      }
      Some((hi, lo))
    }
  }

  /** x72 row: the perceptual hash of a REALLY-decoded image. */
  case class PhashRow(asset_id: Long, width_px: Int, height_px: Int,
      phash_hi: Long, phash_lo: Long)

  /** x72 gate: per image asset, the 8×8 average-hash computed from
    * ImageIO's ACTUAL parse of a deterministic synthesized PNG
    * (`pngPayload(asset_id, w, h)` — pixel (x, y) = (asset_id + x + y)
    * % 256), executor-side in mapPartitions. The DuckDB oracle recomputes
    * the identical hash arithmetically from the pixel formula, so a broken
    * encoder, decoder, raster walk, grid rule, or bit packing all diverge
    * immediately — the same witness trick as m1, extended from raster
    * SUMS to the full perceptual-hash bit layout. Map-only: no shuffle,
    * no join; at lake scale this is one scan producing an 8-byte column,
    * the index every image-dedup pass downstream (x72b) reuses. */
  def imagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir)
      .filter(col("media_type") === "image")
      .mapPartitions(_.map { a =>
        val w = (a.asset_id % 16 + 1).toInt
        val h = (a.asset_id % 9 + 1).toInt
        val (hi, lo) = aHash64(pngPayload(a.asset_id, w, h))
          .getOrElse(sys.error(s"asset ${a.asset_id}: synthesized PNG failed to decode"))
        PhashRow(a.asset_id, w, h, hi, lo)
      }).toDF()
      .orderBy("asset_id")
  }

  /** Deterministic "frequency-pattern" grayscale PNG: pixel (x, y) =
    * (seed · (y·w + x)) % 256 — a stripe pattern whose spatial frequency
    * IS the seed, so different seeds yield perceptually DIFFERENT images
    * (unlike the m1 gradient, which aHash correctly sees as all-alike)
    * while equal seeds yield pixel-identical ones. */
  def pngFreqPayload(seed: Long, w: Int, h: Int): Array[Byte] =
    encodeGrayPng(w, h, (x, y) => ((seed * (y.toLong * w + x)) % 256).toInt)

  /** Quadratic-phase pattern PNG for the x72b fixture: with q = y·w + x,
    * pixel = ((block%256)·q + ((block/256)%256)·q²) % 256. The family has
    * 65536 distinct patterns (vs 256 for the linear stripe), so
    * DUP-CLUSTER SIZE STAYS CONSTANT as the corpus grows — the property
    * the 10× rehearsal's decorrelation contract demands (a fixed-modulus
    * seed made clusters grow with the corpus and pair output quadratic:
    * measured 17.5× at 10× before this fixture). */
  def pngQuadPayload(block: Long, w: Int, h: Int): Array[Byte] = {
    val lo = block % 256; val hi = (block / 256) % 256
    encodeGrayPng(w, h, { (x, y) =>
      val q = y.toLong * w + x
      ((lo * q + hi * q * q) % 256).toInt
    })
  }

  /** x72b gate: image NEAR-DUP pairs by perceptual-hash hamming distance —
    * the multimodal analogue of the SimHash text path (x4). The corpus is
    * a planted-structure variant of the x72 fixtures: every image gets the
    * SAME dims (16×9) and a quadratic-phase payload keyed on its 72-id
    * BLOCK (`pngQuadPayload(asset_id / 72)`), so the ~24 image assets of a
    * block are pixel-identical (hamming 0) and distinct blocks are
    * visually distinct patterns — dup clusters stay ~24 strong no matter
    * how large the corpus, so pair output (and time — measured 10×
    * rehearsal) grows LINEARLY. Pairing never goes all-pairs: candidates
    * come from equality on one of four 16-bit hash chunks (pigeonhole:
    * hamming ≤ 3 ⇒ some chunk is untouched, so ≤ `maxHamming` 3 is
    * EXACT), then the full 64-bit hamming verifies via two 32-bit
    * xor/bit_count — the same blocking shape `DocDedup.simhashPairs`
    * scales on (and the same chunk-saturation knob: x4e's auto width is
    * the documented fix past ~10⁵ images). Output: (asset_a, asset_b,
    * hamming), asset_a < asset_b, deduped across chunk collisions. */
  def imageNearDup(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16-bit chunk blocking is exact only for hamming <= 3")
    import spark.implicits._
    val hashed = assets(spark, dir)
      .filter(col("media_type") === "image")
      .mapPartitions(_.map { a =>
        val (hi, lo) = aHash64(pngQuadPayload(a.asset_id / 72, 16, 9))
          .getOrElse(sys.error(s"asset ${a.asset_id}: synthesized PNG failed to decode"))
        (a.asset_id, hi, lo)
      }).toDF("asset_id", "phash_hi", "phash_lo")
      // both chunk-join sides read this frame — the barrier makes the
      // codec pass run ONCE (unbarriered, each side re-decoded every
      // image); GC releases the blocks (see minhashPairs)
      .localCheckpoint(false)
    // four 16-bit chunks: (hi >> 16, hi & 0xFFFF, lo >> 16, lo & 0xFFFF)
    val chunks = hashed.select(col("asset_id"), col("phash_hi"), col("phash_lo"),
      posexplode(array(
        shiftright(col("phash_hi"), 16), col("phash_hi").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("phash_lo"), 16), col("phash_lo").bitwiseAND(lit(0xFFFFL))))
        .as(Seq("chunk_no", "chunk")))
    val a = chunks.as("a"); val b = chunks.as("b")
    val hamming =
      bit_count(col("a.phash_hi").bitwiseXOR(col("b.phash_hi"))) +
        bit_count(col("a.phash_lo").bitwiseXOR(col("b.phash_lo")))
    a.join(b, col("a.chunk_no") === col("b.chunk_no") &&
        col("a.chunk") === col("b.chunk") &&
        col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("asset_a"), col("b.asset_id").as("asset_b"),
        hamming.cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("asset_a", "asset_b")
  }

  /** x72c: image dedup APPLY — the keep-list x72b's pairs exist to
    * produce, mirroring the text-side x30/x17 composition on the
    * multimodal corpus: near-dup pairs → connected components
    * (`DocDedup.dedupClusters`, the same checkpointed small-star loop) →
    * keep the minimum asset id per cluster; singletons keep themselves.
    * Output: (asset_id, cluster_id, kept). Perceptual-hash cliques are
    * shallow (the fixture's are diameter 1), so the CC loop converges in
    * one round; everything else is doc_id-keyed joins. */
  def imageDedupApply(spark: SparkSession, dir: String): DataFrame = {
    // materialize-once (Tables.materializeOnce): the image CC labels are a
    // per-refresh artifact exactly like the text-side x17 labels
    val clusters = graft.Tables.materializeOnce(spark, s"img_cc_labels:$dir")(
        DocDedup.dedupClusters(imageNearDup(spark, dir)
          .select(col("asset_a").as("id_a"), col("asset_b").as("id_b"))))
      .withColumnRenamed("doc_id", "asset_id")
    val gid = coalesce(col("cluster_id"), col("asset_id"))
    assets(spark, dir).toDF()
      .filter(col("media_type") === "image").select("asset_id")
      .join(clusters, Seq("asset_id"), "left")
      .select(col("asset_id"), gid.as("cluster_id"),
        (gid === col("asset_id")).as("kept"))
      .orderBy("asset_id")
  }

  /** m5: caption-quality asset filter — the multimodal curation step
    * LAION-style pipelines run before training (drop assets whose paired
    * text is junk): each asset's caption is its document's text; the
    * caption score is the oracle-checked x8 quality signal; keep = a
    * decodable modality (video has no codec — the marked stub) AND
    * caption quality ≥ `minQuality`. The cross-modal join is doc_id ==
    * asset_id — at lake scale both sides are keyed scans, and the filter
    * composes with x38's keep-list semantics (semi-join on kept ids). */
  def captionFilter(spark: SparkSession, dir: String,
      minQuality: Double = 0.5): DataFrame = {
    val q = TextStats.qualityScore(spark, dir)
      .select(col("doc_id").as("asset_id"), col("quality_score"))
    assets(spark, dir).toDF().select("asset_id", "media_type")
      .join(q, Seq("asset_id"))
      .select(col("asset_id"), col("media_type"), col("quality_score"),
        (col("media_type") =!= "video" && col("quality_score") >= minQuality).as("keep"))
      .orderBy("asset_id")
  }

  /** m1 row: metadata stats + REAL-decode columns (null for assets the
    * JDK has no codec for — after the audio arm, that is only video). */
  case class MediaStat(asset_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long,
      width_px: Option[Int], height_px: Option[Int], gray_mean_ppm: Option[Long],
      sample_rate_hz: Option[Int], n_samples: Option[Int], pcm_abs_mean_ppm: Option[Long])

  /** Gate entry: metadata + SQL-expressible stats over the binary column
    * (octet_length matches DuckDB exactly), PLUS genuinely-decoded image
    * columns: each image asset carries a deterministic synthesized PNG
    * (pngPayload — tiny dims so the oracle predicts the pixel function
    * arithmetically), and width_px/height_px/gray_mean_ppm come out of
    * ImageIO's ACTUAL parse of those PNG bytes inside this mapPartitions.
    * A broken encoder, decoder, or raster walk diverges from the DuckDB
    * oracle immediately. gray_mean_ppm = floor(sum(samples)*1e6 / pixels)
    * — integer arithmetic end-to-end, bit-identical across engines.
    *
    * The AUDIO arm is the same trick through the other JDK codec: each
    * audio asset carries a deterministic synthesized WAV (`wavPayload`,
    * (asset_id % 50 + 10) samples), and sample_rate_hz / n_samples /
    * pcm_abs_mean_ppm come out of javax.sound.sampled's ACTUAL parse of
    * those RIFF bytes. pcm_abs_mean_ppm = floor(Σ|sample| * 1e6 / n) —
    * |·| keeps the integer division nonnegative (floor-vs-truncate on
    * negatives is engine-ambiguous). Video columns stay null (no JDK
    * codec — the one remaining marked stub). */
  def mediaStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir).mapPartitions(_.map { a =>
      val decoded =
        if (a.media_type == "image") {
          val w = (a.asset_id % 16 + 1).toInt
          val h = (a.asset_id % 9 + 1).toInt
          decodeImage(pngPayload(a.asset_id, w, h))
        } else None
      val audio =
        if (a.media_type == "audio")
          decodeAudio(wavPayload(a.asset_id, (a.asset_id % 50 + 10).toInt))
        else None
      MediaStat(a.asset_id, a.media_type, a.payload.length,
        a.width, a.height, a.duration_ms,
        decoded.map(_._1), decoded.map(_._2),
        decoded.map(d => d._3 * 1000000L / (d._1.toLong * d._2)),
        audio.map(_._1), audio.map(_._2),
        audio.map(d => d._3 * 1000000L / d._2))
    }).toDF()
      .orderBy("asset_id")
  }
}

package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches. IMAGE decode/resize is REAL — `javax.imageio` PNG codec (in
  * the JDK, so present in any executor) runs inside `mapPartitions`;
  * image fixtures are deterministic synthesized PNGs (no media files ship
  * in this environment). Audio/video decode stays a clearly-marked
  * deterministic stub (no PCM/H.264 codec in the JDK); the plumbing —
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

  /** Deterministic tiny grayscale PNG: pixel (x, y) carries sample
    * (seed + x + y) % 256. A REAL PNG — encoded by the JDK's ImageIO
    * codec — whose decoded statistics are arithmetically predictable, so
    * the decode path is oracle-checkable without shipping image files. */
  def pngPayload(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, ((seed + x + y) % 256).toInt); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode (javax.imageio, runs on executors inside
    * mapPartitions): parses the payload's actual PNG structure and reads
    * the pixel raster. Returns (width, height, sum of band-0 samples), or
    * None when the payload is not a decodable image (ImageIO returns null
    * — the audio/video arm). */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Long)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
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
    * (audio/video bytes): deterministic, same signature and batch
    * discipline as the real image path in extractFeatures. */
  def decodeStub(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xFF) % dim) += 1f; i += 1 }
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** Pixel-histogram embedding from a DECODED image: 16 buckets over the
    * 8-bit gray range, normalized by pixel count. */
  def imageEmbedding(payload: Array[Byte], dim: Int = 16): Option[Array[Float]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
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
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
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

  /** m3 gate: video frame-sampling plan — one row per sampled frame
    * timestamp, every `strideMs` ms from 0 through duration, capped at
    * `maxFrames` per asset. The DECODE of each frame is the stubbed part;
    * the row explosion (sequence + posexplode, a Generator — no join, no
    * shuffle) is the Spark-side plumbing a real sampler rides on. The cap
    * bounds the fan-out per asset: the explode multiplies rows ≤64× no
    * matter how long the video, so downstream partition sizing stays
    * predictable at lake scale. */
  def frameSample(spark: SparkSession, dir: String, strideMs: Int = 500,
      maxFrames: Int = 20): DataFrame = {
    require(strideMs > 0 && maxFrames > 0, "need positive stride and frame cap")
    val lastTs = least(col("duration_ms"), lit((maxFrames - 1).toLong * strideMs))
    assets(spark, dir).toDF()
      .filter(col("media_type") === "video")
      .select(col("asset_id"), col("duration_ms"),
        posexplode(sequence(lit(0L), lastTs, lit(strideMs.toLong)))
          .as(Seq("frame_idx", "frame_ts_ms")))
      .select(col("asset_id"), col("duration_ms"),
        col("frame_idx").cast("int").as("frame_idx"), col("frame_ts_ms"))
      .orderBy("asset_id", "frame_idx")
  }

  /** m1 row: metadata stats + REAL-decode columns (null for assets the
    * JDK has no codec for). */
  case class MediaStat(asset_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long,
      width_px: Option[Int], height_px: Option[Int], gray_mean_ppm: Option[Long])

  /** Gate entry: metadata + SQL-expressible stats over the binary column
    * (octet_length matches DuckDB exactly), PLUS genuinely-decoded image
    * columns: each image asset carries a deterministic synthesized PNG
    * (pngPayload — tiny dims so the oracle predicts the pixel function
    * arithmetically), and width_px/height_px/gray_mean_ppm come out of
    * ImageIO's ACTUAL parse of those PNG bytes inside this mapPartitions.
    * A broken encoder, decoder, or raster walk diverges from the DuckDB
    * oracle immediately. gray_mean_ppm = floor(sum(samples)*1e6 / pixels)
    * — integer arithmetic end-to-end, bit-identical across engines. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir).mapPartitions(_.map { a =>
      val decoded =
        if (a.media_type == "image") {
          val w = (a.asset_id % 16 + 1).toInt
          val h = (a.asset_id % 9 + 1).toInt
          decodeImage(pngPayload(a.asset_id, w, h))
        } else None
      MediaStat(a.asset_id, a.media_type, a.payload.length,
        a.width, a.height, a.duration_ms,
        decoded.map(_._1), decoded.map(_._2),
        decoded.map(d => d._3 * 1000000L / (d._1.toLong * d._2)))
    }).toDF()
      .orderBy("asset_id")
  }
}

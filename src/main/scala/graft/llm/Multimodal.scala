package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches. The DECODE step is a clearly-marked deterministic STUB (no
  * media codecs in this environment); everything around it — schema,
  * partitioning, batch shape, feature layout — is real Spark and tested.
  *
  * Layout mirrors production multimodal pipelines: assets stay binary
  * through the plan (no driver collect), decode/feature-extract runs
  * inside `mapPartitions` so a real codec drops in without touching the
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

  /** STUB decoder ???: a real implementation would hand `payload` to a
    * codec (JPEG/PNG/PCM/H.264). Here: a deterministic byte-histogram
    * "embedding" so the plumbing is testable end-to-end. Same signature,
    * same batch discipline. */
  def decodeStub(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xFF) % dim) += 1f; i += 1 }
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** Frame sampling STUB: every `stride` bytes = one "frame" offset. */
  def sampleFrames(payloadLen: Int, stride: Int = 64, maxFrames: Int = 8): Array[Int] =
    (0 until payloadLen by stride).take(maxFrames).toArray

  /** Resize STUB ???: a real implementation re-encodes the pixel buffer; the
    * metadata transform (the part Spark sees) is real — targets the longest
    * side to `maxSide`, preserving aspect ratio. Floor-scaled, the SAME
    * rule as the column-expressed `mediaResize` gate (round-half would
    * both diverge from it and be engine-ambiguous). */
  def resizeDims(width: Int, height: Int, maxSide: Int = 512): (Int, Int) = {
    val longest = math.max(width, height)
    if (longest <= maxSide) (width, height)
    else {
      val scale = maxSide.toDouble / longest
      (math.max(1, math.floor(width * scale).toInt), math.max(1, math.floor(height * scale).toInt))
    }
  }

  /** Resize over the asset table: metadata columns update; payload passes
    * through (stub — a codec would rewrite it in the same mapPartitions). */
  def resize(in: Dataset[MediaAsset], maxSide: Int = 512): Dataset[MediaAsset] = {
    import in.sparkSession.implicits._
    in.mapPartitions(_.map { a =>
      val (w, h) = resizeDims(a.width, a.height, maxSide)
      a.copy(width = w, height = h)
    })
  }

  /** Feature extraction: batched per-partition map — the Scala analogue of
    * a pandas-batch UDF (mapInPandas): assets stream through in
    * `batchSize` groups, the shape a vectorized codec/model inference
    * wants, and nothing leaves the executor. The stub decodes
    * element-wise inside the batch; a real model would run ONE batched
    * forward pass per group. grouped() is lazy over the partition
    * iterator, so peak memory is one batch of payloads, not the
    * partition. */
  def extractFeatures(in: Dataset[MediaAsset], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import in.sparkSession.implicits._
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { a =>
          MediaFeatures(a.asset_id, a.media_type, a.payload.length,
            decodeStub(a.payload), sampleFrames(a.payload.length))
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

  /** Gate entry: metadata + SQL-expressible stats over the binary column
    * (octet_length matches DuckDB exactly); features themselves are
    * covered by ScalaTest. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).toDF()
      .select(col("asset_id"), col("media_type"),
        length(col("payload")).as("n_bytes"), col("width"), col("height"), col("duration_ms"))
      .orderBy("asset_id")
}

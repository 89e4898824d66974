package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MEASURED evidence for the r14→r15 e17/e18 fix (the r14 `weak`): the
  * per-batch LABEL-STORE WRITE must be ∝ the batch plus the membership of
  * the components it touches, NOT the full known corpus. r14 made the CC
  * COMPUTE batch-proportional but still serialized the complete label
  * table per micro-batch ("the unavoidable O(known) column write" — it
  * wasn't); r15 persists only `ccStepDelta`'s relabeled rows.
  *
  * The probe synthesizes a known corpus of K docs (quad clusters, label
  * artifact persisted to parquet — the real store shape), a FIXED-size
  * batch of B docs half of which attach to existing quads and half open
  * new singletons, then times + sizes the two write strategies against
  * the same stored prior:
  *   - delta = `ccStepDelta(...).write`  (r15 path: relabeled rows only)
  *   - full  = `ccStep(...).write`       (r14 path: complete next version)
  * at K and 10·K. The pass criterion is the SCALE.md row: delta rows and
  * bytes stay ~flat as the known set grows 10× under a constant batch;
  * full grows ~linearly — the asymptote the r14 verdict flagged.
  *
  * Usage: scripts/run.sh graft.streaming.LabelScaleProbe [K] [B]
  */
object LabelScaleProbe {

  def main(args: Array[String]): Unit = {
    val k0 = args.headOption.map(_.toLong).getOrElse(1000000L)
    val b = args.lift(1).map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("| known K | batch B | delta rows | delta bytes | delta (s) | full rows | full bytes | full (s) |")
    println("|---|---|---|---|---|---|---|---|")
    for (k <- Seq(k0, k0 * 10)) {
      val r = measureAt(spark, k, b)
      println(f"| $k | $b | ${r._1}%d | ${r._2}%d | ${r._3}%.2f | ${r._4}%d | ${r._5}%d | ${r._6}%.2f |")
    }
    // r16 (VERDICT ask #2): the FOLD itself — r15's one remaining
    // O(corpus) write — must now be ∝ touched buckets, not the known set:
    // a fixed-size delta confined to 2 of 16 buckets must fold ~2/16 of
    // the base's bytes at both K and 10·K.
    println()
    println("| known K | buckets touched/total | base bytes | fold bytes | fold/base ppm | fold (s) |")
    println("|---|---|---|---|---|---|")
    for (k <- Seq(k0, k0 * 10)) {
      val r = measureFoldAt(spark, k)
      println(f"| $k | ${r._1}%d/16 | ${r._2}%d | ${r._3}%d | ${r._4}%d | ${r._5}%.2f |")
    }
    spark.stop()
  }

  /** (touchedBuckets, baseBytes, foldBytes, foldPerBasePpm, foldSec): a
    * 10k-row delta confined to buckets {0,1} of 16, folded over a K-doc
    * bucketed seed — the r16 sharded-fold write cost. */
  def measureFoldAt(spark: SparkSession, k: Long): (Int, Long, Long, Long, Double) = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_foldscale_$k")
    graft.Tables.registerArtifactCleanup(tmp)
    java.nio.file.Files.writeString(tmp.resolve("fold_buckets"), "16")
    spark.range(0, k)
      .select(col("id").as("doc_id"),
        (col("id") - col("id") % 4).as("cluster_id"),
        pmod(col("id"), lit(16L)).cast("int").as("bucket"))
      .write.partitionBy("bucket")
      .parquet(tmp.resolve("labels_fold_g0").toString)
    // fixed-size delta: 10k known docs relabeled, all in buckets {0,1}
    spark.range(0, 80000L)
      .filter(pmod(col("id"), lit(16L)) <= 1)
      .select(col("id").as("doc_id"), lit(0L).as("cluster_id"))
      .write.parquet(tmp.resolve("labels_d0").toString)
    val t0 = System.nanoTime()
    EventsStream.compactLabelStore(spark, tmp, upTo = 1L)
    val foldSec = (System.nanoTime() - t0) / 1e9
    val baseBytes = dirBytes(tmp.resolve("labels_fold_g0").toFile)
    val foldBytes = dirBytes(tmp.resolve("labels_fold_g1").toFile)
    val touched = Option(tmp.resolve("labels_fold_g1").toFile.listFiles())
      .fold(0)(_.count(_.getName.startsWith("bucket=")))
    (touched, baseBytes, foldBytes, foldBytes * 1000000L / baseBytes, foldSec)
  }

  private def dirBytes(f: java.io.File): Long =
    if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(dirBytes).sum)
    else f.length()

  /** (deltaRows, deltaBytes, deltaSec, fullRows, fullBytes, fullSec) at
    * known-set size k; seconds are median-of-3 of compute+write. */
  def measureAt(spark: SparkSession, k: Long,
      b: Long): (Long, Long, Double, Long, Long, Double) = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_labelscale_$k")
    graft.Tables.registerArtifactCleanup(tmp)
    val known = spark.range(0, k).select(col("id").as("doc_id"))
    // quad clusters over the known set — the stored prior label artifact
    known.select(col("doc_id"), (col("doc_id") - col("doc_id") % 4).as("cluster_id"))
      .write.parquet(tmp.resolve("labels_prior").toString)
    val prior = spark.read.parquet(tmp.resolve("labels_prior").toString)
    // pair artifact: known-internal quad star edges (realistic scan cost)
    // + batch edges — even batch docs attach to a pseudo-random existing
    // quad, odd batch docs arrive edge-free (new singletons)
    val knownEdges = known.filter(col("doc_id") % 4 =!= 0)
      .select((col("doc_id") - col("doc_id") % 4).as("id_a"), col("doc_id").as("id_b"))
    val batch = spark.range(k, k + b).select(col("id").as("doc_id"))
    val batchEdges = batch.filter(col("doc_id") % 2 === 0)
      .select((pmod(col("doc_id") * 7919L, lit(k))
        - pmod(col("doc_id") * 7919L, lit(k)) % 4).as("id_a"),
        col("doc_id").as("id_b"))
    knownEdges.unionByName(batchEdges)
      .write.parquet(tmp.resolve("pairs").toString)
    val pairs = spark.read.parquet(tmp.resolve("pairs").toString)
    def med3(run: () => Unit): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); run()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)
    val deltaDir = tmp.resolve("labels_d0")
    val fullDir = tmp.resolve("labels_v1")
    val deltaSec = med3(() =>
      EventsStream.ccStepDelta(pairs, prior, batch)
        .write.mode("overwrite").parquet(deltaDir.toString))
    val fullSec = med3(() =>
      EventsStream.ccStep(pairs, prior, batch)
        .write.mode("overwrite").parquet(fullDir.toString))
    (spark.read.parquet(deltaDir.toString).count(), dirBytes(deltaDir.toFile),
      deltaSec,
      spark.read.parquet(fullDir.toString).count(), dirBytes(fullDir.toFile),
      fullSec)
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle-byte probe for registered gates: runs a query twice (first
  * untimed — JIT/codegen/file listing), accumulating per-stage
  * shuffle-write bytes via a listener on the second run, and prints one
  * machine-readable line. "Measure, don't guess" for exchange-width
  * claims (e.g. the x59 string→hash join-key slimming).
  *
  * Usage:
  *   scripts/run.sh graft.ShuffleProbe <gateName> [sfDir]
  *   scripts/run.sh graft.ShuffleProbe --table [sfDir] [outCsv]
  *
  * `--table` probes the pinned WIDE-GATE set (the shuffle-heaviest
  * pipelines) and writes one CSV row per gate — committed per round
  * (SHUFFLE.csv) so exchange-width claims are diffable round-over-round
  * instead of quoted from one-off shell runs.
  */
object ShuffleProbe {
  /** The widest gates by shuffle/checkpoint traffic (r8 bench + probe
    * sessions): corpus-scan pipelines with banded self-joins, CC rounds,
    * ensembles, span rebuilds. A FIXED list, so the per-round CSV diffs
    * row-for-row; extend when a new gate joins the wide set. */
  val wideGates: Seq[String] = Seq(
    "x15_ngram_jaccard", "x17_dedup_clusters", "x3_minhash_pairs",
    "x38_training_set", "x39_span_dedup", "x45_pagerank",
    "x56_bigram_lm", "x59_filter_ensemble", "x60_contamination_report",
    "x62_substring_decontaminate", "x74_dup_span_profile", "x75_leak_safe_split",
    // round 11: the two new shingle-family pipelines (per-source df agg,
    // distinct-(shingle, source) self-join), the two-level-rank manifest,
    // the multi-family data card, and the iterative k-core peel
    "x93_boilerplate_ratio", "x95_source_overlap", "x97_curriculum_order",
    "x105_source_datacard", "x106_kcore_peel")

  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse(sys.error("usage: ShuffleProbe <gate>|--table [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics.shuffleWriteMetrics
        if (sys.env.contains("SHUFFLE_PROBE_VERBOSE") && m.bytesWritten > 0)
          println(s"  stage=${s.stageInfo.stageId} name=${s.stageInfo.name} " +
            s"bytes=${m.bytesWritten} records=${m.recordsWritten}")
        bytes.addAndGet(m.bytesWritten)
        rows.addAndGet(m.recordsWritten)
        ()
      }
    })
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    /** (rows, shuffleBytes, shuffleRecords, ckptBytes, sec) for one gate. */
    def probe(name: String): (Long, Long, Long, Long, Double) = {
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown gate $name"))
      fn(spark, sfDir).count() // warm: codegen + page cache, not the measurement
      sweep()
      Thread.sleep(500)
      bytes.set(0L); rows.set(0L)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the last stage-completed events drain
      // localCheckpoint barriers store RDD blocks, not shuffle files — for
      // barrier-heavy pipelines that block footprint is the exchange-width
      // figure that matters (it is exactly the block-manager pressure the
      // bench has to sweep between queries)
      val ckptBytes = spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
      sweep()
      (n, bytes.get, rows.get, ckptBytes, sec)
    }
    if (gate == "--table") {
      val outCsv = args.lift(2).getOrElse("SHUFFLE.csv")
      val sb = new StringBuilder(
        "gate,rows,shuffle_write_bytes,shuffle_write_records,checkpoint_block_bytes,sf\n")
      for (name <- wideGates) {
        val (n, b, r, c, sec) = probe(name)
        // elapsed deliberately NOT in the CSV: byte counts are
        // deterministic per plan and diff cleanly; times wobble per JVM
        println(f"SHUFFLE_PROBE gate=$name rows=$n shuffle_write_bytes=$b elapsed=$sec%.3f")
        sb.append(s"$name,$n,$b,$r,$c,$sfDir\n")
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(outCsv),
        sb.toString.getBytes("UTF-8"))
      println(s"wrote $outCsv")
    } else {
      val (n, b, r, c, sec) = probe(gate)
      println(f"SHUFFLE_PROBE gate=$gate rows=$n shuffle_write_bytes=$b " +
        f"shuffle_write_records=$r checkpoint_block_bytes=$c " +
        f"elapsed=$sec%.3f sf=$sfDir")
    }
    spark.stop()
  }
}

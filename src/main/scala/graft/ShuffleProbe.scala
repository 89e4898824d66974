package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle-byte probe for a single registered gate: runs the query twice
  * (first untimed — JIT/codegen/file listing), accumulating per-stage
  * shuffle-write bytes via a listener on the second run, and prints one
  * machine-readable line. "Measure, don't guess" for exchange-width
  * claims (e.g. the x59 string→hash join-key slimming).
  *
  * Usage: scripts/run.sh graft.ShuffleProbe <gateName> [sfDir]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse(sys.error("usage: ShuffleProbe <gate> [sfDir]"))
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
    val fn = SparkEntry.queries.getOrElse(gate, sys.error(s"unknown gate $gate"))
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
    fn(spark, sfDir).count() // warm: codegen + page cache, not the measurement
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
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
    println(f"SHUFFLE_PROBE gate=$gate rows=$n shuffle_write_bytes=${bytes.get} " +
      f"shuffle_write_records=${rows.get} checkpoint_block_bytes=$ckptBytes " +
      f"elapsed=$sec%.3f sf=$sfDir")
    spark.stop()
  }
}

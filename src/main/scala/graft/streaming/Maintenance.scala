package graft.streaming

import org.apache.spark.sql.SparkSession

/** Out-of-band store maintenance — the scheduler entry point for
  * deployments that disable the in-stream policy
  * (`maintenanceEvery ≤ 0`) and run retention from cron/Airflow instead:
  * fold + vacuum the e17/e18 label and split stores at the checkpoint's
  * COMMITTED FRONTIER, derived from the commit log — never past it (the
  * r14 ADVICE contract, enforced by `requireWithinFrontier` inside the
  * ckDir-taking compact overloads).
  *
  * Safe to run while the stream is DOWN or BETWEEN triggers it owns: the
  * fold boundary is the committed frontier, so the only replay-eligible
  * batch reads the new fold; committed artifacts are never rewritten
  * (compaction skips existing generations), and vacuum removes only what
  * the newest committed fold covers. The one contract the caller owns is
  * not racing a LIVE trigger's reads mid-flight — schedule it the way any
  * lake table's snapshot-expiry job is scheduled.
  *
  * An optional third argument `<minDeltaRatioPpm>` makes the fold
  * CONDITIONAL on the bytes-ratio signal (`labelDeltaRatioPpm` /
  * `splitDeltaRatioPpm`): a store whose uncovered deltas hold less than
  * that many ppm of the base's bytes is left alone — the production
  * cadence policy, amortizing the touched-bucket fold write against a
  * bounded fraction of read-side union/LWW work whatever the batch
  * rate. DEFAULT 100000 (fold once deltas reach 10% of the base —
  * r15 ADVICE: an unconditional default would pay the fold for a few KB
  * of deltas); pass an explicit 0 to fold unconditionally.
  *
  * Usage: scripts/run.sh graft.streaming.Maintenance <storeDir> <ckDir>
  *        [minDeltaRatioPpm=100000; 0 folds unconditionally]
  */
object Maintenance {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Maintenance <storeDir> <checkpointDir> " +
        "[minDeltaRatioPpm=100000; 0 folds unconditionally]")
    val storeDir = java.nio.file.Paths.get(args(0))
    val ckDir = java.nio.file.Paths.get(args(1))
    val minRatioPpm = args.lift(2).map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val frontier = EventsStream.committedFrontier(ckDir)
    println(s"committed frontier: $frontier")
    if (frontier > 0) {
      // label store (e17/e18)
      if (EventsStream.committedLabelFolds(storeDir).nonEmpty) {
        val ratio = EventsStream.labelDeltaRatioPpm(storeDir)
        if (ratio >= minRatioPpm) {
          EventsStream.compactLabelStore(spark, storeDir, frontier, ckDir)
          EventsStream.vacuumLabelStore(storeDir)
          println(s"label store folded at g$frontier and vacuumed " +
            s"(delta ratio $ratio ppm)")
        } else println(s"label store below fold threshold " +
          s"($ratio < $minRatioPpm ppm) — skipped")
      }
      // split store (e18) — present only for the frozen-split chain
      val hasSplit = Option(storeDir.toFile.listFiles())
        .exists(_.exists(f => f.getName == "split_init" ||
          f.getName.startsWith("split_fold_g")))
      if (hasSplit) {
        val ratio = EventsStream.splitDeltaRatioPpm(storeDir)
        if (ratio >= minRatioPpm) {
          EventsStream.compactSplitStore(spark, storeDir, frontier, ckDir)
          EventsStream.vacuumSplitStore(storeDir)
          println(s"split store folded at g$frontier and vacuumed " +
            s"(delta ratio $ratio ppm)")
        } else println(s"split store below fold threshold " +
          s"($ratio < $minRatioPpm ppm) — skipped")
      }
    } else println("no committed batches — nothing to fold")
    spark.stop()
  }
}

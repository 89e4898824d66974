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
  * Usage: scripts/run.sh graft.streaming.Maintenance <storeDir> <ckDir>
  */
object Maintenance {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Maintenance <storeDir> <checkpointDir>")
    val storeDir = java.nio.file.Paths.get(args(0))
    val ckDir = java.nio.file.Paths.get(args(1))
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
        EventsStream.compactLabelStore(spark, storeDir, frontier, ckDir)
        EventsStream.vacuumLabelStore(storeDir)
        println(s"label store folded at g$frontier and vacuumed")
      }
      // split store (e18) — present only for the frozen-split chain
      val hasSplit = Option(storeDir.toFile.listFiles())
        .exists(_.exists(f => f.getName == "split_init" ||
          f.getName.startsWith("split_fold_g")))
      if (hasSplit) {
        EventsStream.compactSplitStore(spark, storeDir, frontier, ckDir)
        EventsStream.vacuumSplitStore(storeDir)
        println(s"split store folded at g$frontier and vacuumed")
      }
    } else println("no committed batches — nothing to fold")
    spark.stop()
  }
}

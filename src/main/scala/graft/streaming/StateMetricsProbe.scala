package graft.streaming

import org.apache.spark.sql.SparkSession

/** Diagnostic main: run the stateful streaming gates at a given SF dir on
  * the pinned RocksDB state-store provider and print the MEASURED state
  * footprint per stateful operator — rows in state, provider-reported
  * memory, and the RocksDB SST/memory custom metrics — so SCALE.md's
  * streaming-state sizing section quotes executed numbers, not the
  * watermark-bound argument alone.
  *
  * Usage: scripts/run.sh graft.streaming.StateMetricsProbe [sfDir] [gates]
  */
object StateMetricsProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gates = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "e1b_stream_hourly", "e7_stream_sliding", "e8_stream_dedup",
      "e10_stream_sessions", "e10b_session_window", "e11_stream_join",
      "e12_stream_outer_join", "e13_stream_full_outer", "e14_stream_join_agg"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    for (g <- gates) {
      // clear BEFORE each gate: a stateless (foreachBatch) drain would
      // otherwise leave the previous gate's state operators attributed to
      // this gate's name (r13 advisor finding)
      EventsStream.lastGateProgress = Array.empty
      EventsStream.lastStoreDir = None
      val n = graft.SparkEntry.queries(g)(spark, dir).count()
      // e17/e18 keep their cross-batch state in versioned parquet stores,
      // not RocksDB — report the MEASURED on-disk bytes per version (the
      // artifact a lake refresh would retain/vacuum), so SCALE.md's
      // streaming-store sizing quotes executed numbers
      for (store <- EventsStream.lastStoreDir) {
        def bytes(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(bytes).sum else f.length()
        val versions = store.toFile.listFiles().toSeq.sortBy(_.getName)
        for (v <- versions)
          println(f"$g / store ${v.getName}: ${bytes(v)}%d bytes")
        println(f"$g / store TOTAL: ${bytes(store.toFile)}%d bytes over " +
          s"${versions.size} versions")
      }
      val ops = EventsStream.lastGateProgress.flatMap(_.stateOperators)
        .groupBy(_.operatorName)
      if (ops.isEmpty) println(s"$g: (stateless), drained $n rows")
      for ((name, ps) <- ops.toSeq.sortBy(_._1)) {
        // max across batches of every reported metric; nonzero only — the
        // RocksDB provider's metric names are whatever this Spark build
        // publishes, so print them all instead of guessing keys
        val customMax = ps.flatMap { p =>
          import scala.jdk.CollectionConverters._
          p.customMetrics.asScala.map { case (k, v) => k -> v.longValue }
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
          .filter(_._2 != 0L).toSeq.sortBy(_._1)
        println(s"$g / $name: rowsInState=${ps.map(_.numRowsTotal).max} " +
          s"memoryUsedBytes=${ps.map(_.memoryUsedBytes).max} drained=$n")
        customMax.foreach { case (k, v) => println(s"  $k = $v") }
      }
    }
    spark.stop()
  }
}

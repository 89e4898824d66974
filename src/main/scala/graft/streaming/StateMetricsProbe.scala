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
    println("| gate | operator | rows in state (max) | state mem (max) | rocksdb sst (max) | rocksdb mem (max) |")
    println("|---|---|---|---|---|---|")
    for (g <- gates) {
      val n = graft.SparkEntry.queries(g)(spark, dir).count()
      val ops = EventsStream.lastGateProgress.flatMap(_.stateOperators)
        .groupBy(_.operatorName)
      if (ops.isEmpty) println(s"| $g | (stateless) | — | — | — | — |")
      for ((name, ps) <- ops.toSeq.sortBy(_._1)) {
        def maxCustom(k: String): Long =
          ps.map(p => Option(p.customMetrics.get(k)).map(_.longValue).getOrElse(0L)).max
        println(s"| $g | $name | ${ps.map(_.numRowsTotal).max} " +
          s"| ${ps.map(_.memoryUsedBytes).max} B " +
          s"| ${maxCustom("rocksdbSstFileSize")} B " +
          s"| ${maxCustom("rocksdbTotalMemoryUsage")} B |")
      }
      println(s"<!-- $g drained $n rows -->")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JVM/codegen/file-listing startup shouldn't be
    // attributed to whichever query happens to run first
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Reference-equivalent pipeline timings (BASELINE.md's only published
    // numbers are for ONE transform pass: load→detect 0.86 s and
    // load→anomalies-saved 6.65 s at 2M rows). These keys give the
    // apples-to-apples comparison; "value" stays the all-queries total.
    val rows = graft.Tables.lineitem(spark, sfDir).count()
    val t1 = System.nanoTime()
    graft.queries.Etl.taggedLineitem(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("rejection_reason").isNotNull).count()
    val detectSec = (System.nanoTime() - t1) / 1e9
    val tmp = java.nio.file.Files.createTempDirectory("graft_bench").toString
    val t2 = System.nanoTime()
    val tagged = graft.queries.Etl.taggedLineitem(spark, sfDir)
    graft.etl.Anomalies.splitAnomalies(tagged)
      .write.mode("overwrite").option("compression", "snappy").parquet(s"$tmp/anomalies")
    val e2eSec = (System.nanoTime() - t2) / 1e9
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""pipeline_rows":$rows,"pipeline_detect_sec":$detectSec,""" +
      s""""pipeline_detect_mrows_per_sec":${rows / detectSec / 1e6},""" +
      s""""pipeline_anomaly_save_sec":$e2eSec}""")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Fresh-JVM steady-state probe for the weather-sensitive gates: the r13
  * verdict showed x59/x110 medians inflating 2–3× inside the long 150-
  * query bench JVM (accumulated block-manager/GC state) while a clean JVM
  * reproduces ~1.8 s — but that attribution lived in SCALE.md prose.
  * `Bench` now forks this main (one JVM per gate) and ships the medians
  * machine-readably as the `isolated` map in its JSON line, so the
  * artifact is self-attributing.
  *
  * Protocol: one untimed warm-up run (JIT/codegen/file listing), then a
  * median-of-3; prints exactly one line `ISOLATED {"<gate>":sec,...}`.
  *
  * Usage: scripts/run.sh graft.IsolatedBench <sfDir> <gate[,gate...]>
  */
object IsolatedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val gates = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("x59_filter_ensemble"))
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
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val timed = gates.map { g =>
      val fn = SparkEntry.queries(g)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        sweep(); dt
      }
      once() // untimed warm-up
      g -> (1 to 3).map(_ => once()).sorted.apply(1)
    }
    val body = timed.map { case (g, s) =>
      "\"" + g + "\":" + String.format(java.util.Locale.ROOT, "%.2f", s)
    }.mkString("{", ",", "}")
    println(s"ISOLATED $body")
    spark.stop()
  }
}

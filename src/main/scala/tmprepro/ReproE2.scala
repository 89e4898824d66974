import org.apache.spark.sql.SparkSession
object ReproE2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("repro")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("e2_sessionize","e3_event_gaps","j9_interval_join","e1_hourly_events")) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        println(s"$q OK rows=" + df.count())
      } catch { case t: Throwable => println(s"$q ERR " + t.toString.take(500)) }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of named gate queries (for
  * EXPLAIN.md). Usage: Explain <sfDir> <name1,name2,...> */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    names.foreach { n =>
      println(s"\n## $n\n")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of named gate queries (for
  * EXPLAIN.md). Usage: Explain <sfDir> <name1,name2,...>
  * With a third arg <outDir>, writes `explain("formatted")` output to
  * <outDir>/<name>.txt instead (the plans/r16 audit files). */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val outDir = if (args.length > 2) Some(args(2)) else None
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
      outDir match {
        case Some(dir) =>
          val formatted = SparkEntry.queries(n)(spark, sfDir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$n.txt"),
            formatted.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"wrote $dir/$n.txt")
        case None =>
          println(s"\n## $n\n")
          println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedRank must equal the single-partition global window
  * bit-for-bit — on skewed data, with ties in the primary key, across
  * partition boundaries, and for the running-sum variant. */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish counts with heavy ties (many 1s), keys unique via the id
  // tiebreak; 10k rows over 4 shuffle partitions exercises every
  // boundary-stitch path
  private lazy val df = spark.range(10000)
    .select(concat(lit("t"), col("id")).as("token"),
      (lit(1000000) / (col("id") % 997 + 1)).cast("long").as("n"))
    .localCheckpoint(eager = true)

  private val order = Seq(desc("n"), asc("token"))

  test("rank equals the global row_number window exactly") {
    val got = DistributedRank.rank(df, order, "rank")
      .select("token", "rank").as[(String, Long)].collect().toMap
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("token", "rank").as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("running sum equals the global cumulative window exactly") {
    val got = DistributedRank
      .rankWithRunningSums(df, order, "rank", Seq("n" -> "cum"))
      .select("token", "rank", "cum").as[(String, Long, Long)]
      .collect().sortBy(_._2)
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .withColumn("cum", sum("n").over(w))
      .select("token", "rank", "cum").as[(String, Long, Long)]
      .collect().sortBy(_._2)
    assert(got.toSeq == want.toSeq)
    // ranks are a permutation of 1..N and the running sum is monotone
    assert(got.map(_._2).toSeq == (1L to 10000L))
    assert(got.sliding(2).forall { case Array(a, b) => a._3 <= b._3 })
  }

  test("degenerate inputs: empty frame and all-equal sort key") {
    assert(DistributedRank.rank(df.limit(0), order, "rank").count() == 0)
    val flat = spark.range(100)
      .select(concat(lit("k"), col("id")).as("token"), lit(7L).as("n"))
    val got = DistributedRank.rank(flat, order, "rank")
      .select("token", "rank").as[(String, Long)].collect().toMap
    // all n equal → order falls to the token tiebreak alone
    val want = flat.withColumn("rank",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("token", "rank").as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("the plan windows only within range partitions — never one task") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = DistributedRank.rank(df, order, "rank")
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val globals = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(globals.isEmpty, s"unpartitioned window in DistributedRank:\n$plan")
  }
}

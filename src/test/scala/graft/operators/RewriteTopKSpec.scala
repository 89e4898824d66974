package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The RewriteRowNumberTopK optimizer rule: the row_number-filter-drop
  * idiom must plan as TopKPerKeyExec (bounded heap), with results equal
  * to an independent scalar recompute; unsafe shapes must be left alone. */
class RewriteTopKSpec extends SparkSpec {

  private lazy val li = {
    GraftFunctions.register(spark)
    Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
  }
  private def w = Window.partitionBy("l_returnflag")
    .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))

  private def scalarTopK(k: Int): Set[Seq[Any]] =
    li.collect().groupBy(_.getString(0)).valuesIterator.flatMap { rs =>
      rs.sortBy(r => (-r.getDouble(3), r.getLong(1), r.getInt(2))).take(k)
    }.map(_.toSeq).toSet

  test("row_number idiom plans as TopKPerKey and matches a scalar recompute") {
    val idiom = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rule did not fire:\n$plan")
    assert(!plan.contains("Window ["), s"window must be gone:\n$plan")
    assert(idiom.collect().map(_.toSeq).toSet == scalarTopK(3))
  }

  test("rn < k and rn = 1 comparison forms fire too") {
    val lt = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") < 4).drop("rn")
    assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(lt.collect().map(_.toSeq).toSet == scalarTopK(3))
    val eq = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(eq.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(eq.collect().map(_.toSeq).toSet == scalarTopK(1))
  }

  test("no rewrite when rn stays in the output (schema must keep the rank)") {
    val keepsRn = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val plan = keepsRn.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), "rewrite would drop the rn column")
    assert(plan.contains("Window"))
    assert(keepsRn.drop("rn").collect().map(_.toSeq).toSet == scalarTopK(3))
  }

  test("rn < Int.MinValue does not wrap into a keep-everything rewrite") {
    // the naive k-1 on Int.MinValue wraps to Int.MaxValue and would pass
    // the k > 0 guard, silently turning an always-false filter into
    // keep-2³¹-1-rows-per-key; the k > 1 guard leaves the window plan in
    // place and the filter correctly yields zero rows
    val neg = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") < Int.MinValue).drop("rn")
    assert(!neg.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "an always-false rn filter must not be rewritten")
    assert(neg.count() == 0)
  }

  test("spark.graft.topkRewrite.enabled=false keeps the spillable window plan") {
    spark.conf.set(graft.plans.RewriteRowNumberTopK.enabledConf, "false")
    try {
      val idiom = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
      val plan = idiom.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), "kill switch must disable the rewrite")
      assert(idiom.collect().map(_.toSeq).toSet == scalarTopK(3))
    } finally spark.conf.unset(graft.plans.RewriteRowNumberTopK.enabledConf)
  }

  test("the exec degrades past the buffered-rows cap (spill + merge), not by OOM") {
    spark.conf.set(graft.plans.TopKPerKeyExec.maxBufferedRowsConf, "10")
    try {
      // near-unique keys × k=1: retained rows ≈ #keys ≫ 10, so every
      // partition spills many sorted runs; the rewritten plan must still
      // return exactly the window answer
      val perOrder = Window.partitionBy("l_orderkey")
        .orderBy(desc("l_extendedprice"), asc("l_linenumber"))
      val topk = li.withColumn("rn", row_number().over(perOrder))
        .filter(col("rn") === 1).drop("rn")
      assert(topk.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val got = topk.select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet
      spark.conf.set("spark.graft.topkRewrite.enabled", "false")
      val want = li.withColumn("rn", row_number().over(perOrder))
        .filter(col("rn") === 1).drop("rn")
        .select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet
      assert(got == want, s"spill path diverged: ${got.size} vs ${want.size} rows")
      assert(want.nonEmpty)
    } finally {
      spark.conf.unset(graft.plans.TopKPerKeyExec.maxBufferedRowsConf)
      spark.conf.unset("spark.graft.topkRewrite.enabled")
    }
  }

  test("no rewrite for non-row_number ranks or extra filter conjuncts") {
    val rankBased = li.withColumn("rn", rank().over(w)).filter(col("rn") <= 3).drop("rn")
    assert(!rankBased.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "rank() admits ties — not the same operator")
    val conj = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("l_orderkey") > 0).drop("rn")
    assert(!conj.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "compound predicates are left to the window path")
  }
}

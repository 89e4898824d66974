package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.GraftFunctions
import graft.llm.Similarity
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {

  test("registered SQL functions run through spark.sql and stay exact") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "graft_norm_sq(array(3.0d, 4.0d)) AS n, " +
      "graft_simhash(array(1L, 2L, 3L)) AS sh, " +
      "size(graft_minhash(array(1L, 2L, 3L), 16)) AS mk").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getInt(3) == 16)
    // SQL path == Column API path, bit for bit
    val viaSql = spark.sql("SELECT graft_simhash(array(7L, 8L)) AS s").head().getLong(0)
    assert(viaSql == graft.functions.HashExpressions.simHashJava(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(7L, 8L))))
  }

  test("salted join is semantically identical to the plain inner join") {
    val li = Tables.lineitem(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val plain = li.join(supp, li("l_suppkey") === supp("s_suppkey"), "inner")
      .groupBy("s_suppkey").count()
    val salted = Skew.saltedJoin(
        li.withColumnRenamed("l_suppkey", "s_suppkey"), supp, "s_suppkey",
        saltBy = col("l_orderkey") * 10 + col("l_linenumber"), numSalts = 8)
      .groupBy("s_suppkey").count()
    val diff = plain.withColumnRenamed("count", "a")
      .join(salted.withColumnRenamed("count", "b"), Seq("s_suppkey"), "full")
      .filter(col("a").isNull || col("b").isNull || col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("salted count matches plain groupBy count on a skewed key") {
    import spark.implicits._
    val skewed = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong else 1L, i.toLong))
      .toDF("key", "row_id")
    val plain = skewed.groupBy("key").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(skewed, "key", col("row_id"))
    val diff = plain.join(salted.withColumnRenamed("n", "m"), Seq("key"), "full")
      .filter(col("n") =!= col("m"))
    assert(diff.count() == 0)
  }

  test("IVF top-k: valid ranking, plausible recall vs brute force") {
    val bf = Similarity.topKBruteForce(spark, sfDir, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.topKIvf(spark, sfDir, nQueries = 10, k = 5, nCells = 16, nProbe = 8)
    val got = ivf.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.groupBy("query_id").count().filter(col("count") > 5).count() == 0)
    val recall = (bf & got).size.toDouble / bf.size
    info(s"IVF recall@5 with 8/16 probes: $recall")
    assert(recall > 0.3, s"IVF should beat random cell selection, got $recall")
  }

  test("TopKPerKey custom operator matches the window formulation exactly") {
    GraftFunctions.register(spark)
    val li = Tables.lineitem(spark, sfDir)
    val ordering = Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val custom = graft.plans.TopKPerKey(li, Seq(col("l_returnflag")), ordering, 5)
    // the strategy must actually plan our exec node
    // TreeNode.nodeName strips the Exec suffix in plan strings
    assert(custom.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy(ordering: _*)
    val windowed = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).drop("rn")
    val a = custom.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(_.toSeq).toSet
    val b = windowed.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(_.toSeq).toSet
    assert(a == b, s"custom ${a.size} rows vs window ${b.size}")
    assert(a.size == 15) // 3 flags x top 5
  }

  test("TopKPerKey degrades to spill + merge past the buffer cap, same rows") {
    GraftFunctions.register(spark)
    // high-cardinality keys (one per orderkey) so retained rows ≫ a tiny
    // cap: with the cap at 500 the partition MUST spill several sorted
    // runs and the k-way merge path produces the result
    val li = Tables.lineitem(spark, sfDir)
    val ordering = Seq(col("l_extendedprice").desc, col("l_linenumber").asc)
    val keys = Seq(col("l_orderkey"))
    val expected = graft.plans.TopKPerKey(li, keys, ordering, 2)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(_.toSeq).toSet
    val cap = graft.plans.TopKPerKeyExec.maxBufferedRowsConf
    spark.conf.set(cap, "500")
    try {
      val spilled = graft.plans.TopKPerKey(li, keys, ordering, 2)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .collect().map(_.toSeq).toSet
      assert(spilled == expected,
        s"spill path diverged: ${spilled.size} rows vs ${expected.size}")
      assert(expected.nonEmpty)
    } finally spark.conf.unset(cap)
  }

  test("Tables.widen repartitions narrow scans and passes wide scans through untouched") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_widen").toString
    val df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/narrow")
    df.repartition(8).write.mode("overwrite").parquet(s"$tmp/wide")
    // narrow (1 split < cores/2): the round-robin exchange must be planned
    val narrowPlan = Tables.widen(spark.read.parquet(s"$tmp/narrow"))
      .queryExecution.executedPlan.toString
    assert(narrowPlan.contains("Exchange RoundRobinPartitioning"),
      s"narrow scan must widen to cores:\n$narrowPlan")
    // wide (8 files ≥ cores/2 at local[4]): NO exchange may be added —
    // at lake scale this is the thousands-of-splits case where the old
    // unconditional repartition cost a full-data shuffle for nothing
    val widePlan = Tables.widen(spark.read.parquet(s"$tmp/wide"))
      .queryExecution.executedPlan.toString
    assert(!widePlan.contains("Exchange"),
      s"already-wide scan must pass through with no exchange:\n$widePlan")
  }

  test("plan shape guards: broadcast star join, pruned scan") {
    val w4 = graft.warehouse.StarSchema.factTrips(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!w4.contains("SortMergeJoin"), "fact build must broadcast all dims")
    assert("BroadcastHashJoin".r.findAllIn(w4).size == 4)
    val s1 = graft.queries.Etl.derivedMetrics(spark, sfDir)
      .queryExecution.executedPlan.toString
    // column pruning: the scan must read only the 5 needed columns
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(s1).map(_.group(1)).getOrElse("")
    assert(read.split(",").length <= 5, s"scan reads too much: $read")
    // predicate pushdown: the filter must reach the parquet scan (the plan
    // string truncates long filter lists, so scan forward from the marker
    // instead of bracket-matching)
    val p8 = graft.queries.Etl.pushdownFilter(spark, sfDir)
      .queryExecution.executedPlan.toString
    val idx = p8.indexOf("PushedFilters: [")
    assert(idx >= 0 && p8.substring(idx).take(300).contains("GreaterThan"),
      s"filters not pushed: ${if (idx >= 0) p8.substring(idx).take(200) else "no marker"}")
  }
}

package graft.sources

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("snappy parquet roundtrip preserves data") {
    val out = Files.createTempDirectory("graft_sink").toString
    val li = Tables.lineitem(spark, sfDir).limit(100)
    Sinks.writeParquet(li, s"$out/li")
    assert(spark.read.parquet(s"$out/li").count() == 100)
  }

  test("timestamped side-output embeds the stamp in the path") {
    val out = Files.createTempDirectory("graft_sink").toString
    val path = Sinks.writeTimestamped(Tables.lineitem(spark, sfDir).limit(5), out,
      now = java.time.LocalDateTime.of(2026, 8, 12, 10, 30, 0))
    assert(path.endsWith("anomalies_20260812_103000.parquet"))
    assert(spark.read.parquet(path).count() == 5)
  }

  test("partitioned write prunes partitions on read") {
    val out = Files.createTempDirectory("graft_sink").toString
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("ship_date", to_date(col("l_shipdate")))
    Sinks.writePartitioned(li, s"$out/fact", "ship_date")
    val oneDay = li.select(max("ship_date")).head().getDate(0)
    val pruned = spark.read.parquet(s"$out/fact").filter(col("ship_date") === lit(oneDay))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "date filter must hit partition pruning")
    assert(pruned.count() == li.filter(col("ship_date") === lit(oneDay)).count())
  }

  test("csv roundtrip (Power BI ingestion path)") {
    val out = Files.createTempDirectory("graft_sink").toString
    val df = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus", "o_totalprice").limit(50)
    Sinks.writeCsv(df, s"$out/csv")
    val back = Sinks.readCsv(spark, s"$out/csv", df.schema)
    assert(back.count() == 50)
    assert(back.schema == df.schema)
  }

  test("json-lines roundtrip with explicit schema") {
    val out = Files.createTempDirectory("graft_sink").toString
    val df = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").limit(50)
    Sinks.writeJson(df, s"$out/json")
    val back = Sinks.readJson(spark, s"$out/json", df.schema)
    assert(back.count() == 50)
    assert(back.schema == df.schema)
    // values survive the roundtrip, not just counts
    val a = df.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("orc roundtrip preserves values and pushes filters to the reader") {
    val out = Files.createTempDirectory("graft_sink").toString
    val df = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").limit(50)
    Sinks.writeOrc(df, s"$out/orc")
    val back = Sinks.readOrc(spark, s"$out/orc")
    assert(back.schema == df.schema)
    val a = df.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a == b)
    // same pushdown contract as parquet: the predicate reaches the scan
    val plan = back.filter(col("o_orderkey") === a.head.head)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey"),
      s"ORC scan must carry pushed filters:\n$plan")
  }

  test("text source reads one row per line") {
    val out = Files.createTempDirectory("graft_sink").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/corpus.txt"),
      "first line\nsecond line\nthird line\n".getBytes("UTF-8"))
    val t = Sinks.readText(spark, s"$out/corpus.txt")
    assert(t.columns.toSeq == Seq("value"))
    assert(t.count() == 3)
    assert(t.orderBy("value").collect().map(_.getString(0)).toSeq ==
      Seq("first line", "second line", "third line"))
  }

  test("requireNonEmpty throws on empty frames, passes through otherwise") {
    import spark.implicits._
    val nonEmpty = Seq(1, 2).toDF("x")
    assert(Sinks.requireNonEmpty(nonEmpty, "test").count() == 2)
    intercept[IllegalStateException] {
      Sinks.requireNonEmpty(nonEmpty.filter($"x" > 10), "empty")
    }
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    Sinks.writeBucketed(li, "li_bucketed_test", "l_orderkey")
    Sinks.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_bucketed_test", "l_orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the exchange (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed_test")
        .join(spark.table("o_bucketed_test"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        "identically-bucketed sides must co-locate without a shuffle:\n" + plan)
      assert(joined.count() == li.count(), "orderkeys are a foreign key into orders")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed_test")
      spark.sql("DROP TABLE IF EXISTS o_bucketed_test")
    }
  }

  test("w9 bucketed join + aggregate plans with zero hash exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val w9 = graft.warehouse.Bucketed.orderLineSummary(spark, sfDir)
      val plan = w9.queryExecution.executedPlan.toString
      // join AND per-key aggregate both reuse the bucket layout; the only
      // exchange left is the presentation range sort
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join+agg must not shuffle:\n" + plan)
      val li = Tables.lineitem(spark, sfDir)
      assert(w9.agg(sum("n_lines")).head().getLong(0) == li.count())
      // write-once-reuse: a second call must hit the session catalog and
      // return the same result without rewriting the bucketed tables
      val before = spark.catalog.listTables().filter(col("name").startsWith("w9_")).count()
      val again = graft.warehouse.Bucketed.orderLineSummary(spark, sfDir)
      assert(again.agg(sum("n_lines")).head().getLong(0) == li.count())
      val after = spark.catalog.listTables().filter(col("name").startsWith("w9_")).count()
      assert(before == after, "reuse path must not create new tables")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.catalog.listTables().filter(col("name").startsWith("w9_")).collect()
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `${t.name}`"))
    }
  }

  test("SQL view layer answers DAX-measure analogues") {
    graft.dashboard.Views.register(spark, sfDir)
    val total = graft.dashboard.Views.measure(spark, "total_trips").head().getLong(0)
    assert(total > 0)
    val perDay = graft.dashboard.Views.measure(spark, "trips_per_day")
    assert(perDay.agg(sum("n")).head().getLong(0) == total)
  }
}

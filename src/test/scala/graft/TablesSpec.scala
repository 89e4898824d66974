package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Regression: the harness has regenerated events.parquet with different
  * physical ts types across rounds (TIMESTAMP(NANOS) → timestamp[us] untz'd,
  * which Spark 4 reads as TIMESTAMP_NTZ). Tables.events must normalize
  * whatever is on disk to session-tz TimestampType, or every unix_micros
  * consumer (e2_sessionize, e3_event_gaps, j9_interval_join) fails analysis.
  * These tests read the REAL testdata parquet — synthetic fixtures can't
  * catch a physical-type drift in the file. */
class TablesSpec extends SparkSpec {

  test("events ts normalizes to TimestampType regardless of on-disk physical type") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"got ${ev.schema("ts").dataType}")
    assert(ev.schema("ts").dataType != TimestampNTZType)
  }

  test("unix_micros consumers run against the real events file") {
    import org.apache.spark.sql.functions._
    // the exact call that broke in r6: analysis-time DATATYPE_MISMATCH on NTZ
    val n = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("us")).limit(1).count()
    assert(n == 1L)
    assert(SparkEntry.queries("e2_sessionize")(spark, sfDir).limit(1).count() >= 0L)
    assert(SparkEntry.queries("e3_event_gaps")(spark, sfDir).limit(1).count() >= 0L)
    assert(SparkEntry.queries("j9_interval_join")(spark, sfDir).limit(1).count() >= 0L)
  }

  test("schema tripwire: every harness table reads with the expected logical types") {
    // the r6 failure mode generalized: if the harness regenerates ANY
    // table with a different physical type, this names the exact drift in
    // one assertion instead of surfacing as N cryptic gate errors.
    // Timestamp columns accept either normalized reading (session-tz or
    // NTZ — both green paths); everything else is exact.
    import org.apache.spark.sql.types._
    def tsOk(dt: DataType): Boolean = dt == TimestampType || dt == TimestampNTZType
    val exact: Map[String, Map[String, DataType]] = Map(
      "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderpriority" -> StringType),
      "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType),
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
        "value" -> DoubleType, "event_type" -> StringType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true), "label" -> IntegerType))
    val readers: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "lineitem" -> Tables.lineitem(spark, sfDir), "orders" -> Tables.orders(spark, sfDir),
      "customer" -> Tables.customer(spark, sfDir), "events" -> Tables.events(spark, sfDir),
      "documents" -> Tables.documents(spark, sfDir),
      "embeddings" -> Tables.embeddings(spark, sfDir))
    val drift = for {
      (t, cols) <- exact.toSeq
      (c, want) <- cols.toSeq
      got = readers(t).schema(c).dataType if got != want
    } yield s"$t.$c: expected $want, file now reads as $got"
    assert(drift.isEmpty, s"HARNESS SCHEMA DRIFT:\n${drift.mkString("\n")}")
    // timestamp columns: either normalized reading, never anything else
    for ((t, c) <- Seq("lineitem" -> "l_shipdate", "orders" -> "o_orderdate")) {
      val dt = readers(t).schema(c).dataType
      assert(tsOk(dt), s"$t.$c must read as a timestamp type, got $dt")
    }
    assert(readers("events").schema("ts").dataType == TimestampType)
  }

  test("widen memo keys on canonicalized plan: distinct scans get independent verdicts") {
    import org.apache.spark.sql.functions._
    // one narrow frame (single in-memory partition) and one already-wide frame;
    // a colliding/shared memo entry would give them the same verdict
    val narrow = spark.range(0, 100, 1, 1).toDF("id")
    val wide = spark.range(0, 100, 1, 32).toDF("n").withColumn("x", col("n") * 2)
    val wNarrow = Tables.widen(narrow)
    val wWide = Tables.widen(wide)
    assert(wNarrow.rdd.getNumPartitions > 1, "narrow frame should be widened")
    assert(wWide.rdd.getNumPartitions == 32, "wide frame must pass through untouched")
  }
}

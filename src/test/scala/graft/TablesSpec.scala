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

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class IntervalJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("bucketized interval join equals the naive non-equi join") {
    val ev = graft.Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase").select(col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"))
    val bucketized = IntervalJoin.joinTrailing(p, "ts", c, "c_ts", 3600, "inner")
      .select("event_id", "c_id")
    val naive = p.join(c,
      unix_micros(col("c_ts")) > unix_micros(col("ts")) - 3600000000L &&
        col("c_ts") <= col("ts"), "inner")
      .select("event_id", "c_id")
    assert(bucketized.count() == naive.count())
    assert(bucketized.except(naive).isEmpty && naive.except(bucketized).isEmpty)
  }

  test("boundary semantics: (leftTs - w, leftTs] — exclusive start, inclusive end") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("id", "t")
    val right = Seq(
      (10L, ts("2024-01-01 11:00:00")), // exactly leftTs - w -> excluded
      (11L, ts("2024-01-01 11:00:00.000001")), // just inside
      (12L, ts("2024-01-01 12:00:00")), // equal -> included
      (13L, ts("2024-01-01 12:00:00.000001")) // future -> excluded
    ).toDF("rid", "rt")
    val got = IntervalJoin.joinTrailing(left, "t", right, "rt", 3600, "inner")
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 12L))
  }

  test("left join is ROW-level exact: no spurious null-right rows from bucket copies") {
    import spark.implicits._
    // L1 matches a right row in its OWN bucket only (the bucket-1 copy
    // matches nothing — the case that used to emit a spurious null row);
    // L2 matches via its bucket-1 copy only; L3 matches nothing at all.
    val left = Seq(
      (1L, ts("2024-01-01 10:30:00")),
      (2L, ts("2024-01-01 09:10:00")),
      (3L, ts("2024-01-01 23:00:00"))
    ).toDF("lid", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00")), // same hour-bucket as L1
      (20L, ts("2024-01-01 08:40:00"))  // previous bucket relative to L2
    ).toDF("rid", "rt")
    val got = IntervalJoin.joinTrailing(left, "t", right, "rt", 3600, "left")
      .select("lid", "rid")
    val naive = left.join(right,
      unix_micros(col("rt")) > unix_micros(col("t")) - 3600000000L &&
        col("rt") <= col("t"), "left")
      .select("lid", "rid")
    assert(got.count() == 3, "exactly one row per left (1 match, 1 match, 1 null)")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    val nulls = got.filter(col("rid").isNull).collect().map(_.getLong(0)).toSeq
    assert(nulls == Seq(3L), "only the truly unmatched left row carries nulls")
  }

  test("row identity is content-derived: exact for duplicate rows, stable across re-evaluation") {
    import spark.implicits._
    // two identical matched lefts and two identical unmatched lefts: the
    // content-hash id means duplicates share an id, which is exact —
    // identical content ⇒ identical bucket/predicate ⇒ identical outcome,
    // so both copies always travel through the same branch together. (A
    // position-based id could diverge between the matched branch and the
    // anti-join restore under recompute; content hashes cannot.)
    val left = Seq(
      (1L, ts("2024-01-01 10:30:00")), (1L, ts("2024-01-01 10:30:00")),
      (3L, ts("2024-01-01 23:00:00")), (3L, ts("2024-01-01 23:00:00"))
    ).toDF("lid", "t").repartition(3) // non-trivial partitioning on purpose
    val right = Seq((10L, ts("2024-01-01 10:00:00"))).toDF("rid", "rt")
    val got = IntervalJoin.joinTrailing(left, "t", right, "rt", 3600, "left")
    assert(got.count() == 4, "each duplicate left row appears exactly once")
    assert(got.filter(col("rid").isNull).count() == 2, "both unmatched copies restored")
    assert(got.filter(col("rid") === 10L).count() == 2, "both matched copies match")
    // recompute stress: building and executing the same plan twice (fresh
    // evaluation of both the matched branch and the anti-join restore)
    // yields the identical row multiset
    val again = IntervalJoin.joinTrailing(left, "t", right, "rt", 3600, "left")
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
  }

  test("left join keeps zero-match rows and never double-counts across buckets") {
    val out = graft.queries.Joins.intervalActivity(spark, sfDir)
    val nPurchases = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == nPurchases, "one output row per purchase")
    assert(out.filter(col("n_clicks_1h") === 0).count() >= 0) // schema sanity
    // cross-check one aggregate against the naive computation
    val ev = graft.Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase").select(col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"))
    val naive = p.join(c,
      unix_micros(col("c_ts")) > unix_micros(col("ts")) - 3600000000L &&
        col("c_ts") <= col("ts"), "left")
      .groupBy("event_id").agg(count(col("c_id")).as("n"))
    val diff = out.join(naive, Seq("event_id"))
      .filter(col("n_clicks_1h") =!= col("n"))
    assert(diff.count() == 0)
  }
}

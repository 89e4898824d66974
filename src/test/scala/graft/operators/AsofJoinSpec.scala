package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof join picks the greatest right ts <= left ts per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00")),
      (10L, ts("2024-01-01 11:00:00")),
      (10L, ts("2024-01-01 13:00:00")), // after every left row for k=10
      (20L, ts("2024-01-01 09:30:00")) // after the only left row for k=20
    ).toDF("k", "rt")
    val out = AsofJoin.asofTs(left, right, Seq("k"), "t", "rt", "matched")
      .select("id", "matched").collect().map(r => r.getLong(0) ->
        Option(r.getTimestamp(1))).toMap
    assert(out(1L).contains(ts("2024-01-01 09:30:00")))
    assert(out(2L).contains(ts("2024-01-01 11:00:00")))
    assert(out(3L).isEmpty) // no prior right row -> null (left-asof)
  }

  test("equal timestamps match inclusively (right row at the same instant)") {
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((5L, ts("2024-01-01 10:00:00"))).toDF("k", "rt")
    val got = AsofJoin.asofTs(left, right, Seq("k"), "t", "rt", "m")
      .head().getAs[Timestamp]("m")
    assert(got == ts("2024-01-01 10:00:00"))
  }

  test("attribution query: every matched view_ts is <= the click ts, same user") {
    val out = graft.queries.Joins.asofAttribution(spark, sfDir)
    assert(out.count() > 0)
    assert(out.filter(col("view_ts") > col("ts")).count() == 0)
    // matched ts really is the max prior view: no view strictly between
    // view_ts and ts for the same user
    val views = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vt"))
    val gaps = out.join(views, col("vu") === col("user_id") &&
      col("vt") > col("view_ts") && col("vt") <= col("ts"))
    assert(gaps.count() == 0)
  }

  test("payload asof join attaches the matched right row's columns") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00")),
      (2L, 10L, ts("2024-01-01 08:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "early", 1.5),
      (10L, ts("2024-01-01 11:00:00"), "late", 2.5)
    ).toDF("k", "rt", "tag", "v")
    val out = AsofJoin.asof(left, right, Seq("k"), "t", "rt",
      rightCols = Seq("tag", "v")).collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[String]("tag")),
        Option(r.getAs[Any]("v")))).toMap
    assert(out(1L) == (Some("late"), Some(2.5))) // greatest rt <= t
    assert(out(2L) == (None, None)) // no prior right row
  }

  test("payload asof join breaks equal-timestamp ties by tieCols, deterministically") {
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (5L, ts("2024-01-01 10:00:00"), 100L, "a"),
      (5L, ts("2024-01-01 10:00:00"), 200L, "b") // max rid wins the tie
    ).toDF("k", "rt", "rid", "tag")
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "rt",
      rightCols = Seq("tag"), tieCols = Seq("rid"))
      .head().getAs[String]("tag")
    assert(got == "b")
  }

  test("range-bin join covers every in-range row exactly once") {
    val binned = graft.queries.Joins.rangeBinJoin(spark, sfDir)
    val nBinned = binned.agg(sum("n")).head().getLong(0)
    val inRange = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 0 && col("l_quantity") < 1000).count()
    assert(nBinned == inRange)
  }
}

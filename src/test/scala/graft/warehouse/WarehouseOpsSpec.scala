package graft.warehouse

import graft.SparkSpec
import java.sql.Date

/** Merge-upsert and SCD2 semantics on planted fixtures. */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  test("upsertMerge: incoming wins on conflict, orderCol breaks intra-batch dups") {
    val existing = Seq((1L, "e1", 10), (2L, "e2", 10)).toDF("k", "v", "ver")
    val incoming = Seq((2L, "i2-low", 5), (2L, "i2-high", 9), (3L, "i3", 1))
      .toDF("k", "v", "ver")
    val out = Upsert.upsertMerge(existing, incoming, Seq("k"), "ver")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // key 1: only existing; key 2: incoming beats existing, ver 9 beats 5;
    // key 3: new insert
    assert(out == Seq((1L, "e1"), (2L, "i2-high"), (3L, "i3")))
  }

  test("upsertMerge and upsertDoNothing agree when keys don't collide") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val incoming = Seq((3L, "c")).toDF("k", "v")
    val doNothing = Upsert.upsertDoNothing(existing, incoming, Seq("k"))
      .orderBy("k").collect().toSeq
    val merge = Upsert.upsertMerge(existing.withColumn("ver", $"k"),
        incoming.withColumn("ver", $"k"), Seq("k"), "ver")
      .drop("ver").orderBy("k").collect().toSeq
    assert(doNothing == merge)
  }

  test("scd2: intervals chain per key, exactly one open row per key") {
    def d(s: String) = Date.valueOf(s)
    val events = Seq(
      (1L, d("2024-01-01"), "P1"), (1L, d("2024-02-01"), "P2"),
      (1L, d("2024-03-15"), "P3"), (2L, d("2024-05-01"), "Q1"))
      .toDF("k", "ts", "attr")
    val out = Scd.scd2(events, "k", "ts")
      .orderBy("k", "valid_from").collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      // consecutive rows chain: valid_to == next valid_from
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getDate(4) == b.getDate(3))
        case _ =>
      }
      // exactly one open (current) version per key, and it is the last
      assert(rows.count(_.isNullAt(4)) == 1)
      assert(rows.last.isNullAt(4) && rows.last.getInt(5) == 1)
      assert(rows.init.forall(_.getInt(5) == 0))
    }
    assert(out.length == 4)
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S5/S6/S7 against a real mutable JDBC store (embedded Derby): sink,
  * ON-CONFLICT-DO-NOTHING upsert, and key read-back driving a fact build
  * — the reference's load.py flow, end to end, with genuine SQL-database
  * round-trips instead of the parquet-warehouse analogue. */
class JdbcSpec extends SparkSpec {

  private lazy val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    // derby.log goes to the temp tree, not the repo CWD
    System.setProperty("derby.stream.error.file", s"$d/derby.log")
    s"$d/db"
  }
  private lazy val jdbcUrl = Jdbc.url(dbDir)

  test("S5/S7: JDBC sink round-trips a dimension exactly") {
    val nation = graft.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name", "n_regionkey")
    Jdbc.writeTable(nation, jdbcUrl, "dim_nation")
    val back = Jdbc.readTable(spark, jdbcUrl, "dim_nation")
    assert(back.count() == nation.count())
    val a = nation.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    val b = back.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(a == b, "read-back must be byte-identical to the written dim")
  }

  test("S6: upsert is ON CONFLICT DO NOTHING — existing rows win, new keys append") {
    import spark.implicits._
    val base = Seq((1L, "alpha"), (2L, "beta")).toDF("k", "v")
    Jdbc.writeTable(base, jdbcUrl, "dim_upsert")
    // conflict on k=2 (existing wins; incoming "BETA2" must NOT land),
    // new key 3, intra-batch duplicate on 4 collapses to one row
    val batch = Seq((2L, "BETA2"), (3L, "gamma"), (4L, "delta"), (4L, "delta_dup"))
      .toDF("k", "v")
    val inserted = Jdbc.upsertDoNothing(batch, jdbcUrl, "dim_upsert", Seq("k"))
    assert(inserted == 2, s"keys 3 and 4 insert, got $inserted")
    val after = Jdbc.readTable(spark, jdbcUrl, "dim_upsert")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 4)
    assert(after(2L) == "beta", "conflict row must keep the EXISTING value")
    assert(after(3L) == "gamma")
    // idempotency: replaying the same batch inserts nothing
    assert(Jdbc.upsertDoNothing(batch, jdbcUrl, "dim_upsert", Seq("k")) == 0)
  }

  test("S7: read-back keys drive a fact build (load.py key-lookup flow)") {
    val region = graft.Tables.region(spark, sfDir).select("r_regionkey", "r_name")
    Jdbc.writeTable(region, jdbcUrl, "dim_region")
    val keys = Jdbc.readTable(spark, jdbcUrl, "dim_region").select("r_regionkey", "r_name")
    // fact rows resolve their dimension key via the read-back, as the
    // reference resolves surrogate ids before the fact insert
    val fact = graft.Tables.nation(spark, sfDir)
      .join(broadcast(keys), col("n_regionkey") === col("r_regionkey"), "inner")
      .select("n_nationkey", "r_regionkey", "r_name")
    assert(fact.count() == graft.Tables.nation(spark, sfDir).count(),
      "every nation resolves a region key from the JDBC read-back")
    assert(fact.filter(col("r_name").isNull).count() == 0)
  }
}

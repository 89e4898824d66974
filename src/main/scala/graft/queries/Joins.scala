package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.4): the star-schema fact×dim lookups of the
  * reference's load stage (`Scripts_ETL/load.py:155-172`).
  *
  * Scale stance: every dimension here is small (distinct timestamps, 2k
  * part keys, a handful of labels) → `broadcast()` hints keep the fact scan
  * shuffle-free. At 100 TB the fact side streams through a
  * BroadcastHashJoin; only genuinely large-large joins (none in the
  * reference) would shuffle.
  */
object Joins {

  /** J1: timestamp-keyed surrogate lookup (load.py:155-159) — build a time
    * dimension keyed by distinct datetime with a generated pk, then join the
    * fact on the timestamp value. The pk is arithmetic (epoch micros, see
    * StarSchema.timeKey) — no global window over a dim that grows with
    * distinct timestamps. */
  def timeSurrogateJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val dimTime = li.select(col("l_shipdate").as("datetime")).distinct()
      .withColumn("time_pk", graft.warehouse.StarSchema.timeKey(col("datetime")))
    li.join(broadcast(dimTime), li("l_shipdate") === dimTime("datetime"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("time_pk"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J2+J3: the same dimension joined twice with alias disambiguation
    * (load.py:160-167 `suffixes=('_pu','_do')`): nation reached via the
    * customer side AND via the supplier side of each lineitem. */
  def doubleDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val custNation = n.select(col("n_nationkey").as("cn_key"), col("n_name").as("pickup_nation"))
    val suppNation = n.select(col("n_nationkey").as("sn_key"), col("n_name").as("dropoff_nation"))
    // orders/customer SCALE with the fact table (unlike nation/supplier,
    // which are genuinely bounded dims) — no broadcast hint on them: at
    // bench scale AQE still picks BroadcastHashJoin (they sit under the
    // 10 MB threshold), and at 100 TB the planner correctly falls back to
    // a shuffled join instead of OOMing the driver on a forced broadcast.
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(custNation), c("c_nationkey") === custNation("cn_key"))
      .join(broadcast(suppNation), s("s_nationkey") === suppNation("sn_key"))
      .select(col("l_orderkey"), col("l_linenumber"), col("pickup_nation"), col("dropoff_nation"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Left-semi join (SQL EXISTS): orders with at least one returned line.
    * The semi join shuffles only the join keys of the probe side and stops
    * at the first match per key — no fact×fact row explosion, no payload
    * columns from the build side ever move. This is the scalable EXISTS
    * plan at any data size (a naive inner-join + distinct would shuffle
    * the matched rows then de-duplicate them again). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(returned, o("o_orderkey") === returned("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Left-anti join (SQL NOT EXISTS): orders with no line shipped on/after
    * the cutoff — the same plan shape the warehouse upsert uses
    * (`warehouse.Upsert`): build side reduced to keys, probe side streamed. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val recent = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp"))
      .select("l_orderkey")
    o.join(recent, o("o_orderkey") === recent("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** J4: inner join on a label string against a tiny in-memory dimension
    * (load.py:168-172). 'N' rows are deliberately unmatched and silently
    * dropped — the reference's inner-join row-loss semantics, preserved. */
  def labelJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = Seq(("R", "Retour"), ("A", "Accepté")).toDF("flag", "payment_label")
    Tables.lineitem(spark, dir)
      .join(broadcast(labels), col("l_returnflag") === col("flag"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("payment_label"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J7: keyed as-of join (attribution): each click event matched to the
    * most recent 'view' by the same user at or before it — via
    * `operators.AsofJoin` (one shuffle on user_id, no range-join blowup).
    * Inner-asof semantics: clicks with no prior view are dropped, like
    * DuckDB's `ASOF JOIN`. */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view").select("user_id", "ts")
    graft.operators.AsofJoin.asofTs(clicks, views, Seq("user_id"), "ts", "ts", "view_ts")
      .filter(col("view_ts").isNotNull)
      .select("event_id", "user_id", "ts", "view_ts")
      .orderBy("event_id")
  }

  /** J9: large-×-large trailing-interval join via `operators.IntervalJoin`
    * — per purchase event, click activity (any user) in the preceding
    * hour: the "recent context" feature family of a training pipeline.
    * Neither side broadcasts at scale; the bucket equi-join keeps it a
    * plain shuffle. Left-join + count(c_id) keeps zero-activity purchases
    * with n=0. */
  def intervalActivity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase").select(col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"), col("value").as("c_value"))
    graft.operators.IntervalJoin.joinTrailing(p, "ts", c, "c_ts", 3600)
      .groupBy("event_id")
      .agg(count(col("c_id")).as("n_clicks_1h"),
        round(coalesce(sum("c_value"), lit(0.0)), 2).as("click_value_1h"))
      .orderBy("event_id")
  }

  /** J8: range join against a tiny literal bin table (the general form of
    * A9's fixed-width histogram: arbitrary bin edges). The build side is
    * broadcast, so the non-equi predicate runs as a BroadcastNestedLoop
    * probe over 4 rows per record — no shuffle, scales linearly in the
    * fact. (A large-×-large range join would instead bucketize both sides
    * on coarse ranges and equi-join the bucket id first.) */
  def rangeBinJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bins = Seq((0, 10, "small"), (10, 25, "mid"), (25, 40, "large"),
      (40, 1000, "huge")).toDF("lo", "hi", "bin_label")
    Tables.lineitem(spark, dir)
      .join(broadcast(bins), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("bin_label")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total_price"))
      .orderBy("bin_label")
  }
}

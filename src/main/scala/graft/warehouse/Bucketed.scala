package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Sinks

/** The bucketed-layout scale path (reference load.py's indexed-warehouse
  * intent re-expressed for a lake): pay the join-key shuffle ONCE at write
  * time, then every later join/aggregate on that key runs with zero
  * exchanges.
  */
object Bucketed {

  /** w9: order-line summary over two IDENTICALLY BUCKETED tables. Both
    * sides are written `bucketBy(nBuckets, l_orderkey)` (sorted within
    * buckets); the join AND the per-orderkey aggregate then both reuse the
    * bucket layout, so the whole query plans with no hash-partitioning
    * exchange — the w4 star join optimizes the dims away by broadcasting,
    * this is the complementary fact⋈fact shape where neither side fits in
    * memory and bucketing is what kills the shuffle at 100 TB.
    *
    * The gate's correctness contract is engine-independent (same rows as
    * the plain join the oracle runs); the LAYOUT contract — no exchange
    * between scan and result — is pinned in SinksSpec with broadcasts
    * disabled. Quantities are integral-valued doubles; summing them as
    * longs keeps the aggregate exact cross-engine. */
  def orderLineSummary(spark: SparkSession, dir: String, nBuckets: Int = 8): DataFrame = {
    // write-once-reuse: the bucketed layout is the PERSISTED artifact the
    // whole pattern exists to amortize — rewriting it on every call would
    // re-pay the one-time shuffle per query (and made the bench time the
    // write, not the join). Table names are keyed by (dir, nBuckets) so a
    // different source or layout gets its own tables; a catalog hit for
    // BOTH tables in this session means the layout exists and is reused.
    // The tag ENCODES the dir (byte → _hex for non-alnum) rather than
    // hashing it: two distinct dirs can never share a table name, so a
    // collision cannot silently serve another source's bucketed data.
    // (Source parquet regenerated in place mid-session still reuses the
    // session's layout — the same staleness contract as any warehouse.)
    val tag = s"$dir|$nBuckets".map {
      case c if c.isLetterOrDigit => c.toString
      case c                      => f"_${c.toInt}%02x"
    }.mkString
    val liT = s"w9_lineitem_b_$tag"
    val oT = s"w9_orders_b_$tag"
    if (!spark.catalog.tableExists(liT) || !spark.catalog.tableExists(oT)) {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      Sinks.writeBucketed(li, liT, "l_orderkey", nBuckets)
      Sinks.writeBucketed(o, oT, "l_orderkey", nBuckets)
    }
    spark.table(liT)
      .join(spark.table(oT), Seq("l_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        max(col("o_totalprice")).as("o_totalprice"))
      .orderBy("l_orderkey")
  }
}

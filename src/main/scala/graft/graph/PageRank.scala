package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration weighted PageRank over the nation-level trade graph
  * (customer-nation → supplier-nation edges derived from orders×lineitem).
  * The iterative-join-then-aggregate shape is the canonical Spark graph
  * recipe (GraphX's Pregel and every "PageRank on Spark" paper reduce to
  * it); like `DocDedup.dedupClusters` each round is one shuffle and a lazy
  * localCheckpoint keeps lineage flat.
  *
  * All arithmetic is INTEGER (parts-per-million ranks, floor division per
  * edge) so the result is bit-identical across engines and independent of
  * aggregation order — no float sums cross the oracle boundary:
  *
  *   contrib(e)   = rank_ppm(src) * w(e) div out_w(src)
  *   rank_ppm'(v) = 150000 + 850 * sum(contrib) div 1000      (d = 0.85)
  *
  * 100 TB: the edge build aggregates the fact join down to (src, dst)
  * before iterating, so rounds run on the graph, not the data; rank and
  * out-weight tables are node-sized (broadcast), each round shuffles only
  * the per-dst contribution aggregate. Node count never hits the driver. */
object PageRank {

  /** Aggregated trade edges: src = customer nation, dst = supplier nation,
    * w = shipment count. One big join (orderkey, SMJ) + two broadcast dim
    * joins + one aggregate — then checkpointed so iterations replan none
    * of it. */
  def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === s("s_suppkey"))
      .groupBy(c("c_nationkey").cast("long").as("src"),
        s("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(eager = false)
  }

  /** x45: `iters` rounds of integer PageRank, returning
    * (node, n_name, rank_ppm) sorted by node. */
  def nationRank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val outw = edges.groupBy("src").agg(sum("w").as("out_w"))
      .localCheckpoint(eager = false)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false)
    var ranks = nodes.withColumn("rank_ppm", lit(1000000L))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(broadcast(outw), "src")
        .join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"), expr("rank_ppm * w div out_w").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("in_sum"))
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("850 * coalesce(in_sum, 0L) div 1000")).as("rank_ppm"))
        .localCheckpoint(eager = false)
    }
    val nation = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    ranks.join(broadcast(nation), col("node") === col("n_nationkey"))
      .select("node", "n_name", "rank_ppm")
      .orderBy("node")
  }
}

package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** x86: triangle counting + local clustering coefficient over the near-dup
  * pair graph — the density diagnostic for dedup clusters. Components
  * (x17) say WHICH docs duplicate each other; triangles say HOW: a long
  * chain of pairwise matches (coeff ≈ 0) is a drift of incremental edits
  * that conservative dedup should keep-per-link, while a dense clique
  * (coeff ≈ 1) is one document mirrored everywhere and safe to collapse
  * to a single keeper.
  *
  * Algorithm: the MapReduce node-iterator with DEGREE-ordered orientation
  * (Suri & Vassilvitskii, WWW'11 — public). Each undirected edge is
  * oriented from its lower-(degree, id) endpoint to the higher; wedges
  * are the self-join of oriented edges on their source, and a wedge
  * closes into a triangle iff its two tips are themselves an edge. Under
  * ANY total order every triangle forms exactly one wedge at its minimal
  * vertex, so counts are orientation-independent — which is what lets the
  * oracle recount with plain id-ordering — but the DEGREE order is the
  * scale choice: wedge fan-out per node is its out-degree, and
  * degree-orientation bounds out-degree by O(√|E|) on any graph (a
  * billion-follower hub generates wedges at its LOW-degree neighbors,
  * never at itself). Shuffles: one degree agg, two id-keyed joins for the
  * orientation, one source-keyed self-join (wedges), one edge-keyed
  * closing join — all on long keys, never text.
  *
  * Output: one row per graph node — degree, triangle membership count,
  * and the local clustering coefficient 2T/(deg·(deg−1)) (an exact-long
  * ratio in one double division — cross-engine bit-safe). */
object Triangles {

  /** Library form over canonical undirected edges (id_a < id_b, distinct). */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a"), col("id_b")).localCheckpoint()
    val deg = e.select(col("id_a").as("v"))
      .unionByName(e.select(col("id_b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
    val oriented = e
      .join(deg.select(col("v").as("id_a"), col("degree").as("da")), "id_a")
      .join(deg.select(col("v").as("id_b"), col("degree").as("db")), "id_b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("id_a") < col("id_b")),
          struct(col("id_a").as("s"), col("id_b").as("t")))
          .otherwise(struct(col("id_b").as("s"), col("id_a").as("t"))).as("o"))
      .select(col("o.s").as("s"), col("o.t").as("t"))
      .localCheckpoint()
    // wedges at the minimal-order vertex, each tip pair emitted once with
    // b < c — canonical, so the closing join probes the undirected edge
    // set directly (oriented edges are distinct, no wedge dedup needed)
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.s").as("a"), col("x.t").as("b"), col("y.t").as("c"))
    val tris = wedges
      .join(e, col("id_a") === col("b") && col("id_b") === col("c"))
      .select("a", "b", "c")
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v").as("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)).as("clustering_coeff"))
      .orderBy("doc_id")
  }

  /** Gate entry: triangles over the oracle-checked x15 near-dup pairs;
    * reads the persisted pair artifact, as refresh-time analytics would. */
  def neardupTriangles(spark: SparkSession, dir: String): DataFrame =
    triangleStats(graft.llm.DocDedup.pairArtifact(spark, dir).drop("jaccard"))
}

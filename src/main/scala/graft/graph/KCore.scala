package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** x106: k-CORE PEEL (onion decomposition at a fixed k) over the near-dup
  * pair graph — the density stratifier that separates template farms from
  * edit drifts, per NODE rather than per cluster (x86 gives the same
  * signal per triangle; the peel gives the subgraph every dedup policy
  * actually acts on). Peeling repeatedly deletes every node of current
  * degree < k; the survivors are the k-core (the maximal subgraph of
  * min-degree ≥ k — mirror farms worth a single keeper), and the round a
  * node dies in is its onion layer (layer 1 = leaf of a drift chain,
  * higher layers = closer to the dense center).
  *
  * Algorithm: synchronous parallel peel (Matula & Beck's sequential core
  * decomposition lifted to rounds — the standard Pregel/GraphFrames
  * formulation), over an explicitly tracked alive-node set so that nodes
  * whose incident edges ALL vanish in a round (a star hub after its
  * leaves peel) are still peeled — at the layer where their degree hits
  * 0 — instead of silently disappearing from the output. Each round is
  * ONE degree aggregation plus three anti-joins on long node ids — no
  * text, no cartesian; lineage is flattened per round with a lazy
  * localCheckpoint exactly like the x17 star loop. Rounds are bounded by
  * the peel DEPTH of the graph (the longest chain of cascading
  * removals), not its size: near-dup graphs are shallow-and-wide (mostly
  * leaves hanging off dense cores), and the converge-or-fail guard makes
  * a depth blow-up a loud error, never a silent wrong answer. 100 TB: the
  * per-round shuffle carries only the alive edge list, which shrinks
  * monotonically; the removed-set side of each anti-join is the round's
  * low-degree nodes. Unlike connected components there is no
  * O(log n)-round rewrite to reach the exact cores — production systems
  * cap rounds and either accept the round-R onion truncation or fall back
  * to approximate coreness (neighborhood h-index iteration); this
  * implementation keeps the exact contract and the explicit bound.
  *
  * Output: one row per graph node — `peel_layer` (removal round; 0 means
  * the node survives in the k-core) and `core_degree` (degree within the
  * k-core for survivors, 0 for peeled nodes). Node domain = nodes with at
  * least one pair, matching x86. */
object KCore {

  /** Library form over canonical undirected edges (id_a < id_b, distinct).
    * Fails loudly if the peel needs more than `maxRounds` rounds — the
    * oracle chains exactly `maxRounds` peel steps, so convergence within
    * the bound is part of the checked contract. */
  def kCorePeel(edges: DataFrame, k: Int = 2, maxRounds: Int = 6): DataFrame = {
    var e = edges.select(col("id_a").as("s"), col("id_b").as("t"))
      .unionByName(edges.select(col("id_b").as("s"), col("id_a").as("t")))
      .localCheckpoint(eager = false)
    // the alive node set is tracked EXPLICITLY: a node whose incident
    // edges all vanish mid-peel (the hub of a star whose leaves peel
    // first) has no row left in `e`, so a degree aggregation alone can
    // never see it — yet onion decomposition owes it a layer (degree 0
    // < k the round after its last edge dies). `alive` starts as the
    // node domain and shrinks with every peel; low = alive ∖ {deg ≥ k}.
    var alive = e.select(col("s").as("node")).distinct().localCheckpoint()
    var peeled: Option[DataFrame] = None
    var round = 0
    var converged = false
    while (!converged) {
      // eager checkpoint: `low` is consumed four times (emptiness probe,
      // layer union, alive update, anti-join filter) and must not
      // recompute the degree aggregation it derives from
      val keep = e.groupBy("s").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("s").as("node"))
      val low = alive.join(keep, Seq("node"), "left_anti").localCheckpoint()
      if (low.isEmpty) converged = true
      else {
        round += 1
        require(round <= maxRounds,
          s"k-core peel did not converge in $maxRounds rounds — raise " +
            "maxRounds (and the oracle chain) or switch to approximate coreness")
        val lay = low.select(col("node"), lit(round).cast("int").as("peel_layer"))
        peeled = Some(peeled.fold(lay)(_.unionByName(lay)))
        alive = alive.join(low, Seq("node"), "left_anti").localCheckpoint()
        e = e.join(low, e("s") === low("node"), "left_anti")
          .join(low, col("t") === low("node"), "left_anti")
          .localCheckpoint(eager = false)
      }
    }
    val core = e.groupBy(col("s").as("node"))
      .agg(count(lit(1)).as("core_degree"))
      .select(col("node"), lit(0).cast("int").as("peel_layer"), col("core_degree"))
    val all = peeled.fold(core)(p =>
      core.unionByName(p.withColumn("core_degree", lit(0L))))
    all.select(col("node").as("doc_id"), col("peel_layer"), col("core_degree"))
      .orderBy("doc_id")
  }

  /** Gate entry: the 2-core peel over the oracle-checked x15 near-dup
    * pairs (layer 1+ = chain drift periphery, core = mirror sets); reads
    * the persisted pair artifact, as any refresh-time analytics would. */
  def neardupKCore(spark: SparkSession, dir: String): DataFrame =
    kCorePeel(graft.llm.DocDedup.pairArtifact(spark, dir).drop("jaccard"))
}

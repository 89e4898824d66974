package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the two round-14 rewrites, on RANDOM graphs
  * rather than the fixtures': (1) the affected-components-only `ccStep`
  * must equal a full CC recompute over the union graph for any pair set /
  * prior / batch partition, and (2) `leakSafeSplitDelta` ∪ frozen prior
  * must equal the full `leakSafeSplitFrozen` re-derivation it replaced.
  * Small dense random graphs maximize the nasty cases (multi-component
  * merges through several batch docs at once, batch-only chains, edges
  * deferred on unknown endpoints). */
class Round14PropertiesSpec extends SparkSpec {

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Reference CC by union-find on the driver (the oracle's reachability,
    * independently implemented — no Spark code shared with ccStep). */
  private def refCC(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for ((a, b) <- edges; if parent.contains(a) && parent.contains(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("property: ccStep == full union-graph CC on random graphs") {
    import spark.implicits._
    val nGen = Gen.chooseNum(4, 24)
    for (seed <- 1 to 25) {
      val n = draw(nGen, seed.toLong)
      val all = (0L until n.toLong).toSet
      // random arrival split: ~70% prior, rest batch
      val batch = all.filter(d => draw(Gen.chooseNum(0, 9), seed * 1000L + d) < 3)
      val prior = all -- batch
      // random pair set over ALL ids plus some unknown-future ids (n..n+3)
      val m = draw(Gen.chooseNum(n, 3 * n), seed * 7L)
      val pairSeq = (0 until m).map { i =>
        val a = draw(Gen.chooseNum(0L, n.toLong + 3), seed * 31L + i)
        val b = draw(Gen.chooseNum(0L, n.toLong + 3), seed * 37L + i)
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      // prior labels = CC over pairs internal to the prior snapshot
      val priorEdges = pairSeq.filter(p => prior(p._1) && prior(p._2))
      val priorLabels = refCC(prior, priorEdges)
      // the step's contract: edges with both ends in prior ∪ batch enter
      val knownEdges = pairSeq.filter(p => all(p._1) && all(p._2))
      val want = refCC(all, knownEdges)
      val got = EventsStream.ccStep(
          pairSeq.toDF("id_a", "id_b"),
          priorLabels.toSeq.toDF("doc_id", "cluster_id"),
          batch.toSeq.toDF("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want,
        s"seed=$seed n=$n: ccStep diverged\n got=$got\nwant=$want\nbatch=$batch pairs=$pairSeq")
    }
  }

  test("property: delta split ∪ frozen prior == full frozen re-derivation on random refreshes") {
    import spark.implicits._
    for (seed <- 1 to 25) {
      val n = draw(Gen.chooseNum(6, 30), seed.toLong)
      val all = (0L until n.toLong).toSet
      val newDocs = all.filter(d => draw(Gen.chooseNum(0, 9), seed * 100L + d) < 3)
      val priorDocs = all -- newDocs
      // random current clustering: each doc joins group (id % g) with prob
      // 0.7, else singleton — groups freely mix prior and new docs
      val g = draw(Gen.chooseNum(2, 6), seed * 3L)
      val nowPairs = all.toSeq.flatMap { d =>
        if (draw(Gen.chooseNum(0, 9), seed * 11L + d) < 7) Some(d -> (d % g)) else None
      }
      val clusters = nowPairs.toDF("doc_id", "cluster_id")
      val labels = all.toSeq.toDF("doc_id")
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      // prior split: the x75 coin over a random PRIOR clustering
      val priorClusters = priorDocs.toSeq.flatMap { d =>
        if (draw(Gen.chooseNum(0, 9), seed * 13L + d) < 7) Some(d -> (d % (g + 1))) else None
      }.toDF("doc_id", "cluster_id")
      val priorSplit = graft.llm.DocDedup.leakSafeSplitOf(
        priorDocs.toSeq.toDF("doc_id"), priorClusters)
      val full = graft.llm.DocDedup.leakSafeSplitFrozen(
          all.toSeq.toDF("doc_id"), clusters, priorSplit)
        .filter(col("assignment") =!= "frozen")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      val delta = graft.llm.DocDedup.leakSafeSplitDelta(
          newDocs.toSeq.toDF("doc_id"), labels, priorSplit.select("doc_id", "split"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      assert(delta == full,
        s"seed=$seed: delta diverged\n only-delta=${delta -- full}\n only-full=${full -- delta}")
      assert(delta.map(_._1) == newDocs, s"seed=$seed: delta must cover exactly the new docs")
    }
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-8 curation operators: for RANDOM
  * inputs, the invariants that make each operator trustworthy hold
  * against an independent scalar reference — the same style as
  * TaxiPropertiesSpec (generators drawn directly with fixed seeds; the
  * scalatest/scalacheck bridge isn't in the offline dep cache). */
class LlmPropertiesSpec extends SparkSpec {

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: aHash64 equals the arithmetic grid hash for random gradient images") {
    val gen = for {
      seed <- Gen.choose(0L, 100000L)
      w <- Gen.choose(1, 32)
      h <- Gen.choose(1, 32)
    } yield (seed, w, h)
    for (i <- 1 to 40) {
      val (seed, w, h) = draw(gen, i)
      val Some((hi, lo)) = Multimodal.aHash64(Multimodal.pngPayload(seed, w, h))
      val s = for (j <- 0 until 8; ii <- 0 until 8)
        yield (seed + ii * w / 8 + j * h / 8) % 256
      val sum = s.sum
      var (ehi, elo) = (0L, 0L)
      for (idx <- 0 until 64 if 64 * s(idx) >= sum)
        if (idx >= 32) ehi |= 1L << (idx - 32) else elo |= 1L << idx
      assert((hi, lo) == ((ehi, elo)), s"seed=$seed w=$w h=$h")
    }
  }

  test("property: Bloom pre-filter never false-negatives on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val textGen = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    for (round <- 1 to 5) {
      val n = 20 + round * 10
      val docs = (0 until n).map(i => (i.toLong, draw(textGen, round * 1000L + i)))
      val df = docs.toDF("doc_id", "text")
      val mBits = draw(Gen.oneOf(64, 512, 4096), round.toLong)
      val out = DocDedup.bloomPrefilterOf(df, col("doc_id") % 2 === 0, mBits)
        .as[(Long, Boolean, Boolean)].collect()
      // independent ground truth: batch text seen on the historical side
      val hist = docs.filter(_._1 % 2 == 0).map(_._2).toSet
      val truth = docs.filter(_._1 % 2 == 1).map { case (id, t) => id -> hist.contains(t) }.toMap
      assert(out.length == truth.size)
      out.foreach { case (id, hit, dup) =>
        assert(dup == truth(id), s"exact_dup wrong for doc $id (mBits=$mBits)")
        assert(!dup || hit, s"FALSE NEGATIVE on doc $id (mBits=$mBits) — impossible for a Bloom filter")
      }
    }
  }

  test("property: dupSpanProfile equals a scalar brute-force on random corpora") {
    import spark.implicits._
    val k = 3
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val textGen = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    for (round <- 1 to 5) {
      val docs = (0 until (4 + round)).map(i => (i.toLong, draw(textGen, round * 77L + i)))
      val out = Curation.dupSpanProfileDocs(docs.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      // scalar reference
      val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }.toMap
      val shOf = toks.view.mapValues(ts =>
        if (ts.length >= k) (0 to ts.length - k).map(i => ts.slice(i, i + k).mkString(" "))
        else Seq.empty).toMap
      val docsPerShingle = shOf.toSeq.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      docs.foreach { case (id, _) =>
        val dupPos = shOf(id).zipWithIndex.collect {
          case (s, i) if docsPerShingle(s) >= 2 => i + 1 }
        val runs = dupPos.foldLeft(List.empty[(Int, Int)]) { // (start, len)
          case (acc, p) => acc match {
            case (s0, l) :: rest if s0 + l == p => (s0, l + 1) :: rest
            case _                              => (p, 1) :: acc
          }
        }
        val expect =
          if (runs.isEmpty) (0L, 0L)
          else ((runs.map(_._2).max + k - 1).toLong, dupPos.size.toLong)
        assert(out(id) == expect, s"doc $id (round $round): ${out(id)} != $expect")
      }
    }
  }

  test("property: leakSafeSplit is cluster-coherent and superset-stable on random groupings") {
    import spark.implicits._
    for (round <- 1 to 5) {
      val n = 15 + round * 5
      val ids = (0L until n.toLong)
      // random partial clustering: some docs share random group labels
      val labGen = Gen.choose(0L, 4L)
      val clustered = ids.filter(id => draw(Gen.prob(0.5), round * 31L + id))
      val clusters = clustered.map(id => (id, draw(labGen, round * 131L + id) * 1000L))
      val split = DocDedup.leakSafeSplitOf(ids.toDF("doc_id"), clusters.toDF("doc_id", "cluster_id"))
        .as[(Long, Long, String)].collect()
      assert(split.length == n)
      split.groupBy(_._2).foreach { case (gid, members) =>
        assert(members.map(_._3).toSet.size == 1, s"group $gid straddles") }
      // unclustered docs are their own group
      val cl = clusters.toMap
      split.foreach { case (id, gid, _) =>
        assert(gid == cl.getOrElse(id, id), s"group of $id") }
      // superset stability: adding fresh docs never moves existing ones
      val bigger = DocDedup.leakSafeSplitOf(
        (ids ++ (1000L until 1000L + 5L)).toDF("doc_id"), clusters.toDF("doc_id", "cluster_id"))
        .as[(Long, Long, String)].collect().map(t => t._1 -> t._3).toMap
      split.foreach { case (id, _, s) => assert(bigger(id) == s, s"doc $id moved") }
    }
  }

  // scalar union-find reference shared by the CC properties below
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }

  test("property: incremental CC equals full recompute for random graphs and random refresh cuts") {
    import spark.implicits._
    // total generator (no filter — a filtered draw can yield None): b is
    // a nonzero offset from a, mod the id space
    val edgeGen = for {
      a <- Gen.choose(0L, 40L); off <- Gen.choose(1L, 40L)
    } yield { val b = (a + off) % 41; (math.min(a, b), math.max(a, b)) }
    for (round <- 1 to 8) {
      val nEdges = 5 + round * 4
      val edges = (0 until nEdges)
        .map(i => draw(edgeGen, round * 10000L + i)).distinct
      // random refresh cut: ~60% of edges are "yesterday's" graph
      val (oldE, newE) = edges.partition { case (a, b) =>
        draw(Gen.choose(0, 9), a * 1000 + b) < 6 }
      if (newE.nonEmpty) {
        val oldNodes = oldE.flatMap(e => Seq(e._1, e._2)).distinct
        val priorUf = unionFind(oldE)
        val prior = oldNodes.map(n => (n, priorUf.getOrElse(n, n))).toDF("doc_id", "cluster_id")
        val got = DocDedup.incrementalClusters(prior,
            newE.toDF("id_a", "id_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val fullUf = unionFind(edges)
        val nodes = (oldNodes ++ newE.flatMap(e => Seq(e._1, e._2))).distinct
        val want = nodes.map(n => n -> fullUf.getOrElse(n, n)).toMap
        assert(got == want, s"round $round: old=$oldE new=$newE")
      }
    }
  }

  test("property: triangle stats equal a scalar brute force on random graphs") {
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.choose(0L, 20L); off <- Gen.choose(1L, 20L)
    } yield { val b = (a + off) % 21; (math.min(a, b), math.max(a, b)) }
    for (round <- 1 to 6) {
      val edges = (0 until 10 + round * 8)
        .map(i => draw(edgeGen, round * 777L + i)).distinct
      val got = graft.graph.Triangles.triangleStats(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val nodes = adj.keys.toSeq
      val want = nodes.map { v =>
        val nb = adj(v).toSeq
        val tri = (for { i <- nb.indices; j <- (i + 1) until nb.size
          if adj(nb(i)).contains(nb(j)) } yield 1).size.toLong
        v -> ((nb.size.toLong, tri))
      }.toMap
      assert(got == want, s"round $round: $edges")
    }
  }

  test("property: rendezvous resharding only ever moves docs into the newest shard") {
    import spark.implicits._
    // library-level form of the x90 spec over RANDOM doc-id universes and
    // shard counts: write the ids as a documents frame via a temp view is
    // unnecessary — reuse the corpus function on sfDir for ids, and check
    // the pure property across consecutive n for several n
    for (n <- 2 to 6) {
      val a = Curation.rendezvousShards(spark, sfDir, shards = n).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val b = Curation.rendezvousShards(spark, sfDir, shards = n + 1).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val movers = a.keys.filter(id => a(id) != b(id))
      movers.foreach(id => assert(b(id) == n, s"n=$n: doc $id moved between old shards"))
      assert(movers.size.toDouble / a.size < 2.5 / (n + 1),
        s"n=$n: movement ${movers.size.toDouble / a.size} far above 1/${n + 1}")
    }
  }
}

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
}

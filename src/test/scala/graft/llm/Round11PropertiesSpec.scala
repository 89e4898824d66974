package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-11 operators: on RANDOM inputs the
  * Spark constructions must equal an independent scalar reference (or, for
  * x97, the naive global-window formulation the distributed form
  * replaces). Generators drawn directly with fixed seeds, as in
  * LlmPropertiesSpec. */
class Round11PropertiesSpec extends SparkSpec {

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def md5U52(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 13)
    java.lang.Long.parseLong(hex, 16)
  }

  test("property: priority sample equals a scalar Duffield–Lund–Thorup recompute") {
    import spark.implicits._
    val srcGen = Gen.oneOf("a", "b", "c")
    for (round <- 1 to 5) {
      val n = 20 + round * 15
      val docs = (0 until n).map { i =>
        (i.toLong * 7 + round, draw(srcGen, round * 1000L + i),
          draw(Gen.choose(1L, 500L), round * 2000L + i))
      }
      val k = 3
      val got = Curation.prioritySampleOf(
        docs.toDF("doc_id", "source", "n_chars"), k)
        .select("source", "rank", "doc_id", "weight", "priority", "est_weight")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
      // scalar reference: same dyadic u, same IEEE division, JVM-side
      val expected = docs.groupBy(_._2).flatMap { case (src, ds) =>
        val ranked = ds.map { case (id, _, w) =>
          val u = (md5U52(id) + 1).toDouble / 4503599627370496.0
          (id, w, w.toDouble / u)
        }.sortBy { case (id, _, pr) => (-pr, id) }
        val tau = if (ranked.length > k) ranked(k)._3 else 0.0
        ranked.take(k).zipWithIndex.map { case ((id, w, pr), i) =>
          (src, i + 1, id, w, pr, math.max(w.toDouble, tau))
        }
      }.toSet
      assert(got == expected, s"round=$round")
    }
  }

  test("property: distributed curriculum order equals the naive global-window form") {
    import spark.implicits._
    val srcGen = Gen.oneOf("s0", "s1", "s2", "s3")
    // quality on the 1/20 bucket grid plus off-grid values and exact ties
    val qGen: Gen[Double] =
      Gen.oneOf(Gen.choose(0, 20).map(_ / 20.0), Gen.choose(0.0, 1.0))
    for (round <- 1 to 5) {
      val n = 30 + round * 20
      val docs = (0 until n).map { i =>
        (i.toLong, draw(srcGen, round * 100L + i), draw(qGen, round * 300L + i))
      }
      val df = docs.toDF("doc_id", "source", "quality_score")
      val got = Curation.curriculumOrderOf(df)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
          r.getInt(3), r.getInt(4))).toSet
      // the naive formulation the distributed construction must reproduce
      val byQ = Window.orderBy(desc("quality_score"), col("doc_id"))
      val perSrc = Window.partitionBy("decile", "source")
        .orderBy(desc("quality_score"), col("doc_id"))
      val inter = Window.orderBy(col("decile"), col("src_rank"),
        col("source"), col("doc_id"))
      val naive = df
        .withColumn("decile", ntile(10).over(byQ))
        .withColumn("src_rank", row_number().over(perSrc))
        .withColumn("curriculum_rank", row_number().over(inter))
        .select("curriculum_rank", "doc_id", "source", "decile", "src_rank")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
          r.getInt(3), r.getInt(4))).toSet
      assert(got == naive, s"round=$round n=$n")
    }
  }

  test("property: embedding dim profile equals scalar integer-milli moments") {
    import spark.implicits._
    for (round <- 1 to 5) {
      val dim = 3 + round
      val n = 10 + round * 10
      val vecs = (0 until n).map { i =>
        (i.toLong, (0 until dim).map(j =>
          draw(Gen.choose(-0.6, 0.6), round * 5000L + i * 97 + j).toFloat).toArray)
      }
      val got = Similarity.embeddingDimProfileOf(vecs.toDF("vec_id", "embedding"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
      val expected = (0 until dim).map { d =>
        val vs = vecs.map(_._2(d))
        val ms = vs.map(v => math.floor(v.toDouble * 1000.0).toLong)
        val (s1, s2) = (ms.sum, ms.map(m => m * m).sum)
        (d.toLong, vs.length.toLong, s1.toDouble / vs.length,
          (vs.length * s2 - s1 * s1).toDouble / (vs.length.toLong * vs.length).toDouble,
          vs.min.toDouble, vs.max.toDouble)
      }.toSet
      assert(got == expected, s"round=$round dim=$dim")
    }
  }

  test("property: seq-len budget table equals a scalar recompute") {
    import spark.implicits._
    val budgets = Seq(4, 8, 16)
    for (round <- 1 to 5) {
      val n = 15 + round * 10
      val texts = (0 until n).map { i =>
        val len = draw(Gen.choose(1, 30), round * 400L + i)
        Seq.fill(len)("w").mkString(" ")
      }
      val got = Packing.seqlenBudgetOf(texts.toDF("text"), budgets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      val lens = texts.map(_.split(" ").length.toLong)
      val expected = budgets.map { b =>
        val lost = lens.map(l => math.max(l - b, 0L)).sum
        val pad = lens.map(l => b - math.min(l, b)).sum
        (b.toLong, lens.length.toLong, lens.count(_ > b).toLong, lens.sum,
          lost, lost * 1000000L / lens.sum, pad * 1000000L / (lens.length * b))
      }.toSet
      assert(got == expected, s"round=$round")
    }
  }

  test("property: embedding drift equals a scalar milli-quantized recompute") {
    import spark.implicits._
    def coin(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      if (Integer.parseInt(f"${d(0)}%02x", 16) < 128) "a" else "b"
    }
    for (round <- 1 to 6) {
      val n = 20 + round * 12
      val dim = draw(Gen.choose(2, 6), round * 11L)
      val rows = (0 until n).map { i =>
        val label = draw(Gen.choose(0, 2), round * 1000L + i)
        val vec = (0 until dim).map(d =>
          draw(Gen.choose(-1000, 1000), round * 5000L + i * 10L + d) / 1000.0f).toArray
        (i.toLong, label, vec)
      }
      val got = Similarity.embeddingDriftOf(rows.toDF("vec_id", "label", "embedding"))
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      val expected = rows.groupBy(_._2).map { case (label, rs) =>
        val (as, bs) = rs.partition(r => coin(r._1) == "a")
        val na = as.length.toLong
        val nb = bs.length.toLong
        val drift = if (na > 0 && nb > 0) {
          val num = (0 until dim).map { d =>
            val sa = as.map(r => math.floor(r._3(d).toDouble * 1000.0).toLong).sum
            val sb = bs.map(r => math.floor(r._3(d).toDouble * 1000.0).toLong).sum
            val t = sa * nb - sb * na
            t * t
          }.sum
          val den = na.toDouble * nb.toDouble * 1000.0
          Some(num.toDouble / den / den)
        } else None
        label -> ((na, nb, drift))
      }
      assert(got == expected, s"round=$round dim=$dim")
    }
  }

  test("property: k-core peel equals a scalar synchronous peel on random graphs") {
    import spark.implicits._
    def scalarPeel(edges: Seq[(Long, Long)], k: Int): Map[Long, (Int, Long)] = {
      var adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      // alive set tracked like the Spark side: a node whose edges all
      // vanish still peels (degree 0 < k) the round after, never vanishes
      var alive = adj.map(_._1).toSet
      var res = Map.empty[Long, (Int, Long)]
      var round = 0
      var done = false
      while (!done) {
        val deg = adj.groupBy(_._1).map { case (n, es) => n -> es.size }
        val low = alive.filter(n => deg.getOrElse(n, 0) < k)
        if (low.isEmpty) done = true
        else {
          round += 1
          low.foreach(n => res += n -> ((round, 0L)))
          alive --= low
          adj = adj.filterNot { case (s, t) => low(s) || low(t) }
        }
      }
      adj.groupBy(_._1).foreach { case (n, es) => res += n -> ((0, es.size.toLong)) }
      res
    }
    val pairGen = for {
      a <- Gen.choose(1L, 14L)
      b <- Gen.choose(1L, 14L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    for (round <- 1 to 12) {
      val nEdges = draw(Gen.choose(3, 25), round * 31L)
      val edges = draw(Gen.listOfN(nEdges, pairGen), round * 97L).distinct
      val k = draw(Gen.choose(2, 3), round * 7L)
      // maxRounds 50: a random 14-node graph can peel deeper than the
      // corpus gate's 6-round bound; the library contract is parametric
      val got = graft.graph.KCore.kCorePeel(edges.toDF("id_a", "id_b"), k, maxRounds = 50)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      assert(got == scalarPeel(edges, k), s"round=$round k=$k edges=$edges")
    }
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Round-4 analytics additions: one-pass profiling, resample+ffill,
  * integer PageRank, mixture epoching. Each checked against an
  * independent scalar recomputation on the sf0.001 tables. */
class AnalyticsOpsSpec extends SparkSpec {

  test("column profile: one row per column, stats internally consistent") {
    val rows = Profiling.columnProfile(spark, sfDir).collect()
    val total = graft.Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("l_linenumber", "l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { r =>
      val (nulls, nonNull, dist, mn, mx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nulls + nonNull == total, s"counts must partition: $r")
      assert(dist <= nonNull && dist >= 1)
      assert(mn <= mx)
    }
    val line = rows.find(_.getString(0) == "l_linenumber").get
    assert(line.getLong(3) <= 7, "l_linenumber has at most 7 distinct values")
  }

  test("resample+ffill: dense calendar, fill carries last observation") {
    val out = TimeSeries.resampleFfill(spark, sfDir).collect()
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate).sortBy(_.toEpochDay)
      assert(days.last.toEpochDay - days.head.toEpochDay + 1 == days.length,
        "grid must be gap-free")
      // scalar ffill over the sorted days must reproduce n_filled
      var lastSeen = 0L
      rs.sortBy(_.getDate(1).toLocalDate.toEpochDay).foreach { r =>
        val (obs, filled, gap) = (r.getLong(2), r.getLong(3), r.getInt(4))
        if (gap == 0) { assert(obs >= 1); lastSeen = obs }
        else assert(obs == 0L)
        assert(filled == lastSeen, s"ffill mismatch at $r")
      }
    }
    assert(out.exists(_.getInt(4) == 1), "fixture must exercise real gaps")
  }

  test("pagerank: matches a scalar integer implementation exactly") {
    val edges = graft.graph.PageRank.tradeEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d, w) => in(d) += rank(s) * w / outw(s) }
      rank = nodes.map(n => n -> (150000L + 850L * in(n) / 1000L)).toMap
    }
    val got = graft.graph.PageRank.nationRank(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == rank, "distributed ranks must equal the scalar recompute")
    assert(rank.values.forall(_ >= 150000L), "teleport floor")
  }

  test("mixture epochs: per-doc copy counts follow the integer factor rule") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val perLang = docs.groupBy(_._2).map { case (s, ds) => s -> ds.length.toLong }
    val sq = perLang.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
    val totalSq = sq.values.sum
    val nTotal = docs.length.toLong
    val factor = sq.map { case (s, v) => s -> v * nTotal * 1000000L / (totalSq * perLang(s)) }
    val out = graft.llm.Curation.mixtureEpochs(spark, sfDir).collect()
    val copies = out.groupBy(_.getLong(0)).map { case (id, rs) =>
      // copy_idx must be exactly 1..n
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length).toSeq)
      id -> rs.length.toLong
    }
    val md5ppm = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (id: Long) => {
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % 1000000L
      }
    }
    docs.foreach { case (id, lang) =>
      val f = factor(lang)
      val expected = f / 1000000L + (if (md5ppm(id) < f % 1000000L) 1L else 0L)
      assert(copies.getOrElse(id, 0L) == expected, s"doc $id of $lang")
    }
    // the weights must actually reshape the mixture: the dominant language
    // downsamples (<1×) and some low-resource language upsamples (>1×)
    assert(factor.values.exists(_ < 1000000L) && factor.values.exists(_ > 1000000L))
  }

  test("cumulative users: monotone, ends at the total distinct-user count") {
    val out = TimeSeries.cumulativeUsers(spark, sfDir).collect()
    val cums = out.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a }, "strictly increasing")
    out.foreach(r => assert(r.getLong(1) >= 1))
    assert(cums.head == out.head.getLong(1), "day 1 cumulative == day 1 new")
    assert(out.map(_.getLong(1)).sum == cums.last, "new-user counts sum to the total")
    val totalUsers = graft.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(cums.last == totalUsers, "curve must end at the converting-user total")
  }

  test("fuzzy join: matches a scalar blocked edit-distance recompute") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.Tables.part(spark, sfDir)
      .select("p_name").distinct().collect().map(_.getString(0)).toSeq
    val expected = names.groupBy(_.split(" ").last).values.flatMap { ns =>
      for (x <- ns; y <- ns if x < y; d = lev(x, y) if d <= 3) yield (x, y, d)
    }.toSeq.sorted
    val got = Dedup.fuzzyNameJoin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture must produce fuzzy matches")
  }

  test("triangle stats: degree-ordered count matches brute force on known shapes; corpus invariants hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // K4 clique (1-4): every node deg 3, 3 triangles, coeff 1.0; a path
    // 10-11-12-13: zero triangles, coeff 0; a hub 20 with leaves 21-23
    // plus one closed pair (21, 22): exactly one triangle at 20,21,22
    val edges = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) ++
      Seq((10L, 11L), (11L, 12L), (12L, 13L)) ++
      Seq((20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L))
    val got = graft.graph.Triangles.triangleStats(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    (1L to 4L).foreach(v => assert(got(v) == ((3L, 3L, 1.0)), s"K4 node $v: ${got(v)}"))
    assert(got(10L) == ((1L, 0L, 0.0)) && got(11L) == ((2L, 0L, 0.0)))
    assert(got(20L) == ((3L, 1L, 1.0 * 2 / 6)) && got(21L) == ((2L, 1L, 1.0)))
    assert(got(23L) == ((1L, 0L, 0.0)))
    // corpus gate: every triangle contributes 3 memberships; coeff bounded
    val corpus = graft.graph.Triangles.neardupTriangles(spark, sfDir).cache()
    assert(corpus.agg(sum("n_triangles")).head().getLong(0) % 3 == 0)
    assert(corpus.filter(col("clustering_coeff") < 0 || col("clustering_coeff") > 1).count() == 0)
    corpus.unpersist()
  }

  test("distinct-ngram diversity: scalar recompute per source; ratios bounded") {
    import org.apache.spark.sql.functions._
    val got = graft.llm.TextStats.distinctNgrams(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    // scalar recompute over the collected corpus (test-sized)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val toks = rows.map(_._2.split(" ").toSeq)
      val shingles = toks.flatMap(t =>
        if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq else Seq(t.mkString(" ")))
      val want = (toks.map(_.length.toLong).sum, toks.flatten.distinct.length.toLong,
        shingles.length.toLong, shingles.distinct.length.toLong)
      assert(got(src) == want, s"source $src: ${got(src)} vs $want")
    }
  }
}

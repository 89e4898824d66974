package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 pins: the x110→geometry feedback loop closed (x15c) — the
  * measured witness recall becomes an integer correction factor in the
  * band-geometry dispatch, and the calibrated gate's output carries both
  * the factor and the geometry it selected. */
class Round13Spec extends SparkSpec {

  test("x15c: calibrated ladder — corr=1e6 reduces exactly to autoBandRows") {
    for (n <- Seq(16L, 500L, 60000L, 1L << 40))
      assert(DocDedup.autoBandRowsCalibrated(n, 1000000L) ==
        DocDedup.autoBandRows(n),
        s"n=$n: full-confidence correction must not change the geometry")
  }

  test("x15c: an underperforming witness forces more, shorter bands") {
    // at n=60000 theory picks r=2 (683594 ppm clears 600k); a measured
    // correction of 0.8 derates it to 546875 — below target, so the
    // dispatch must step to r=1 (recall 996094·0.8 = 796875, clears)
    assert(DocDedup.autoBandRowsCalibrated(60000L, 1000000L) == 2)
    assert(DocDedup.autoBandRowsCalibrated(60000L, 800000L) == 1)
    // a catastrophic witness exhausts the ladder and lands on r=1
    assert(DocDedup.autoBandRowsCalibrated(60000L, 100000L) == 1)
  }

  test("x15c: the measured correction is integer-exact, positive, capped at 1e6") {
    val corr = DocDedup.bandCalibrationPpm(spark, sfDir)
    assert(corr > 0L && corr <= 1000000L, s"corr=$corr out of range")
    // the fixture's witness sample is non-vacuous (Round12Spec pins the
    // audit non-empty), so the cap-or-measured branch actually ran:
    // re-derive the factor from the audit components by hand
    val audit = DocDedup.bandRecallAudit(spark, sfDir)
      .select("j_bucket", "n_true_pairs", "n_found").collect()
    val found = audit.map(_.getLong(2)).sum
    val expected = audit.map(r =>
      r.getLong(1) * DocDedup.bandRecallPpmAt(r.getLong(0) * 100000L, 2, 4)).sum
    val byHand =
      if (expected == 0L) 1000000L
      else math.min(1000000L, found * 1000000L * 1000000L / expected)
    assert(corr == byHand, s"corr=$corr != recomputed $byHand")
  }

  test("x15c: gate output carries the geometry the calibrated dispatch selected") {
    val out = DocDedup.ngramJaccardPairsCalibrated(spark, sfDir).persist()
    val n = graft.Tables.documents(spark, sfDir).count()
    val corr = DocDedup.bandCalibrationPpm(spark, sfDir)
    val rExpect = DocDedup.autoBandRowsCalibrated(n, corr)
    val rows = out.select("rows_per_band", "n_bands", "calib_ppm").distinct().collect()
    assert(rows.length == 1, s"one geometry row expected, got ${rows.toSeq}")
    assert(rows(0).getInt(0) == rExpect && rows(0).getInt(1) == 8 / rExpect &&
      rows(0).getLong(2) == corr,
      s"geometry ${rows(0)} != derived (r=$rExpect, b=${8 / rExpect}, corr=$corr)")
    // when the measurement confirms theory (corr at cap), the calibrated
    // pair set is exactly x15b's — the correction changes nothing it
    // shouldn't
    if (corr == 1000000L) {
      val base = DocDedup.ngramJaccardPairsAuto(spark, sfDir)
        .select("id_a", "id_b", "jaccard")
      assert(out.select("id_a", "id_b", "jaccard").except(base).isEmpty &&
        base.except(out.select("id_a", "id_b", "jaccard")).isEmpty,
        "capped correction must reproduce x15b's pair set")
    }
    out.unpersist()
  }

  test("x132: rerank returns exact-distance top-k drawn from the ADC candidate pool") {
    val rr = Similarity.pqRerankTopK(spark, sfDir).persist()
    val pool = Similarity.pqTopK(spark, sfDir, k = 25)
      .select("query_id", "neighbor_id")
    // subset of the stage-1 pool, k rows per query, ranks dense from 1
    assert(rr.join(pool, Seq("query_id", "neighbor_id"), "left_anti").isEmpty,
      "reranked rows must come from the ADC candidate pool")
    val perQ = rr.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(perQ.length == 20 &&
      perQ.forall(r => r.getLong(1) == 5L && r.getInt(2) == 1 && r.getInt(3) == 5),
      s"20 queries × dense ranks 1..5 expected: ${perQ.toSeq}")
    // the ranking IS by exact distance: rank order == dist_exact order
    val bad = rr.as("a").join(rr.as("b"),
      col("a.query_id") === col("b.query_id") && col("a.rank") < col("b.rank") &&
        col("a.dist_exact") > col("b.dist_exact")).count()
    assert(bad == 0L, "rank must be non-decreasing in exact distance")
    rr.unpersist()
  }

  test("x133: cluster mass is conserved — member weights sum to ~1e6 per cluster") {
    val w = DocDedup.dupWeighting(spark, sfDir).persist()
    assert(w.count() == graft.Tables.documents(spark, sfDir).count(),
      "soft weighting keeps every document")
    // singletons weigh exactly 1e6; members exactly 1e6 // size
    assert(w.filter(col("cluster_size") === 1 && col("weight_ppm") =!= 1000000L).isEmpty)
    assert(w.filter(col("weight_ppm") =!=
      floor(lit(1000000L) / col("cluster_size")).cast("long")).isEmpty)
    // per cluster the total mass is 1e6 up to the integer-floor remainder
    val labels = DocDedup.clusterLabels(spark, sfDir)
    val mass = w.join(labels, Seq("doc_id"))
      .groupBy("cluster_id").agg(sum("weight_ppm").as("m"), count(lit(1)).as("n"))
      .filter(col("m") > 1000000L || col("m") <= lit(1000000L) - col("n"))
    assert(mass.isEmpty, "cluster mass must be within the floor remainder of 1e6")
    w.unpersist()
  }

  test("x134: first document is fully novel; counts reconcile globally") {
    val nv = DocDedup.ngramNovelty(spark, sfDir).persist()
    val firstDoc = nv.agg(min("doc_id")).head().getLong(0)
    assert(nv.filter(col("doc_id") === firstDoc)
      .head().getAs[Long]("novelty_ppm") == 1000000L,
      "the earliest doc's shingles are all first occurrences")
    assert(nv.filter(col("novelty_ppm") < 0 || col("novelty_ppm") > 1000000L).isEmpty)
    // every distinct shingle has exactly one first occurrence
    val totNovel = nv.agg(sum("n_novel")).head().getLong(0)
    val distinctShingles = graft.Tables.documents(spark, sfDir)
      .select(explode(array_distinct(
        DocDedup.shingles(split(col("text"), " ")))).as("s"))
      .select("s").distinct().count()
    assert(totNovel == distinctShingles,
      s"sum(n_novel)=$totNovel != global distinct shingles $distinctShingles")
    nv.unpersist()
  }

  test("x136: coherence rows reconcile with the labels and pair artifact exactly") {
    val c = DocDedup.clusterCoherence(spark, sfDir).collect()
    val labels = DocDedup.clusterLabels(spark, sfDir).persist()
    val nClusters = labels.select("cluster_id").distinct().count()
    assert(c.length.toLong == nClusters, "one row per cluster")
    assert(c.map(_.getLong(1)).sum == labels.count(), "members partition the labeled docs")
    // every pair in the artifact lands in exactly one cluster's count
    val nPairs = DocDedup.pairArtifact(spark, sfDir).count()
    assert(c.map(_.getLong(2)).sum == nPairs, "pair evidence must be fully attributed")
    c.foreach { r =>
      val (n, p) = (r.getLong(1), r.getLong(2))
      val possible = n * (n - 1) / 2
      assert(n >= 2 && p >= n - 1 && p <= possible,
        s"cluster ${r.getLong(0)}: $p pairs outside [n-1, n(n-1)/2] for n=$n")
      assert(r.getLong(5) == p * 1000000L / possible, "coverage arithmetic")
      // verified pairs sit at or above the dedup threshold; the
      // micro-mean is bounded by [min·1e6 (floored), 1e6]
      assert(r.getDouble(3) >= 0.5 && r.getDouble(4) <= 1000000.0 &&
        r.getDouble(4) >= math.floor(r.getDouble(3) * 1e6) - 1)
    }
    labels.unpersist()
  }

  test("x137: the guard only ever rescues — dropped docs are a subset of x30's losers") {
    val g = DocDedup.dedupApplyGuarded(spark, sfDir).persist()
    assert(g.count() == graft.Tables.documents(spark, sfDir).count(),
      "statuses must cover every doc")
    val dropped = g.filter(col("status") === "dropped").select("doc_id")
    val losers = DocDedup.clusterLabels(spark, sfDir)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    assert(dropped.join(losers, Seq("doc_id"), "left_anti").isEmpty,
      "the guard must never drop a doc plain survivorship would keep")
    val byStatus = g.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("dropped", 0L) > 0L &&
      byStatus.getOrElse("keeper", 0L) > 0L,
      "healthy clusters must still drop non-keepers")
    // the fixture's clusters are all tight pairs/triangles (coverage 1e6,
    // links ≥ 0.9), so at principled thresholds the guard correctly never
    // fires on it — one keeper per (healthy == every) cluster
    assert(byStatus.getOrElse("kept_guarded", 0L) == 0L)
    assert(byStatus.getOrElse("keeper", 0L) ==
      DocDedup.clusterCoherence(spark, sfDir).count(),
      "one keeper per healthy cluster")
    g.unpersist()
  }

  test("x137: a planted 4-chain is rescued wholesale; the tight cluster still dedups") {
    val spark2 = spark
    import spark2.implicits._
    // cluster 1: a CHAIN 1~2~3~4 (3 of 6 possible pairs = 500k coverage —
    // CC glued ends 1 and 4 were never compared); cluster 10: a tight
    // pair. Coverage flags the chain, the pair stays healthy.
    val pairs = Seq((1L, 2L, 0.8), (2L, 3L, 0.8), (3L, 4L, 0.8),
      (10L, 11L, 0.95)).toDF("id_a", "id_b", "jaccard")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)).toDF("doc_id", "cluster_id")
    val docs = (1L to 4L).union(Seq(10L, 11L, 99L)).toDF("doc_id")
    val coh = DocDedup.clusterCoherenceOf(labels, pairs)
    val chain = coh.filter(col("cluster_id") === 1L).head()
    assert(chain.getLong(5) == 500000L && chain.getDouble(3) == 0.8,
      s"chain coverage/min wrong: $chain")
    val out = DocDedup
      .dedupApplyGuardedOf(docs, labels, coh, 600000L, 0.6)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == "kept_guarded"),
      s"chain members must be rescued: $out")
    assert(out(10L) == "keeper" && out(11L) == "dropped" && out(99L) == "singleton",
      s"healthy cluster must still dedup, singletons self-keep: $out")
  }

  test("x138: coverage reconciles with e16's unseen-bigram set; bounds hold") {
    val cov = TextStats.lmCoverage(spark, sfDir).collect()
    assert(cov.nonEmpty)
    cov.foreach { r =>
      val (nb, nk, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nk <= nb && ppm == nk * 1000000L / nb, s"arithmetic at ${r.getString(0)}")
      assert(ppm > 0L && ppm <= 1000000L, s"${r.getString(0)}: coverage $ppm")
    }
    // somewhere in the corpus the unseen path fires (a fully-covered
    // source is legitimate — e.g. a templated one — but not all of them)
    assert(cov.exists(_.getLong(4) < 1000000L),
      "fixture must contain unseen incoming bigrams in at least one source")
    // totals reconcile with a direct recompute over the model join
    val docs = graft.Tables.widen(graft.Tables.documents(spark, sfDir))
    val lm = TextStats.bigramLmTableOf(docs.filter(col("doc_id") % 2 === 0))
    val t = split(col("text"), " ")
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), explode(zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(concat(col("p.w1"), lit(" "), col("p.w2")).as("bigram"))
    val totKnown = incoming.join(lm.select("bigram"), Seq("bigram"), "left_semi").count()
    assert(cov.map(_.getLong(3)).sum == totKnown, "known totals must reconcile")
    assert(cov.map(_.getLong(2)).sum == incoming.count(), "bigram totals must reconcile")
  }

  test("x139: balance rows partition the split; shares and deviations recompute exactly") {
    val b = DocDedup.splitBalance(spark, sfDir).collect()
    assert(b.map(_.getString(0)).toSet == Set("train", "val", "test"))
    val tot = b.map(_.getLong(1)).sum
    assert(tot == graft.Tables.documents(spark, sfDir).count())
    b.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * 1000000L / tot, s"share at ${r.getString(0)}")
      val target = if (r.getString(0) == "train") 796875L else 101562L
      assert(r.getLong(3) == target &&
        r.getLong(4) == math.abs(r.getLong(2) - target), s"target/dev at ${r.getString(0)}")
    }
    // the library form on a hand-built frame: exact floors
    val spark2 = spark
    import spark2.implicits._
    val hand = DocDedup.splitBalanceOf(
      (Seq.fill(3)("train") ++ Seq("val")).toDF("split")).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(hand("train") == ((750000L, 46875L)) && hand("val") == ((250000L, 148438L)))
  }

  test("x135: halves partition the corpus; shares and drift recompute exactly") {
    val d = TextStats.qualityDrift(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    val (totPrev, totCur) = (d.map(_.getLong(1)).sum, d.map(_.getLong(2)).sum)
    assert(totPrev + totCur == nDocs, "bins must partition the corpus")
    assert(totPrev > 0 && totCur > 0, "fixture has both snapshot halves")
    // integer-floor shares sum to 1e6 within the per-bin floor remainder
    val pSum = d.map(_.getLong(3)).sum
    assert(pSum <= 1000000L && pSum > 1000000L - d.length,
      s"prev shares sum $pSum out of floor range")
    // every row's arithmetic recomputes from its own counts
    d.foreach { r =>
      val (np, nc, p, q, drift) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p == np * 1000000L / totPrev && q == nc * 1000000L / totCur,
        s"share mismatch at bin ${r.getLong(0)}")
      val expect = if (p + q == 0) 0L else (p - q) * (p - q) / (p + q)
      assert(drift == expect, s"drift mismatch at bin ${r.getLong(0)}")
    }
  }
}

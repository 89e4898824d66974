package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the LLM-pipeline extension operators. sf0.001 documents carry
  * planted near-duplicates (found empirically: MinHash est_jaccard ≥ 0.9
  * pairs that are NOT byte-identical), which these tests exploit. */
class LlmSpec extends SparkSpec {

  // computed once, shared by the minhash/simhash tests (the pairs query is
  // the expensive one at test scale)
  private lazy val pairs08 =
    DocDedup.minhashPairs(spark, sfDir, minEstJaccard = 0.8).persist()

  test("exact dedup groups every document (no byte-identical dups in corpus)") {
    val g = DocDedup.exactGroups(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir).count()
    assert(g.agg(sum("n_docs")).head().getLong(0) == docs)
  }

  test("minhash LSH finds near-dup pairs and estimates match exact jaccard") {
    val pairs = pairs08
    assert(pairs.count() > 0, "planted near-dups should surface")
    // est jaccard within 0.2 of exact n-gram jaccard for every candidate
    val verified = DocDedup.ngramJaccard(graft.Tables.documents(spark, sfDir), pairs)
      .join(pairs, Seq("id_a", "id_b"))
    val bad = verified.filter(abs(col("jaccard") - col("est_jaccard")) > 0.2).count()
    assert(bad == 0, "minhash estimate should track exact jaccard")
    assert(verified.filter(col("jaccard") < 0.5).count() == 0)
  }

  test("x3 candidate pairs contain every x15-verified pair (LSH recall 1.0 at gate thresholds)") {
    // x3 (xxhash64 MinHash+LSH, the rows-only gate) pinned against the
    // fully ORACLE-CHECKED pipeline: every pair the md5-band + exact
    // 3-gram-Jaccard path (x15) verifies as a near-dup must also surface
    // from the production xxh64 path on the same corpus. Deterministic
    // (fixed seeds, fixed corpus), so this witnesses x3's construction
    // end-to-end without needing an xxh64 oracle in DuckDB.
    val verified = DocDedup.ngramJaccardPairs(spark, sfDir).select("id_a", "id_b")
    val candidates = DocDedup.minhashPairs(spark, sfDir).select("id_a", "id_b")
    val missed = verified.except(candidates)
    assert(verified.count() > 0, "corpus should carry planted near-dups")
    assert(missed.isEmpty,
      s"x3 missed verified near-dup pairs: ${missed.collect().mkString(", ")}")
  }

  test("simhash: near-dup pairs have small hamming distance, random pairs large") {
    val sh = DocDedup.simhashDigest(spark, sfDir)
    val near = pairs08.filter(col("est_jaccard") >= 0.9)
    val withSh = near
      .join(sh.select(col("doc_id").as("id_a"), col("simhash").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("simhash").as("sh_b")), Seq("id_b"))
      .withColumn("ham", DocDedup.hamming(col("sh_a"), col("sh_b")))
    val avgNear = withSh.agg(avg("ham")).head().getDouble(0)
    assert(avgNear < 16, s"near-dups should be close in simhash space, got $avgNear")
    // unrelated docs: expected hamming ~32
    val far = sh.limit(30)
    val a = far.select(col("doc_id").as("ia"), col("simhash").as("sa"))
    val b = far.select(col("doc_id").as("ib"), col("simhash").as("sb"))
    val avgFar = a.join(b, col("ia") < col("ib"))
      .agg(avg(DocDedup.hamming(col("sa"), col("sb")))).head().getDouble(0)
    // docs share a small vocabulary so "far" pairs sit below the 32-bit
    // random expectation (~18 observed) — still 8× the near-pair distance
    assert(avgFar > 12, s"random pairs should be distant, got $avgFar")
  }

  test("simhashPairs blocking finds the same pairs as exhaustive hamming") {
    val blocked = DocDedup.simhashPairs(spark, sfDir, maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = DocDedup.simhashDigest(spark, sfDir)
    val a = sh.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("simhash").as("sb"))
    val exhaustive = a.join(b, col("id_a") < col("id_b"))
      .filter(DocDedup.hamming(col("sa"), col("sb")) <= 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4-chunk blocking is EXACT for hamming ≤ 3 (pigeonhole: 3 bit flips
    // cannot touch all 4 chunks)
    assert(blocked == exhaustive)
  }

  test("simhashPairsWide (128-bit): blocking exact vs exhaustive, halves independent") {
    val wide = DocDedup.simhashPairsWide(spark, sfDir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val sh = DocDedup.simhashDigest128(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    // brute force over the full 128-bit space
    val exhaustive = (for {
      (ia, (loA, hiA)) <- sh
      (ib, (loB, hiB)) <- sh if ia < ib
      h = java.lang.Long.bitCount(loA ^ loB) + java.lang.Long.bitCount(hiA ^ hiB)
      if h <= 3
    } yield (ia, ib) -> h).toMap
    assert(wide == exhaustive,
      s"4x32-bit blocking must be exact for hamming<=3: got ${wide.size} vs ${exhaustive.size}")
    // the salted second half is a genuinely different function of the
    // same tokens (otherwise the widening adds zero discriminating bits)
    assert(sh.count { case (_, (lo, hi)) => lo != hi } > sh.length / 2)
  }

  test("x4d md5 witness: 4x8-bit cross-half blocking exact vs exhaustive") {
    val witness = DocDedup.simhashPairsWideMd5(spark, sfDir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val sh = DocDedup.simhash2x16Md5Of(
        graft.Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val exhaustive = (for {
      (ia, (loA, hiA)) <- sh
      (ib, (loB, hiB)) <- sh if ia < ib
      h = java.lang.Long.bitCount(loA ^ loB) + java.lang.Long.bitCount(hiA ^ hiB)
      if h <= 3
    } yield (ia, ib) -> h).toMap
    assert(witness == exhaustive,
      s"witness blocking must be exact: got ${witness.size} vs ${exhaustive.size}")
    // the two md5 streams must genuinely differ (salted second stream)
    assert(sh.count { case (_, (lo, hi)) => lo != hi } > sh.length / 2)
  }

  test("autoChunkBits derivation and simhashPairsAuto dispatch") {
    // occupancy-32 derivation, clamped to the constructions we carry
    assert(DocDedup.autoChunkBits(1000) == 8)
    assert(DocDedup.autoChunkBits(1000000) == 15)      // 64-bit path
    assert(DocDedup.autoChunkBits(100000000) == 22)    // -> two-stream wide
    assert(DocDedup.autoChunkBits(Long.MaxValue / 2) == 32)
    // at corpus scale here the derived width stays <= 16: the auto path
    // must be EXACTLY the 64-bit production pipeline
    val auto = DocDedup.simhashPairsAuto(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = DocDedup.simhashPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == fixed)
    // a pinned width > 16 dispatches to the wide construction
    val wide = DocDedup.simhashPairsAuto(spark, sfDir, chunkBits = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wideFixed = DocDedup.simhashPairsWide(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == wideFixed)
    // the md5-witness dispatch (x4e_auto_md5 gate) picks the single-stream
    // witness at gate scale — exactly simhashPairsMd5's pair set
    val autoMd5 = DocDedup.simhashPairsAutoMd5(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val md5Fixed = DocDedup.simhashPairsMd5(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoMd5 == md5Fixed)
  }

  test("4-chunk blocking refuses maxHamming > 3 (incomplete pair set)") {
    intercept[IllegalArgumentException](DocDedup.simhashPairs(spark, sfDir, maxHamming = 4))
    intercept[IllegalArgumentException](DocDedup.simhashPairsWide(spark, sfDir, maxHamming = 4))
    intercept[IllegalArgumentException](DocDedup.simhashPairsWideMd5(spark, sfDir, maxHamming = 4))
  }

  test("ANN LSH recall vs brute force is pinned") {
    val exact = Similarity.nearDupPairs(spark, sfDir, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annPairsLsh(spark, sfDir, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exact), "LSH must not invent pairs (exact rescoring)")
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
    // seeded planes + fixed corpus → recall is DETERMINISTIC (measured
    // 0.358 for 8 tables × 6 planes at threshold 0.3); pin a floor so a
    // silent banding/seed regression cannot pass as green
    val recall = approx.size.toDouble / exact.size
    assert(recall >= 0.3, s"ANN recall regressed: $recall (${approx.size}/${exact.size})")
  }

  test("KNN join: valid ranked lists, and candidates agree with the pair path") {
    val knn = Similarity.knnJoin(spark, sfDir, k = 5).cache()
    // well-formed neighbor lists: no self-loop, ranks contiguous from 1,
    // neighbors unique per vector
    assert(knn.filter(col("vec_id") === col("neighbor_id")).count() == 0)
    val perVec = knn.groupBy("vec_id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi"),
      countDistinct("neighbor_id").as("nd"))
    assert(perVec.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
      col("nd") =!= col("n") || col("n") > 5).count() == 0,
      "each vector's neighbors are ranked 1..n<=k with no duplicates")
    // consistency with the verified near-dup path: every annPairsLsh pair
    // above threshold whose endpoints have <k neighbors total must appear
    // in SOME direction (same buckets, same rescoring — the top-k is the
    // only thing that can drop a candidate)
    val pairs = Similarity.annPairsLsh(spark, sfDir, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val knnPairs = knn.select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bidir = pairs.filter { case (a, b) =>
      knnPairs.contains((a, b)) || knnPairs.contains((b, a)) }
    assert(pairs.isEmpty || bidir.size.toDouble / pairs.size >= 0.8,
      s"near-dup pairs should rank inside top-k lists: ${bidir.size}/${pairs.size}")
    knn.unpersist()
  }

  test("derived-parameter LSH: md5 planes, integer-exact autoPlanes, auto gates behave") {
    // planeMd5 is the contract with the oracle SQL (DuckDB rebuilds the
    // matrix from its own md5) — pin a few signs so a silent change to the
    // key format or nibble choice cannot pass as green
    assert(Similarity.planeMd5(0, 0, 8) ==
      Seq(-1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    assert(Similarity.planeMd5(7, 27, 8) ==
      Seq(-1.0, 1.0, 1.0, 1.0, 1.0, -1.0, -1.0, 1.0))
    // integer-exact ceil(log2(n/32)): exact at power-of-two corpus sizes
    // (where float log2 jitter could disagree with the SQL threshold sum)
    assert(Similarity.autoPlanes(500) == 6)
    assert(Similarity.autoPlanes(32L << 6) == 6)      // exactly 2048 -> 6
    assert(Similarity.autoPlanes((32L << 6) + 1) == 7) // 2049 -> 7
    assert(Similarity.autoPlanes(20000) == 10)
    assert(Similarity.autoPlanes(Long.MaxValue / 4) == 28) // cap
    // the auto pair path must not invent pairs (exact rescore) and keeps
    // the multi-table recall floor of the pinned form
    val exact = Similarity.nearDupPairs(spark, sfDir, threshold = 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Similarity.annPairsLshAuto(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact), "auto LSH must not invent pairs")
    assert(exact.nonEmpty && auto.size.toDouble / exact.size >= 0.3,
      s"auto-LSH recall regressed: ${auto.size}/${exact.size}")
    // auto KNN: well-formed ranked lists (no self-loops, contiguous ranks)
    val knn = Similarity.knnJoinAuto(spark, sfDir).cache()
    assert(knn.filter(col("vec_id") === col("neighbor_id")).count() == 0)
    val perVec = knn.groupBy("vec_id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi"))
    assert(perVec.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
      col("n") > 5).count() == 0)
    knn.unpersist()
  }

  test("x80 semantic decontamination: attribution equals brute force, flags follow the threshold") {
    val rows = Similarity.semanticDecontaminate(spark, sfDir).collect()
    // covers exactly the train split; eval ids never appear as subjects
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(rows.length == n - (n + 16) / 17 && rows.forall(_.getLong(0) % 17 != 0))
    // attribution vs a driver-side brute force over the raw vectors
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val evalIds = emb.keys.filter(_ % 17 == 0).toSeq.sorted
    rows.foreach { r =>
      val (id, top, sim, flag) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
      val best = evalIds.map(e => (e, cos(emb(id), emb(e))))
        .maxBy { case (e, s) => (s, -e) }
      assert(best._1 == top, s"vec $id: top $top != brute ${best._1}")
      assert(math.abs(best._2 - sim) < 1e-9)
      assert(flag == (if (sim >= 0.35) 1 else 0))
    }
    // the threshold is live on this corpus: both flag values occur
    assert(rows.exists(_.getInt(3) == 1) && rows.exists(_.getInt(3) == 0))
  }

  test("x80b auto-LSH decontamination: exact rescore never over-reports, recall pinned") {
    val brute = Similarity.semanticDecontaminate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    val lsh = Similarity.semanticDecontaminateAuto(spark, sfDir).collect()
    assert(lsh.length == brute.size, "every train vector reports, attributed or not")
    lsh.foreach { r =>
      val (bTop, bSim, _) = brute(r.getLong(0))
      if (!r.isNullAt(1)) {
        val sim = r.getDouble(2)
        assert(sim <= bSim + 1e-12, "candidate rescore is exact: cannot exceed the brute max")
        // when the LSH candidates contain the true argmax, attribution matches
        if (math.abs(sim - bSim) < 1e-12) assert(r.getLong(1) == bTop)
        assert(r.getInt(3) == (if (sim >= 0.35) 1 else 0))
      } else assert(r.getInt(3) == 0, "bucket-less trains must not flag")
    }
    // the decision that matters: flags are a SUBSET of brute force (exact
    // rescore -> no false positives) with a pinned recall floor (seeded
    // planes + fixed corpus -> deterministic)
    val bruteFlagged = brute.collect { case (id, (_, _, 1)) => id }.toSet
    val lshFlagged = lsh.filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    assert(lshFlagged.subsetOf(bruteFlagged), "no false contamination flags")
    assert(bruteFlagged.nonEmpty && lshFlagged.size.toDouble / bruteFlagged.size >= 0.5,
      s"x80b recall regressed: ${lshFlagged.size}/${bruteFlagged.size}")
  }

  test("bigram LM score: valid ppm range, corpus-complete, repeats score higher than rarities") {
    val lm = TextStats.bigramLmScore(spark, sfDir).cache()
    // conditional probability ppm is in (0, 1e6]: every bigram was seen at
    // least once given its prefix, and at most always
    assert(lm.filter(col("lm_score_ppm") <= 0 || col("lm_score_ppm") > 1000000).count() == 0)
    // exactly the docs with >= 2 whitespace tokens are scored, and the
    // bigram totals reconcile with token counts
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
    val expected = docs.filter(col("nt") >= 2)
      .agg(count(lit(1)), sum(col("nt") - 1)).head()
    assert(lm.count() == expected.getLong(0))
    assert(lm.agg(sum("n_bigrams")).head().getLong(0) == expected.getLong(1))
    lm.unpersist()
  }

  test("KNN join: recall vs exact brute-force top-k is pinned") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exactTop = emb.map { case (id, v) =>
      id -> emb.filter(_._1 != id).map { case (j, w) => (j, cos(v, w)) }
        .sortBy { case (j, s) => (-s, j) }.take(5).map(_._1).toSet
    }.toMap
    val knn = Similarity.knnJoin(spark, sfDir, k = 5)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (hit, tot) = exactTop.foldLeft((0, 0)) { case ((h, t), (id, ex)) =>
      (h + knn.getOrElse(id, Set.empty[Long]).intersect(ex).size, t + ex.size)
    }
    // seeded planes + fixed corpus → deterministic; pin a floor so a
    // banding/seed regression cannot pass silently
    val recall = hit.toDouble / tot
    assert(recall >= 0.25, s"KNN-join recall regressed: $recall ($hit/$tot)")
  }

  test("containment: bounded, >= jaccard, and both orientations of verified pairs") {
    val cont = DocDedup.containmentPairs(spark, sfDir, minContainment = 0.5).cache()
    assert(cont.filter(col("containment") <= 0 || col("containment") > 1.0).count() == 0)
    // containment(A→B) = |∩|/|A| >= |∩|/|∪| = jaccard, so every
    // oracle-checked x15 pair (jaccard >= 0.5) must appear in BOTH
    // orientations, each with containment >= its jaccard
    val jac = DocDedup.ngramJaccardPairs(spark, sfDir)
    val fwd = jac.join(cont, Seq("id_a", "id_b"))
    assert(fwd.count() == jac.count(), "forward orientation missing pairs")
    assert(fwd.filter(col("containment") < col("jaccard") - 1e-12).count() == 0)
    val rev = jac.select(col("id_b").as("id_a"), col("id_a").as("id_b"))
    assert(rev.join(cont, Seq("id_a", "id_b")).count() == jac.count(),
      "reverse orientation missing pairs")
    cont.unpersist()
  }

  test("contamination report: reconciles with the x31 decontamination flags") {
    val rep = Curation.contaminationReport(spark, sfDir).cache()
    val dec = Curation.decontaminate(spark, sfDir).cache()
    // exactly the docs with >= 1 eval-shingle hit are attributed
    assert(rep.count() == dec.filter(col("n_hits") > 0).count())
    val j = rep.join(dec, Seq("doc_id"))
    assert(j.count() == rep.count(), "every attributed doc must exist in x31")
    // shared-with-top-eval <= distinct shingles hit anywhere <= total
    // per-eval collision multiplicity; shingle counts agree across paths
    assert(j.filter(col("shared_shingles") > col("n_hits")).count() == 0)
    assert(j.filter(col("n_hits") > col("total_collisions")).count() == 0)
    assert(j.filter(rep("n_shingles") =!= dec("n_shingles")).count() == 0)
    assert(rep.filter(col("share") <= 0 || col("share") > 1).count() == 0)
    // the top eval doc really is from the eval split
    assert(rep.filter(col("top_eval_id") % 17 =!= 0).count() == 0)
    rep.unpersist(); dec.unpersist()
  }

  test("substring decontamination: planted inclusions found, corpus matches brute force") {
    import spark.implicits._
    val ev = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // 10 tokens
      (17L, "tiny eval")                  // < k: outside the verbatim tier's contract
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta theta iota kappa suffix"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  // exact copy
      (3L, "contains tiny eval inside it"),
      (4L, "alpha beta gamma delta epsilon but then it diverges entirely away"),
      (5L, "nothing in common at all here")
    ).toDF("doc_id", "text")
    val found = Curation.substringDecontaminateDocs(train, ev)
      .select("doc_id", "eval_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((1L, 0L), (2L, 0L)), "sub-anchor eval items are excluded by contract")

    // corpus: the anchor-candidate path must equal brute-force contains()
    // over in-contract (>= 8-token) eval docs
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (evs, trs) = docs.partition(_._1 % 17 == 0)
    val brute = (for {
      (tid, ttext) <- trs
      (eid, etext) <- evs if etext.split(" ").length >= 8 && ttext.contains(etext)
    } yield (tid, eid)).toSet
    val got = Curation.substringDecontaminate(spark, sfDir)
      .select("doc_id", "eval_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"anchor path diverged from brute force: got=$got brute=$brute")
  }

  test("substring spans (x62b): mid-doc verbatim inclusion with paraphrased first line") {
    import spark.implicits._
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val ev = Seq(
      (0L, s"some completely original opening line here $body and a closing remark")
    ).toDF("doc_id", "text")
    // train doc 1 embeds the eval BODY mid-paragraph but not the eval doc's
    // opening line — the paraphrased-first-line inclusion x62's single
    // first-shingle anchor cannot see
    val train = Seq(
      (1L, s"train preamble text $body train epilogue text"),
      (2L, "entirely unrelated words with no shared span whatsoever in here")
    ).toDF("doc_id", "text")
    val got = Curation.substringSpansDocs(train, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 30L)), s"got=$got")
    // and x62 provably misses it: doc 1 does not contain the WHOLE eval text
    assert(Curation.substringDecontaminateDocs(train, ev).count() == 0)
  }

  test("substring spans (x62b): corpus matches brute-force longest common token run") {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    // intern tokens to ints so the O(|a|·|b|) DP compares ints, not strings
    val dict = scala.collection.mutable.HashMap.empty[String, Int]
    val all = docs.map { case (id, t) => (id, t.map(w => dict.getOrElseUpdate(w, dict.size))) }
    val (evs, trs) = all.partition(_._1 % 17 == 0)
    def longestRun(a: Array[Int], b: Array[Int]): Int = {
      var best = 0
      var prev = new Array[Int](b.length + 1)
      var cur = new Array[Int](b.length + 1)
      var i = 0
      while (i < a.length) {
        var j = 0
        while (j < b.length) {
          cur(j + 1) = if (a(i) == b(j)) prev(j) + 1 else 0
          if (cur(j + 1) > best) best = cur(j + 1)
          j += 1
        }
        val t = prev; prev = cur; cur = t
        i += 1
      }
      best
    }
    val brute = (for {
      (tid, tt) <- trs
      (eid, et) <- evs
      l = longestRun(tt, et) if l >= 16
    } yield (tid, eid) -> l.toLong).toMap
    val got = Curation.substringSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == brute, s"x62b diverged from DP brute force: got=$got brute=$brute")
  }

  test("best-of-cluster: keeper dominates its cluster on (quality, -id)") {
    val best = DocDedup.bestOfCluster(spark, sfDir).cache()
    val cl = DocDedup.dedupClustersGate(spark, sfDir)
    val q = TextStats.qualityScore(spark, sfDir).select("doc_id", "quality_score")
    val members = cl.join(q, Seq("doc_id"))
    // one keeper per cluster; keeper is a member; sizes reconcile
    assert(best.count() == cl.select("cluster_id").distinct().count())
    val withKeeper = best.join(
      members.select(col("cluster_id"), col("doc_id").as("keeper_id"),
        col("quality_score").as("member_q")),
      Seq("cluster_id", "keeper_id"))
    assert(withKeeper.count() == best.count(), "keeper must belong to its cluster")
    assert(withKeeper.filter(col("keeper_quality") =!= col("member_q")).count() == 0)
    assert(best.agg(sum("cluster_size")).head().getLong(0) == cl.count())
    // no member strictly beats the keeper: higher quality, or equal
    // quality with a smaller id
    val beaten = best.join(members, Seq("cluster_id"))
      .filter(col("quality_score") > col("keeper_quality") ||
        (col("quality_score") === col("keeper_quality") && col("doc_id") < col("keeper_id")))
    assert(beaten.count() == 0, "keeper must be the (quality, -id) argmax")
    best.unpersist()
  }

  test("filter ensemble: votes reconcile with the component signals") {
    val ens = TextStats.filterEnsemble(spark, sfDir).cache()
    assert(ens.filter(col("votes") =!= col("v_q") + col("v_lm") + col("v_clf")).count() == 0)
    assert(ens.filter((col("votes") >= 2) =!= (col("verdict") === "keep")).count() == 0)
    // LM misses coalesce to a 0 vote — no doc drops out of the verdict
    assert(ens.count() == graft.Tables.documents(spark, sfDir).count())
    // every fused vote equals its standalone-gate recompute
    val q = TextStats.qualityScore(spark, sfDir)
      .select(col("doc_id"), (col("quality_score") >= 0.6).cast("int").as("eq"))
    assert(ens.join(q, "doc_id").filter(col("v_q") =!= col("eq")).count() == 0)
    val lm = TextStats.bigramLmScore(spark, sfDir)
      .select(col("doc_id"), (col("lm_score_ppm") >= 200000L).cast("int").as("elm"))
    val lmJ = ens.join(lm, Seq("doc_id"), "left").na.fill(0, Seq("elm"))
    assert(lmJ.filter(col("v_lm") =!= col("elm")).count() == 0)
    val cl = TextStats.classifierMargin(spark, sfDir)
      .select(col("doc_id"), (col("w_sum") >= 0).cast("int").as("ecl"))
    assert(ens.join(cl, "doc_id").filter(col("v_clf") =!= col("ecl")).count() == 0)
    // fused = ONE corpus read: the checkpointed bigram stream hides the
    // single parquet scan, so the gate's own plan must contain none
    val plan = TextStats.filterEnsemble(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"fused x59 must not rescan documents:\n${plan.take(800)}")
    ens.unpersist()
  }

  test("bigram LM score: hand-computed micro-corpus") {
    import spark.implicits._
    // corpus: "a b", "a c", "a b d" → prefix counts: a=3, b=1
    // bigrams: (a b)×2 → ppm 666666; (a c)×1 → 333333; (b d)×1 → 1000000
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b d")).toDF("doc_id", "text")
    val got = TextStats.bigramLmScoreDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (1L, 1L, 666666.0),                  // "a b"
      (2L, 1L, 333333.0),                  // "a c"
      (3L, 2L, (666666.0 + 1000000.0) / 2) // "a b" + "b d"
    ))
  }

  test("classifier margin: bounded weights, sign-consistent verdict, stable across runs") {
    val m1 = TextStats.classifierMargin(spark, sfDir).cache()
    // per-token weights live in [-50, 50] so the mean must too
    assert(m1.filter(col("margin") < -50 || col("margin") > 50).count() == 0)
    assert(m1.filter((col("margin") >= 0 && col("verdict") =!= "keep") ||
      (col("margin") < 0 && col("verdict") =!= "drop")).count() == 0)
    // n_tokens agrees with the oracle-checked x9 whitespace tokenization
    val x9 = TextStats.tokenCount(spark, sfDir).select(col("doc_id"), col("n_tokens_ws"))
    assert(m1.join(x9, "doc_id").filter(col("n_tokens") =!= col("n_tokens_ws")).count() == 0)
    // pure function of content: a second build is row-identical
    val m2 = TextStats.classifierMargin(spark, sfDir)
    assert(m1.exceptAll(m2).count() == 0 && m2.exceptAll(m1).count() == 0)
    m1.unpersist()
  }

  test("dedup clusters: unconverged resolution fails loudly; deep chains fit the default budget") {
    import spark.implicits._
    // path graph 1-2-…-64: diameter 63 — far past the default 20-round
    // budget under min-label propagation, trivially inside it for the
    // large-star/small-star alternation (O(log n) rounds)
    val chain = (1L to 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalArgumentException] {
      DocDedup.dedupClusters(chain, maxIters = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // DEFAULT maxIters resolves the whole chain to one cluster, label 1
    val labs = DocDedup.dedupClusters(chain).collect()
    assert(labs.map(_.getLong(1)).distinct.toSeq == Seq(1L))
    assert(labs.length == 64 && labs.map(_.getLong(0)).toSet == (1L to 64L).toSet)
  }

  test("frozen refresh split: prior assignments never move; bridges inherit; new groups coin") {
    import spark.implicits._
    // snapshot 1: pair clusters {3,4} (group 3 → coin test) and {11,12}
    // (group 11 → coin train); snapshot 2 adds doc 7 BRIDGING them (merged
    // label 3) and singleton doc 30
    val priorDocs = Seq(3L, 4L, 11L, 12L).toDF("doc_id")
    val priorClusters = Seq((3L, 3L), (4L, 3L), (11L, 11L), (12L, 11L))
      .toDF("doc_id", "cluster_id")
    val prior = DocDedup.leakSafeSplitOf(priorDocs, priorClusters)
    assert(prior.collect().map(r => r.getLong(0) -> r.getString(2)).toMap ==
      Map(3L -> "test", 4L -> "test", 11L -> "train", 12L -> "train"),
      "fixture must straddle splits or the freeze is untested")
    val docs = Seq(3L, 4L, 7L, 11L, 12L, 30L).toDF("doc_id")
    val merged = Seq((3L, 3L), (4L, 3L), (7L, 3L), (11L, 3L), (12L, 3L))
      .toDF("doc_id", "cluster_id")
    val out = DocDedup.leakSafeSplitFrozen(docs, merged, prior).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    // frozen: 11/12 KEEP train although their group relabeled to 3 — the
    // naive x75 re-run would move them to the merged group's coin (test)
    assert(out(11L) == ((3L, "train", "frozen")) && out(12L) == ((3L, "train", "frozen")))
    assert(out(3L) == ((3L, "test", "frozen")) && out(4L) == ((3L, "test", "frozen")))
    val naive = DocDedup.leakSafeSplitOf(docs, merged).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(naive(11L) == "test", "the hazard is real: re-deriving WOULD move doc 11")
    // inherited: bridge doc 7 takes the min-frozen-doc_id member's split
    assert(out(7L) == ((3L, "test", "inherited")))
    // coined: never-before-seen group throws the x75 coin on its own id
    assert(out(30L) == ((30L, "train", "coined")))
    assert(out.size == 6)
  }

  test("incremental CC: refresh over prior stars equals full recompute; merges relabel; singletons survive") {
    import spark.implicits._
    // prior artifact: components {1,2,3} and {10,11} (star-form labels) +
    // singletons 20, 30; refresh edges BRIDGE the two components via new
    // doc 50, attach 51 to singleton 20, and introduce isolated pair 60-61
    val prior = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (30L, 30L)).toDF("doc_id", "cluster_id")
    val newEdges = Seq((11L, 50L), (50L, 3L), (51L, 20L), (60L, 61L))
      .toDF("id_a", "id_b")
    val got = DocDedup.incrementalClusters(prior, newEdges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      50L -> 1L, 20L -> 20L, 51L -> 20L, 30L -> 30L, 60L -> 60L, 61L -> 60L)
    assert(got == want, s"incremental merge wrong: $got")
    // the CONTRACT on the real pipeline: gate output == full recompute
    // over the complete pair set (+ old-snapshot singletons)
    val pairs = DocDedup.ngramJaccardPairs(spark, sfDir).drop("jaccard")
      .localCheckpoint()
    val full = graft.Tables.documents(spark, sfDir).select("doc_id")
      .filter(col("doc_id") % 10 =!= 0)
      .unionByName(pairs.select(col("id_a").as("doc_id")))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
      .join(DocDedup.dedupClusters(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val inc = DocDedup.incrementalClustersGate(spark, sfDir)
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0,
      "incremental refresh diverged from full recompute")
  }

  test("vocab coverage: matches a scalar recompute; cut clears the target; doubling V helps monotonically") {
    val r = TextStats.vocabCoverage(spark, sfDir).collect().head
    val (vs, cov, cov2, total, distinct) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(cov >= 990000L, s"cut coverage $cov below target")
    assert(cov2 >= cov && cov2 <= 1000000L)
    // scalar recompute over the collected corpus
    val toks = graft.Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" "))
    val freq = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }
    assert(total == toks.length.toLong && distinct == freq.size.toLong)
    val cums = freq.scanLeft(0L)(_ + _._2).tail
    val wantVs = cums.indexWhere(c => c * 1000000L >= 990000L * total) + 1
    assert(vs == wantVs.toLong, s"vocab size $vs vs scalar $wantVs")
    assert(cov == cums(wantVs - 1) * 1000000L / total)
    val idx2 = math.min(wantVs * 2, freq.size)
    assert(cov2 == cums(idx2 - 1) * 1000000L / total)
  }

  test("split leakage audit: cluster-coherent split leaks strictly less than a per-doc coin") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    def totalShared(audit: org.apache.spark.sql.DataFrame): Long =
      audit.agg(sum("n_shared")).head().getLong(0)
    val safe = DocDedup.splitLeakageAudit(spark, sfDir)
    assert(safe.count() == 3, "three split pairs expected")
    // the counterfactual: the SAME coin thrown per doc instead of per
    // near-dup group (empty cluster table -> every doc its own group)
    val naiveAssign = DocDedup.leakSafeSplitOf(docs.select("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"))
    val naive = DocDedup.splitLeakageAuditOf(
      docs.join(naiveAssign.select("doc_id", "split"), "doc_id"))
    assert(totalShared(naive) > totalShared(safe),
      s"cluster-coherent split must leak less: naive ${totalShared(naive)} vs safe ${totalShared(safe)}")
  }

  test("matryoshka fidelity: covers exactly the x5 pair set; truncated cosine is a valid cosine") {
    val x5 = Similarity.nearDupPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val m = Similarity.matryoshkaFidelity(spark, sfDir).collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1))).toSet == x5.keySet,
      "x88 must report every x5 near-dup pair and nothing else")
    m.foreach { r =>
      assert(r.getDouble(2) == x5((r.getLong(0), r.getLong(1))), "full cosine must equal x5's")
      val t = r.getDouble(3)
      assert(t >= -1.0 - 1e-9 && t <= 1.0 + 1e-9, s"truncated cosine out of range: $t")
      assert(r.getDouble(4) == t - r.getDouble(2), "err must be the signed difference")
    }
  }

  test("k-center coreset: matches scalar greedy recompute; selection radius non-increasing") {
    val got = Clustering.kcenterCoreset(spark, sfDir, k = 6).collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // brute force on the collected vectors (corpus is test-sized)
    val vs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    var chosen = Vector(vs.head)
    var want = Vector((1, vs.head._1, None: Option[Double]))
    for (rank <- 2 to 6) {
      val cand = vs.filter(v => !chosen.exists(_._1 == v._1))
        .map { case (id, vec) => (id, vec, chosen.map(c => d2(vec, c._2)).min) }
      val best = cand.minBy { case (id, _, md) => (-md, id) }
      chosen :+= ((best._1, best._2)); want :+= ((rank, best._1, Some(best._3)))
    }
    assert(got.map(t => (t._1, t._2)).toSeq == want.map(t => (t._1, t._2)).toSeq,
      s"greedy selection diverged: ${got.toSeq} vs ${want.toSeq}")
    // classic farthest-point property: the selection radius never grows
    val ds = got.flatMap(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"selection radius increased: ${ds.toSeq}")
  }

  test("dedup clusters: star alternation matches brute-force components on a scrambled graph") {
    import spark.implicits._
    // adversarial shapes in one fixture: a deep path given in REVERSED id
    // order (worst case for min-propagation), a binary tree, a cycle, a
    // clique, and duplicate + self edges that must be ignored
    val path = (100L to 130L).map(i => (i + 1, i))
    val tree = (1L until 32L).map(i => (200L + i, 200L + i / 2))
    val cycle = (300L until 310L).map(i => (i, 300L + (i - 299L) % 10L))
    val clique = for { a <- 400L to 405L; b <- (a + 1) to 405L } yield (a, b)
    val noise = Seq((100L, 100L), (101L, 100L), (101L, 100L))
    val edges = path ++ tree ++ cycle ++ clique ++ noise
    val got = DocDedup.dedupClusters(edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: union-find over the same edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val want = parent.keys.toSeq.map(k => k -> find(k)).toMap
    assert(got == want, s"star alternation diverged from union-find")
  }

  test("top-k neighbors are correctly ranked") {
    val tk = Similarity.topKBruteForce(spark, sfDir, nQueries = 5, k = 3)
    assert(tk.count() == 15)
    // rank 1 sim >= rank 2 sim >= rank 3 sim per query
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id").orderBy("rank")
    val bad = tk.withColumn("prev", lag("sim", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("sim")).count()
    assert(bad == 0)
  }

  test("hard negatives: cross-label only, ranked, and agree with filtered brute force") {
    val hn = Similarity.hardNegatives(spark, sfDir, nQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(hn.length == 15)
    val labels = graft.Tables.embeddings(spark, sfDir).select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the defining predicate: no neighbor shares the query's label
    hn.foreach { case (q, _, n, _) => assert(labels(q) != labels(n), s"$q/$n share a label") }
    // reference: x6's exact top-k restricted to cross-label candidates —
    // the mined set must be exactly the label-filtered head of the ranking
    val full = Similarity.topKBruteForce(spark, sfDir, nQueries = 5, k = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val expect = full.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.toSeq.sortBy(r => (-r._3, r._2)).filter(r => labels(r._2) != labels(q)).take(3)
        .zipWithIndex.map { case ((_, n, s), i) => (q, i + 1, n, s) }
    }.toSet
    assert(hn.toSet == expect)
  }

  test("language-ID predicts en for stopword-bearing synthetic docs") {
    val l = TextStats.langId(spark, sfDir)
    val en = l.filter(col("predicted_lang") === "en").count()
    assert(en > l.count() / 2, "corpus is English-vocab word salad")
    // no marker hits → unknown, never a false positive
    assert(l.filter(col("predicted_lang") =!= "unknown" && col("score_en") +
      col("score_de") + col("score_fr") + col("score_es") === 0).count() == 0)
  }

  test("quality score is bounded and token counts are consistent") {
    val q = TextStats.qualityScore(spark, sfDir)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1.0001).count() == 0)
    val t = TextStats.tokenCount(spark, sfDir)
    assert(t.filter(col("n_tokens_bpe") < col("n_tokens_ws")).count() == 0,
      "BPE-ish tokens are at least as many as whitespace tokens")
  }

  test("rolling fingerprint is stable under trailing-whitespace edits") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "totally different words here now ok yes")).toDF("doc_id", "text")
    val fps = docs
      .withColumn("shingle_hashes",
        transform(when(size(split(col("text"), " ")) >= 5,
          transform(sequence(lit(0), size(split(col("text"), " ")) - 5),
            i => concat_ws(" ", slice(split(col("text"), " "), i + 1, lit(5)))))
          .otherwise(array(col("text"))), s => xxhash64(s)))
      .select(col("doc_id"), array_min(col("shingle_hashes")).as("fp_min"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("multimodal: feature extraction preserves partitioning and batch shape") {
    val a = Multimodal.assets(spark, sfDir)
    val f = Multimodal.extractFeatures(a)
    assert(f.rdd.getNumPartitions == a.rdd.getNumPartitions, "mapPartitions keeps partitioning")
    val row = f.head()
    assert(row.embedding.length == 16, "fixed-width embedding")
    assert(math.abs(row.embedding.sum - 1.0f) < 1e-3, "histogram normalized")
    assert(row.frame_offsets.length <= 8)
    assert(Set("image", "audio", "video").contains(row.media_type))
    // deterministic stub: same payload → same features
    assert(Multimodal.decodeStub("abc".getBytes).sameElements(Multimodal.decodeStub("abc".getBytes)))
  }

  test("multimodal: resize preserves aspect ratio and caps the longest side") {
    assert(Multimodal.resizeDims(1024, 512, 512) == (512, 256))
    assert(Multimodal.resizeDims(300, 200, 512) == (300, 200)) // no upscale
    assert(Multimodal.resizeDims(200, 2000, 512) == (51, 512))
    val resized = Multimodal.resize(Multimodal.assets(spark, sfDir), maxSide = 300)
    assert(resized.filter(a => math.max(a.width, a.height) > 300).count() == 0)
    assert(resized.count() == Multimodal.assets(spark, sfDir).count())
  }

  test("motion-PNG container: structural demux, frame seek, decoded samples") {
    // container = 0..min(dur, 9500) ms at 250 ms/frame -> 2501/250+1 = 11
    val payload = Multimodal.videoPayload(seed = 5L, w = 12, h = 7, durationMs = 2501L)
    val frames = Multimodal.demuxMotionPng(payload)
    assert(frames.size == 11)
    // frames tile the container exactly (structural parse, no gaps)
    assert(frames.head._1 == 0 &&
      frames.map(_._2).sum == payload.length &&
      frames.sliding(2).forall { case Seq((o1, l1), (o2, _)) => o1 + l1 == o2 })
    // frame f decodes to pixel (x,y) = (seed + 7f + x + y) % 256
    for (f <- Seq(0, 3, 10)) {
      val (o, l) = frames(f)
      val Some((w, h, sum)) =
        Multimodal.decodeImage(java.util.Arrays.copyOfRange(payload, o, o + l))
      assert((w, h) == (12, 7))
      val expect = (for { y <- 0 until 7; x <- 0 until 12 } yield (5L + 7L * f + x + y) % 256).sum
      assert(sum == expect, s"frame $f: $sum != $expect")
    }
    // garbage between frames is a parse error, not a silent wrong frame
    intercept[IllegalArgumentException](
      Multimodal.demuxMotionPng(payload ++ Array[Byte](1, 2, 3)))
    // a TRUNCATED final frame (cut-off chunk) is the same structured
    // require failure carrying the offset — never a raw array-bounds throw
    intercept[IllegalArgumentException](
      Multimodal.demuxMotionPng(payload.dropRight(5)))
    intercept[IllegalArgumentException](
      Multimodal.demuxMotionPng(payload.dropRight(20)))
    // the m3 gate samples every 2nd container frame up to the cap
    val m3 = Multimodal.frameSample(spark, sfDir)
    assert(m3.filter(col("frame_ts_ms") % 500 =!= 0).count() == 0)
    assert(m3.groupBy("asset_id").count().agg(max("count")).head().getLong(0) <= 20)
    // non-default (strideMs, maxFrames): the container window is derived
    // from them, so sampling never indexes past the demuxed frame table
    // (latent IndexOutOfBounds with the old hard-coded 9500 ms window)
    val m3b = Multimodal.frameSample(spark, sfDir, strideMs = 1000, maxFrames = 20)
    assert(m3b.filter(col("frame_ts_ms") % 1000 =!= 0).count() == 0)
    assert(m3b.groupBy("asset_id").count().agg(max("count")).head().getLong(0) <= 20)
  }

  test("multimodal: real PNG codec round-trip, pixel resize, decoded m1 columns") {
    // encode → decode identity through the ACTUAL JDK PNG codec
    val png = Multimodal.pngPayload(seed = 7L, w = 13, h = 5)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte && png(2) == 'N'.toByte &&
      png(3) == 'G'.toByte, "payload must be a real PNG stream")
    val Some((w, h, sum)) = Multimodal.decodeImage(png)
    assert((w, h) == (13, 5))
    val expect = (for { y <- 0 until 5; x <- 0 until 13 } yield (7L + x + y) % 256).sum
    assert(sum == expect, s"decoded raster sum $sum != arithmetic $expect")
    // non-image bytes: no JDK codec → None, stub arm
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    // real pixel resize: output payload is a re-encoded PNG at target dims
    val big = Multimodal.pngPayload(seed = 3L, w = 300, h = 200)
    val Some(resizedPng) = Multimodal.resizeImage(big, maxSide = 100)
    val Some((rw, rh, _)) = Multimodal.decodeImage(resizedPng)
    assert((rw, rh) == (100, 66), s"got ($rw, $rh)")
    // image embeddings come from decoded pixels: uniform-gradient image →
    // mass spread across buckets, normalized
    val Some(emb) = Multimodal.imageEmbedding(png)
    assert(math.abs(emb.sum - 1.0f) < 1e-3)
    // m1 gate: decoded columns match the pixel function arithmetically
    val m1 = Multimodal.mediaStats(spark, sfDir)
      .filter(col("media_type") === "image").limit(10).collect()
    assert(m1.nonEmpty)
    m1.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      val (ww, hh) = ((id % 16 + 1).toInt, (id % 9 + 1).toInt)
      assert(r.getAs[Int]("width_px") == ww && r.getAs[Int]("height_px") == hh)
      val s = (for { y <- 0 until hh; x <- 0 until ww } yield (id + x + y) % 256).sum
      assert(r.getAs[Long]("gray_mean_ppm") == s * 1000000L / (ww.toLong * hh))
      assert(r.isNullAt(r.fieldIndex("sample_rate_hz")), "image rows carry no audio stats")
    }
    // audio arm: decoded PCM stats match the sample function arithmetically
    val m1a = Multimodal.mediaStats(spark, sfDir)
      .filter(col("media_type") === "audio").limit(10).collect()
    assert(m1a.nonEmpty)
    m1a.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      val n = (id % 50 + 10).toInt
      assert(r.getAs[Int]("sample_rate_hz") == 8000)
      assert(r.getAs[Int]("n_samples") == n)
      val sa = (0 until n).map(i => math.abs((id + i) % 65536 - 32768)).sum
      assert(r.getAs[Long]("pcm_abs_mean_ppm") == sa * 1000000L / n)
      assert(r.isNullAt(r.fieldIndex("width_px")), "audio rows carry no image stats")
    }
  }

  test("WAV payload is a REAL RIFF container and decodes to the exact sample function") {
    val wav = Multimodal.wavPayload(7L, 100)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((sr, n, sumAbs)) = Multimodal.decodeAudio(wav)
    assert(sr == 8000 && n == 100)
    assert(sumAbs == (0 until 100).map(i => math.abs((7L + i) % 65536 - 32768)).sum)
    // non-audio bytes are rejected, not misparsed
    assert(Multimodal.decodeAudio("not a riff container".getBytes("UTF-8")).isEmpty)
  }

  test("hand-rolled RIFF container is byte-identical to the JDK WAVE writer") {
    // r16: wavOf/wavPayload write the 44-byte canonical header directly
    // (AudioSystem.write serialized the fixture loop on its provider
    // registry). The contract: SAME bytes as the JDK writer, so nothing
    // downstream — including the real javax.sound decode — can tell.
    for ((seed, n) <- Seq((7L, 100), (0L, 1), (123456789L, 977))) {
      val ours = Multimodal.wavPayload(seed, n)
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = (((seed + i) % 65536) - 32768).toInt
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      assert(java.util.Arrays.equals(ours, bos.toByteArray),
        s"riffWav(seed=$seed, n=$n) diverges from the JDK writer")
    }
  }

  test("hash split: ~80/20, deterministic, and append-stable") {
    val s1 = TextStats.hashSplit(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = TextStats.hashSplit(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2, "pure function of the key: identical across runs")
    val trainFrac = s1.values.count(_ == "train").toDouble / s1.size
    assert(math.abs(trainFrac - 205.0 / 256) < 0.08, s"train fraction $trainFrac")
    // append-stability: the split of a subset equals the subset of the split
    val subset = TextStats.hashSplit(spark, sfDir).filter(col("doc_id") < 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset == s1.filter(_._1 < 100))
  }

  test("repetition stats: planted boilerplate scores high, varied text low") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),            // 3 bigrams, all (spam,spam)
      (2L, "one two three four five"),        // 4 distinct bigrams
      (3L, "solo")                            // <2 tokens → no output row
    ).toDF("doc_id", "text")
    val r = TextStats.repetitionStatsOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L).getAs[Double]("dup_bigram_frac") == 2.0 / 3)
    assert(r(1L).getAs[Double]("top_bigram_share") == 1.0)
    assert(r(2L).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r(2L).getAs[Double]("top_bigram_share") == 0.25)
    // corpus-wide: fractions stay in [0, 1]
    val c = TextStats.repetitionStats(spark, sfDir)
    assert(c.filter(col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1
      || col("top_bigram_share") <= 0 || col("top_bigram_share") > 1).count() == 0)
  }

  test("BPE trainer: merge sequence and greedy non-overlapping rewrite") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val (merges, corpus) = BpeTrainer.train(docs, nMerges = 5, sep = "+")
    // round 0: (a,b) appears 4× corpus-wide; round 1: (a+b,a+b) 2× in doc 1
    // (greedy: first two a+b merge, the third survives); then nothing ≥ 2
    assert(merges.map(m => (m.w1, m.w2, m.n)) ==
      Seq(("a", "b", 4L), ("a+b", "a+b", 2L)))
    val toks = corpus.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(toks(1L) == Seq("a+b+a+b", "a+b"))
    assert(toks(2L) == Seq("a+b", "c"))
    // overlap semantics: "a a a" merges once, the middle token is consumed
    val tri = Seq((1L, "a a a")).toDF("doc_id", "text")
      .select(BpeTrainer.mergePair(split($"text", " "), "a", "a", "+").as("t"))
      .head().getSeq[String](0)
    assert(tri == Seq("a+a", "a"))
    // tokenize with the learned table reproduces the trained corpus exactly
    val retok = BpeTrainer.tokenize(docs, merges, sep = "+").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(retok == toks)
  }

  test("dedup apply: losers removed, keepers and unpaired docs survive") {
    val clusters = DocDedup.dedupClustersGate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val losers = clusters.collect { case (d, c) if d != c => d }.toSet
    val kept = DocDedup.dedupApply(spark, sfDir).collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == all -- losers)
    assert(losers.nonEmpty, "fixture plants near-dups, so some docs must drop")
  }

  test("dedup stats: histogram covers the corpus and reconciles with clusters and apply") {
    val stats = DocDedup.dedupStats(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = graft.Tables.documents(spark, sfDir).count()
    // per-row arithmetic + full-corpus coverage
    stats.foreach { case (size, (nc, nd, nr)) =>
      assert(nd == size.toLong * nc && nr == (size - 1).toLong * nc)
    }
    assert(stats.map(_._2._2).sum == total, "sum(n_docs) must cover the corpus")
    // reconciliation: removed == docs x30 actually drops; clustered rows ==
    // the x17 label table; no sub-2 "clusters" besides the singleton row
    val removed = stats.map(_._2._3).sum
    assert(removed == total - DocDedup.dedupApply(spark, sfDir).count())
    val clustered = stats.collect { case (s, (_, nd, _)) if s >= 2 => nd }.sum
    assert(clustered == DocDedup.dedupClustersGate(spark, sfDir).count())
    assert(stats.count(_._1 == 1) == 1 && stats.forall(_._1 >= 1))
  }

  test("dedup clusters: label propagation resolves multi-hop components") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 round), triangle 10-11-12,
    // isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = DocDedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedup clusters on real pairs: every pair ends in one cluster") {
    val pairs = DocDedup.ngramJaccardPairs(spark, sfDir).drop("jaccard").cache()
    val clusters = DocDedup.dedupClusters(pairs)
    val joined = pairs
      .join(clusters.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("cluster_id", "ca"), Seq("id_a"))
      .join(clusters.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("cluster_id", "cb"), Seq("id_b"))
    assert(joined.filter(org.apache.spark.sql.functions.col("ca") =!=
      org.apache.spark.sql.functions.col("cb")).count() == 0,
      "paired docs must share a cluster")
  }

  test("semantic dedup agrees with the all-pairs scan restricted to cells") {
    import org.apache.spark.sql.expressions.Window
    val sd = Similarity.semanticDedup(spark, sfDir).persist()
    // one verdict per vector; keep flag is exactly n_dup_of == 0
    assert(sd.count() == graft.Tables.embeddings(spark, sfDir).count())
    assert(sd.filter((col("kept") === 1) =!= (col("n_dup_of") === 0)).count() == 0)
    // the smallest id in every cell has no earlier cell-mate to duplicate
    val minDropped = sd
      .withColumn("mn", min("vec_id").over(Window.partitionBy("cell_id")))
      .filter(col("vec_id") === col("mn") && col("kept") === 0).count()
    assert(minDropped == 0, "cell minima must always be kept")
    // cross-check against the independently-gated all-pairs scan (x5):
    // dropped == has a lower-id cell-mate with cosine >= threshold
    val cells = sd.select(col("vec_id"), col("cell_id"))
    val expected = Similarity.nearDupPairs(spark, sfDir)
      .join(cells.toDF("id_a", "cell_a"), Seq("id_a"))
      .join(cells.toDF("id_b", "cell_b"), Seq("id_b"))
      .filter(col("cell_a") === col("cell_b"))
      .select(col("id_b").as("vec_id")).distinct()
    val actual = sd.filter(col("kept") === 0).select("vec_id")
    assert(expected.exceptAll(actual).count() == 0 &&
      actual.exceptAll(expected).count() == 0,
      "dropped set must equal the within-cell near-dup pair targets")
    sd.unpersist()
  }
  test("source overlap: planted two-source fixture counts exactly the shared shingles") {
    import spark.implicits._
    // srcA: tokens a..f → shingles {a b c, b c d, c d e, d e f}
    // srcB: tokens c..h → shingles {c d e, d e f, e f g, f g h}
    // shared = {c d e, d e f} → n_shared = 2, n_a = n_b = 4
    val docs = Seq(("sA", "a b c d e f"), ("sB", "c d e f g h"))
      .toDF("source", "text")
    val ov = DocDedup.sourceOverlapOf(docs)
      .as[(String, String, Long, Long, Long)].collect()
    assert(ov.toSeq == Seq(("sA", "sB", 2L, 4L, 4L)))
  }

  test("source overlap gate: full matrix, bounds, totals reconcile") {
    import spark.implicits._
    val ov = DocDedup.sourceOverlap(spark, sfDir).persist()
    val rows = ov.as[(String, String, Long, Long, Long)].collect()
    // ordered pairs appear once, with a < b
    assert(rows.forall { case (a, b, _, _, _) => a < b })
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    // shared can never exceed either side's distinct total
    assert(rows.forall { case (_, _, sh, na, nb) => sh <= math.min(na, nb) })
    // n_a/n_b agree with an independent distinct-shingle count per source
    val direct = graft.Tables.documents(spark, sfDir)
      .select(col("source"), explode(DocDedup.shingles(split(col("text"), " "))).as("s"))
      .groupBy("source").agg(countDistinct("s").as("n"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (a, b, _, na, nb) =>
      assert(na == direct(a), s"n_a for $a")
      assert(nb == direct(b), s"n_b for $b")
    }
    ov.unpersist()
  }

  test("OOV rate reconciles with an explode-based anti-join computation") {
    import spark.implicits._
    val got = TextStats.oovRate(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val vocab = TextStats.tokenFreq(spark, sfDir, 50)
      .select("token").as[String].collect().toSet
    val expected = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, toks) =>
        val oov = toks.count(t => !vocab(t)).toLong
        (id, toks.length.toLong, oov, oov * 1000000L / toks.length)
      }.sortBy(_._1).toSeq
    assert(got == expected)
    // the ppm column is the exact integer quotient, and OOV is bounded
    got.foreach { case (_, n, oov, ppm) =>
      assert(oov <= n && ppm == oov * 1000000L / n)
    }
  }

  test("PQ encode picks the nearest centroid per subspace (scalar recompute)") {
    import spark.implicits._
    val cbs = Similarity.pqCodebooks(spark, sfDir)
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val codes = Similarity.pqEncode(spark, sfDir).collect()
    assert(codes.length == vecs.size)
    codes.foreach { r =>
      val vec = vecs(r.getLong(0))
      (0 until 8).foreach { m =>
        val sub = vec.slice(m * 8, m * 8 + 8)
        // scalar left-fold — the same summation order as the engine\u0027s
        // normSq fold, so equality (and thus the argmin) is exact
        val dists = cbs(m).map(c =>
          sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
        val expect = dists.indexOf(dists.min) + 1
        assert(r.getInt(m + 1) == expect, s"vec ${r.getLong(0)} subspace $m")
      }
    }
  }

  test("PQ ADC top-k has real recall against exact L2 search") {
    import spark.implicits._
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val queries = vecs.filter(_._1 < 20)
    val exact = queries.map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (nid, nv) => (l2(qv, nv), nid) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    def pqSets(k: Int): Map[Long, Set[Long]] =
      Similarity.pqTopK(spark, sfDir, k = k)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    def recallIn(short: Map[Long, Set[Long]]): Double =
      exact.map { case (q, ex) => (short(q) & ex).size.toDouble / 5 }.sum / exact.size
    val top5 = pqSets(5)
    assert(top5.keySet == exact.keySet)
    // these embeddings are near-i.i.d. synthetic — the hardest case for a
    // quantizer — so the floors sit under the measured values (0.20 /
    // 0.51 on sf0.001) but far above chance (5/499 ≈ 0.01, 20/499 ≈ 0.04)
    val r5 = recallIn(top5)
    assert(r5 >= 0.12, s"ADC recall@5 too low: $r5")
    // the production contract: the ADC SHORTLIST (top-C, then exact
    // rescore of C candidates) must capture most true neighbors
    val r20 = recallIn(pqSets(20))
    assert(r20 >= 0.4, s"ADC shortlist recall@20 too low: $r20")
  }

  test("sourceQualityProfile: partitions each source, ppm shares reconcile") {
    import spark.implicits._
    val rows = TextStats.sourceQualityProfile(spark, sfDir)
      .as[(String, Int, Long, Long)].collect()
    val perDoc = TextStats.qualityScore(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir).select("doc_id", "source"), Seq("doc_id"))
      .select("source", "quality_score").as[(String, Double)].collect()
    // counts are a partition of each source's docs into the fixed bands
    val expect = perDoc.groupBy { case (s, q) =>
      (s, math.min(9, math.floor(q * 10).toInt)) }.view.mapValues(_.length.toLong).toMap
    assert(rows.map(t => (t._1, t._2) -> t._3).toMap == expect)
    rows.foreach { case (_, band, _, _) => assert(band >= 0 && band <= 9) }
    // shares: exact integer ppm of the source total, Σ within 10 ppm of 1e6
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val total = rs.map(_._3).sum
      rs.foreach { case (_, _, n, ppm) => assert(ppm == n * 1000000L / total) }
      val s = rs.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - 10L * rs.length, s"$src shares sum $s") }
  }

  test("ivfPqTopK equals a scalar IVF-restricted ADC recompute") {
    import spark.implicits._
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val byId = vecs.toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cents = (0L until 16L).map(i => i -> byId(i))
    def bestCell(v: Seq[Double]): Long =
      cents.map { case (cid, cv) => (cos(v, cv), -cid) }.zip(cents.map(_._1))
        .maxBy(_._1)._2
    val cellOf = vecs.map { case (id, v) => id -> bestCell(v) }.toMap
    def probes(v: Seq[Double]): Set[Long] =
      cents.map { case (cid, cv) => (cos(v, cv), -cid, cid) }.sortBy(t => (-t._1, -t._2))
        .take(4).map(_._3).toSet
    val cbs = Similarity.pqCodebooks(spark, sfDir)
    def codeOf(v: Seq[Double]): Seq[Int] = (0 until 8).map { mi =>
      val sub = v.slice(mi * 8, mi * 8 + 8)
      val ds = cbs(mi).map(c => sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      ds.indexOf(ds.min)
    }
    def dlOf(v: Seq[Double]): Seq[Seq[Double]] = (0 until 8).map { mi =>
      val sub = v.slice(mi * 8, mi * 8 + 8)
      cbs(mi).map(c => sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    val expect = (0L until 20L).flatMap { qid =>
      val pr = probes(byId(qid)); val dl = dlOf(byId(qid))
      vecs.filter { case (nid, _) => nid != qid && pr.contains(cellOf(nid)) }
        .map { case (nid, nv) =>
          (codeOf(nv).zipWithIndex.map { case (c, mi) => dl(mi)(c) }.sum, nid) }
        .sortBy(identity).take(5).zipWithIndex
        .map { case ((d, nid), r) => (qid, r + 1, nid, d) }
    }.toSet
    val got = Similarity.ivfPqTopK(spark, sfDir)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got == expect, s"IVF-PQ mismatch: ${got.size} vs ${expect.size}")
  }

  test("contrastivePairs: negatives equal x67, positives same-label, counts exact") {
    import spark.implicits._
    val rows = Similarity.contrastivePairs(spark, sfDir)
      .as[(Long, Int, Int, Long, Double)].collect()
    val labels = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").as[(Long, String)].collect().toMap
    rows.foreach { case (q, pl, _, n, _) =>
      assert(q != n)
      assert((labels(q) == labels(n)) == (pl == 1), s"pair_label wrong for ($q,$n)") }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.count(_._2 == 1) == 2, s"query $q positives")
      assert(rs.count(_._2 == 0) == 5, s"query $q negatives") }
    // the negative branch IS x67's hard-negative set, rank for rank
    val negs = rows.filter(_._2 == 0).map(t => (t._1, t._3) -> t._4).toMap
    val x67 = Similarity.hardNegatives(spark, sfDir)
      .as[(Long, Int, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(negs == x67, "manifest negatives must equal x67's hard negatives")
  }

  test("featureHash equals a scalar hashing-trick recompute, sparse long form") {
    import spark.implicits._
    def md5_60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "cat cat cat"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextStats.featureHashDocs(docs, dim = 16)
      .as[(Long, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val expect = Seq(1L -> "the cat sat on the mat", 2L -> "cat cat cat")
      .flatMap { case (id, t) => t.split(" ").filter(_.nonEmpty).map { tok =>
        val h = md5_60(tok)
        (id, (h % 16).toInt) -> (if (h % 32 < 16) 1L else -1L)
      } }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(out == expect, "signed bucket sums must match the scalar hashing trick")
    // a repeated token accumulates with a consistent sign
    val catBucket = (md5_60("cat") % 16).toInt
    assert(math.abs(out((2L, catBucket))) == 3, "three 'cat's, one sign")
    // sparse: the empty doc emits nothing; corpus gate emits <= dim rows/doc
    assert(!out.keys.exists(_._1 == 3L))
    val gate = TextStats.featureHash(spark, sfDir).as[(Long, Int, Long)].collect()
    val perDoc = gate.groupBy(_._1).view.mapValues(_.length)
    assert(perDoc.values.max <= 16, "never more than dim rows per doc")
    assert(gate.exists(_._3 < 0) && gate.exists(_._3 > 0), "signs genuinely mix")
  }

  test("imageDedupApply keeps exactly one representative per phash cluster") {
    import spark.implicits._
    val out = Multimodal.imageDedupApply(spark, sfDir)
      .as[(Long, Long, Boolean)].collect()
    val nImages = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0).count()
    assert(out.length == nImages, "every image asset gets a verdict")
    out.foreach { case (id, cid, kept) =>
      assert(kept == (id == cid), s"kept must mean 'is the cluster representative' ($id)") }
    out.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._3) == 1, s"cluster $cid must keep exactly one") }
    // reconciliation: every near-dup pair landed in one cluster
    val cid = out.map(t => t._1 -> t._2).toMap
    Multimodal.imageNearDup(spark, sfDir).select("asset_a", "asset_b")
      .as[(Long, Long)].collect()
      .foreach { case (a, b) => assert(cid(a) == cid(b), s"pair ($a,$b) split") }
    assert(out.count(!_._3) > 0, "the planted blocks must actually remove dups")
  }

  test("captionFilter keeps decodable assets with quality captions only") {
    import spark.implicits._
    val out = Multimodal.captionFilter(spark, sfDir)
      .as[(Long, String, Double, Boolean)].collect()
    val q = TextStats.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(out.length == q.size, "one verdict per asset")
    out.foreach { case (id, mt, score, keep) =>
      assert(score == q(id), s"caption score must be x8's score (asset $id)")
      assert(keep == (mt != "video" && score >= 0.5), s"keep rule broken on $id") }
    assert(out.exists(_._4) && out.exists(!_._4), "both verdicts occur on the corpus")
  }

  test("leakSafeSplit: clusters never straddle splits, assignment is refresh-stable") {
    import spark.implicits._
    // planted clusters: docs 1,2,3 are one group (cluster_id 1), 10,11
    // another; 20 is a singleton
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val split = DocDedup.leakSafeSplitOf(docs, clusters)
      .as[(Long, Long, String)].collect()
    assert(split.length == 6)
    val byGroup = split.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    byGroup.foreach { case (gid, splits) =>
      assert(splits.size == 1, s"group $gid straddles splits: $splits") }
    // refresh stability: re-splitting a SUPERSET must not move existing docs
    val more = DocDedup.leakSafeSplitOf(
      (docs.as[Long].collect() ++ Seq(30L, 31L)).toSeq.toDF("doc_id"), clusters)
      .as[(Long, Long, String)].collect().map(t => t._1 -> t._3).toMap
    split.foreach { case (id, _, s) => assert(more(id) == s, s"doc $id moved on refresh") }
    // corpus gate: every x17 cluster coherent, proportions sane
    val gate = DocDedup.leakSafeSplit(spark, sfDir)
      .as[(Long, Long, String)].collect()
    val labels = DocDedup.dedupClustersGate(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val splitOf = gate.map(t => t._1 -> t._3).toMap
    labels.groupBy(_._2).foreach { case (cid, members) =>
      val ss = members.keys.map(splitOf).toSet
      assert(ss.size == 1, s"cluster $cid split across $ss — leakage") }
    val n = gate.length.toDouble
    val frac = gate.groupBy(_._3).view.mapValues(_.length / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0.04 && frac.getOrElse("test", 0.0) > 0.04)
  }

  test("bloomPrefilter: no false negatives, scalar-exact positions, FPR responds to mBits") {
    import spark.implicits._
    // gate output: every true dup must be a bloom hit (the Bloom guarantee)
    val gate = DocDedup.bloomPrefilter(spark, sfDir)
      .as[(Long, Boolean, Boolean)].collect()
    assert(gate.nonEmpty && gate.exists(_._3), "fixture must plant true dups")
    gate.foreach { case (id, hit, dup) =>
      assert(!dup || hit, s"false negative on doc $id — Bloom filters cannot do that") }
    // scalar recompute of the relational positions on a tiny fixture
    val docs = Seq((0L, "alpha"), (2L, "beta"), (1L, "alpha"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val res = DocDedup.bloomPrefilterOf(docs, col("doc_id") % 2 === 0)
      .as[(Long, Boolean, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def positions(s: String, m: Int): Seq[Long] =
      (0 until 3).map(t => java.lang.Long.parseLong(md5hex(s).slice(t * 8, t * 8 + 8), 16) % m)
    val histPos = Seq("alpha", "beta").flatMap(positions(_, 4096)).toSet
    def expect(s: String) = (positions(s, 4096).forall(histPos), Seq("alpha", "beta").contains(s))
    assert(res(1L) == expect("alpha") && res(1L)._2, "doc 1 is a true dup of doc 0")
    assert(res(3L) == expect("gamma"))
    // a saturated filter (tiny mBits) must go all-hits; a huge one must
    // separate — the FPR knob actually connects to the construction
    val many = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val tiny = DocDedup.bloomPrefilterOf(many, col("doc_id") % 2 === 0, mBits = 8)
      .as[(Long, Boolean, Boolean)].collect()
    assert(tiny.forall(_._2), "8-bit filter saturates: every probe hits")
    val huge = DocDedup.bloomPrefilterOf(many, col("doc_id") % 2 === 0, mBits = 1 << 20)
      .as[(Long, Boolean, Boolean)].collect()
    assert(huge.count(t => t._2 && !t._3) == 0, "2^20 bits for 200 keys: no FPs expected")
  }

  test("bloomProbeAny: a positions union with mixed (m_bits, k) is a hard failure") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val p64 = DocDedup.bloomPositions(docs, mBits = 64, k = 3)
    val p128 = DocDedup.bloomPositions(docs, mBits = 128, k = 3)
    // the docstring workflow unions daily position builds — two builds with
    // different autoMBits sizes must fail loudly, not silently pick one and
    // yield false negatives (the one verdict a Bloom filter must never give)
    val ex = intercept[IllegalArgumentException](
      DocDedup.bloomProbeAny(docs, p64.union(p128)).collect())
    assert(ex.getMessage.contains("mixed Bloom parameters"))
    // a consistent artifact still self-configures and probes clean
    val ok = DocDedup.bloomProbeAny(docs, p64)
      .select("doc_id", "bloom_hit").as[(Long, Boolean)].collect().toMap
    assert(ok(1L) && ok(2L), "member keys must hit their own filter")
  }

  test("audioQuality computes its stats from REALLY-decoded PCM (scalar recompute)") {
    import spark.implicits._
    // container round-trip: wavOf → javax.sound.sampled → exact samples
    val planted = Array(-32768, -1, 0, 1, 32767, 12345, -32000)
    val Some((rate, decoded)) = Multimodal.decodePcm(Multimodal.wavOf(planted))
    assert(rate == 8000 && decoded.sameElements(planted))
    // gate columns equal a scalar recompute from the fixture formula
    val rows = Multimodal.audioQuality(spark, sfDir)
      .as[(Long, Int, Int, Int, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { case (id, _, n, peak, clip, energy, zc) =>
      val s = Multimodal.m4Samples(id, (id % 50 + 10).toInt)
      assert(n == s.length)
      assert(peak == s.map(math.abs).max)
      assert(clip == s.count(v => math.abs(v) >= 32000) * 1000000L / s.length)
      assert(energy == s.map(v => v.toLong * v).sum)
      assert(zc == s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)), s"asset $id")
    }
    // the fixture genuinely varies the quality columns (a constant column
    // would gate nothing)
    assert(rows.map(_._5).distinct.length > 10, "clip_ppm must vary across assets")
    assert(rows.map(_._4).distinct.length > 10, "peak_abs must vary across assets")
  }

  test("aHash64 matches an arithmetic recompute and is perceptually stable") {
    // the REAL decode path must reproduce the pure-arithmetic hash the
    // oracle predicts: s(i,j) = (seed + ⌊i·w/8⌋ + ⌊j·h/8⌋) % 256,
    // bit = [64·s ≥ Σs], idx = j·8+i packed into 32-bit halves
    for ((seed, w, h) <- Seq((7L, 13, 5), (0L, 1, 1), (250L, 16, 9), (99L, 8, 8))) {
      val Some((hi, lo)) = Multimodal.aHash64(Multimodal.pngPayload(seed, w, h))
      val s = for (j <- 0 until 8; i <- 0 until 8)
        yield (seed + i * w / 8 + j * h / 8) % 256
      val sum = s.sum
      var (ehi, elo) = (0L, 0L)
      for (idx <- 0 until 64 if 64 * s(idx) >= sum)
        if (idx >= 32) ehi |= 1L << (idx - 32) else elo |= 1L << idx
      assert((hi, lo) == (ehi, elo), s"seed=$seed w=$w h=$h")
    }
    // identical pixels re-encoded → identical hash; a one-sample nudge of
    // the raster → tiny hamming (perceptual stability, the property that
    // makes aHash a NEAR-dup key rather than an exact checksum)
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val base = Multimodal.pngFreqPayload(5L, 16, 9)
    assert(Multimodal.aHash64(base) == Multimodal.aHash64(Multimodal.pngFreqPayload(5L, 16, 9)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val r = img.getRaster
    r.setSample(3, 3, 0, (r.getSample(3, 3, 0) + 1) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = hamming(Multimodal.aHash64(base).get, Multimodal.aHash64(bos.toByteArray).get)
    assert(d <= 2, s"one-sample nudge moved $d hash bits")
    // distinct stripe frequencies → distinct hashes (the fixture really
    // plants DIFFERENT images across seed classes, not one constant hash)
    val hashes = (0 until 24).map(s => Multimodal.aHash64(Multimodal.pngFreqPayload(s, 16, 9)).get)
    assert(hashes.distinct.size > 12, s"only ${hashes.distinct.size} distinct hashes across 24 classes")
  }

  test("imageNearDup equals brute-force hamming pairs and finds every planted dup") {
    import spark.implicits._
    val out = Multimodal.imageNearDup(spark, sfDir)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // brute force over the same fixture hashes (driver-side: |images| is
    // corpus-bounded here; the operator's chunk blocking is the scale path)
    val ids = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0).select("doc_id").as[Long].collect().sorted
    val hs = ids.map(id => id -> Multimodal.aHash64(Multimodal.pngQuadPayload(id / 72, 16, 9)).get).toMap
    val brute = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) + java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if d <= 3
    } yield (a, b) -> d).toMap
    assert(out == brute, s"blocked pairs ${out.size} != brute-force ${brute.size}")
    // every same-block pair is pixel-identical → present at hamming 0
    for (a <- ids.take(40); b <- ids.take(40) if a < b && a / 72 == b / 72)
      assert(out.get((a, b)).contains(0), s"planted dup ($a,$b) missing")
  }
}

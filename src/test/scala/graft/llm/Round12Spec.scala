package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 regression pins for the advisor findings: the JL audit's
  * dimensionality is probed from the frame (not hardcoded 64), the
  * release diff surfaces fully-new shards, and the k-core peel emits a
  * layer for edge-orphaned nodes (pinned in Round11Spec's fixture, plus
  * the alive-set scalar model in Round11PropertiesSpec). */
class Round12Spec extends SparkSpec {

  test("x115: JL audit uses ALL coordinates of a d>64 frame") {
    import spark.implicits._
    // chain vectors differing ONLY at coordinate 70 by a constant step:
    // d2_orig = step² and d2_proj = Σ_t (s_t·step)² = kOut·step² EXACTLY
    // (milli-quantized longs), so every pair's ratio_ppm is exactly 10⁶.
    // Under a sign matrix truncated to the first 64 dims the projected
    // difference would be 0 — ratio 0, decile 0 — so this pins the probe.
    val d = 80
    val emb = (0L to 5L).map { i =>
      val v = Array.fill(d)(0.0f); v(70) = 0.125f * i; (i, v)
    }.toDF("vec_id", "embedding")
    val a = Similarity.jlDistortionAuditOf(emb, kOut = 4).collect()
    assert(a.length == 1, s"one decile bucket expected, got ${a.toSeq}")
    assert(a(0).getLong(0) == 10L && a(0).getLong(1) == 5L &&
      a(0).getLong(2) == 1000000L && a(0).getLong(3) == 1000000L,
      s"exact kOut·d2 concentration expected, got ${a(0)}")
  }

  test("x115: an empty frame fails loudly instead of probing a phantom d") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.jlDistortionAuditOf(empty)
    }
  }

  test("x115: mixed dimensionalities fail loudly instead of truncating to one row's d") {
    import spark.implicits._
    // a single-row probe would read d=4 or d=8 by scan luck and the inner
    // join on dim would silently drop the longer vectors' tail coordinates
    val mixed = Seq((0L, Array.fill(4)(1.0f)), (1L, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.jlDistortionAuditOf(mixed)
    }
  }

  test("x15b: band geometry derivation — size ladder, recall guard, exact ppm chain") {
    // exact values of the integer ppm recall chain (the guard constants
    // the oracle re-evaluates symbolically — these pin the op sequence)
    assert(DocDedup.bandRecallPpm(4, 2) == 121094L)
    assert(DocDedup.bandRecallPpm(2, 4) == 683594L)
    assert(DocDedup.bandRecallPpm(1, 8) == 996094L)
    // size ladder: tiny corpora band widest; the guard steps the
    // size-driven start down until the 600k-ppm target clears
    assert(DocDedup.autoBandRows(16) == 1)
    assert(DocDedup.autoBandRows(60000) == 2, "r0=4 fails the guard, steps to 2")
    assert(DocDedup.autoBandRows(1L << 40) == 2)
    // a laxer target keeps the size-driven sharp geometry
    assert(DocDedup.autoBandRows(60000, targetRecallPpm = 100000L) == 4)
  }

  test("x15b: the theory curve the dispatch trusts is validated by the x110 witness") {
    // deployed geometry at this corpus clears the target by construction
    val n = graft.Tables.documents(spark, sfDir).count()
    val r = DocDedup.autoBandRows(n)
    assert(DocDedup.bandRecallPpm(r, 8 / r) >= 600000L)
    // x110 measures the SAME deployed banding against an independent
    // simhash witness: per bucket, measured recall must clear the
    // theoretical floor at the bucket's LOW edge (the curve is monotone,
    // so the low edge bounds every pair in the bucket) minus a 150k-ppm
    // guard for small witness samples
    val audit = DocDedup.bandRecallAudit(spark, sfDir).collect()
    assert(audit.nonEmpty, "the witness surfaced no true pairs — audit is vacuous")
    audit.foreach { row =>
      val jLo = row.getLong(0) * 100000L
      val floorPpm = DocDedup.bandRecallPpmAt(jLo, r, 8 / r)
      val measuredPpm = math.round(row.getDouble(4) * 1000000.0)
      assert(measuredPpm >= floorPpm - 150000L,
        s"bucket ${row.getLong(0)}: measured $measuredPpm < theory floor $floorPpm")
    }
  }

  test("x125: the capstone reconciles with the standalone funnel gates") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // rebuild the cascade from the STANDALONE gates the capstone composes
    val surv = TextStats.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        floor(col("quality_score") * 1e6).cast("long").as("qi"), col("quality_score"))
      .join(Curation.lengthFilter(spark, sfDir).select("doc_id"), Seq("doc_id"), "left_semi")
      .filter(col("quality_score") >= 0.6)
      .join(DocDedup.dedupApply(spark, sfDir), Seq("doc_id"), "left_semi")
      .join(Curation.decontaminationVerdicts(spark, sfDir)
        .filter(col("contaminated") === 0).select("doc_id"), Seq("doc_id"), "left_semi")
      .join(DocDedup.frozenSplitGate(spark, sfDir)
        .filter(col("split") === "train").select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "n_tokens", "qi").persist()
    val survToks = surv.agg(sum("n_tokens")).head().getLong(0)
    assert(survToks > 12000L, "the 12k budget must BIND — otherwise the boundary logic is dead code")
    // near-dup survivors are a subset of x38's exact-dedup training set
    // (an exact duplicate is a jaccard-1 near-dup, so every exact loser is
    // a CC loser), and the other x38 rules are in the cascade
    val x38 = Curation.trainingSet(spark, sfDir).select("doc_id")
    assert(surv.join(x38, Seq("doc_id"), "left_anti").count() == 0,
      "cascade survivors must all be x38 training-set members")
    // the budget selection the manifest summarizes: counts and the cap
    val sel = Curation.tokenBudgetOf(surv, 12000L).persist()
    assert(sel.agg(sum("n_tokens")).head().getLong(0) <= 12000L)
    assert(sel.count() < surv.count(), "binding budget must drop someone")
    val manifest = Curation.curationPipeline(spark, sfDir).persist()
    assert(manifest.agg(sum("n_docs")).head().getLong(0) == sel.count(),
      "manifest docs must equal the budget selection")
    // manifest token/char totals equal the cleaned text of the selection
    val cleanSel = Curation.cleanText(spark, sfDir)
      .join(sel.select("doc_id"), Seq("doc_id"), "left_semi")
      .agg(sum(size(split(col("clean_text"), " "))).as("t"),
        sum(length(col("clean_text"))).as("c")).head()
    assert(manifest.agg(sum("n_tokens")).head().getLong(0) == cleanSel.getLong(0))
    assert(manifest.agg(sum("n_chars")).head().getLong(0) == cleanSel.getLong(1))
    surv.unpersist(); sel.unpersist(); manifest.unpersist()
  }

  test("x122b: the stored-index append equals the live-build append row-for-row") {
    // same candidates (stored codes are the artifact roundtrip of the live
    // coding), same rescore expression over exact-roundtripped doubles —
    // the two forms must be bit-identical, not merely approximately equal
    val live = Similarity.knnIncrementalAppend(spark, sfDir).collect().toSeq
    val stored = Similarity.knnIncrementalAppendStored(spark, sfDir).collect().toSeq
    assert(live.nonEmpty && live == stored)
  }

  test("x82: frozen split stays frozen across THREE chained snapshots") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the two-snapshot gate covers one refresh; the production risk is the
    // CHAIN — an assignment must survive any number of refreshes, and a
    // doc inherited at refresh k must be frozen (same split) at k+1, with
    // inheritance staying consistent with a scalar model of the rules
    def md5Coin(groupId: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(groupId.toString.getBytes("UTF-8"))
      val coin = d(0) & 0xff // first two hex chars of the md5 as an int
      if (coin < 204) "train" else if (coin < 230) "val" else "test"
    }
    val rnd = new scala.util.Random(42L)
    for (round <- 1 to 5) {
      val all = (1L to 40L)
      val d1 = all.filter(_ => rnd.nextDouble() < 0.5)
      val d2 = (d1 ++ all.filter(_ => rnd.nextDouble() < 0.3)).distinct.sorted
      val d3 = all
      // arbitrary re-clustering per snapshot (merges AND splits allowed —
      // the freeze must hold under any relabeling)
      def clusters(docs: Seq[Long], span: Int): Seq[(Long, Long)] =
        docs.filter(_ % 3 != 0).map(d => (d, d - d % span))
      val c1 = clusters(d1, 2); val c2 = clusters(d2, 4); val c3 = clusters(d3, 8)
      val a1 = DocDedup.leakSafeSplitOf(d1.toDF("doc_id"), c1.toDF("doc_id", "cluster_id"))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val a2df = DocDedup.leakSafeSplitFrozen(d2.toDF("doc_id"),
        c2.toDF("doc_id", "cluster_id"),
        a1.toSeq.toDF("doc_id", "split"))
      val a2 = a2df.collect().map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
      val a3df = DocDedup.leakSafeSplitFrozen(d3.toDF("doc_id"),
        c3.toDF("doc_id", "cluster_id"),
        a2df.select("doc_id", "split"))
      val a3 = a3df.collect().map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
      // (a) no assigned doc EVER moves, transitively through the chain
      a1.foreach { case (d, s) =>
        assert(a2(d)._1 == s && a3(d)._1 == s, s"round $round: doc $d moved from $s") }
      a2.foreach { case (d, (s, _)) => assert(a3(d)._1 == s) }
      // (b) every snapshot-2 doc — whatever its tier then — is frozen in 3
      d2.foreach(d => assert(a3(d)._2 == "frozen"))
      // (c) scalar model of the refresh-3 rules over the a2 artifact
      val g3 = d3.map(d => d -> c3.toMap.getOrElse(d, d)).toMap
      d3.filterNot(a2.contains).foreach { d =>
        val members = d3.filter(x => g3(x) == g3(d) && a2.contains(x))
        val expected =
          if (members.nonEmpty) a2(members.min)._1 else md5Coin(g3(d))
        assert(a3(d)._1 == expected, s"round $round: new doc $d in group ${g3(d)}")
        assert(a3(d)._2 == (if (members.nonEmpty) "inherited" else "coined"))
      }
    }
  }

  test("x123: a fully-new shard surfaces with deltas-from-zero and changed=1") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"doc $i words here", 15L))
      .toDF("doc_id", "text", "n_chars")
    // prev snapshot empty: EVERY shard is fully new — the inner-join
    // regression dropped all of them; the left join must keep each with
    // doc_delta = n_docs_curr and changed = 1
    val prev = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
    val d = Curation.releaseDiffOf(docs, prev, shards = 4).collect()
    assert(d.length == 4)
    d.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), s"doc_delta != n_docs_curr in $r")
      assert(r.getInt(4) == 1, s"fully-new shard not flagged changed: $r")
    }
    // and the diff against an identical snapshot still reports no change
    val same = Curation.releaseDiffOf(docs, docs, shards = 4).collect()
    assert(same.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L && r.getInt(4) == 0))
    // the MIRROR case: a shard whose docs were ALL removed (curr empty)
    // must surface with negative deltas and changed=1, not vanish —
    // deletion is what a release note most needs to show
    val del = Curation.releaseDiffOf(prev, docs, shards = 4).collect()
    assert(del.length == 4)
    del.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) < 0L && r.getInt(4) == 1,
        s"fully-deleted shard not surfaced: $r")
    }
  }

  /** 60-bit md5 long exactly as the engines derive it (first 15 hex). */
  private def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("e11: the streaming interval join drains to EXACTLY the batch join") {
    import graft.streaming.EventsStream
    val ev = graft.Tables.events(spark, sfDir)
    val batch = EventsStream.clickViewJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .collect().map(_.toSeq).toSet
    val stream = EventsStream.joinStreamGate(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "fixture produced no click-view matches")
    assert(stream == batch,
      s"stream-stream join diverged: ${stream.size} vs ${batch.size} rows; " +
        s"only-stream=${(stream -- batch).take(3)}, only-batch=${(batch -- stream).take(3)}")
  }

  test("e12: outer-join emission = matches + clicks provably expired at the final watermark") {
    import graft.streaming.EventsStream
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxClick = clicks.values.max
    val maxView = ev.filter(col("event_type") === "view")
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    // final min-policy global watermark: each side's max event time minus
    // its own delay (click 1h, view 2h)
    val w = math.min(maxClick - 3600000000L, maxView - 7200000000L)
    val matched = EventsStream.clickViewJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = EventsStream.leftJoinStreamGate(spark, sfDir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val expect = matched ++ clicks.collect {
      case (id, us) if !matched.exists(_._1 == id) && us < w => (id, -1L)
    }
    assert(got.exists(_._2 == -1L), "no null-padded row — the eviction path was not exercised")
    assert(clicks.exists { case (id, us) =>
      !matched.exists(_._1 == id) && us >= w },
      "fixture has no tail click — the withheld-row side of the contract is untested")
    assert(got == expect,
      s"outer-join emission diverged: only-got=${(got -- expect).take(3)}, " +
        s"only-expect=${(expect -- got).take(3)}")
  }

  test("e13: full-outer emission = matches + BOTH sides' provably-expired rows") {
    import graft.streaming.EventsStream
    val ev = graft.Tables.events(spark, sfDir)
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (clicks, views) = (side("click"), side("view"))
    // final min-policy global watermark, as in the e12 spec
    val w = math.min(clicks.values.max - 3600000000L, views.values.max - 7200000000L)
    val matched = EventsStream.clickViewJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = EventsStream.fullOuterJoinStreamGate(spark, sfDir).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // click side: margin 0 (e12's contract); view side: margin 1h — a
    // view stays matchable until the watermark passes view_ts + 1h
    // .toSeq first: collecting (-1L, id) pairs straight off the Map would
    // rebuild a Map keyed by the constant -1L and collapse every expected
    // view-null row into one
    val expect = matched ++
      clicks.toSeq.collect { case (id, us)
        if !matched.exists(_._1 == id) && us < w => (id, -1L) } ++
      views.toSeq.collect { case (id, us)
        if !matched.exists(_._2 == id) && us + 3600000000L < w => (-1L, id) }
    assert(got.exists(p => p._1 == -1L && p._2 != -1L),
      "no null-padded VIEW row — the right-side eviction path was not exercised")
    assert(got.exists(p => p._2 == -1L && p._1 != -1L),
      "no null-padded CLICK row — the left-side eviction path was not exercised")
    assert(views.exists { case (id, us) =>
      !matched.exists(_._2 == id) && us + 3600000000L >= w },
      "fixture has no tail view — the withheld right-row contract is untested")
    assert(got == expect,
      s"full-outer emission diverged: only-got=${(got -- expect).take(3)}, " +
        s"only-expect=${(expect -- got).take(3)}")
  }

  test("x129: planted vectors — floor codes, saturation, exact pico SSE, zero-vector") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.5f, -1.0f, 0.0f)), // scale 1: q = 127, 63, -127, 0
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f))   // all-zero: exact zeros out
    ).toDF("vec_id", "embedding")
    val a = Similarity.int8QuantAuditOf(emb).collect()
    val r0 = a.find(_.getLong(0) == 0L).get
    assert(r0.getDouble(1) == 1.0 && r0.getInt(2) == 2, s"scale/n_sat: $r0")
    // lanes 1·scale, −1·scale, 0 reconstruct exactly; the only error lane
    // is 0.5 → floor(63.5) = 63 → e = 0.5 − 63/127; recompute the pico
    // quantization with the same double ops
    val e = 0.5 - 63.0 * 1.0 / 127.0
    assert(r0.getLong(3) == math.floor(e * e * 1e12).toLong, s"sse_pico: $r0")
    assert(r0.getDouble(4) == r0.getLong(3) / (4.0 * 1e12), s"mse_recon: $r0")
    val r1 = a.find(_.getLong(0) == 1L).get
    assert(r1.getDouble(1) == 0.0 && r1.getInt(2) == 0 &&
      r1.getLong(3) == 0L && r1.getDouble(4) == 0.0, s"zero vector: $r1")
  }

  test("x129: corpus audit — every nonzero vector saturates its max lane; mse bounded") {
    val a = Similarity.int8QuantAudit(spark, sfDir).collect()
    val total = graft.Tables.embeddings(spark, sfDir).count()
    assert(a.length == total, "one audit row per vector")
    a.foreach { r =>
      val (scale, nSat, mse) = (r.getDouble(1), r.getInt(2), r.getDouble(4))
      if (scale > 0) {
        // the max-|v| lane quantizes to exactly ±127 — always saturated
        assert(nSat >= 1, s"max lane must saturate: $r")
        // per-lane |error| < scale/127 (floor bias), so mse < (scale/127)²
        assert(mse < (scale / 127.0) * (scale / 127.0) + 1e-12, s"mse bound: $r")
      } else assert(nSat == 0 && mse == 0.0, s"zero vector: $r")
    }
  }

  test("x130: planted skew — load factors, deterministic top-k cut") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("k")
    val prof = graft.operators.Skew.keySkewProfile(df, "k", topK = 2).collect()
    // total 10 over 4 keys → uniform 2.5; a: 5 rows = load 200, b: 120
    assert(prof.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("a", 5L, 500000L, 200L), ("b", 3L, 300000L, 120L)), prof.toSeq.toString)
  }

  test("w6b: autoSalts derives ceil(max load/100); uniform frame derives 1") {
    import spark.implicits._
    // a: 5 of 10 rows over 4 keys → load 200 → 2 salts
    val skewed = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d")).toDF("k")
    assert(graft.operators.Skew.autoSalts(skewed, "k") == 2)
    // perfectly uniform → load exactly 100 → 1 salt (salting a no-op)
    val uniform = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    assert(graft.operators.Skew.autoSalts(uniform, "k") == 1)
    // empty frame degrades to the no-op 1 salt (the plain join it
    // parameterizes returns empty too) instead of throwing on head()
    assert(graft.operators.Skew.autoSalts(uniform.filter(col("k") === "z"), "k") == 1)
    // a key colliding with a profile OUTPUT column fails loudly
    intercept[IllegalArgumentException] {
      graft.operators.Skew.keySkewProfile(uniform.withColumnRenamed("k", "n"), "n")
    }
    // a key named like a former INTERNAL column must NOT collide
    val renamed = graft.operators.Skew.keySkewProfile(
      skewed.withColumnRenamed("k", "total"), "total").collect()
    assert(renamed.head.getString(0) == "a" && renamed.head.getLong(3) == 200L)
  }

  test("x130: corpus profile reconciles with recomputed key stats") {
    val ev = graft.Tables.events(spark, sfDir)
    val prof = graft.operators.Skew.keySkewProfile(ev, "user_id").collect()
    val byKey = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (nKeys, total) = (byKey.size.toLong, byKey.values.sum)
    assert(prof.length == math.min(20, nKeys).toInt, "top-k row count")
    val want = byKey.toSeq.sortBy { case (k, n) => (-n, k) }.take(20)
    assert(prof.map(r => (r.getLong(0), r.getLong(1))).toSeq == want,
      "top-k cut must be the (n desc, key asc) prefix")
    prof.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) == n * 1000000L / total, s"share_ppm drifted: $r")
      assert(r.getLong(3) == n * nKeys * 100L / total, s"load_x100 drifted: $r")
    }
  }

  test("x131: parity table = scalar recompute of BOTH rankings (third engine)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    // the same sequential fold order as dotFast / aggregate()
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def nrm(v: Array[Double]) =
      math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
    val codes = emb.map { case (id, v) =>
      val scale = v.map(math.abs).max
      val q = v.map(x => if (scale == 0) 0L else math.floor(x * 127.0 / scale).toLong)
      id -> (q, q.foldLeft(0L)((acc, x) => acc + x * x))
    }
    def top5(qid: Long, score: Long => Double): Seq[Long] =
      emb.keys.filter(_ != qid).toSeq
        .map(id => (id, score(id)))
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    val expect = (0L until 20L).map { qid =>
      val (qv, (qq, qn2)) = (emb(qid), codes(qid))
      val f = top5(qid, id => dot(qv, emb(id)) / (nrm(qv) * nrm(emb(id))))
      val q = top5(qid, { id =>
        val (cq, cn2) = codes(id)
        qq.indices.foldLeft(0L)((acc, i) => acc + qq(i) * cq(i)) /
          math.sqrt((qn2 * cn2).toDouble)
      })
      (qid, f.toSet.intersect(q.toSet).size.toLong,
        if (f.head == q.head) 1L else 0L)
    }
    val got = Similarity.int8TopKParity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"parity diverged from scalar model:\n$got\nvs\n$expect")
    // the audit must SHOW real divergence, or it audits nothing
    assert(expect.exists(t => t._2 < 5 || t._3 == 0),
      "fixture shows no float/int8 ranking divergence to audit")
  }

  test("x126: per-cell budget, pick-set = scalar smallest-k recompute, bounded heap") {
    graft.functions.GraftFunctions.register(spark) // strategy + rewrite rule
    val asg = Clustering.assign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val sample = Clustering.cellBalancedSample(spark, sfDir, perCell = 5)
    // the row_number idiom must hit the TopKPerKey rewrite (bounded heap)
    assert(sample.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val got = sample.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent scalar witness: per cell, the 5 smallest md5 coins
    val expect = asg.groupBy(_._2).toSeq.flatMap { case (cell, vs) =>
      vs.toSeq.map { case (vid, _) => (md5Long60(s"bal:$vid"), vid) }
        .sorted.take(5).map { case (_, vid) => (cell, vid) }
    }.toSet
    assert(got == expect,
      s"pick set != scalar recompute: only-got=${(got -- expect).take(3)}, " +
        s"only-expect=${(expect -- got).take(3)}")
  }

  test("x127: planted two-cell frame — exact cohesion/separation by hand") {
    import spark.implicits._
    // cell 0: (±0.5, 0) → milli ±500, S₀ = (0,0), ΣQ = 2·500² = 500000;
    //   cohesion = (n·ΣQ − ΣS²)/(n²·10⁶) = (2·500000 − 0)/(4·10⁶) = 0.25
    //   (mean squared distance to the (0,0) centroid: 0.5² = 0.25 ✓)
    // cell 1: one vector at (2, 0) → cohesion 0
    // separation both ways: S₁ = (2000,0), t = S₀d·n₁ − S₁d·n₀ = ∓4000 →
    //   16·10⁶ / ((n₀·n₁)²·10⁶) = 4.0 = ‖(0,0) − (2,0)‖² ✓
    val asg = Seq(
      (10L, 0L, Seq(0.5, 0.0)), (11L, 0L, Seq(-0.5, 0.0)),
      (12L, 1L, Seq(2.0, 0.0)))
      .toDF("vec_id", "cell_id", "vec")
    val rows = Clustering.cellQualityAuditOf(asg).collect()
    assert(rows.length == 2)
    val c0 = rows.find(_.getLong(0) == 0L).get
    assert(c0.getLong(1) == 2L && c0.getDouble(2) == 0.25 &&
      c0.getLong(3) == 1L && c0.getDouble(4) == 4.0, s"cell 0: $c0")
    val c1 = rows.find(_.getLong(0) == 1L).get
    assert(c1.getLong(1) == 1L && c1.getDouble(2) == 0.0 &&
      c1.getLong(3) == 0L && c1.getDouble(4) == 4.0, s"cell 1: $c1")
    // degenerate single-cell assignment: the separation pair table is
    // empty, but the lone cell's cohesion row must SURVIVE (null
    // nearest/separation is the answer, not an empty frame)
    val lone = Clustering.cellQualityAuditOf(
      Seq((10L, 0L, Seq(0.5, 0.0)), (11L, 0L, Seq(-0.5, 0.0)))
        .toDF("vec_id", "cell_id", "vec")).collect()
    assert(lone.length == 1 && lone(0).getLong(1) == 2L &&
      lone(0).getDouble(2) == 0.25 && lone(0).isNullAt(3) && lone(0).isNullAt(4),
      s"single-cell audit wrong: ${lone.toSeq}")
  }

  test("x128: cell profile partitions the corpus; load factors reconcile") {
    val prof = Similarity.ivfCellProfile(spark, sfDir).collect()
    val total = graft.Tables.embeddings(spark, sfDir).count()
    assert(prof.map(_.getLong(0)).toSeq == (0L until 16L),
      "one row per centroid cell, in order, empty cells included")
    assert(prof.map(_.getLong(1)).sum == total, "n_vecs must partition the corpus")
    prof.foreach { r =>
      val (n, share, load) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(share == n * 1000000L / total, s"share_ppm drifted: $r")
      assert(load == n * 16L * 100L / total, s"load_x100 drifted: $r")
    }
    // the profile must be able to SHOW imbalance: with first-16 sampled
    // centroids the fixture is not uniform — at least one cell ≠ 100
    assert(prof.exists(_.getLong(3) != 100L), "profile shows no deviation to audit")
  }

  test("x127: corpus audit partitions the vectors; metrics well-formed") {
    val audit = Clustering.cellQualityAudit(spark, sfDir).collect()
    val total = graft.Tables.embeddings(spark, sfDir).count()
    assert(audit.map(_.getLong(1)).sum == total, "n_members must partition the corpus")
    audit.foreach { r =>
      assert(r.getDouble(2) >= 0.0, s"negative cohesion: $r")
      assert(r.getLong(3) != r.getLong(0), s"nearest cell is itself: $r")
      assert(r.getDouble(4) > 0.0, s"non-positive separation: $r")
    }
  }
}

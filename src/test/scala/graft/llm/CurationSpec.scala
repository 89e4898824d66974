package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the corpus-curation stages (decontamination, mixture weights,
  * shuffle-sharding, cleaning). The oracle gates check cross-engine value
  * equality; these tests pin the SEMANTICS the oracle can't see — that a
  * doc sharing all shingles with the eval set is actually flagged, that
  * weights form a distribution, that sharding is a permutation. */
class CurationSpec extends SparkSpec {

  test("decontaminate: eval-split docs never appear, flags are threshold-consistent") {
    val d = Curation.decontaminate(spark, sfDir).persist()
    // eval docs (doc_id % 17 == 0) must be excluded from the output
    assert(d.filter(col("doc_id") % 17 === 0).count() == 0)
    // the flag is exactly the integer threshold on the two counts
    val bad = d.filter(
      (col("contaminated") === 1) =!= (col("n_hits") * 5 >= col("n_shingles"))).count()
    assert(bad == 0, "contaminated flag must equal the n_hits/n_shingles threshold")
    // a corpus this repetitive (shared small vocabulary) must produce BOTH
    // contaminated and clean docs — otherwise the gate tests nothing
    assert(d.filter(col("contaminated") === 1).count() > 0, "no overlap found at all")
    d.unpersist()
  }

  test("decontaminate flags a doc whose shingles all come from the eval set") {
    // planted fixture: doc 0 is in the eval split (0 % 17 == 0); a corpus
    // doc with identical text must be 100% contaminated
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val evalText = docs.filter(col("doc_id") === 0).select("text").as[String].head()
    val planted = docs.select("doc_id", "text")
      .union(Seq((999983L, evalText)).toDF("doc_id", "text"))
    val sh = planted.select(col("doc_id"),
      explode(DocDedup.shingles(split(col("text"), " "))).as("s"))
    val benchH = sh.filter(col("doc_id") % 17 === 0)
      .select(md5(col("s").cast("binary")).as("m")).distinct()
    val hits = sh.filter(col("doc_id") === 999983L)
      .select(md5(col("s").cast("binary")).as("m")).distinct()
      .join(benchH, Seq("m")).count()
    val total = sh.filter(col("doc_id") === 999983L).select("s").distinct().count()
    assert(hits == total, "every shingle of the copied doc must hit the eval set")
  }

  test("mixture weights form a distribution and order sources by sqrt(n)") {
    val w = Curation.mixtureWeights(spark, sfDir).persist()
    val total = w.agg(sum("weight")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")
    // alpha=0.5 flattens: every source's weight share must sit between its
    // doc share (alpha=1) and the uniform share (alpha=0)
    val n = w.count().toDouble
    val docsTotal = w.agg(sum("n_docs")).head().getLong(0).toDouble
    val viol = w.withColumn("doc_share", col("n_docs") / docsTotal)
      .filter(!((col("weight") >= least(col("doc_share"), lit(1.0 / n)) - 1e-9) &&
                (col("weight") <= greatest(col("doc_share"), lit(1.0 / n)) + 1e-9)))
      .count()
    assert(viol == 0, "sqrt weighting must land between proportional and uniform")
    w.unpersist()
  }

  test("shuffle shards: a permutation with contiguous per-shard positions") {
    val s = Curation.shuffleShards(spark, sfDir).persist()
    val docs = graft.Tables.documents(spark, sfDir).count()
    assert(s.count() == docs)
    assert(s.select("doc_id").distinct().count() == docs, "every doc placed exactly once")
    // pos is 1..count(shard) with no gaps
    val badShards = s.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(badShards == 0, "positions must be contiguous from 1 per shard")
    s.unpersist()
  }

  test("x81 shard manifest: counts reconcile with x33, digest is order- and content-sensitive") {
    val m = Curation.shardManifest(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
    assert(m.map(_.getLong(1)).sum == docs.count(), "sum of shard n_docs = corpus size")
    assert(m.map(_.getLong(3)).sum ==
      docs.agg(sum("n_chars")).head().getLong(0), "n_chars reconciles")
    assert(m.map(_.getString(4)).distinct.length == m.length,
      "distinct shards carry distinct digests")
    // the digest re-derives from x33's order + per-doc md5s (driver-side)
    val assign = Curation.shuffleShards(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val dmd5 = docs.select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = assign.groupBy(_._2).map { case (shard, rows) =>
      val concat = rows.sortBy(_._3).map(r => dmd5(r._1)).mkString("")
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(concat.getBytes("UTF-8")).map("%02x".format(_)).mkString
      shard -> dig
    }
    m.foreach(r => assert(expect(r.getInt(0)) == r.getString(4),
      s"shard ${r.getInt(0)} digest mismatch"))
  }

  test("x81b auto manifest: shard count derives from corpus size, agrees with explicit x81") {
    // integer-exact ceil: boundary cases around the target
    assert(Curation.autoShards(0) == 1 && Curation.autoShards(1) == 1)
    assert(Curation.autoShards(64) == 1 && Curation.autoShards(65) == 2)
    assert(Curation.autoShards(640) == 10 && Curation.autoShards(641) == 11)
    assert(Curation.autoShards(1000, targetDocsPerShard = 100) == 10)
    intercept[IllegalArgumentException](Curation.autoShards(10, 0))
    // the auto gate equals shardManifest called with the derived count —
    // the dispatch is the ONLY new moving part
    val n = graft.Tables.documents(spark, sfDir).count()
    val auto = Curation.shardManifestAuto(spark, sfDir).collect().toSeq
    val explicit = Curation.shardManifest(spark, sfDir, Curation.autoShards(n)).collect().toSeq
    assert(auto == explicit)
    // per-shard doc counts stay near the target (±3× — md5 balance, not
    // an exact quota), which is the bound that keeps digest buffers flat
    assert(auto.map(_.getLong(1)).max <= 3 * 64,
      "a shard 3x over target means the derived count is not tracking size")
  }

  test("clean text drops stopwords and short tokens, keeps the rest in order") {
    val c = Curation.cleanText(spark, sfDir)
    val joined = graft.Tables.documents(spark, sfDir).join(c, "doc_id")
    // no stopword or <3-char token survives
    val leaked = joined.filter(
      exists(split(col("clean_text"), " "),
        t => (length(t) < 3 && length(t) > 0) || t.isInCollection(Curation.stopwords)))
      .count()
    assert(leaked == 0, "cleaning must remove stopwords and short tokens")
    // kept-token count matches an independent recount of the cleaned text
    val miscount = joined.filter(col("n_tokens_kept") =!=
      when(col("clean_text") === "", 0).otherwise(size(split(col("clean_text"), " "))))
      .count()
    assert(miscount == 0)
  }

  test("cleaning is idempotent: re-cleaning cleaned text is a no-op") {
    val c = Curation.cleanText(spark, sfDir)
    val diff = c.filter(
      array_join(Curation.cleanedTokens(col("clean_text")), " ") =!= col("clean_text"))
      .count()
    assert(diff == 0, "clean(clean(text)) must equal clean(text)")
  }

  test("shard placement is append-stable: a doc's shard ignores the rest of the corpus") {
    // the 100 TB property that matters: appending new docs must never move
    // existing docs to a different shard, and must preserve their relative
    // order within a shard (only positions shift). Compare full corpus vs
    // a half-corpus subset.
    val full = Curation.shuffleShards(spark, sfDir).persist()
    val subsetIds = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 0).select("doc_id")
    val sub = subsetIds.join(full, "doc_id")
      .select(col("doc_id"), col("shard").as("shard_full"), col("pos").as("pos_full"))
    // recompute from scratch on the subset (simulates the smaller corpus)
    val recomputed = Curation.shuffleShards(spark, sfDir)
      .join(subsetIds, "doc_id") // same md5 key — placement is per-doc
    val moved = recomputed.join(sub, "doc_id")
      .filter(col("shard") =!= col("shard_full")).count()
    assert(moved == 0, "shard must be a pure function of doc_id")
    // relative order within each shard is preserved between corpus sizes
    import org.apache.spark.sql.expressions.Window
    val rerank = sub.withColumn("pos_sub",
      row_number().over(Window.partitionBy("shard_full").orderBy("pos_full")))
    val order = rerank.groupBy("shard_full")
      .agg(count(lit(1)).as("n"), max("pos_sub").as("mx"))
      .filter(col("mx") =!= col("n")).count()
    assert(order == 0)
    full.unpersist()
  }

  test("incremental dedup: planted exact / near / novel incoming docs classify correctly") {
    import spark.implicits._
    // existing corpus: ids 0, 2, 4; incoming batch: ids 1, 3, 5.
    // id 1 copies id 0 byte-for-byte → dup_exact.
    // id 3 repeats id 2's single token one extra time: different bytes,
    // but the all-same-token simhash votes have the same sign per bit →
    // identical simhash16 → dup_near (deterministic by construction).
    // id 5 is unrelated → kept.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "omega omega omega omega"),
      (3L, "omega omega omega omega omega"),
      (4L, "filler text row"),
      (5L, "completely different content here")
    ).toDF("doc_id", "text")
    val got = DocDedup.incrementalDedupOf(docs, col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "dup_exact", 3L -> "dup_near", 5L -> "kept"))
  }

  test("length filter matches an independently computed percentile_disc interval") {
    val docs = graft.Tables.documents(spark, sfDir)
    val lens = docs.select("n_chars").collect().map(_.getLong(0)).sorted
    val total = lens.length
    // percentile_disc: smallest value whose cumulative count reaches p% —
    // computed scalar-side as the independent witness
    def cutoff(pct: Int): Long = {
      val counts = lens.groupBy(identity).toSeq.sortBy(_._1)
      var cum = 0
      var res = lens.last
      var found = false
      for ((v, g) <- counts) {
        cum += g.length
        if (!found && cum * 100 >= total * pct) { res = v; found = true }
      }
      res
    }
    val (lo, hi) = (cutoff(5), cutoff(95))
    val expected = lens.count(v => v >= lo && v <= hi)
    val kept = Curation.lengthFilter(spark, sfDir)
    assert(kept.count() == expected)
    val outside = kept.filter(col("n_chars") < lo || col("n_chars") > hi).count()
    assert(outside == 0)
  }

  test("training set composes its stages: subset of every keep-list, no eval docs") {
    val ts = Curation.trainingSet(spark, sfDir).persist()
    assert(ts.count() > 0, "the pipeline must keep something")
    // never train on the benchmark: eval-split docs are structurally excluded
    assert(ts.filter(col("doc_id") % 17 === 0).count() == 0)
    // subset of each stage's keep-list
    val lf = Curation.lengthFilter(spark, sfDir).select("doc_id")
    assert(ts.join(lf, Seq("doc_id"), "left_anti").count() == 0, "length filter violated")
    val clean = Curation.decontaminate(spark, sfDir)
      .filter(col("contaminated") === 0).select("doc_id")
    assert(ts.join(clean, Seq("doc_id"), "left_anti").count() == 0, "contaminated doc kept")
    val keepers = graft.Tables.documents(spark, sfDir)
      .groupBy(md5(col("text").cast("binary"))).agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    assert(ts.join(keepers, Seq("doc_id"), "left_anti").count() == 0, "non-canonical dup kept")
    ts.unpersist()
  }

  test("fused curation report equals the join of its standalone gates") {
    // the fusion must be a pure layout optimization: one scan, same values
    val fused = TextStats.curationReport(spark, sfDir)
    val expected = TextStats.langId(spark, sfDir).select("doc_id", "predicted_lang")
      .join(TextStats.repetitionStats(spark, sfDir), "doc_id")
      .join(graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens")), "doc_id")
      .select("doc_id", "predicted_lang", "n_tokens", "n_bigrams",
        "n_distinct_bigrams", "dup_bigram_frac", "top_bigram_share")
    val a = fused.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = expected.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, "fused one-pass report must match the N-pass composition")
  }

  test("winnow fingerprints are a bounded subset of the shingle hashes") {
    val wn = TextStats.winnow(spark, sfDir).persist()
    // every doc yields at least one fingerprint and never more than its
    // window-minima count; the CSV round-trips to n_fp distinct values
    val bad = wn.filter(col("n_fp") < 1 ||
      size(array_distinct(split(col("fp_csv"), ","))) =!= col("n_fp")).count()
    assert(bad == 0)
    // winnowing compresses: far fewer fingerprints than shingles on real docs
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 4).as("n_shingles"))
      .filter(col("n_shingles") >= 4)
    val over = wn.join(docs, "doc_id").filter(col("n_fp") > col("n_shingles")).count()
    assert(over == 0, "cannot select more fingerprints than shingles")
    val ratio = wn.join(docs, "doc_id")
      .agg(avg(col("n_fp").cast("double") / col("n_shingles"))).head().getDouble(0)
    assert(ratio < 0.75, s"winnowing should thin the fingerprint set, got $ratio")
    wn.unpersist()
  }

  test("span dedup keeps exactly the first occurrence of each span and reassembles in order") {
    import spark.implicits._
    // doc 1 owns both its spans; doc 2 repeats doc 1's first span (dropped)
    // but keeps its own tail; doc 3 is ENTIRELY doc 1's first span → vanishes
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w"),
      (3L, "a b c d")).toDF("doc_id", "text")
    val out = DocDedup.spanDedupDocs(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 2, "a b c d e f g h"), (2L, 1, "x y z w")))
  }

  test("span dedup: every distinct span survives exactly once corpus-wide") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = DocDedup.spanDedup(spark, sfDir)
    val ts = split(col("text"), " ")
    val nSpans = (floor((size(ts) - 1).cast("double") / 4) + 1).cast("int")
    val distinctSpans = docs.filter(length(col("text")) > 0)
      .select(explode(org.apache.spark.sql.functions.transform(
        sequence(lit(0), nSpans - 1), i => concat_ws(" ", slice(ts, i * 4 + 1, lit(4))))).as("span"))
      .select(countDistinct("span")).head().getLong(0)
    val kept = out.agg(sum("n_spans_kept")).head().getLong(0)
    assert(kept == distinctSpans,
      s"kept spans ($kept) must equal distinct input spans ($distinctSpans)")
  }

  test("PII redaction scrubs emails and phones, leaves clean text alone") {
    import spark.implicits._
    val fixture = Seq(
      "write john.doe+x@sub.example.co.uk today",
      "call 555-0142 or 555-9999 now",
      "mixed a.b@c.io and 123-4567 here",
      "nothing sensitive in this one 12-34 a@b").toDF("text")
    val red = fixture.select(Curation.redactPii(col("text")).as("r")).as[String].collect()
    assert(red(0) == "write <EMAIL> today")
    assert(red(1) == "call <PHONE> or <PHONE> now")
    assert(red(2) == "mixed <EMAIL> and <PHONE> here")
    // too-short digits and a bare a@b (no dot-TLD) must NOT be redacted
    assert(red(3) == "nothing sensitive in this one 12-34 a@b")
  }

  test("x40 gate plants exactly one email and one phone per doc") {
    val out = Curation.piiRedact(spark, sfDir).persist()
    assert(out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
    // nothing email-shaped survives redaction
    assert(out.filter(col("redacted").contains("@")).count() == 0)
    out.unpersist()
  }

  test("rarity score is exact on a planted vocabulary") {
    import spark.implicits._
    // corpus: 'x' ×3, 'y' ×2, 'z' ×1 → ranks x=1, y=2, z=3
    val docs = Seq((1L, "x y x"), (2L, "y z x")).toDF("doc_id", "text")
    val out = TextStats.rarityScoreDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // doc 1: ranks (1,2,1) → sum 4, max 2, ppm floor(4e6/3)
    // doc 2: ranks (2,3,1) → sum 6, max 3, ppm 2e6
    assert(out == Seq((1L, 3L, 4L, 2L, 1333333L), (2L, 3L, 6L, 3L, 2000000L)))
  }

  test("importance resampling keeps target-like docs and drops disjoint raw docs") {
    import spark.implicits._
    // target (en) docs share bigrams only with each other; the fr docs use
    // a disjoint vocabulary — their buckets have n_tgt = 0, so every fr
    // bucket ratio sits below parity and every en bucket above it
    val docs = Seq(
      (1L, "en", "aa bb cc"), (2L, "en", "aa bb cc"), (3L, "en", "aa bb cc"),
      (10L, "fr", "xx yy zz"), (11L, "fr", "xx yy zz")
    ).toDF("doc_id", "lang", "text")
    val out = Curation.importanceResampleDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toList
    assert(out.map(_._1) == List(1L, 2L, 3L, 10L, 11L), "every doc scored exactly once")
    assert(out.forall(_._2 == 2), "each doc carries its 2 distinct bigram features")
    assert(out.filter(_._1 < 10).forall(_._4 == 1), "target-like docs kept")
    assert(out.filter(_._1 >= 10).forall(_._4 == 0), "disjoint raw docs dropped")
    // likelihood ratios order the two groups strictly
    val enMin = out.filter(_._1 < 10).map(_._3).min
    val frMax = out.filter(_._1 >= 10).map(_._3).max
    assert(enMin > 1000000L && frMax < 1000000L, s"parity must separate: $enMin vs $frMax")
  }

  test("importance resampling on the corpus: total coverage, target leaning measurable") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = Curation.importanceResample(spark, sfDir).persist()
    assert(out.count() == docs.count(), "every document is scored")
    // en docs must average more target-like than non-en docs (the signal
    // the operator exists to extract)
    val scored = out.join(docs.select("doc_id", "lang"), "doc_id")
    val enAvg = scored.filter(col("lang") === "en").agg(avg("score_ppm")).head.getDouble(0)
    val otherAvg = scored.filter(col("lang") =!= "en").agg(avg("score_ppm")).head.getDouble(0)
    assert(enAvg > otherAvg, s"en docs must lean target: $enAvg vs $otherAvg")
    out.unpersist()
  }

  test("token budget: equals the greedy quality-desc prefix at every budget") {
    // independent recompute from the oracle-proven x8 gate output: order
    // by (quantized quality desc, doc_id), accumulate tokens over ALL
    // docs in that order, keep while cumulative <= budget — the exact
    // semantics the histogram + boundary-bucket formulation must match
    val q = TextStats.qualityScore(spark, sfDir)
      .select("doc_id", "n_tokens", "quality_score").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        math.floor(r.getDouble(2) * 1e6).toLong))
    val ordered = q.sortBy { case (id, _, qi) => (-qi, id) }
    def brute(budget: Long): Set[Long] = {
      var cum = 0L
      ordered.flatMap { case (id, tok, _) =>
        cum += tok
        if (cum <= budget) Some(id) else None
      }.toSet
    }
    val total = q.map(_._2).sum
    for (budget <- Seq(0L, 500L, 5000L, total / 2, total + 100)) {
      val got = Curation.tokenBudget(spark, sfDir, budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == brute(budget),
        s"budget=$budget: got ${got.size} docs, brute ${brute(budget).size}")
    }
    // full budget keeps everything; zero budget keeps nothing
    assert(Curation.tokenBudget(spark, sfDir, total + 100).count() == q.length)
    assert(Curation.tokenBudget(spark, sfDir, 0L).count() == 0)
  }

  test("filter funnel: telescoping stages that reconcile with the x38 training set") {
    val rows = Curation.filterFunnel(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("stage"), r.getAs[String]("rule"),
        r.getAs[Long]("n_in"), r.getAs[Long]("n_dropped"), r.getAs[Long]("n_out")))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((1, "exact_dedup"), (2, "decontaminate"), (3, "length_interval"), (4, "quality_floor")))
    // stage 1 sees the whole corpus; every stage telescopes exactly
    assert(rows.head._3 == graft.Tables.documents(spark, sfDir).count())
    rows.foreach { case (_, rule, nIn, nDropped, nOut) =>
      assert(nIn - nDropped == nOut && nDropped >= 0, s"$rule: $nIn/$nDropped/$nOut")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 == b._3, s"stage ${b._1} n_in must equal stage ${a._1} n_out")
    }
    // the funnel EXPLAINS the x38 cascade: stage-3 survivors are exactly
    // the training set (same rules, same order), so the two cannot drift
    assert(rows(2)._5 == Curation.trainingSet(spark, sfDir).count())
    // the decontamination stage drops at least the benchmark docs themselves
    assert(rows(1)._4 >= graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 17 === 0).count())
  }

  test("snapshot diff classifies a planted add/remove/edit/unchanged fixture") {
    import spark.implicits._
    val oldV = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val newV = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val d = Curation.snapshotDiffOf(oldV, newV)
      .as[(Long, String)].collect().toMap
    // doc 2 is unchanged → NOT emitted (the delta-only contract)
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff gate: classes match the deterministic derivation") {
    import spark.implicits._
    val d = Curation.snapshotDiff(spark, sfDir)
      .as[(Long, String)].collect().toMap
    d.foreach { case (id, cls) =>
      val expected =
        if (id % 10 == 9) "added"          // only in the new snapshot
        else if (id % 10 == 0) "removed"   // only in the old snapshot
        else if (id % 7 == 0) "changed"    // in both, text edited
        else fail(s"doc $id should be unchanged and absent, got $cls")
      assert(cls == expected, s"doc $id: $cls != $expected")
    }
    // every doc matching a delta rule appears (nothing silently dropped)
    val ids = graft.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long].collect()
    val expectedN = ids.count(id => id % 10 == 9 || id % 10 == 0 || id % 7 == 0)
    assert(d.size == expectedN)
  }

  test("dup-span profile: exact planted span, self-repetition excluded, short docs zero") {
    import spark.implicits._
    def toks(prefix: String, n: Int): String = (0 until n).map(i => s"$prefix$i").mkString(" ")
    val aBlock = (10 until 20).map(i => s"a$i").mkString(" ") // 10 shared tokens
    val docs = Seq(
      1L -> toks("a", 30),                                    // donor: a0..a29
      2L -> (toks("b", 10) + " " + aBlock + " " + (10 until 20).map(i => s"b$i").mkString(" ")),
      3L -> Seq.fill(30)("x").mkString(" "),                  // self-repeating only
      4L -> toks("c", 5)                                      // shorter than k
    ).toDF("doc_id", "text")
    val prof = Curation.dupSpanProfileDocs(docs, k = 8)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // the 10-token shared block yields 3 consecutive duplicated 8-shingle
    // positions on each side -> longest dup substring = 3 + 7 = 10 tokens
    assert(prof(1L) == ((10L, 3L)), s"donor got ${prof(1L)}")
    assert(prof(2L) == ((10L, 3L)), s"copier got ${prof(2L)}")
    // doc 3's shingles repeat only WITHIN itself: cross-doc rule excludes it
    assert(prof(3L) == ((0L, 0L)), "self-repetition must not count (x28's metric)")
    assert(prof(4L) == ((0L, 0L)), "docs shorter than k carry no shingle")
    // corpus gate: profile covers every doc and the dup structure is real
    val gate = Curation.dupSpanProfile(spark, sfDir).as[(Long, Long, Long)].collect()
    assert(gate.length == graft.Tables.documents(spark, sfDir).count())
    assert(gate.exists(_._2 > 0), "corpus has planted near-dups; profile must see them")
    // max run bound: dup_positions >= max_dup_tokens - (k-1) whenever nonzero
    gate.filter(_._2 > 0).foreach { case (id, mx, np) =>
      assert(np >= mx - 7, s"doc $id: run length ${mx - 7} exceeds dup position count $np") }
  }

  test("source token budget: allocations respected, filled highest-quality-first, sums bounded") {
    val out = Curation.sourceBudget(spark, sfDir, totalBudget = 50000L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.nonEmpty)
    // per-source: never exceed the allocation; global: allocations never
    // exceed the budget (floor division leaves a remainder unallocated)
    out.foreach { case (src, (budget, _, tokKept, _, _)) =>
      assert(tokKept <= budget, s"$src kept $tokKept tokens over budget $budget") }
    assert(out.values.map(_._1).sum <= 50000L)
    // scalar recompute for one source: the kept set is the greedy
    // highest-quality prefix
    val src = out.keys.min
    val docs = TextStats.qualityScore(spark, sfDir)
      .select("doc_id", "n_tokens", "quality_score")
      .join(graft.Tables.documents(spark, sfDir).select("doc_id", "source"), "doc_id")
      .filter(col("source") === src)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
      .sortBy { case (id, _, qs) => (-qs, id) }
    val budget = out(src)._1
    var (cum, nKept, tKept) = (0L, 0L, 0L)
    docs.foreach { case (_, n, _) =>
      cum += n; if (cum <= budget) { nKept += 1; tKept += n } }
    assert(out(src)._2 == nKept && out(src)._3 == tKept,
      s"$src: got (${out(src)._2}, ${out(src)._3}) want ($nKept, $tKept)")
  }

  test("rendezvous sharding: adding a shard moves ~1/(n+1) of docs, all INTO the new shard") {
    val s8 = Curation.rendezvousShards(spark, sfDir, shards = 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s9 = Curation.rendezvousShards(spark, sfDir, shards = 9).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(s8.keySet == s9.keySet)
    val moved = s8.keys.filter(id => s8(id) != s9(id)).toSeq
    // the minimal-movement guarantee: every mover lands in the NEW shard
    moved.foreach(id => assert(s9(id) == 8, s"doc $id moved between OLD shards"))
    val frac = moved.size.toDouble / s8.size
    assert(frac > 0.03 && frac < 0.25, s"movement fraction $frac far from 1/9")
    // the counterfactual that motivates the operator: md5-mod sharding
    // moves the great majority of docs on the same reshard
    def modShard(id: Long, n: Int): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      (((h(0) & 0xff).toLong << 16 | (h(1) & 0xff) << 8 | (h(2) & 0xff)) % n).toInt
    }
    val modMoved = s8.keys.count(id => modShard(id, 8) != modShard(id, 9))
    assert(modMoved.toDouble / s8.size > 0.5,
      "fixture sanity: mod-hash resharding should reshuffle most docs")
  }

  test("quality quantile normalization: matches built-in percent_rank; every source drops its own bottom slice") {
    import org.apache.spark.sql.expressions.Window
    val out = Curation.qualityQuantileNormalize(spark, sfDir).cache()
    // independent plan: Spark's own percent_rank over the RAW rows (a
    // corpus-wide window, the shape the grouped-CDF form avoids) must
    // agree bit-for-bit on every pct
    val raw = TextStats.qualityScore(spark, sfDir).select("doc_id", "quality_score")
      .join(graft.Tables.documents(spark, sfDir).select("doc_id", "source"), "doc_id")
      .withColumn("pct_w", percent_rank().over(
        Window.partitionBy("source").orderBy("quality_score")))
    assert(out.join(raw.select("doc_id", "pct_w"), "doc_id")
      .filter(col("pct") =!= col("pct_w")).count() == 0,
      "grouped-CDF pct diverged from percent_rank")
    // keep flag = pct >= 0.2, and every source retains ~top 80% (ties at
    // the cut keep, so the kept fraction is >= 0.8 minus one tie class)
    assert(out.filter((col("pct") >= 0.2) =!= (col("keep") === 1)).count() == 0)
    val bySrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("keep").as("k")).collect()
    bySrc.foreach { r =>
      val frac = r.getLong(2).toDouble / r.getLong(1)
      assert(frac >= 0.75 && frac <= 1.0, s"source ${r.getString(0)} kept $frac")
    }
    out.unpersist()
  }
}

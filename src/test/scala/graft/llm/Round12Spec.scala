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
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 pins: the frozen split's DELTA maintenance path (the r13
  * `weak` fix) — per-batch work emits rows for NEW docs only, and the
  * delta tiers are provably the non-frozen tiers of the full
  * `leakSafeSplitFrozen` re-derivation it replaces. */
class Round14Spec extends SparkSpec {

  test("leakSafeSplitDelta ≡ the non-frozen tiers of leakSafeSplitFrozen") {
    // the x82 planted refresh: prior snapshot = doc_id % 5 ≠ 0 clustered
    // as pairs, refresh adds the rest and merges pairs into quads — the
    // exact cluster-merge hazard the freeze exists for
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id")
    val priorDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val priorClusters = priorDocs.filter(col("doc_id") % 20 < 8)
      .select(col("doc_id"), (col("doc_id") - col("doc_id") % 2).as("cluster_id"))
    val nowClusters = docs.filter(col("doc_id") % 20 < 8)
      .select(col("doc_id"), (col("doc_id") - col("doc_id") % 4).as("cluster_id"))
    val prior = DocDedup.leakSafeSplitOf(priorDocs, priorClusters)
    val full = DocDedup.leakSafeSplitFrozen(docs, nowClusters, prior)
    // the delta contract wants labels over the FULL known set (self-label
    // singletons) — exactly what e18's ccStep hands it
    val labels = docs.join(nowClusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    val delta = DocDedup.leakSafeSplitDelta(newDocs, labels,
      prior.select("doc_id", "split"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("group_id")),
        r.getString(r.fieldIndex("split")), r.getString(r.fieldIndex("assignment")))
    val got = delta.collect().map(key).toSet
    val want = full.filter(col("assignment") =!= "frozen").collect().map(key).toSet
    assert(got == want,
      s"delta diverged: only-got=${(got -- want).take(3)}, only-want=${(want -- got).take(3)}")
    // and the delta emits EXACTLY one row per new doc — no frozen rewrites
    val newIds = newDocs.collect().map(_.getLong(0)).toSet
    assert(got.map(_._1) == newIds && got.size == newIds.size,
      "delta must cover each new doc exactly once and nothing else")
    // non-degenerate fixture: both tiers appear
    assert(got.exists(_._4 == "inherited") && got.exists(_._4 == "coined"),
      "fixture lost its inherit/coin coverage")
  }
}

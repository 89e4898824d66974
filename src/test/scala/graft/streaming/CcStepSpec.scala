package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct pins for the r14 affected-components-only `ccStep` (the e17/e18
  * refresh kernel): the planted graph exercises every edge class —
  * cross-component merge through a batch doc, batch–batch edge, isolated
  * batch doc, edge to a not-yet-known doc (must drop), and an UNTOUCHED
  * component whose rows must pass through verbatim. */
class CcStepSpec extends SparkSpec {

  private def labels(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "cluster_id")
  }

  test("ccStep: planted merge, pass-through, drop-unknown — equals full recompute") {
    import spark.implicits._
    // prior star forest: component A = {1,2,3}→1, component B = {5,6}→5,
    // singleton 9, untouched component U = {20,21}→20
    val prior = labels(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      9L -> 9L, 20L -> 20L, 21L -> 21L)
      .select(col("doc_id"), when(col("doc_id") === 21L, 20L)
        .otherwise(col("cluster_id")).as("cluster_id"))
    // pair artifact: the verified-pair universe, arrival-agnostic
    val pairs = Seq(
      (3L, 100L),   // batch 100 bridges A …
      (100L, 6L),   // … and B → A∪B∪{100} must merge to min 1
      (101L, 102L), // batch–batch edge → component {101,102}→101
      (9L, 300L),   // 300 is NOT known yet → edge must NOT enter
      (20L, 21L)    // internal to U, no batch endpoint → not a new edge
    ).toDF("id_a", "id_b")
    val batch = Seq(100L, 101L, 102L, 103L).toDF("doc_id") // 103 isolated
    val got = EventsStream.ccStep(pairs, prior, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L, 100L -> 1L, // merged
      101L -> 101L, 102L -> 101L,                                   // batch-batch
      103L -> 103L,                                                 // isolated self
      9L -> 9L,                                                     // 300 dropped
      20L -> 20L, 21L -> 20L)                                       // untouched verbatim
    assert(got == want, s"ccStep diverged: got=$got")
    // every doc exactly once (unaffected ∪ relabeled must partition)
    val n = EventsStream.ccStep(pairs, prior, batch).count()
    assert(n == want.size, s"duplicate or missing label rows: $n")
  }

  test("broadcast-bound guard: a chain-collapsed giant cluster fails typed, not as an OOM") {
    import spark.implicits._
    // planted pathology (r14 VERDICT ask #4): ONE component holds every
    // known doc; the batch doc attaches to it, so touched membership = the
    // whole corpus — the case that previously died as a raw broadcast OOM
    val n = 100L
    val prior = spark.range(0, n)
      .select(col("id").as("doc_id"), lit(0L).as("cluster_id"))
    val pairs = Seq((0L, 1000L)).toDF("id_a", "id_b")
    val batch = Seq(1000L).toDF("doc_id")
    spark.conf.set("graft.cc.maxTouchedMembership", "50")
    try {
      val err = intercept[graft.llm.TouchedMembershipExceeded] {
        EventsStream.ccStep(pairs, prior, batch).count()
      }
      assert(err.getMessage.contains("x136_cluster_coherence") &&
        err.getMessage.contains("x137_guarded_dedup"),
        s"error must name the upstream audits: ${err.getMessage}")
      // the same pathology through the frozen-split delta path
      val labels = prior.unionByName(Seq((1000L, 0L)).toDF("doc_id", "cluster_id"))
      val assigned = spark.range(0, n)
        .select(col("id").as("doc_id"), lit("train").as("split"))
      intercept[graft.llm.TouchedMembershipExceeded] {
        graft.llm.DocDedup.leakSafeSplitDelta(batch, labels, assigned).count()
      }
      // a HEALTHY batch under the same bound must pass even though an
      // untouched giant component exists — only TOUCHED membership counts
      val prior2 = prior.unionByName(Seq((200L, 200L)).toDF("doc_id", "cluster_id"))
      val ok = EventsStream.ccStep(Seq((200L, 201L)).toDF("id_a", "id_b"),
        prior2, Seq(201L).toDF("doc_id")).count()
      assert(ok == n + 2, s"healthy batch mis-sized under the guard: $ok")
    } finally spark.conf.unset("graft.cc.maxTouchedMembership")
  }

  test("labelStoreView: last-writer-wins over deltas, fold base verbatim, replay boundary honored") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_lsv_")
    // fold g0: docs 1..4 self-labeled; d0 relabels {2,3}→2; d1 relabels
    // {3,4,9}→3 (9 is a batch-1 newcomer) — the view must take d1 over d0
    // over the fold, per doc
    labels(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
      .write.parquet(store.resolve("labels_fold_g0").toString)
    labels(2L -> 2L, 3L -> 2L)
      .write.parquet(store.resolve("labels_d0").toString)
    labels(3L -> 3L, 4L -> 3L, 9L -> 3L)
      .write.parquet(store.resolve("labels_d1").toString)
    def view(below: Long): Map[Long, Long] =
      EventsStream.labelStoreView(spark, store, below)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(view(Long.MaxValue) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 9L -> 3L),
      "full view must be fold overridden by d0 then d1")
    // replay of batch 1 reads below=1: d1 (its own possibly-partial
    // write) must be INVISIBLE
    assert(view(1L) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L),
      "below=1 must see fold+d0 only")
    assert(view(0L) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L),
      "below=0 must be the fold verbatim")
    // compacting at 2 then vacuuming: r16 folds are BUCKETED — the new
    // generation holds only the buckets the deltas touched (docs 2,3,4,9
    // → buckets 2,3,4,9 under the default 16), the monolithic g0 keeps
    // serving the cold buckets (doc 1), and both deltas are covered
    EventsStream.compactLabelStore(spark, store, upTo = 2L)
    EventsStream.vacuumLabelStore(store)
    val names = store.toFile.listFiles().map(_.getName).toSet
    assert(names == Set("labels_fold_g0", "labels_fold_g2", "fold_buckets"),
      s"vacuum left $names")
    val foldBuckets = store.resolve("labels_fold_g2").toFile.listFiles()
      .map(_.getName).filter(_.startsWith("bucket=")).toSet
    assert(foldBuckets == Set("bucket=2", "bucket=3", "bucket=4", "bucket=9"),
      s"fold must hold exactly the touched buckets: $foldBuckets")
    assert(view(Long.MaxValue) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 9L -> 3L),
      "fold+vacuum changed what the reader sees")
  }

  test("ccStep: a later batch picks up the previously-unknown endpoint's edge") {
    import spark.implicits._
    // continue the story: 300 arrives — the (9,300) pair's LATER endpoint
    // is now in the batch, so the edge enters exactly once, here
    val prior = labels(9L -> 9L, 1L -> 1L, 2L -> 1L)
    val pairs = Seq((9L, 300L)).toDF("id_a", "id_b")
    val batch = Seq(300L).toDF("doc_id")
    val got = EventsStream.ccStep(pairs, prior, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(9L -> 9L, 300L -> 9L, 1L -> 1L, 2L -> 1L),
      s"deferred edge not applied: $got")
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r16: bucketed partial folds + the bytes-ratio in-stream maintenance
  * policy. The contract under test: NO job in the store system ever
  * rewrites the whole corpus — a fold touches exactly the buckets
  * holding uncovered delta rows — and maintenance cadence can follow the
  * delta-bytes signal instead of a fixed batch count, with a delta-count
  * backstop keeping the artifact set bounded for low-churn streams. */
class Round16StoreSpec extends SparkSpec {
  import spark.implicits._

  private def labels(pairs: (Long, Long)*) =
    pairs.toDF("doc_id", "cluster_id")

  private def bucketDirs(store: java.nio.file.Path, gen: String): Set[String] =
    Option(store.resolve(gen).toFile.listFiles()).fold(Set.empty[String])(
      _.map(_.getName).filter(_.startsWith("bucket=")).toSet)

  test("label fold rewrites ONLY the buckets holding uncovered delta rows") {
    spark.conf.set("graft.store.foldBuckets", "8")
    try {
      val store = java.nio.file.Files.createTempDirectory("graft_r16_lbl_")
      // monolithic seed: docs 0..63 self-labeled (8 docs per bucket)
      labels((0L until 64L).map(d => d -> d): _*)
        .write.parquet(store.resolve("labels_fold_g0").toString)
      // d0 touches docs 8 and 16 — both bucket 0 under B=8
      labels(8L -> 16L, 16L -> 16L)
        .write.parquet(store.resolve("labels_d0").toString)
      EventsStream.compactLabelStore(spark, store, upTo = 1L)
      assert(bucketDirs(store, "labels_fold_g1") == Set("bucket=0"),
        "fold g1 must hold exactly the touched bucket")
      // the touched-bucket fold holds that bucket's FULL membership (8
      // rows), not the corpus (64) — write ∝ touched buckets
      val g1 = spark.read.parquet(store.resolve("labels_fold_g1").toString)
      assert(g1.count() == 8, s"bucket-0 fold must hold 8 rows, got ${g1.count()}")
      EventsStream.vacuumLabelStore(store)
      val names = store.toFile.listFiles().map(_.getName).toSet
      assert(names == Set("labels_fold_g0", "labels_fold_g1", "fold_buckets"),
        s"cold buckets keep the seed, deltas are covered: $names")
      // a second fold touching a DIFFERENT bucket leaves g1 alone
      labels(1L -> 9L, 9L -> 9L) // bucket 1
        .write.parquet(store.resolve("labels_d1").toString)
      EventsStream.compactLabelStore(spark, store, upTo = 2L)
      EventsStream.vacuumLabelStore(store)
      assert(bucketDirs(store, "labels_fold_g2") == Set("bucket=1"))
      val after = store.toFile.listFiles().map(_.getName).toSet
      assert(after == Set("labels_fold_g0", "labels_fold_g1",
        "labels_fold_g2", "fold_buckets"),
        s"per-bucket serving generations must coexist: $after")
      // the composite view = seed overridden by both folded deltas
      val got = EventsStream.labelStoreView(spark, store, Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = (0L until 64L).map(d => d -> d).toMap ++
        Map(8L -> 16L, 16L -> 16L, 1L -> 9L, 9L -> 9L)
      assert(got == want, "bucketed folds changed what the reader sees")
    } finally spark.conf.unset("graft.store.foldBuckets")
  }

  test("split fold is a touched-buckets-only physical merge") {
    spark.conf.set("graft.store.foldBuckets", "8")
    try {
      val store = java.nio.file.Files.createTempDirectory("graft_r16_spl_")
      def rows(ds: Seq[Long], batch: Long) = ds
        .map(d => (d, if (d % 2 == 0) "train" else "test",
          if (batch < 0) "frozen" else "coined", batch))
        .toDF("doc_id", "split", "assignment", "assigned_batch")
      rows(0L until 64L, -1L)
        .write.parquet(store.resolve("split_init").toString)
      rows(Seq(64L, 72L), 0L) // both bucket 0
        .write.parquet(store.resolve("split_b0").toString)
      EventsStream.compactSplitStore(spark, store, upTo = 1L)
      assert(bucketDirs(store, "split_fold_g1") == Set("bucket=0"),
        "split fold must hold exactly the touched bucket")
      val g1 = spark.read.parquet(store.resolve("split_fold_g1").toString)
      // bucket 0 of the seed (8 docs) + the 2 delta rows, batch ids intact
      assert(g1.count() == 10, s"expected 10 rows, got ${g1.count()}")
      assert(g1.filter(col("assigned_batch") === 0L).count() == 2,
        "fold must preserve delta batch ids verbatim")
      EventsStream.vacuumSplitStore(store)
      val names = store.toFile.listFiles().map(_.getName).toSet
      assert(names == Set("split_init", "split_fold_g1", "fold_buckets"),
        s"seed serves cold buckets, b0 is covered: $names")
      val got = EventsStream.splitStoreView(spark, store, Long.MaxValue)
        .select("doc_id", "assigned_batch")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0L until 64L).map(_ -> -1L).toSet + (64L -> 0L) + (72L -> 0L)
      assert(got == want, "split fold+vacuum changed the view")
    } finally spark.conf.unset("graft.store.foldBuckets")
  }

  test("bytes-ratio maintenance policy: low churn folds less often, count backstop bounds the set") {
    import EventsStream.MaintenancePolicy
    // unit thresholds first: the policy is pure given the two signals
    def fires(p: EventsStream.MaintenancePolicy, ratio: Long, n: Int) =
      EventsStream.policyFires(4L, p, ratio, n)
    val byBytes = MaintenancePolicy.BytesRatio(100000L, maxDeltas = 16)
    assert(!fires(byBytes, 99999L, 15), "below both signals → no fold")
    assert(fires(byBytes, 100000L, 1), "bytes ratio at threshold → fold")
    assert(fires(byBytes, 0L, 16), "delta-count backstop → fold")
    assert(!EventsStream.policyFires(0L, byBytes, Long.MaxValue, 999),
      "batch 0 never folds (nothing committed below it)")

    // integration: the SAME 6-batch stream, three policies. High ratio +
    // high backstop → zero folds (six deltas accumulate); the default
    // EveryN(4) case is pinned by StreamingSpec; a tight backstop folds
    // mid-stream and bounds the artifact set.
    val odd = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").filter(col("doc_id") % 2 === 1)
    def run(policy: EventsStream.MaintenancePolicy): Set[String] = {
      val srcDir = java.nio.file.Files.createTempDirectory("graft_r16p_src_")
      val storeDir = java.nio.file.Files.createTempDirectory("graft_r16p_store_")
      val ckDir = java.nio.file.Files.createTempDirectory("graft_r16p_ck_")
      for (i <- 0 until 6) {
        // single FILE per slice (the file stream source does not recurse
        // into nested parquet dirs) — one file = one micro-batch
        val tmp = java.nio.file.Files.createTempDirectory("graft_r16p_part_")
        odd.filter(col("doc_id") % 12 === 2 * i + 1).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.toFile.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath, srcDir.resolve(s"slice$i.parquet"))
        tmp.toFile.listFiles().foreach(_.delete())
        java.nio.file.Files.deleteIfExists(tmp)
      }
      EventsStream.runIncrementalCcStream(spark, sfDir, srcDir.toString,
        storeDir, ckDir, maintenance = policy).count()
      storeDir.toFile.listFiles().map(_.getName).filter(n =>
        n.startsWith("labels_")).toSet
    }
    val lowChurn = run(MaintenancePolicy.BytesRatio(Long.MaxValue, maxDeltas = 100))
    assert(lowChurn == Set("labels_fold_g0") ++ (0 to 5).map(i => s"labels_d$i"),
      s"a low-churn stream must not fold at all: $lowChurn")
    val backstopped = run(MaintenancePolicy.BytesRatio(Long.MaxValue, maxDeltas = 4))
    // the backstop fires once 4 uncovered deltas exist (start of batch 4),
    // folding d0-d3; d4/d5 then accumulate below the next backstop
    assert(backstopped.filter(_.startsWith("labels_d")) ==
      Set("labels_d4", "labels_d5"),
      s"the count backstop must fold the first four deltas: $backstopped")
    assert(backstopped.contains("labels_fold_g4"),
      s"backstop fold generation missing: $backstopped")
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property suite for the r15 delta label store: for RANDOM delta
  * sequences, random fold/vacuum points and every read boundary, the
  * fold+LWW view must equal a naive driver-side replay (a plain
  * last-writer-wins map — no Spark code shared with `labelStoreView`).
  * This is the crash-replay trust anchor: the runners' correctness
  * reduces to "view(below=b) == state after batches < b" for arbitrary
  * histories, including histories compacted mid-way. */
class LabelStorePropertiesSpec extends SparkSpec {

  test("bytes-ratio fold signal: MaxValue pre-seed, 0 with no uncovered deltas, monotone, reset by fold") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_ratio_")
    assert(EventsStream.labelDeltaRatioPpm(store) == Long.MaxValue,
      "a store with no committed fold must demand a fold")
    (0L until 50L).map(d => (d, d)).toDF("doc_id", "cluster_id")
      .write.parquet(store.resolve("labels_fold_g0").toString)
    assert(EventsStream.labelDeltaRatioPpm(store) == 0L,
      "no uncovered deltas → 0")
    (0L until 10L).map(d => (d, d + 1)).toDF("doc_id", "cluster_id")
      .write.parquet(store.resolve("labels_d0").toString)
    val r1 = EventsStream.labelDeltaRatioPpm(store)
    assert(r1 > 0L, s"uncovered delta bytes → positive ratio, got $r1")
    (0L until 10L).map(d => (d, d + 2)).toDF("doc_id", "cluster_id")
      .write.parquet(store.resolve("labels_d1").toString)
    val r2 = EventsStream.labelDeltaRatioPpm(store)
    assert(r2 > r1, s"more delta bytes must raise the signal: $r1 → $r2")
    EventsStream.compactLabelStore(spark, store, upTo = 2L)
    EventsStream.vacuumLabelStore(store)
    assert(EventsStream.labelDeltaRatioPpm(store) == 0L,
      "fold must reset the signal (its deltas are covered)")
  }

  test("property: labelStoreView == naive LWW replay across random histories and fold points") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 8) {
      val store = java.nio.file.Files.createTempDirectory(s"graft_lsvp_$trial")
      // seed fold g0: docs 0..n-1 self-labeled
      val n = 4 + rnd.nextInt(8)
      val seed = (0L until n).map(d => (d, d))
      seed.toDF("doc_id", "cluster_id")
        .write.parquet(store.resolve("labels_fold_g0").toString)
      // reference: naive in-memory replay, one LWW map snapshot per boundary
      var state = seed.toMap
      val nBatches = 1 + rnd.nextInt(5)
      val snapshots = scala.collection.mutable.ArrayBuffer[Map[Long, Long]](state)
      for (b <- 0 until nBatches) {
        // each batch relabels doc 0 plus a random subset of known docs,
        // and may add a newcomer; label values are arbitrary longs
        val touched = 0L +: ((1L until n).filter(_ => rnd.nextBoolean()) ++
          (if (rnd.nextBoolean()) Seq(100L + b) else Seq.empty))
        val delta = touched.distinct.map(d => (d, rnd.nextInt(50).toLong))
        delta.toDF("doc_id", "cluster_id")
          .write.parquet(store.resolve(s"labels_d$b").toString)
        state = state ++ delta.toMap
        snapshots += state
      }
      // maybe compact+vacuum at a random committed boundary, like the
      // in-stream policy would mid-history
      val foldAt = rnd.nextInt(nBatches + 1)
      if (rnd.nextBoolean() && foldAt > 0) {
        EventsStream.compactLabelStore(spark, store, upTo = foldAt.toLong)
        EventsStream.vacuumLabelStore(store)
      }
      // every boundary at or past the newest fold must replay exactly
      val minBoundary = EventsStream.committedLabelFolds(store).last
      for (b <- minBoundary to nBatches.toLong) {
        val got = EventsStream.labelStoreView(spark, store, b)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == snapshots(b.toInt),
          s"trial=$trial below=$b foldAt=$foldAt: view diverged\n got=$got\nwant=${snapshots(b.toInt)}")
      }
      val full = EventsStream.labelStoreView(spark, store, Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(full == snapshots.last,
        s"trial=$trial: full view != final state")
    }
  }
}

package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Whole-suite physical-plan audit: every gate query's executed plan is
  * checked for the properties that matter at 100 TB. Catches silent plan
  * regressions (a lost broadcast hint, an accidental cartesian) that
  * row-level correctness gates cannot see. */
class PlanAuditSpec extends SparkSpec {

  // brute-force similarity scans are *defined* as all-pairs over a
  // broadcast side; everything else must never produce a cartesian
  // (x42's n×k centroid assignment is the same broadcast probe as x12's;
  // its pair scan is an equi-join on cell_id, never a cartesian;
  // x67 is x6's brute-force layout plus the label-exclusion predicate —
  // the broadcast side is the nQueries rows bounded by a scan-pushed
  // vec_id filter, so the nested loop is linear in the corpus, and the
  // documented lake-scale path swaps it for x55's LSH bucket join)
  // x71's ADC probe is the same bounded layout: 20 query distance-tables
  // broadcast over the one-scan codes side; x71b adds x12's 16-row
  // centroid cross probe (cell assignment) on top — both broadcast sides
  // are constant-bounded (nQueries / nCells); x78 is x67's layout with
  // the (query, pair_label) double-branch window over the one scored pass
  private val allPairsByDesign =
    // x80: bounded broadcast probe of the EVAL side (eval suites are MBs
    // by construction — x31's argument), per-train argmax collapses the
    // expansion map-side
    // x88 is x5's capped all-pairs verifier with the truncated cosine
    // beside the full one — same hard vec_id cap, same sanction
    // x131 is x6's bounded-query broadcast ranking run twice (float +
    // int8 codes) — same nQueries cap, same sanction
    // x132's stage 1 is x71's ADC probe verbatim (20 broadcast distance
    // tables over the codes scan); its stage-2 exact rescore is pure
    // equi-joins on candidate ids — the NLJ it inherits is x71's
    Set("x5_embed_neardup", "x6_ann_topk", "x12_ivf_topk", "x42_semantic_dedup",
      "x67_hard_negatives", "x71_pq_topk", "x71b_ivfpq_topk", "x78_contrastive_pairs",
      "x80_semantic_decontaminate", "x88_matryoshka", "x131_int8_topk_parity",
      "x132_pq_rerank")

  private lazy val plans: Map[String, String] = {
    graft.functions.GraftFunctions.register(spark)
    SparkEntry.queries.map { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      name -> plan
    }
  }

  test("no query plans a cartesian product (except all-pairs similarity by design)") {
    val offenders = plans.collect {
      case (n, p) if !allPairsByDesign(n) && p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("non-similarity queries avoid nested-loop joins except tiny broadcast probes") {
    // BroadcastNestedLoopJoin is legitimate ONLY when the build side is a
    // handful of literal rows (range bins, the 1-row quantile-threshold
    // frame of the length filter — also inside the x38 composition) or
    // by-design all-pairs scans
    // x47/x48: BM25's 1-row (N, avgdl) stats frame and x48's 1-row query
    // vector are the same sanctioned 1-row-broadcast-probe shape;
    // x66: the singleton row is corpus-count × clustered-count — two
    // 1-row stat frames crossed for one output row
    // x70: the corpus top-V vocabulary collapsed to a ONE-ROW array and
    // broadcast onto the scan — the same sanctioned 1-row-probe shape
    // x41/x91: DistributedRank's partition-offset prefix sums are a
    // triangular (pid < pid) self-join of a P-row frame — P = shuffle
    // parallelism, a config bound, never data; the NLJ is the point (no
    // window, no driver collect). x91 additionally crosses three 1-row
    // broadcast stat frames (totals, the cut row, the 2×-budget row)
    // onto the vocab table — the sanctioned 1-row-probe shape
    // x92: the 1-row Σ sqrt_scaled frame crossed onto the ≤|sources|
    // budget table — the same shape
    // x99: the two 1-row totals frames (Σ unigrams, Σ bigrams) crossed
    // onto the vocabulary-sized PMI pair table — the same shape
    // x124: composes x36's length filter like x38 does, so the same
    // sanctioned 1-row threshold probe appears in its lineage (x65 hides
    // the identical subplan behind its localCheckpoint barrier)
    // x128: x12's broadcast argmax verbatim (the 16-row centroid table
    // crossed onto the scan — the profile audits exactly the index x12
    // probes, so it inherits x12's sanctioned shape)
    // x130: the 1-row (n_keys, total) stat frame crossed back onto the
    // per-key count aggregate — the sanctioned 1-row-probe shape again
    // sql3: a 16-row (vec_id < 16 pushed to the scan) inequality self-join
    // — all-pairs BY DESIGN over a literal-bounded side, the SQL-text twin
    // of the sanctioned all-pairs similarity shapes
    val allowed = allPairsByDesign + "x128_ivf_cell_profile" +
      "x130_key_skew_profile" + "sql3_dot_pairs_text" +
      "j8_range_bin_join" + "x36_length_filter" + "x41_rarity_score" +
      "x38_training_set" + "x47_bm25_rank" + "x48_hybrid_rrf" + "x66_dedup_stats" +
      "x70_oov_rate" + "x91_vocab_coverage" + "x92_source_budget" +
      "x99_pmi_collocations" + "x124_token_funnel"
    val offenders = plans.collect {
      case (n, p) if !allowed(n) && p.contains("BroadcastNestedLoopJoin") => n
    }
    assert(offenders.isEmpty, s"unexpected nested-loop joins in: $offenders")
  }

  test("every query stays under a sane exchange budget") {
    // a gate query is one operator family exercised once; double-digit
    // shuffle counts signal accidental recomputation of a shared subtree.
    // x17 is exempt: its iterative rounds persist each label generation,
    // and InMemoryRelation PRINTS the full cached child tree per round
    // (nested, so the string counts every prior round's exchanges many
    // times over) — execution scans the caches, it does not re-shuffle.
    val budget = 14
    val offenders = plans.removed("x17_dedup_clusters").map { case (n, p) =>
      n -> "Exchange (hash|range|Single)".r.findAllIn(p).size
    }.filter(_._2 > budget)
    assert(offenders.isEmpty, s"exchange-heavy plans: $offenders")
  }

  test("the by-design all-pairs verifier (x5) hard-caps its input at the scan") {
    // x5 is quadratic BY DESIGN (the small-scale verifier the LSH scale
    // path x5b is recall-checked against); the cap must be pushed into the
    // parquet scan so the all-pairs join can never touch an unbounded
    // corpus, whatever it is pointed at
    val p = plans("x5_embed_neardup")
    assert(p.contains("LessThan(vec_id,2000)"),
      s"x5's vec_id cap must reach the scan as a pushed filter:\n$p")
  }

  test("the star-schema fact build broadcasts every dimension") {
    val p = plans("w4_fact_trips")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, "4 dims -> 4 broadcast joins")
    assert(!p.contains("SortMergeJoin"), "fact side must never shuffle in the star build")
  }

  test("global (unpartitioned) windows run only over pre-aggregated input") {
    // a window with no partition spec moves ALL input to one task; that is
    // only acceptable over an already-aggregated frame (group counts, a
    // vocabulary, daily totals — bounded by cardinality, not data size).
    // Every `WindowExec: No Partition Defined` warning in the logs must
    // trace to such a bounded input; this enforces it structurally: in the
    // optimized logical plan, each global Window's subtree must contain an
    // Aggregate (or a LogicalRDD barrier, which in this library only ever
    // fronts a checkpointed aggregate/signature frame — see the no-persist
    // audit below for why those barriers exist).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    import org.apache.spark.sql.execution.LogicalRDD
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val lp = fn(spark, sfDir).queryExecution.optimizedPlan
      spark.catalog.clearCache()
      val bad = lp.collect {
        case w: LWindow if w.windowExpressions.nonEmpty &&
            w.partitionSpec.isEmpty &&
            w.child.collectFirst { case a: Aggregate => a }.isEmpty &&
            w.child.collectFirst { case r: LogicalRDD => r }.isEmpty => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"global windows over unaggregated (unbounded) input in: $offenders")
  }

  test("the r15-weak vocab gates rank distributed — no single-partition window") {
    // x41/x91/x47 rank the token VOCABULARY — Heaps-sublinear but
    // unbounded (O(10⁹) tokens at 100 TB). r16 replaced their global
    // row_number/running-sum windows with DistributedRank (range
    // partition + per-partition window + P-row offsets) and x47's with
    // two TakeOrdered top-k's. Enforced structurally: no WindowExec in
    // these plans may be unpartitioned or sit above an
    // Exchange SinglePartition (the remaining SinglePartition exchanges
    // are the final stages of one-row scalar aggregates — P partial rows,
    // metadata-sized at any scale).
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    for (name <- Seq("x41_rarity_score", "x91_vocab_coverage", "x47_bm25_rank")) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      spark.catalog.clearCache()
      val offenders = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty ||
            w.collectFirst { case e: ShuffleExchangeExec
              if e.outputPartitioning == SinglePartition => e }.nonEmpty => w
      }
      assert(offenders.isEmpty,
        s"$name funnels an unbounded frame through one task:\n$plan")
    }
  }

  test("dim_time never plans a window — its key is arithmetic (scale-safe at second grain)") {
    // dim_time is the ONE dim not bounded by domain cardinality: at the
    // reference's second-grain pickup timestamps it is ~O(fact rows), so
    // even an Aggregate-fronted global row_number (structurally sanctioned
    // above) would serialize it through one task. The surrogate key must
    // therefore be derived arithmetically (unix_micros) — no Window
    // operator anywhere in the dim build or the fact's dim_time subtree.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("w1_dim_time", "j1_time_surrogate_join")) {
      val lp = SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan
      spark.catalog.clearCache()
      assert(lp.collectFirst { case w: LWindow => w }.isEmpty,
        s"$name must key dim_time arithmetically, not via a window")
    }
  }

  test("no gate query pins CacheManager state (library code never persist()s)") {
    // building every query (plans above ran with clearCache between) must
    // leave the catalog cache empty WITHOUT any cleanup: barriers are lazy
    // localCheckpoints released by GC, so direct library callers cannot
    // accumulate cached plans across queries
    plans // force the lazy audit first (it clears its own caches)
    SparkEntry.queries.foreach { case (_, fn) => fn(spark, sfDir) }
    assert(spark.sharedState.cacheManager.isEmpty,
      "a gate query registered a persist() with the CacheManager")
  }
}

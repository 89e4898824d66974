package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-11 operator properties: boilerplate ratio (x93), priority
  * sampling (x94), source-overlap matrix (x95), embedding dimension
  * profile (x96), curriculum ordering (x97), PMI collocations (x99), the
  * dedup survivorship report (x100), mixed-language flag (x101), ANN
  * quality eval (x102), seq-len budget (x103), threshold sweep (x104),
  * source data card (x105), the x110 band recall audit, the embedding
  * outlier/confusion monitors (x111/x112), classifier calibration (x113),
  * kNN label agreement (x114), JL distortion (x115), tokenizer fertility
  * (x116), shuffle quality (x117), filter disagreement (x118), kNN
  * reciprocity (x119), template prefixes (x120), normalization
  * robustness (x121) and incremental index append (x122). Each test pins
  * an algebraic invariant of the operator, not fixture values — the
  * value-level gate is the DuckDB oracle. */
class Round11Spec extends SparkSpec {

  private lazy val nDocs = Tables.documents(spark, sfDir).count()

  test("x93: boilerplate ratio is a valid fraction and covers every doc") {
    val r = TextStats.boilerplateRatio(spark, sfDir).persist()
    assert(r.count() == nDocs)
    assert(r.filter(col("n_boiler") > col("n_shingles")).count() == 0)
    assert(r.filter(col("boiler_ratio") < 0 || col("boiler_ratio") > 1).count() == 0)
    r.unpersist()
  }

  test("x93: a stricter df threshold never marks more boilerplate") {
    val loose = TextStats.boilerplateRatio(spark, sfDir, thresholdPct = 10)
      .select(col("doc_id"), col("n_boiler").as("b_loose"))
    val strict = TextStats.boilerplateRatio(spark, sfDir, thresholdPct = 90)
      .select(col("doc_id"), col("n_boiler").as("b_strict"))
    assert(loose.join(strict, "doc_id")
      .filter(col("b_strict") > col("b_loose")).count() == 0)
  }

  test("x94: priority sample takes k per source, priorities dominate weights") {
    val s = Curation.prioritySample(spark, sfDir, k = 5).persist()
    val perSource = s.groupBy("source").agg(count(lit(1)).as("n"),
      max("rank").as("maxr"))
    // every source in this fixture has >= 5 docs, so exactly k rows each
    assert(perSource.filter(col("n") =!= 5 || col("maxr") =!= 5).count() == 0)
    // u <= 1 so priority = w/u >= w; the DLT estimator never shrinks a weight
    assert(s.filter(col("priority") < col("weight")).count() == 0)
    assert(s.filter(col("est_weight") < col("weight")).count() == 0)
    // deterministic: a rerun reproduces the sample exactly
    val again = Curation.prioritySample(spark, sfDir, k = 5)
    assert(s.exceptAll(again).isEmpty && again.exceptAll(s).isEmpty)
    s.unpersist()
  }

  test("x95: overlap matrix is a valid Jaccard over ordered source pairs") {
    val m = DocDedup.sourceOverlapMatrix(spark, sfDir).persist()
    assert(m.filter(col("source_a") >= col("source_b")).count() == 0)
    assert(m.filter(col("n_shared") > least(col("n_a"), col("n_b"))).count() == 0)
    assert(m.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
    m.unpersist()
  }

  test("x96: dimension profile has one row per dim with coherent moments") {
    val dim = Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).head().getInt(0)
    val nVec = Tables.embeddings(spark, sfDir).count()
    val p = Similarity.embeddingDimProfile(spark, sfDir).persist()
    assert(p.count() == dim)
    assert(p.filter(col("n") =!= nVec).count() == 0)
    assert(p.filter(col("var_milli2") < 0).count() == 0)
    // mean in milli-units sits inside [1000*min - 1, 1000*max] (floor slack)
    assert(p.filter(col("mean_milli") < col("min_v") * 1000 - 1 ||
      col("mean_milli") > col("max_v") * 1000).count() == 0)
    p.unpersist()
  }

  test("x97: curriculum rank is a contiguous permutation with balanced deciles") {
    val c = Curation.curriculumOrder(spark, sfDir).persist()
    assert(c.count() == nDocs)
    val agg = c.agg(min("curriculum_rank"), max("curriculum_rank"),
      countDistinct("curriculum_rank")).head()
    assert(agg.getInt(0) == 1 && agg.getInt(1) == nDocs.toInt &&
      agg.getLong(2) == nDocs)
    val sizes = c.groupBy("decile").agg(count(lit(1)).as("n"))
      .agg(max("n") - min("n")).head().getLong(0)
    assert(sizes <= 1, "ntile deciles differ by at most one")
    // the manifest never interleaves across deciles: rank order == decile order
    val w = org.apache.spark.sql.expressions.Window.orderBy("curriculum_rank")
    val disorder = c.withColumn("prev", lag("decile", 1).over(w))
      .filter(col("prev") > col("decile")).count()
    assert(disorder == 0)
    c.unpersist()
  }

  test("x99: collocations clear the count screen and beat independence at the top") {
    val p = TextStats.pmiCollocations(spark, sfDir).persist()
    assert(p.count() > 0)
    assert(p.filter(col("n_ab") < 5).count() == 0)
    assert(p.filter(col("assoc_ratio") <= 0).count() == 0)
    // ranked descending: the head dominates the tail
    val rows = p.select("assoc_ratio").collect().map(_.getDouble(0))
    assert(rows.zip(rows.tail).forall { case (a, b) => a >= b })
    p.unpersist()
  }

  test("x101: mixed flag only fires on docs with two live language signals") {
    val m = TextStats.mixedLanguage(spark, sfDir).persist()
    assert(m.count() == nDocs)
    assert(m.filter(col("second_score") > col("best_score")).count() == 0)
    assert(m.filter(col("is_mixed") === 1 && col("second_score") === 0).count() == 0)
    // the argmax label agrees with x7 on every doc
    val x7 = TextStats.langId(spark, sfDir)
      .select(col("doc_id"), col("predicted_lang").as("p7"))
    assert(m.join(x7, "doc_id")
      .filter(col("predicted_lang") =!= col("p7")).count() == 0)
    m.unpersist()
  }

  test("x102: ANN eval metrics are coherent (hits bounded, RR in range)") {
    val e = Similarity.annQualityEval(spark, sfDir).persist()
    assert(e.count() > 0)
    assert(e.filter(col("hits") > col("n_returned")).count() == 0)
    assert(e.filter(col("hits") > col("ideal")).count() == 0)
    assert(e.filter(col("n_returned") > 5).count() == 0)
    assert(e.filter(col("recall_at_k").isNotNull &&
      (col("recall_at_k") < 0 || col("recall_at_k") > 1)).count() == 0)
    assert(e.filter(col("rr") < 0 || col("rr") > 1).count() == 0)
    // rr = 0 exactly when no relevant neighbor was returned
    assert(e.filter((col("rr") === 0.0) =!= (col("hits") === 0)).count() == 0)
    e.unpersist()
  }

  test("x103: truncation loss falls and padding waste rises with the budget") {
    val t = Packing.seqlenBudget(spark, sfDir)
      .orderBy("budget").collect()
    assert(t.length == 4)
    assert(t.map(_.getAs[Long]("tokens_total")).distinct.length == 1)
    val lost = t.map(_.getAs[Long]("tokens_lost"))
    val pad = t.map(_.getAs[Long]("pad_ppm"))
    assert(lost.zip(lost.tail).forall { case (a, b) => a >= b })
    assert(pad.zip(pad.tail).forall { case (a, b) => a <= b })
  }

  test("x104: sweep counts are monotone in the threshold and tie to x15") {
    val t = DocDedup.thresholdSweep(spark, sfDir).orderBy("threshold").collect()
    assert(t.length == 5)
    val pairs = t.map(_.getAs[Long]("n_pairs"))
    val docs = t.map(_.getAs[Long]("n_docs_involved"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    // the 0.5 row IS the x15 pair set
    assert(pairs.head == DocDedup.ngramJaccardPairs(spark, sfDir).count())
    // a pair involves 2 docs, shared docs only shrink the distinct count
    assert(t.forall(r => r.getAs[Long]("n_docs_involved") <= 2 * r.getAs[Long]("n_pairs")))
  }

  test("x105: data card partitions the corpus and bounds every published rate") {
    val c = Curation.sourceDataCard(spark, sfDir).persist()
    val nSources = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(c.count() == nSources)
    assert(c.agg(sum("n_docs")).head().getLong(0) == nDocs)
    assert(c.filter(col("top_lang_docs") > col("n_docs")).count() == 0)
    assert(c.filter(col("top_lang_ppm") < 0 || col("top_lang_ppm") > 1000000).count() == 0)
    assert(c.filter(col("distinct3_ratio") <= 0 || col("distinct3_ratio") > 1).count() == 0)
    assert(c.filter(col("dup_docs") > col("n_docs")).count() == 0)
    assert(c.filter(col("dup_rate") < 0 || col("dup_rate") > 1).count() == 0)
    // redundancy column reconciles with the CC artifact: every clustered doc
    // lands in exactly one source's dup_docs
    assert(c.agg(sum("dup_docs")).head().getLong(0) ==
      DocDedup.clusterLabels(spark, sfDir).count())
    c.unpersist()
  }

  test("x106: k-core peel layers and core degrees on a known graph") {
    import spark.implicits._
    // K4 clique (1-4): whole 2-core, in-core degree 3. Path 10-11-12-13:
    // endpoints die round 1, the stranded middle edge dies round 2 —
    // exercises a real cascade. Star 20-(21,22,23): leaves die round 1;
    // the hub is never low-degree while it has edges, but its degree hits
    // 0 once the leaves peel, so the alive-set tracking peels it at layer
    // 2 — one row per node of the domain, no silent vanishing.
    val edges = ((for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) ++
      Seq((10L, 11L), (11L, 12L), (12L, 13L)) ++
      Seq((20L, 21L), (20L, 22L), (20L, 23L))).toDF("id_a", "id_b")
    val got = graft.graph.KCore.kCorePeel(edges).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    (1L to 4L).foreach(v => assert(got(v) == ((0, 3L)), s"K4 node $v: ${got(v)}"))
    assert(got(10L) == ((1, 0L)) && got(13L) == ((1, 0L)))
    assert(got(11L) == ((2, 0L)) && got(12L) == ((2, 0L)))
    assert(Seq(21L, 22L, 23L).forall(got(_) == ((1, 0L))))
    assert(got(20L) == ((2, 0L)), "edge-orphaned hub peels at layer 2")
    assert(got.keySet == ((1L to 4L) ++ (10L to 13L) ++ (20L to 23L)).toSet,
      "one row per node of the pair-graph domain")
    // corpus gate: layers within the oracle-chained bound; core nodes have
    // in-core degree >= k; peeled nodes report degree 0
    val corpus = graft.graph.KCore.neardupKCore(spark, sfDir).persist()
    assert(corpus.filter(col("peel_layer") < 0 || col("peel_layer") > 6).count() == 0)
    assert(corpus.filter(col("peel_layer") === 0 && col("core_degree") < 2).count() == 0)
    assert(corpus.filter(col("peel_layer") > 0 && col("core_degree") =!= 0).count() == 0)
    corpus.unpersist()
  }

  test("x107: size histogram partitions the corpus; sizes reconcile with the labels") {
    val p = DocDedup.clusterSizeProfile(spark, sfDir).persist()
    assert(p.agg(sum("n_docs")).head().getLong(0) == nDocs)
    assert(p.filter(col("n_docs") =!= col("cluster_size") * col("n_clusters")).count() == 0)
    assert(p.filter(col("cluster_size") < 1 || col("n_clusters") < 1).count() == 0)
    // docs in sizes >= 2 are exactly the labeled (clustered) docs; no
    // component of size < 2 can come out of a pair graph
    val clustered = p.filter(col("cluster_size") >= 2)
      .agg(sum("n_docs")).head().getLong(0)
    assert(clustered == DocDedup.clusterLabels(spark, sfDir).count())
    p.unpersist()
  }

  test("x108: matrix totals tie to the pair artifact; similarity means bounded") {
    val m = DocDedup.crossSourceDup(spark, sfDir).persist()
    assert(m.agg(sum("n_pairs")).head().getLong(0) ==
      DocDedup.pairArtifact(spark, sfDir).count())
    assert(m.filter(col("source_a") > col("source_b")).count() == 0)
    // pairs are kept at jaccard >= 0.5, so every mean is in [0.5, 1.0] micro
    assert(m.filter(col("mean_jaccard_micro") < 500000.0 ||
      col("mean_jaccard_micro") > 1000000.0).count() == 0)
    m.unpersist()
  }

  test("x109: one row per label; halves partition the table; drift non-negative") {
    val d = Similarity.embeddingDrift(spark, sfDir).persist()
    val emb = Tables.embeddings(spark, sfDir)
    assert(d.count() == emb.select("label").distinct().count())
    assert(d.agg(sum(col("n_a") + col("n_b"))).head().getLong(0) == emb.count())
    assert(d.filter(col("drift_sq") < 0).count() == 0)
    // the coin must actually split every fixture label, or drift is all-NULL
    assert(d.filter(col("n_a") > 0 && col("n_b") > 0 && col("drift_sq").isNull)
      .count() == 0)
    d.unpersist()
  }

  test("x110: recall audit partitions its truth sample; high buckets near-perfect") {
    val a = DocDedup.bandRecallAudit(spark, sfDir).persist()
    assert(a.filter(col("n_found") + col("n_missed") =!= col("n_true_pairs")).count() == 0)
    assert(a.filter(col("recall") < 0 || col("recall") > 1).count() == 0)
    assert(a.filter(col("j_bucket") < 5 || col("j_bucket") > 10).count() == 0,
      "truth is filtered to jaccard >= 0.5")
    // two-row bands find a j>=0.9 pair w.p. >= 1-(1-0.81)^4 ~ 0.9987; on
    // the witness-sized sample that should be no more than one miss
    val hi = a.filter(col("j_bucket") >= 9)
      .agg(coalesce(sum("n_true_pairs"), lit(0L)),
        coalesce(sum("n_missed"), lit(0L))).head()
    assert(hi.getLong(0) == 0 || hi.getLong(1) <= 1 + hi.getLong(0) / 100,
      s"banding missed ${hi.getLong(1)} of ${hi.getLong(0)} j>=0.9 pairs")
    a.unpersist()
  }

  test("x111: outlier monitor partitions counts; ranks dense; far <= total") {
    val o = Similarity.embeddingOutliers(spark, sfDir).persist()
    val emb = Tables.widen(Tables.embeddings(spark, sfDir))
    // one n_vecs per label, and they sum to the corpus vector count
    val perLabel = o.select("label", "n_vecs", "n_far").distinct()
    assert(perLabel.count() == emb.select("label").distinct().count())
    assert(perLabel.agg(sum("n_vecs")).head().getLong(0) == emb.count())
    assert(perLabel.filter(col("n_far") > col("n_vecs")).count() == 0)
    // ranks are exactly 1..3 per label and dist2 is non-increasing in rank
    assert(o.groupBy("label").agg(count(lit(1)).as("n"), max("rnk").as("mx"),
      min("rnk").as("mn")).filter(col("n") =!= 3 || col("mx") =!= 3 || col("mn") =!= 1)
      .count() == 0)
    val lagged = o.withColumn("prev", lag("dist2", 1).over(
      org.apache.spark.sql.expressions.Window.partitionBy("label").orderBy("rnk")))
    assert(lagged.filter(col("prev").isNotNull && col("prev") < col("dist2")).count() == 0)
    assert(o.filter(col("dist2") < 0).count() == 0)
    o.unpersist()
  }

  test("x111: a planted far vector surfaces at rank 1 with a far count") {
    import spark.implicits._
    val base = (1L to 20L).map(i => (i, 0, Array.fill(4)(0.1f + 0.001f * i)))
    val planted = (21L, 0, Array(0.9f, -0.9f, 0.9f, -0.9f))
    val emb = (base :+ planted).toDF("vec_id", "label", "embedding")
    val o = Similarity.embeddingOutliersOf(emb, k = 1)
    val top = o.head()
    assert(top.getAs[Long]("vec_id") == 21L)
    assert(top.getAs[Long]("n_far") >= 1L)
  }

  test("x112: centroid confusion emits every unordered pair, cos in [-1,1]") {
    val c = Similarity.labelCentroidConfusion(spark, sfDir).persist()
    val nLabels = Tables.widen(Tables.embeddings(spark, sfDir))
      .select("label").distinct().count()
    assert(c.count() == nLabels * (nLabels - 1) / 2)
    assert(c.filter(col("label_a") >= col("label_b")).count() == 0)
    assert(c.filter(col("cos_centroid") < -1.0 || col("cos_centroid") > 1.0).count() == 0)
    c.unpersist()
  }

  test("x112: identical-centroid labels report cosine exactly 1") {
    import spark.implicits._
    // two labels with the SAME vector set -> same milli-sum vector; a
    // third orthogonal-ish label must not reach cos 1 with either
    val a = (1L to 5L).map(i => (i, 0, Array(0.2f, 0.1f, 0.3f, 0.05f)))
    val b = (6L to 10L).map(i => (i, 1, Array(0.2f, 0.1f, 0.3f, 0.05f)))
    val z = (11L to 15L).map(i => (i, 2, Array(-0.3f, 0.2f, -0.1f, 0.4f)))
    val c = Similarity.labelCentroidConfusionOf((a ++ b ++ z).toDF("vec_id", "label", "embedding"))
      .persist()
    // sqrt(q)*sqrt(q) can differ from q by 1 ulp, so "exactly 1" is an
    // ulp-tolerance check, not ==
    val r01 = c.filter(col("label_a") === 0 && col("label_b") === 1).head()
    assert(math.abs(r01.getAs[Double]("cos_centroid") - 1.0) < 1e-12)
    assert(c.filter(abs(col("cos_centroid") - 1.0) < 1e-12).count() == 1,
      "only the identical pair reaches cos ~ 1")
    c.unpersist()
  }

  test("x113: calibration bins partition the corpus with bounded rates") {
    val c = TextStats.classifierCalibration(spark, sfDir).persist()
    assert(c.agg(sum("n_docs")).head().getLong(0) == nDocs)
    assert(c.filter(col("n_good") > col("n_docs")).count() == 0)
    assert(c.filter(col("good_ppm") < 0 || col("good_ppm") > 1000000).count() == 0)
    // total goods tie to the x8 gate the bins are scored against
    val goods = TextStats.qualityScore(spark, sfDir)
      .filter(col("quality_score") >= 0.6).count()
    assert(c.agg(sum("n_good")).head().getLong(0) == goods)
    c.unpersist()
  }

  test("x114: agreement per-label query counts tie to the x102 eval table") {
    val a = Similarity.knnLabelAgreement(spark, sfDir).persist()
    assert(a.filter(col("n_correct") > col("n_queries")).count() == 0)
    assert(a.filter(col("acc_ppm") < 0 || col("acc_ppm") > 1000000).count() == 0)
    // both ride the same KNN graph, so per-label query counts must agree
    val evalCounts = Similarity.annQualityEval(spark, sfDir)
      .groupBy("label").agg(count(lit(1)).as("n_eval"))
    assert(a.join(evalCounts, Seq("label"), "full")
      .filter(col("n_queries").isNull || col("n_eval").isNull ||
        col("n_queries") =!= col("n_eval")).count() == 0)
    a.unpersist()
  }

  test("x115: distortion buckets are coherent and cover every live chain pair") {
    val a = Similarity.jlDistortionAudit(spark, sfDir).persist()
    // ppm bounds sit inside their decile bucket
    assert(a.filter(col("min_ppm") < col("ratio_decile") * 100000L ||
      col("max_ppm") >= (col("ratio_decile") + 1) * 100000L ||
      col("min_ppm") > col("max_ppm")).count() == 0)
    // every (i, i+1) chain pair with a nonzero original distance is audited
    val ids = Tables.widen(Tables.embeddings(spark, sfDir)).select("vec_id")
    val nChain = ids.as("a").join(ids.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id")).count()
    assert(a.agg(sum("n_pairs")).head().getLong(0) == nChain,
      "no identical chain vectors in this fixture, so all pairs survive the d2>0 guard")
    a.unpersist()
  }

  test("x115: identical vectors produce no auditable pairs") {
    import spark.implicits._
    val emb = (1L to 6L).map(i => (i, Array(0.25f, -0.5f, 0.125f, 0.75f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.jlDistortionAuditOf(emb, kOut = 4).count() == 0)
  }

  test("x116: fertility partitions the corpus and token totals tie to x9") {
    val f = TextStats.tokenizerFertility(spark, sfDir).persist()
    assert(f.agg(sum("n_docs")).head().getLong(0) == nDocs)
    assert(f.filter(col("bpe_per_ws_ppm") <= 0 || col("chars_per_bpe_ppm") <= 0)
      .count() == 0)
    val x9 = TextStats.tokenCount(spark, sfDir)
      .agg(sum("n_tokens_ws"), sum("n_tokens_bpe")).head()
    val tot = f.agg(sum("n_ws_tokens"), sum("n_bpe_tokens")).head()
    assert(tot.getLong(0) == x9.getLong(0) && tot.getLong(1) == x9.getLong(1))
    f.unpersist()
  }

  test("x117: shuffle audit covers every shard; observed tracks expected") {
    val q = Curation.shuffleQualityAudit(spark, sfDir).persist()
    assert(q.count() == 8)
    assert(q.agg(sum("n_docs")).head().getLong(0) == nDocs)
    // a shard of n docs has exactly n-1 adjacent pairs
    assert(q.filter(col("n_adjacent") =!= col("n_docs") - 1).count() == 0)
    assert(q.filter(col("n_same") > col("n_adjacent")).count() == 0)
    assert(q.filter(col("same_ppm") < 0 || col("same_ppm") > 1000000 ||
      col("expected_same_ppm") < 0 || col("expected_same_ppm") > 1000000).count() == 0)
    // md5 order is a credible permutation: observed within 3x of expected
    // on every shard (few-source fixture, expected ~ 1/#sources)
    assert(q.filter(col("same_ppm") > col("expected_same_ppm") * 3 + 100000).count() == 0,
      "a shard shows a same-source run far above the random-permutation rate")
    q.unpersist()
  }

  test("x118: disagreement cells partition the corpus and tie to x59's keeps") {
    val m = TextStats.filterDisagreement(spark, sfDir).persist()
    assert(m.agg(sum("n_docs")).head().getLong(0) == nDocs)
    assert(m.filter(col("share_ppm") < 0 || col("share_ppm") > 1000000).count() == 0)
    // unanimous flag is exactly the all-equal predicate
    assert(m.filter((col("v_q") === col("v_lm") && col("v_lm") === col("v_clf"))
      .cast("int") =!= col("unanimous")).count() == 0)
    // majority-keep mass re-aggregates to the x59 verdicts
    val kept = m.filter(col("v_q") + col("v_lm") + col("v_clf") >= 2)
      .agg(sum("n_docs")).head().getLong(0)
    val x59 = TextStats.filterEnsemble(spark, sfDir)
      .filter(col("verdict") === "keep").count()
    assert(kept == x59)
    m.unpersist()
  }

  test("x119: reciprocity covers rank 1..5 and edge counts tie to the graph") {
    val r = Similarity.knnReciprocity(spark, sfDir).persist()
    assert(r.select("rank").collect().map(_.getInt(0)).sorted.sameElements(1 to 5))
    assert(r.filter(col("n_mutual") > col("n_edges")).count() == 0)
    assert(r.filter(col("mutual_ppm") < 0 || col("mutual_ppm") > 1000000).count() == 0)
    val g = Similarity.knnGraphArtifact(spark, sfDir)
    assert(r.agg(sum("n_edges")).head().getLong(0) == g.count())
    // rank r can only exist for vectors that also have rank r-1
    val byRank = r.orderBy("rank").collect().map(_.getAs[Long]("n_edges"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    r.unpersist()
  }

  test("x120: top prefixes are ranked, bounded, and share-coherent") {
    val p = TextStats.templatePrefixes(spark, sfDir).persist()
    val nSources = Tables.documents(spark, sfDir).select("source").distinct().count()
    // <= 3 per source, ranks dense from 1, counts non-increasing in rank
    val g = p.groupBy("source").agg(count(lit(1)).as("n"), min("rnk").as("mn"),
      max("rnk").as("mx"))
    assert(g.count() == nSources)
    assert(g.filter(col("n") > 3 || col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    val lagged = p.withColumn("prev", lag("n_docs", 1).over(
      org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("rnk")))
    assert(lagged.filter(col("prev").isNotNull && col("prev") < col("n_docs")).count() == 0)
    assert(p.filter(col("share_ppm") < 0 || col("share_ppm") > 1000000).count() == 0)
    p.unpersist()
  }

  test("x117: a single-source assignment reports observed == expected == 1") {
    import spark.implicits._
    val assign = (1 to 40).map(i => (i % 4, i / 4 + 1, "web"))
      .toDF("shard", "pos", "source")
    val q = Curation.shuffleQualityAuditOf(assign).persist()
    assert(q.filter(col("same_ppm") =!= 1000000L ||
      col("expected_same_ppm") =!= 1000000L).count() == 0)
    // and a perfectly alternating two-source shard reports observed 0
    val alt = (1 to 20).map(i => (0, i, if (i % 2 == 0) "a" else "b"))
      .toDF("shard", "pos", "source")
    val q2 = Curation.shuffleQualityAuditOf(alt)
    assert(q2.head().getAs[Long]("same_ppm") == 0L)
    q.unpersist()
  }

  test("x120: a planted shared opening dominates its source at rank 1") {
    import spark.implicits._
    val tpl = "terms of service apply to this web page"
    val a = (1L to 5L).map(i => (i, "siteA", s"$tpl unique tail $i"))
    val b = (6L to 9L).map(i => (i, "siteA", s"organic doc $i body text here now ok"))
    val docs = (a ++ b).toDF("doc_id", "source", "text")
    val top = TextStats.templatePrefixesOf(docs)
      .filter(col("source") === "siteA" && col("rnk") === 1).head()
    assert(top.getAs[String]("prefix") == tpl)
    assert(top.getAs[Long]("n_docs") == 5L)
    assert(top.getAs[Long]("share_ppm") == 5000000L / 9L)
  }

  test("x121: robustness buckets cover every verified pair with sane rates") {
    val r = DocDedup.normalizationRobustness(spark, sfDir).persist()
    assert(r.agg(sum("n_pairs")).head().getLong(0) ==
      DocDedup.pairArtifact(spark, sfDir).count())
    assert(r.filter(col("n_still_dup") > col("n_pairs")).count() == 0)
    assert(r.filter(col("mean_jclean") < 0 || col("mean_jclean") > 1).count() == 0)
    assert(r.filter(col("raw_bucket") < 5 || col("raw_bucket") > 10).count() == 0,
      "verified pairs start at jaccard >= 0.5")
    r.unpersist()
  }

  test("x122: append queries only new vectors against only old neighbors") {
    val a = Similarity.knnIncrementalAppend(spark, sfDir).persist()
    val coin = Tables.widen(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"),
        (conv(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 2),
          16, 10).cast("int") < 26).as("is_new"))
    val joined = a.join(coin, "vec_id")
    assert(joined.filter(!col("is_new")).count() == 0, "queries are new vectors")
    val nbr = a.select(col("neighbor_id").as("vec_id")).distinct().join(coin, "vec_id")
    assert(nbr.filter(col("is_new")).count() == 0, "neighbors are old vectors")
    // ranks dense from 1, sim within bounds and non-increasing per query
    assert(a.groupBy("vec_id").agg(count(lit(1)).as("n"), max("rank").as("mx"),
      min("rank").as("mn")).filter(col("mx") =!= col("n") || col("mn") =!= 1)
      .count() == 0)
    val lagged = a.withColumn("prev", lag("sim", 1).over(
      org.apache.spark.sql.expressions.Window.partitionBy("vec_id").orderBy("rank")))
    assert(lagged.filter(col("prev").isNotNull && col("prev") < col("sim")).count() == 0)
    assert(a.filter(col("sim") < -1.0000001 || col("sim") > 1.0000001).count() == 0)
    a.unpersist()
  }

  test("x123: release diff reconciles deltas with the x122 new batch") {
    val d = Curation.releaseDiff(spark, sfDir).persist()
    assert(d.count() == 8)
    assert(d.agg(sum("n_docs_curr")).head().getLong(0) == nDocs)
    // the total doc delta is exactly the x122 new-batch size
    val newCount = Tables.documents(spark, sfDir)
      .filter(conv(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 2), 16, 10).cast("int") < 26).count()
    assert(d.agg(sum("doc_delta")).head().getLong(0) == newCount)
    // an appended shard's digest must move; deltas are non-negative
    assert(d.filter(col("doc_delta") < 0 || col("token_delta") < 0).count() == 0)
    assert(d.filter(col("doc_delta") > 0 && col("changed") === 0).count() == 0)
    d.unpersist()
  }

  test("x123: identical snapshots diff to zero deltas and unchanged digests") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, s"doc $i body words here", 20L))
      .toDF("doc_id", "text", "n_chars")
    val m = Curation.shardManifestOf(docs, 4)
    val self = m.as("a").join(m.as("b"), "shard")
      .filter(col("a.content_digest") =!= col("b.content_digest") ||
        col("a.n_docs") =!= col("b.n_docs"))
    assert(self.count() == 0)
  }

  test("x124: token ledger is monotone per source and re-aggregates to x65") {
    val t = Curation.tokenFunnel(spark, sfDir).persist()
    assert(t.filter(col("stage") === 0).agg(sum("n_docs")).head().getLong(0) == nDocs)
    assert(t.filter(col("stage") === 0 && col("tokens_kept_ppm") =!= 1000000L)
      .count() == 0)
    // docs and tokens never grow along the cascade
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("stage")
    val lagged = t.withColumn("pd", lag("n_docs", 1).over(w))
      .withColumn("pt", lag("n_tokens", 1).over(w))
    assert(lagged.filter(col("pd").isNotNull &&
      (col("pd") < col("n_docs") || col("pt") < col("n_tokens"))).count() == 0)
    // summing sources per stage reproduces the x65 doc funnel exactly
    val mine = t.groupBy("stage").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    Curation.filterFunnel(spark, sfDir).collect().foreach { r =>
      assert(mine(r.getAs[Int]("stage")) == r.getAs[Long]("n_out"))
    }
    t.unpersist()
  }

  test("x100: survivorship totals reconcile with the applied dedup (x30)") {
    val r = DocDedup.dedupSurvivorship(spark, sfDir).persist()
    assert(r.filter(col("n_survivors") > col("n_docs")).count() == 0)
    assert(r.filter(col("tokens_after") > col("tokens_before")).count() == 0)
    val survivors = r.agg(sum("n_survivors")).head().getLong(0)
    assert(survivors == DocDedup.dedupApply(spark, sfDir).count())
    assert(r.agg(sum("n_docs")).head().getLong(0) == nDocs)
    r.unpersist()
  }
}

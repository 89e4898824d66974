package graft.llm

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation stages for a large-scale training-data pipeline, over
  * the `documents` table: benchmark decontamination (n-gram overlap with a
  * held-out eval set), source mixture weights (temperature sampling),
  * deterministic global shuffle + sharding, and text cleaning.
  *
  * Scale design: every stage is a single scan plus at most one shuffle on
  * short keys. Decontamination joins the corpus's shingle hashes against a
  * broadcast eval-set hash set — eval benchmarks are MBs even when the
  * corpus is 100 TB, so the build side always fits in a broadcast.
  */
object Curation {

  /** Documents scan widened to cores when the file layout is narrow (see
    * Tables.widen): the per-row hashing below is CPU-bound, so a
    * single-file local scan must not pin the stage to one task. At lake
    * scale the scan is already wide and no exchange is planned at all. */
  private def docsWide(spark: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(spark, dir))

  /** md5-derived 60-bit non-negative long: the cross-engine hash used by
    * every oracle-checked curation stage (DuckDB mirror:
    * `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`).
    * private[llm]: ONE definition of the coin contract — Clustering's
    * x126 draw shares it rather than redefining it. */
  private[llm] def md5Long(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Per-doc DISTINCT shingle hashes (3-token shingles, DocDedup's
    * construction). The distinct collapses repeated shingles map-side
    * before anything downstream shuffles. */
  private def shingleHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(DocDedup.shingles(DocDedup.tokensCol)).as("s"))
      .select(col("doc_id"), md5Long(col("s")).as("h"))
      .distinct()

  /** x31: benchmark decontamination — the standard pre-training hygiene
    * step (n-gram collision against the eval suite; reference pipelines
    * drop or flag any training doc sharing a large shingle fraction with a
    * benchmark). Here the deterministic eval split is `doc_id % mod == 0`;
    * a corpus doc is contaminated when >= tauNum/tauDen of its distinct
    * 3-token shingles appear anywhere in the eval set.
    *
    * The threshold compare is pure integer arithmetic
    * (`n_hits * tauDen >= n_shingles * tauNum`) so the oracle hashes
    * bit-identically — no float ratio crosses the engine boundary.
    *
    * 100 TB: eval shingle hashes broadcast (tiny); the corpus side is one
    * scan + per-doc distinct + map-side-combinable count aggregate. */
  def decontaminate(spark: SparkSession, dir: String, mod: Int = 17,
      tauNum: Int = 1, tauDen: Int = 5): DataFrame = {
    val docs = docsWide(spark, dir)
    val bench = shingleHashes(docs.filter(col("doc_id") % mod === 0))
      .select("h").distinct().withColumn("bh", lit(1))
    shingleHashes(docs.filter(col("doc_id") % mod =!= 0))
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("bh")).as("n_hits"))
      .withColumn("contaminated",
        (col("n_hits") * tauDen >= col("n_shingles") * tauNum).cast("int"))
      .orderBy("doc_id")
  }

  /** The x31 verdicts as a materialize-once artifact (Tables.materializeOnce):
    * both downstream consumers (x38 training set, x65 funnel) re-ran the
    * whole decontamination pipeline per query; a refresh computes the
    * verdicts once and persists them, and consumers read the table. The
    * x31 gate itself still exercises the live pipeline. */
  def decontaminationVerdicts(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.materializeOnce(spark, s"decontam:$dir")(decontaminate(spark, dir))

  /** x60: contamination ATTRIBUTION — x31 answers "is this training doc
    * contaminated?"; this answers "by WHICH eval document?" (the report a
    * curation team actually reads: which benchmark leaked into the
    * corpus). For every train doc sharing >= 1 distinct 3-token shingle
    * with the eval split, emit the top-colliding eval doc (most shared
    * shingles; ties broken by smallest eval id), the shared count, and
    * the doc's contaminated-shingle fraction.
    *
    * The per-train-doc argmax is `max(struct(shared, -eval_id))` — a
    * map-side-combinable aggregate, not a window: tasks reduce each
    * train doc to one candidate before the shuffle, so the exchange
    * carries one row per (train doc, partial) instead of one per
    * colliding (train, eval) pair.
    *
    * 100 TB: eval (shingle hash, eval id) pairs broadcast — eval suites
    * are MBs; the corpus side is one scan + per-doc distinct + two
    * partial-aggregated reductions. Nothing shuffles full text. */
  def contaminationReport(spark: SparkSession, dir: String, mod: Int = 17): DataFrame = {
    val docs = docsWide(spark, dir)
    val bench = shingleHashes(docs.filter(col("doc_id") % mod === 0))
      .select(col("h"), col("doc_id").as("eval_id"))
    // barrier: the corpus shingle pass feeds both the collision join and
    // the per-doc shingle count — compute the (doc_id, h) set once
    val corpus = shingleHashes(docs.filter(col("doc_id") % mod =!= 0))
      .localCheckpoint(eager = false)
    val nsh = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    corpus.join(broadcast(bench), Seq("h"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .groupBy("doc_id")
      .agg(max(struct(col("shared").as("sh"), (-col("eval_id")).as("ne"))).as("m"),
        sum(col("shared")).as("total_collisions"))
      .select(col("doc_id"), (-col("m.ne")).as("top_eval_id"),
        col("m.sh").as("shared_shingles"), col("total_collisions"))
      .join(nsh, Seq("doc_id"))
      .withColumn("share",
        col("shared_shingles").cast("double") / col("n_shingles").cast("double"))
      .select("doc_id", "top_eval_id", "shared_shingles", "total_collisions",
        "n_shingles", "share")
      .orderBy("doc_id")
  }

  /** x62: EXACT-SUBSTRING decontamination — the complement of x31's
    * n-gram-overlap test: flag training docs that contain an eval
    * document VERBATIM (quoted benchmark items, wholesale inclusion —
    * the PaLM-style exact-match tier of a decontamination suite).
    *
    * The naive form is contains(train, eval) for every (train, eval)
    * pair — a nested-loop scan. Instead, candidates come from an ANCHOR
    * equi-join: a verbatim inclusion must contain the eval doc's first
    * `k`-token shingle as a contiguous token run, so hashing every train
    * `k`-shingle and equi-joining against the (broadcast) eval anchor
    * hashes yields a tiny candidate set; `contains()` then verifies the
    * full inclusion on candidates only — the LSH generate-then-verify
    * shape, applied to substring matching. Eval items shorter than the
    * `k`-token anchor are OUTSIDE this operator's contract (a shorter
    * anchor can never match a train-side k-shingle) — degenerate short
    * benchmark items are the n-gram tier's job (x31, whole-text-shingle
    * fallback), not the verbatim tier's.
    *
    * 100 TB: eval anchors broadcast (eval suites are MBs); the train side
    * is one scan + explode to short shingle hashes; full texts meet only
    * per candidate pair. */
  def substringDecontaminate(spark: SparkSession, dir: String, mod: Int = 17,
      k: Int = 8): DataFrame = {
    val docs = docsWide(spark, dir)
    substringDecontaminateDocs(
      docs.filter(col("doc_id") % mod =!= 0),
      docs.filter(col("doc_id") % mod === 0), k)
  }

  /** Library form of x62 over arbitrary (doc_id, text) train/eval frames
    * (specs plant verbatim-inclusion fixtures through this). */
  def substringDecontaminateDocs(train: DataFrame, eval: DataFrame,
      k: Int = 8): DataFrame = {
    val toks = DocDedup.tokensCol
    val n = size(toks)
    val kShingles = when(n >= k,
        transform(sequence(lit(0), n - k), i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
    val anchor = concat_ws(" ", slice(toks, lit(1), lit(k)))
    val ev = eval.filter(n >= k)
      .select(col("doc_id").as("eval_id"), col("text").as("etext"),
        md5Long(anchor).as("h"))
    val trainSh = train
      .select(col("doc_id"), explode(kShingles).as("s"))
      .select(col("doc_id"), md5Long(col("s")).as("h"))
      .distinct()
    val cand = trainSh
      .join(broadcast(ev.select("h", "eval_id")), Seq("h"))
      .select("doc_id", "eval_id").distinct()
    cand
      .join(train.select(col("doc_id"), col("text")), Seq("doc_id"))
      .join(broadcast(ev.select("eval_id", "etext")), Seq("eval_id"))
      .filter(col("text").contains(col("etext")))
      .select(col("doc_id"), col("eval_id"),
        length(col("etext")).as("eval_chars"))
      .orderBy("doc_id", "eval_id")
  }

  /** x62b: MID-DOCUMENT exact-substring decontamination — generalizes x62
    * from "train doc contains the WHOLE eval doc verbatim" to "train doc
    * shares ANY verbatim token span of >= minSpan tokens with an eval doc"
    * (the exact-substring tier described in Lee et al., "Deduplicating
    * Training Data Makes Language Models Better"). x62's single
    * first-shingle anchor misses a training doc that embeds an eval doc
    * whose first line was paraphrased; x62b anchors on EVERY k-shingle of
    * every eval doc, so a qualifying overlap is found no matter where it
    * sits in either document.
    *
    * Method: hash k-shingles of both sides WITH POSITIONS; equi-join train
    * shingles against the broadcast eval shingles; a verbatim common span
    * of L tokens shows up as (L - k + 1) consecutive matches on one
    * DIAGONAL (tpos - epos constant), and the gaps-and-islands trick
    * (epos - row_number() per diagonal) measures the longest run with one
    * window + one aggregate — no self-join, no quadratic extend step.
    *
    * 100 TB: eval (hash, pos) pairs broadcast (eval suites are MBs); the
    * train side is one scan + explode to short (hash, pos) rows; the
    * run-length stages group by (train doc, eval doc, diagonal) — rows
    * exist only where shingles actually collide, so the shuffle carries
    * the match set, not the corpus. */
  def substringSpans(spark: SparkSession, dir: String, mod: Int = 17,
      k: Int = 8, minSpan: Int = 16): DataFrame = {
    val docs = docsWide(spark, dir)
    substringSpansDocs(
      docs.filter(col("doc_id") % mod =!= 0),
      docs.filter(col("doc_id") % mod === 0), k, minSpan)
  }

  /** Library form of x62b over arbitrary (doc_id, text) train/eval frames.
    * Emits (doc_id, eval_id, span_tokens = longest shared verbatim token
    * run) for every pair whose longest run reaches `minSpan` tokens. Docs
    * shorter than `k` tokens are outside the contract on both sides (they
    * cannot carry a k-shingle; spans below k are the n-gram tier's job). */
  def substringSpansDocs(train: DataFrame, eval: DataFrame,
      k: Int = 8, minSpan: Int = 16): DataFrame = {
    val toks = DocDedup.tokensCol
    val n = size(toks)
    // positioned k-shingles: 1-based start position + 60-bit md5 hash
    def posShingles(df: DataFrame, id: String, pos: String): DataFrame = df
      .filter(n >= k)
      .select(col("doc_id").as(id),
        posexplode(transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .select(col(id), (col("pos") + 1).as(pos), md5Long(col("col")).as("h"))
    val ev = posShingles(eval, "eval_id", "epos")
    val tr = posShingles(train, "doc_id", "tpos")
    // (doc, eval, tpos, epos) is unique by construction, and diag is a
    // function of (tpos, epos) — no distinct needed before the window
    val matches = tr.join(broadcast(ev), Seq("h"))
      .select(col("doc_id"), col("eval_id"), col("epos"),
        (col("tpos") - col("epos")).as("diag"))
    matches
      .withColumn("grp", col("epos") - row_number().over(
        Window.partitionBy("doc_id", "eval_id", "diag").orderBy("epos")))
      .groupBy("doc_id", "eval_id", "diag", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("doc_id", "eval_id")
      .agg((max(col("len")) + (k - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .orderBy("doc_id", "eval_id")
  }

  /** x74: per-document LONGEST-DUPLICATED-SUBSTRING profile — the
    * memorization-risk metric of Lee et al. ("Deduplicating Training Data
    * Makes Language Models Better"): for every document, the length in
    * tokens of its longest verbatim span that ALSO appears in some other
    * document, plus how many of its shingle positions are cross-doc
    * duplicated. x62b answers this against an eval suite; x74 answers it
    * against the corpus itself — the number that decides whether a doc
    * feeds span-level dedup (x39), whole-doc removal (x30), or passes.
    *
    * Method: positioned k-shingle hashes (one corpus scan, checkpointed);
    * a shingle is DUPLICATED iff it occurs in ≥ 2 distinct docs
    * (within-doc self-repetition is x28's metric, deliberately excluded);
    * per doc, the duplicated positions form runs — gaps-and-islands (pos
    * − row_number) measures the longest in one window + one aggregate. A
    * run of L consecutive duplicated positions certifies a shared span of
    * ≥ L + k − 1 tokens ONLY if the positions match the same partner
    * diagonally — this per-doc profile is the cheap upper-bound form
    * (exact for the dominant case, one shared block); the pairwise-exact
    * diagonal form is x62b's machinery pointed at (corpus, corpus).
    *
    * 100 TB: the dup-hash set comes from a two-level hash agg on the
    * 60-bit shingle hash (map-side partial distinct); the join back is a
    * short-key equi-join carrying only genuinely-duplicated positions;
    * the window partitions by doc_id — per-doc-sized groups, never
    * corpus-sized. Everything is linear in shingle count. */
  def dupSpanProfile(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    dupSpanProfileDocs(docsWide(spark, dir), k)

  /** Library form of x74 over an arbitrary (doc_id, text) frame. */
  def dupSpanProfileDocs(docs: DataFrame, k: Int = 8): DataFrame = {
    val toks = DocDedup.tokensCol
    val n = size(toks)
    val sh = docs.filter(n >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .select(col("doc_id"), (col("pos") + 1).as("p"), md5Long(col("col")).as("h"))
      .localCheckpoint(false) // feeds both the dup-hash agg and the join
    val dup = sh.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    val runs = sh.join(dup, Seq("h"))
      .withColumn("grp", col("p") - row_number().over(
        Window.partitionBy("doc_id").orderBy("p")))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("doc_id")
      .agg((max(col("len")) + (k - 1)).as("max_dup_tokens"),
        sum(col("len")).as("dup_positions"))
    docs.select("doc_id").join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("max_dup_tokens"), lit(0L)).as("max_dup_tokens"),
        coalesce(col("dup_positions"), lit(0L)).as("dup_positions"))
      .orderBy("doc_id")
  }

  /** x63: GLOBAL TOKEN-BUDGET selection — "keep the best docs until the
    * budget is spent", the final sizing step of a curated training set
    * (every data team runs some form of it: rank by quality, take the
    * prefix that fits the compute budget). Naively this is a global sort
    * by quality + running prefix sum — a single-partition killer at
    * corpus scale. Scale-safe form (the x36 histogram trick, token-
    * weighted): quantize quality to an exact integer (qi =
    * floor(score·1e6) — the score doubles are bit-identical cross-engine,
    * so the quantization is too), aggregate token counts per qi (a TINY
    * frame: #distinct quality values), take the descending cumulative sum
    * there, and keep whole buckets while they fit. Only the single
    * BOUNDARY bucket — where the budget runs out — needs per-doc
    * resolution: an ordered (doc_id) running sum over just that bucket's
    * docs, kept while it fits. Quantization granularity is the knob that
    * bounds the boundary bucket; ties at the cutoff resolve by doc_id, so
    * the selection is deterministic and append-stable.
    *
    * 100 TB: one corpus scan → per-qi hash-agg (map-side combined); the
    * global window runs over the qi histogram, not the corpus; the
    * boundary refinement window touches one bucket's docs. */
  def tokenBudget(spark: SparkSession, dir: String,
      budgetTokens: Long = 5000L): DataFrame = {
    val t = split(col("text"), " ")
    val nTok = size(t)
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio =
      TextStats.langScore(Seq(" the ", " a ", " of ", " and ")).cast("double") / nTok
    tokenBudgetOf(docsWide(spark, dir)
      .select(col("doc_id"), nTok.cast("long").as("n_tokens"),
        floor(TextStats.qualityExpr(nTok, avgTokLen, stopRatio) * 1e6).cast("long").as("qi")),
      budgetTokens)
  }

  /** x63's greedy quality-descending selection over ANY (doc_id,
    * n_tokens, qi) frame — x125 applies it to the cascade survivors. */
  def tokenBudgetOf(perDocIn: DataFrame, budgetTokens: Long): DataFrame = {
    val perDoc = perDocIn.localCheckpoint(eager = false)
    val hist = perDoc.groupBy("qi").agg(sum("n_tokens").as("btoks"))
    val marks = hist
      .withColumn("cum_incl", sum("btoks").over(
        Window.orderBy(desc("qi")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_excl", col("cum_incl") - col("btoks"))
    val fullBuckets = marks.filter(col("cum_incl") <= budgetTokens).select("qi")
    val boundary = marks
      .filter(col("cum_excl") < budgetTokens && col("cum_incl") > budgetTokens)
      .select(col("qi").as("bqi"), (lit(budgetTokens) - col("cum_excl")).as("remaining"))
    val keptFull = perDoc.join(broadcast(fullBuckets), Seq("qi"), "left_semi")
    val keptBoundary = perDoc
      .join(broadcast(boundary), col("qi") === col("bqi"))
      .withColumn("run", sum("n_tokens").over(
        Window.partitionBy("qi").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("run") <= col("remaining"))
    keptFull.select("doc_id", "n_tokens", "qi")
      .unionByName(keptBoundary.select("doc_id", "n_tokens", "qi"))
      .orderBy("doc_id")
  }

  /** x32: source mixture weights — temperature sampling over sources with
    * alpha = 0.5 (weight_i proportional to sqrt(n_i), the multilingual /
    * multi-corpus rebalancing rule). `sqrt_scaled = floor(sqrt(n_docs)*1e6)`
    * quantizes the only float to an exact integer BEFORE the cross-row sum,
    * so the normalizing total is association-order-independent and the
    * final weight is one double division of two exact longs — bit-identical
    * in any engine.
    *
    * 100 TB: one map-side-combined aggregate to #sources rows; the global
    * window runs on that tiny result, not the corpus. */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("sqrt_scaled",
        floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
    perSource
      .withColumn("weight",
        col("sqrt_scaled").cast("double") /
          sum("sqrt_scaled").over(Window.partitionBy()).cast("double"))
      .select("source", "n_docs", "n_tokens", "sqrt_scaled", "weight")
      .orderBy("source")
  }

  /** x33: deterministic global shuffle + sharding — the "shuffle the
    * corpus before training" step, made reproducible: order key =
    * md5(doc_id), shard = key mod `shards`, pos = rank within shard. Any
    * engine (or a re-run after appends to OTHER shards) reproduces the
    * same placement.
    *
    * 100 TB: one hash shuffle on `shard` + an in-partition sort — exactly
    * the write pattern of a sharded training-data export
    * (`repartition(shard).sortWithinPartitions(h)`). */
  def shuffleShards(spark: SparkSession, dir: String, shards: Int = 8): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5Long(col("doc_id").cast("string")).as("h"))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))))
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")

  /** x117: SHUFFLE-QUALITY AUDIT — does the x33 global shuffle actually
    * MIX the sources? Per shard: the adjacent-document same-source rate
    * against the rate a perfectly random permutation of that shard's own
    * composition would produce (Σ n_s(n_s−1) / N(N−1)). Poorly shuffled
    * training data is the classic silent loss-spike cause — long
    * same-source runs make consecutive batches correlated — and this
    * table is the pre-flight check that the md5 ordering really behaves
    * like a permutation: observed ≈ expected, with a big gap flagging
    * either a broken shuffle key or a source whose ids cluster under the
    * hash.
    *
    * Exactness: both rates are integer-ppm floor-divs of exact long
    * counts; "adjacent" is defined by x33's deterministic (shard, pos)
    * order, so the table is reproducible at any partitioning.
    *
    * Scale: the adjacency self-join keys on (shard, pos)/(shard, pos+1)
    * — a co-partitioned equi-join over one short row per document; the
    * composition aggregate is (shard, source)-keyed. Nothing wider than
    * (shard, two longs) shuffles. */
  def shuffleQualityAudit(spark: SparkSession, dir: String,
      shards: Int = 8): DataFrame =
    shuffleQualityAuditOf(
      shuffleShards(spark, dir, shards)
        .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id"))

  /** The audit over an arbitrary (shard, pos, source) assignment frame —
    * any sharder whose output carries a within-shard order can be
    * audited with the same construction. */
  def shuffleQualityAuditOf(assignment: DataFrame): DataFrame = {
    val a = assignment.select("shard", "pos", "source")
    val adj = a.as("x")
      .join(a.as("y"),
        col("x.shard") === col("y.shard") && col("x.pos") + 1 === col("y.pos"))
      .groupBy(col("x.shard").as("shard"))
      .agg(count(lit(1)).as("n_adjacent"),
        sum(when(col("x.source") === col("y.source"), 1L).otherwise(0L)).as("n_same"))
    val comp = a.groupBy("shard", "source").agg(count(lit(1)).as("ns"))
      .groupBy("shard")
      .agg(sum("ns").as("n_docs"), sum(col("ns") * (col("ns") - 1)).as("coll_num"))
    comp.join(adj, "shard")
      .select(col("shard"), col("n_docs"), col("n_adjacent"), col("n_same"),
        expr("(n_same * 1000000L) div n_adjacent").as("same_ppm"),
        expr("(coll_num * 1000000L) div (n_docs * (n_docs - 1))").as("expected_same_ppm"))
      .orderBy("shard")
  }

  /** x81: SHARD MANIFEST — the publishing artifact of a dataset release
    * (every released corpus ships one: per shard, how many documents,
    * how many tokens, and a CONTENT CHECKSUM a consumer can re-verify
    * after download). Shards and within-shard order are x33's md5-keyed
    * assignment, so the manifest is reproducible from the corpus alone;
    * the checksum is md5 over the shard's per-document md5s concatenated
    * in shard order — the ordered-reassembly aggregate (collect_list of
    * (pos, md5) structs, array_sort, join), mirrored in the oracle by
    * `string_agg(... ORDER BY pos)`. A flipped byte in any document, a
    * dropped document, or a reordered shard all change the digest.
    *
    * 100 TB: one corpus scan projects (doc_id, md5, token count); the
    * manifest agg shuffles one short row per document to `shards`
    * groups; the digest concatenation is 32 bytes per doc WITHIN each
    * shard group — at real shard sizes (~1 GB data → ~100k docs → 3 MB
    * of hex per shard row) this is the same order as the shard listing
    * a release pipeline writes anyway. */
  def shardManifest(spark: SparkSession, dir: String, shards: Int = 8): DataFrame = {
    val assign = shuffleShards(spark, dir, shards)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("dmd5"),
        size(split(col("text"), " ")).cast("long").as("ntok"), col("n_chars"))
    assign.join(docs, Seq("doc_id"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntok").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("dmd5")))),
          s => s.getField("dmd5")), "").cast("binary")).as("content_digest"))
      .orderBy("shard")
  }

  /** The x81 manifest over an arbitrary (doc_id, text, n_chars) frame —
    * the release-engineering library form x123 diffs snapshots with. */
  def shardManifestOf(docs: DataFrame, shards: Int = 8): DataFrame = {
    val a = docs
      .select(col("doc_id"), col("text"), col("n_chars"),
        md5Long(col("doc_id").cast("string")).as("h"))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))))
    a.select(col("shard"), col("pos"), md5(col("text").cast("binary")).as("dmd5"),
        size(split(col("text"), " ")).cast("long").as("ntok"), col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntok").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("dmd5")))),
          s => s.getField("dmd5")), "").cast("binary")).as("content_digest"))
      .orderBy("shard")
  }

  /** x123: RELEASE DIFF — what changed between two dataset releases, at
    * the shard-manifest level a consumer actually verifies: "yesterday"
    * is the corpus minus the x122 new-batch coin (~90%), "today" is the
    * full corpus, and the table reports per shard the document/token
    * deltas and whether the content digest moved. This is the release
    * note a dataset publisher ships with every refresh — shards whose
    * digest is UNCHANGED need no re-download, and a digest change with a
    * zero doc delta flags an in-place edit rather than an append.
    *
    * Scale: two manifest aggregates over one corpus scan each (the same
    * bounded per-shard digest shape as x81); the diff itself is a
    * |shards|-row equi-join. In production the "prev" side is the stored
    * manifest table — one scan total. */
  def releaseDiff(spark: SparkSession, dir: String, shards: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "n_chars")
    val coin = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
      1, 2), 16, 10).cast("int")
    releaseDiffOf(docs, docs.filter(coin >= 26), shards)
  }

  /** Library form of x123 over two (doc_id, text, n_chars) snapshots. */
  def releaseDiffOf(currDocs: DataFrame, prevDocs: DataFrame,
      shards: Int = 8): DataFrame = {
    val prev = shardManifestOf(prevDocs, shards)
      .select(col("shard"), col("n_docs").as("n_docs_prev"),
        col("n_tokens").as("n_tokens_prev"), col("content_digest").as("digest_prev"))
    val curr = shardManifestOf(currDocs, shards)
      .select(col("shard"), col("n_docs").as("n_docs_curr"),
        col("n_tokens").as("n_tokens_curr"), col("content_digest").as("digest_curr"))
    // FULL OUTER join: a shard whose docs are ALL new has no prev row
    // (deltas from zero, changed=1), and a shard whose docs were ALL
    // REMOVED has no curr row (negative deltas, changed=1) — deletion is
    // exactly what a release note must surface, so neither side may drop
    curr.join(prev, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_docs_curr"), lit(0L)).as("n_docs_curr"),
        (coalesce(col("n_docs_curr"), lit(0L)) -
          coalesce(col("n_docs_prev"), lit(0L))).as("doc_delta"),
        (coalesce(col("n_tokens_curr"), lit(0L)) -
          coalesce(col("n_tokens_prev"), lit(0L))).as("token_delta"),
        (col("digest_prev").isNull || col("digest_curr").isNull ||
          col("digest_prev") =!= col("digest_curr")).cast("int").as("changed"))
      .orderBy("shard")
  }

  /** Shard count derived from corpus size — the `autoPlanes`/`autoMBits`
    * idiom applied to the release layout: shards = ⌈n_docs / target⌉,
    * integer-exact so the SQL oracle re-derives the identical value from
    * its own count(*). This is what keeps x81 scale-safe: with a FIXED
    * shard count, one manifest agg buffer holds 1/shards of the corpus's
    * digests (unbounded as the corpus grows); deriving the count pins the
    * per-shard digest concatenation at ~target × 32 hex bytes forever. */
  private[graft] def autoShards(nDocs: Long, targetDocsPerShard: Long = 64L): Int = {
    require(targetDocsPerShard > 0, "need a positive shard size target")
    math.max(1L, (nDocs + targetDocsPerShard - 1) / targetDocsPerShard).toInt
  }

  /** x81b: the production-form manifest — shard count derived from the
    * corpus (one metadata-cheap count(*)), everything else exactly x81.
    * The gate's oracle re-derives shards from ITS count(*), so the
    * size→layout decision is itself hash-checked, like x4e/x55's auto
    * dispatches. (target = 64 keeps the gate multi-shard from sf0.01 up;
    * a real release would target ~10⁵ docs/shard — same arithmetic.) */
  def shardManifestAuto(spark: SparkSession, dir: String,
      targetDocsPerShard: Long = 64L): DataFrame =
    shardManifest(spark, dir,
      autoShards(Tables.documents(spark, dir).count(), targetDocsPerShard))

  /** Stopword list for cleanText — standard English function words. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** x36: corpus length filter by exact global quantiles, computed the
    * scale-safe way: a value histogram (count per distinct n_chars) plus a
    * running sum over the TINY distinct-value table picks the
    * percentile_disc cutoffs without ever globally sorting the corpus —
    * the single-partition window runs on #distinct-lengths rows, not
    * documents. Keep = lo <= n_chars <= hi where lo/hi are the smallest
    * values whose cumulative count reaches loPct/hiPct of the total
    * (integer compare: cum*100 >= total*pct — no float quantile math to
    * diverge across engines). The one-row threshold frame attaches via a
    * broadcast nested-loop probe — with a single build row that is one
    * comparison per doc, the same legitimate shape as the range-bin
    * lookup (j8), and allowlisted the same way in PlanAuditSpec. */
  def lengthFilter(spark: SparkSession, dir: String,
      loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum("cnt").over(Window.orderBy("n_chars")))
      .withColumn("total", sum("cnt").over(Window.partitionBy()))
    val th = cum.agg(
      min(when(col("cum") * 100 >= col("total") * loPct, col("n_chars"))).as("lo"),
      min(when(col("cum") * 100 >= col("total") * hiPct, col("n_chars"))).as("hi"))
    docs.crossJoin(broadcast(th))
      .filter(col("n_chars").between(col("lo"), col("hi")))
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** Stream-safe decontamination: drop any doc sharing at least one
    * 3-token shingle with the static eval-set hash table. Unlike x31's
    * per-doc ratio (which needs an aggregate), this is a stateless row
    * filter — the eval hashes collapse to ONE array row that attaches via
    * a 1-row stream-static broadcast join (legal in Structured Streaming
    * append mode, no watermark/state), and the overlap test is a
    * codegen'd `arrays_overlap`. Works identically on a batch frame;
    * StreamingSpec asserts stream == batch. */
  def decontaminateAny(docs: DataFrame, benchHashes: DataFrame): DataFrame = {
    val benchArr = broadcast(
      benchHashes.agg(collect_set(col("h")).as("bench_hs")).withColumn("k", lit(1)))
    docs
      .withColumn("hs", transform(DocDedup.shingles(DocDedup.tokensCol), s => md5Long(s)))
      .withColumn("k", lit(1))
      .join(benchArr, Seq("k"))
      .filter(!arrays_overlap(col("hs"), col("bench_hs")))
      .drop("hs", "bench_hs", "k")
  }

  /** The eval-set shingle-hash table for `decontaminateAny` (batch side;
    * a real deployment persists this tiny table once per benchmark
    * release). */
  def benchShingleHashes(spark: SparkSession, dir: String, mod: Int = 17): DataFrame =
    shingleHashes(Tables.documents(spark, dir).filter(col("doc_id") % mod === 0))
      .select("h").distinct()

  /** x38: the capstone — the final training-set doc list, composing the
    * curation stages end to end: keep a doc iff it is (a) the canonical
    * copy of its exact-duplicate group (min doc_id per content hash),
    * (b) in the corpus split and NOT contaminated by the eval set (x31's
    * integer threshold), and (c) inside the exact p5–p95 length interval
    * (x36). Each stage is the oracle-checked operator above; this query
    * chains them the way a production pipeline would, so the gate checks
    * the COMPOSITION, not just the parts.
    *
    * 100 TB: three keep-lists (keeper ids, clean ids, length interval),
    * each shuffle-light by construction, intersected with semi-joins on
    * doc_id — the only corpus-width data movement is the id column. */
  def trainingSet(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val keepers = docs
      .groupBy(md5(col("text").cast("binary")).as("ch"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val clean = decontaminationVerdicts(spark, dir)
      .filter(col("contaminated") === 0)
      .select("doc_id")
    lengthFilter(spark, dir)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** x125: END-TO-END CURATION PIPELINE — the capstone gate that RUNS the
    * funnel the x65/x124 ledgers only report: length filter (x36) ∧
    * quality floor (x65's stage 4) ∧ near-dup apply (x30) ∧ shingle
    * decontamination (x31) ∧ frozen-split train tier (x82), then the x63
    * token budget over the SURVIVORS, x34 cleaning of the selected text,
    * and the x81 shard manifest of the final training set — the artifact
    * a dataset release actually ships. Every stage is the SAME library
    * call its standalone gate runs (no parallel re-implementation to
    * drift), and the DuckDB oracle is the composition of the standalone
    * oracles' CTEs, so the whole cascade is hash-checked end to end.
    *
    * Stage order note: filters compose by intersection (each semi-join
    * keys on doc_id), so their order is immaterial; the budget MUST run
    * after all filters (it allocates tokens among what survived) and the
    * manifest last. Cleaning happens after selection — x34 is a per-row
    * projection, so cleaning only the selected docs is the cheap order.
    *
    * Scale: each stage is its gate's audited plan (short-key semi-joins
    * against the corpus scan); the budget histogram runs over
    * #distinct-quality rows; the manifest is x81's bounded per-shard
    * digest. One corpus-sized frame flows through; nothing quadratic. */
  def curationPipeline(spark: SparkSession, dir: String,
      budgetTokens: Long = 12000L, shards: Int = 8): DataFrame = {
    val q = TextStats.qualityScore(spark, dir)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        floor(col("quality_score") * 1e6).cast("long").as("qi"),
        col("quality_score"))
    val survivors = q
      .join(lengthFilter(spark, dir).select("doc_id"), Seq("doc_id"), "left_semi")
      .filter(col("quality_score") >= 0.6)
      .join(graft.llm.DocDedup.dedupApply(spark, dir), Seq("doc_id"), "left_semi")
      .join(decontaminationVerdicts(spark, dir)
        .filter(col("contaminated") === 0).select("doc_id"), Seq("doc_id"), "left_semi")
      .join(graft.llm.DocDedup.frozenSplitGate(spark, dir)
        .filter(col("split") === "train").select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "n_tokens", "qi")
    val selected = tokenBudgetOf(survivors, budgetTokens).select("doc_id")
    val cleanedSel = cleanText(spark, dir)
      .join(selected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("clean_text").as("text"),
        length(col("clean_text")).cast("long").as("n_chars"))
    shardManifestOf(cleanedSel, shards)
  }

  /** x65: curation-funnel ATTRITION report — the observability artifact
    * every published curation pipeline ships (FineWeb/Dolma/RefinedWeb
    * report per-rule document attrition): the x38 cascade's rules applied
    * in a FIXED order, each stage reporting (n_in, n_dropped, n_out) over
    * the survivors of the previous stage, plus a final quality floor.
    * Stage semantics match `trainingSet` exactly (stage-3 survivors ARE
    * the x38 training set — spec-reconciled), so the funnel is the
    * explanation of the cascade, not a parallel implementation that can
    * drift. Thresholds (length percentiles) are computed over the FULL
    * corpus, as in x36 — a funnel explains a fixed ruleset, it does not
    * re-derive rules per stage.
    *
    * 100 TB: four keep-flags, each shuffle-light by construction (hash-agg
    * keeper ids, short-key decontamination join, broadcast length
    * thresholds, per-row quality arithmetic), left-joined on doc_id; the
    * report itself is ONE boolean aggregate over the flag frame (map-side
    * combined, 5 longs per task) fanned into four literal rows — the
    * per-stage counts cost no extra corpus passes. */
  def filterFunnel(spark: SparkSession, dir: String,
      minQuality: Double = 0.6): DataFrame = {
    val flags = funnelFlags(spark, dir, minQuality)
    // one aggregate row, checkpointed: it feeds four literal stage rows
    // and must not re-run the decontamination pipeline per stage
    val c = flags.agg(
      count(lit(1)).as("n0"),
      sum("f1").as("n1"),
      sum(col("f1") * col("f2")).as("n2"),
      sum(col("f1") * col("f2") * col("f3")).as("n3"),
      sum(col("f1") * col("f2") * col("f3") * col("f4")).as("n4"))
      .localCheckpoint(eager = false)
    Seq((1, "exact_dedup", "n0", "n1"), (2, "decontaminate", "n1", "n2"),
        (3, "length_interval", "n2", "n3"), (4, "quality_floor", "n3", "n4"))
      .map { case (i, rule, nIn, nOut) =>
        c.select(lit(i).as("stage"), lit(rule).as("rule"), col(nIn).as("n_in"),
          (col(nIn) - col(nOut)).as("n_dropped"), col(nOut).as("n_out"))
      }
      .reduce(_ unionByName _)
      .orderBy("stage")
  }

  /** The x65 cascade's per-document keep flags — shared by the doc-count
    * funnel (x65) and the token-denominated per-source ledger (x124) so
    * the two reports can never disagree about a rule. */
  private[llm] def funnelFlags(spark: SparkSession, dir: String,
      minQuality: Double = 0.6): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val keepers = docs
      .groupBy(md5(col("text").cast("binary")).as("ch"))
      .agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(1L).as("f1"))
    // decontaminate() emits only non-bench docs (doc_id % 17 ≠ 0): bench
    // docs fall out of the left join as f2 = 0 — the same "eval docs never
    // train" semantics trainingSet's semi-join has
    val clean = decontaminationVerdicts(spark, dir)
      .filter(col("contaminated") === 0)
      .select(col("doc_id"), lit(1L).as("f2"))
    val lenOk = lengthFilter(spark, dir)
      .select(col("doc_id"), lit(1L).as("f3"))
    val qOk = TextStats.qualityScore(spark, dir)
      .filter(col("quality_score") >= minQuality)
      .select(col("doc_id"), lit(1L).as("f4"))
    docs.select("doc_id")
      .join(keepers, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .join(lenOk, Seq("doc_id"), "left")
      .join(qOk, Seq("doc_id"), "left")
      .na.fill(0L, Seq("f1", "f2", "f3", "f4"))
  }

  /** x124: TOKEN BURN-DOWN LEDGER — the x65 funnel re-denominated in the
    * unit budgets are written in (tokens) and broken out per source: for
    * each source and cascade stage, the documents and tokens still alive
    * and the surviving-token share. x65 answers "how many documents does
    * each rule drop"; THIS answers "whose token budget is the cascade
    * spending" — a source whose token survival is far below its document
    * survival is losing its LONG documents, which shifts the x92 budget
    * and the x103 seq-len decision even when doc counts look fine.
    *
    * Stage semantics are IDENTICAL to x65 (shared `funnelFlags`), so the
    * two reports cannot drift; shares are integer-ppm floor-divs of
    * exact long token sums.
    *
    * Scale: one staged aggregate per source over the flag frame joined
    * with a (doc_id, source, ntok) projection — map-side combined, ten
    * longs per (task, source); the stage fan-out is a literal 5-row
    * Generator over the aggregated row. */
  def tokenFunnel(spark: SparkSession, dir: String,
      minQuality: Double = 0.6): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
    val staged = funnelFlags(spark, dir, minQuality).join(d, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n0"), sum("ntok").as("t0"),
        sum("f1").as("n1"), sum(col("f1") * col("ntok")).as("t1"),
        sum(col("f1") * col("f2")).as("n2"),
        sum(col("f1") * col("f2") * col("ntok")).as("t2"),
        sum(col("f1") * col("f2") * col("f3")).as("n3"),
        sum(col("f1") * col("f2") * col("f3") * col("ntok")).as("t3"),
        sum(col("f1") * col("f2") * col("f3") * col("f4")).as("n4"),
        sum(col("f1") * col("f2") * col("f3") * col("f4") * col("ntok")).as("t4"))
    staged
      .select(col("source"), expr(
        "stack(5, " +
          "0, n0, t0, (t0 * 1000000L) div t0, " +
          "1, n1, t1, (t1 * 1000000L) div t0, " +
          "2, n2, t2, (t2 * 1000000L) div t0, " +
          "3, n3, t3, (t3 * 1000000L) div t0, " +
          "4, n4, t4, (t4 * 1000000L) div t0) " +
        "AS (stage, n_docs, n_tokens, tokens_kept_ppm)"))
      .orderBy("source", "stage")
  }

  /** PII patterns shared by `redactPii` and its spec: RE2-compatible (no
    * backrefs/lookaround) so the same pattern string runs in Spark's Java
    * regex and the DuckDB oracle's RE2. */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** The redaction transform: emails then phones, each replaced by a typed
    * placeholder. Order matters (an email never contains the phone shape
    * here, but fixing the order keeps the output deterministic). */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** x40: PII redaction — the pre-training privacy scrub (emails/phone
    * numbers → typed placeholders). The synthetic corpus contains no PII,
    * so the GATE plants it deterministically inside the query — the same
    * `contact user<id>@mail.com phone 555-XXXX` suffix is built from
    * doc_id in both engines, then redacted — which makes the hash check
    * exercise the actual cross-engine regex semantics instead of passing
    * vacuously on no-match inputs. Redaction counts come from
    * length-difference against a placeholder-free erase (the same
    * occurrence-count trick as TextStats.countOccurrences).
    *
    * Scale: pure codegen'd regexp_replace — one scan, no shuffle, no UDF. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@mail.com phone 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    docsWide(spark, dir)
      .withColumn("aug", planted)
      .withColumn("redacted", redactPii(col("aug")))
      .withColumn("n_emails",
        ((length(col("redacted")) -
          length(replace(col("redacted"), lit("<EMAIL>")))) / 7).cast("int"))
      .withColumn("n_phones",
        ((length(col("redacted")) -
          length(replace(col("redacted"), lit("<PHONE>")))) / 7).cast("int"))
      .select("doc_id", "redacted", "n_emails", "n_phones")
      .orderBy("doc_id")
  }

  /** The x34 cleaning transform as a column function (exposed so callers
    * and the idempotence spec can apply it to arbitrary text columns):
    * lowercase, strip non-alphanumerics, drop stopwords and tokens shorter
    * than 3 chars. */
  def cleanedTokens(text: Column): Column = {
    val stripped = regexp_replace(lower(text), "[^a-z0-9 ]", "")
    filter(split(stripped, " "),
      t => length(t) >= 3 && !t.isInCollection(stopwords))
  }

  /** x34: text cleaning — `cleanedTokens` re-joined. Pure codegen'd
    * higher-order functions (no UDF): one scan at any scale. */
  def cleanText(spark: SparkSession, dir: String): DataFrame = {
    docsWide(spark, dir)
      .select(col("doc_id"), cleanedTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_join(col("toks"), " ").as("clean_text"),
        size(col("toks")).as("n_tokens_kept"))
      .orderBy("doc_id")
  }

  /** x51: importance-weighted data selection (the DSIR recipe, Xie et al.
    * 2023, arXiv:2302.03169): score every document by how target-like its
    * hashed n-gram features are — the likelihood ratio between a TARGET
    * distribution (here `lang = targetLang`, the stand-in for "looks like
    * the high-quality domain") and the RAW distribution (everything else)
    * over hashed bigram buckets — then keep documents whose ratio clears
    * parity. This is the selection step that sits between raw crawl and
    * mixture weighting: rarity (x41) ranks by corpus-global frequency,
    * quotas (x27) cap sources, DSIR selects FOR a target distribution.
    *
    * Integer-exact construction (every float hazard quantized away):
    *  - feature = md5-hashed bigram bucket, h ∈ [0, nBuckets);
    *  - per-bucket Laplace-smoothed likelihood ratio in ppm, computed in
    *    decimal(38,0) like x46's factors (int64 would overflow once
    *    bucket_count · corpus_rows ≈ 9·10¹⁸):
    *      w_ppm(h) = (n_tgt(h)+1)·(R+B)·10⁶ div ((n_raw(h)+1)·(T+B))
    *    where T/R are total distinct (doc, bucket) rows in target/raw and
    *    B = nBuckets (the +1/+B Laplace terms);
    *  - doc score = mean bucket ratio: score_ppm = Σ w_ppm div n_feat;
    *  - keep ⇔ score_ppm ≥ 10⁶ (the doc leans target).
    *
    * 100 TB: the bucket table is ≤ nBuckets rows — its stats aggregate is
    * map-side combined and the ratio table broadcasts; the corpus side is
    * one scan + per-doc distinct + one short-key shuffle. The global T/R
    * totals ride a window over the ALREADY-AGGREGATED bucket table (the
    * x32/x36 pattern — bounded input, no 1-row cross join needed). */
  def importanceResample(spark: SparkSession, dir: String,
      targetLang: String = "en", nBuckets: Int = 1024): DataFrame =
    importanceResampleDocs(docsWide(spark, dir), targetLang, nBuckets)

  /** Core of x51 over an arbitrary (doc_id, lang, text) frame — split out
    * so specs can run it on planted fixtures (see rarityScoreDocs). */
  def importanceResampleDocs(docs: DataFrame, targetLang: String = "en",
      nBuckets: Int = 1024): DataFrame = {
    val toks = DocDedup.tokensCol
    val n = size(toks)
    // bigrams, whole-text fallback for 1-token docs (DocDedup.shingles'
    // convention — every document retains at least one feature)
    val bigrams = when(n >= 2,
        transform(sequence(lit(0), n - 2), i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      .otherwise(array(concat_ws(" ", toks)))
    val feats = docs
      .select(col("doc_id"), (col("lang") === targetLang).cast("int").as("is_tgt"),
        explode(bigrams).as("bg"))
      .select(col("doc_id"), col("is_tgt"), (md5Long(col("bg")) % nBuckets).as("h"))
      .distinct()
      .localCheckpoint(eager = false) // reused by the bucket stats and the re-join
    val buckets = feats.groupBy("h")
      .agg(sum("is_tgt").as("n_tgt"), sum(lit(1) - col("is_tgt")).as("n_raw"))
      .withColumn("t_total", sum("n_tgt").over(Window.partitionBy()))
      .withColumn("r_total", sum("n_raw").over(Window.partitionBy()))
      .select(col("h"),
        expr(s"cast((n_tgt + 1) as decimal(38,0)) * (r_total + $nBuckets) * 1000000 " +
          s"div (cast((n_raw + 1) as decimal(38,0)) * (t_total + $nBuckets))").as("w_ppm"))
    feats.join(broadcast(buckets), Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"),
        expr("cast(sum(w_ppm) as decimal(38,0)) div count(1)").as("score_ppm"))
      .withColumn("keep", (col("score_ppm") >= 1000000L).cast("int"))
      .orderBy("doc_id")
  }

  /** x54: deterministic stratified sampling — keep exactly `perStratum`
    * documents per stratum (here `lang`), chosen as the smallest md5 keys:
    * a uniform without-replacement sample that any engine reproduces
    * bit-for-bit (the same md5-keyed coin as x33/x46, no RNG state). The
    * per-group budget makes it the "balanced eval slice" / "n-per-source
    * audit sample" primitive — where x27's quotas CAP groups and x46's
    * weights RESCALE them, this draws a fixed-size representative slice.
    *
    * Deliberately phrased as the row_number top-k idiom (rn <= k, rn
    * dropped): RewriteRowNumberTopK rewrites it into the bounded-heap
    * TopKPerKey operator, so each task retains at most #strata × k rows
    * and the full-width sort vanishes — the optimizer-ladder showcase
    * firing on a real pipeline stage.
    *
    * 100 TB: one hash shuffle on the stratum key; memory is
    * O(#strata × k) per task after the rewrite. */
  def stratifiedSample(spark: SparkSession, dir: String,
      perStratum: Int = 25): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("h", "doc_id")
    docsWide(spark, dir)
      .select(col("lang"), col("doc_id"),
        md5Long(concat(lit("strat:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perStratum)
      .drop("rn")
      .orderBy("lang", "doc_id")
  }

  /** x46: mixture epoching — APPLY temperature weights (alpha = 0.5, x32's
    * rule keyed here by `lang`, the corpus's skewed axis — the multilingual
    * rebalancing recipe) by replicating/sampling documents so each group's
    * share of the output corpus matches its weight: low-resource languages
    * repeat >1×, the dominant language downsamples <1×.
    *
    * The per-document epoch factor is pure integer arithmetic on the
    * quantized-sqrt scale (weight_i = sqrt(n_i)/Σsqrt, factor_i =
    * weight_i · N / n_i, total output size stays ≈ N):
    *
    *   factor_ppm = sqrt_scaled * N * 1e6 div (Σ sqrt_scaled * n_i)
    *
    * A document gets `factor_ppm div 1e6` whole copies plus one more iff
    * its md5 fraction (`md5_ppm < factor_ppm mod 1e6`) hits — a
    * deterministic per-doc Bernoulli draw, reproducible across engines and
    * appends (same md5-keyed coin as `TextStats.hashSplit`). The numerator
    * is sqrt(n_i)·1e6·N·1e6 — TWO 1e6 scales (sqrt quantization and the
    * ppm output scale), so int64 would overflow once sqrt(n_i)·N reaches
    * ~9.2e6 (roughly a 1M-doc monolingual corpus — and with ANSI off Spark
    * would WRAP silently while DuckDB raises, a silent cross-engine
    * divergence). The factor arithmetic therefore runs in decimal(38,0)
    * (DuckDB mirror: HUGEINT), exact to ~1e38 ≈ 10²⁶ docs; only the final
    * ppm quotient — bounded by N·1e6 — returns to int64.
    *
    * 100 TB: the factor table is #groups rows (broadcast); the corpus side
    * is one scan + a Generator explode — no shuffle at all. Output rows
    * carry (doc_id, copy_idx) so a downstream shuffle-shard (x33) spreads
    * repeats across shards. */
  def mixtureEpochs(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("sqrt_scaled",
        floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
    val factors = perLang
      .withColumn("n_total", sum("n_docs").over(Window.partitionBy()))
      .withColumn("total_sq", sum("sqrt_scaled").over(Window.partitionBy()))
      .select(col("lang"),
        // decimal(38,0) internals, int64 result (see scale note above);
        // `div` on decimals is Spark's IntegralDivide → BIGINT out
        expr("cast(sqrt_scaled as decimal(38,0)) * n_total * 1000000 " +
          "div (cast(total_sq as decimal(38,0)) * n_docs)").as("factor_ppm"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (md5Long(col("doc_id").cast("string")) % 1000000L).as("md5_ppm"))
      .join(broadcast(factors), Seq("lang"))
      .withColumn("n_copies",
        expr("factor_ppm div 1000000L") +
          when(col("md5_ppm") < col("factor_ppm") % 1000000L, 1L).otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("lang"), col("n_copies").cast("int").as("n_copies"))
      .withColumn("copy_idx", explode(sequence(lit(1), col("n_copies"))))
      .select("doc_id", "lang", "copy_idx")
      .orderBy("doc_id", "copy_idx")
  }

  /** x68: corpus snapshot diff — the CDC step of a continuously refreshed
    * corpus: given two versions, emit ONLY the delta (added / removed /
    * changed doc ids), which is what incremental dedup (x35), index
    * refresh, and re-embedding consume downstream. Unchanged docs are
    * deliberately NOT emitted: at 100 TB the delta is orders of magnitude
    * smaller than the corpus, and the whole point of the diff is that
    * downstream stages touch only it.
    *
    * Scale shape: each side reduces map-side to (doc_id, md5) — the join
    * shuffles 24-byte rows, never text; classification is a projection
    * over the full-outer join. Both sides would be different snapshot
    * paths in production; the gate derives them deterministically from one
    * table (old = doc_id%10<9, new = doc_id%10>0 with docs at doc_id%7==0
    * edited) so the oracle can mirror the construction. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val oldV = docs.filter(col("doc_id") % 10 < 9)
      .select(col("doc_id"), col("text"))
    val newV = docs.filter(col("doc_id") % 10 > 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    snapshotDiffOf(oldV, newV)
  }

  /** x85: CROSS-SOURCE QUALITY QUANTILE NORMALIZATION — the fairness fix
    * a multi-source corpus needs before any global quality threshold: raw
    * x8 scores from different sources live on different distributions
    * (a forum crawl's median ≠ an encyclopedia's), so one absolute cutoff
    * silently biases the mix toward whichever source scores high. The
    * normalized value is the per-source percent_rank CDF position
    * (ties share the min rank, Spark/SQL percent_rank semantics), and the
    * keep flag drops each source's own bottom `dropFrac` — every source
    * loses the same fraction regardless of its raw-score location.
    *
    * Scale shape: NOT a window over the corpus. Rows group to the
    * DISTINCT (source, score) table first (heavily tied by construction —
    * scores are bounded ratio arithmetic), the running `n_less` CDF runs
    * over THAT table, and the corpus-width step is a plain equi-join back
    * on (source, score). At 100 TB the same plan holds with scores
    * quantized to ppm (the x-family integer idiom) to hard-bound the CDF
    * table; here scores stay raw so the oracle's percent_rank() matches
    * bit-for-bit: pct = n_less/(n_src−1), both exact longs, one exact
    * division — the cross-engine double contract. */
  def qualityQuantileNormalize(spark: SparkSession, dir: String,
      dropFrac: Double = 0.2): DataFrame = {
    // one-evaluation barrier: `scored` feeds BOTH the grouped CDF and the
    // final join — without it the whole quality-score pipeline runs twice
    val scored = TextStats.qualityScore(spark, dir)
      .select("doc_id", "quality_score")
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .localCheckpoint(eager = false)
    val grp = scored.groupBy("source", "quality_score").agg(count(lit(1)).as("n"))
    val byScore = Window.partitionBy("source").orderBy("quality_score")
    val cdf = grp
      .withColumn("n_less", coalesce(
        sum("n").over(byScore.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_src", sum("n").over(Window.partitionBy("source")))
    scored.join(cdf, Seq("source", "quality_score"))
      .withColumn("pct", when(col("n_src") === 1, lit(0.0))
        .otherwise(col("n_less").cast("double") / (col("n_src") - 1).cast("double")))
      .select(col("doc_id"), col("source"), col("quality_score"), col("pct"),
        (col("pct") >= dropFrac).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** x92: MIXTURE-AWARE PER-SOURCE TOKEN BUDGETING — the step between
    * mixture weighting (x32) and the training-set build: a global token
    * budget is allocated to sources by the sqrt-scaled mixture weights
    * (integer arithmetic: budget_s = sqrt_scaled_s · B div Σ sqrt_scaled),
    * and each source fills its allocation HIGHEST-QUALITY-FIRST (x8 score
    * desc, doc_id tiebreak) — greedy prefix by running token sum. Output
    * is the per-source accounting row: allocation, docs/tokens kept,
    * corpus totals — the table a data order actually executes against.
    *
    * Scale: the ranking window is per-source (the x64 per-shard window
    * discipline — never a global sort); at lake scale the greedy prefix
    * swaps for x63's token-weighted histogram cut per source (same
    * output contract, noted there). Budgets and cumulative sums are exact
    * longs; quality ordering is the proven cross-engine double compare. */
  def sourceBudget(spark: SparkSession, dir: String,
      totalBudget: Long = 100000L): DataFrame = {
    val docs = TextStats.qualityScore(spark, dir)
      .select("doc_id", "n_tokens", "quality_score")
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .localCheckpoint(eager = false)
    val per = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs_total"),
      sum(col("n_tokens").cast("long")).as("n_tokens_total"),
      floor(sqrt(count(lit(1)).cast("double")) * 1e6).cast("long").as("sqrt_scaled"))
    val budgets = per
      .crossJoin(broadcast(per.agg(sum("sqrt_scaled").as("scale_total"))))
      .select(col("source"), col("n_docs_total"), col("n_tokens_total"),
        expr(s"sqrt_scaled * $totalBudget div scale_total").as("budget_tokens"))
    val byQuality = Window.partitionBy("source")
      .orderBy(desc("quality_score"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = docs
      .withColumn("cum", sum(col("n_tokens").cast("long")).over(byQuality))
      .join(broadcast(budgets.select("source", "budget_tokens")), "source")
      .filter(col("cum") <= col("budget_tokens"))
      .groupBy("source").agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens").cast("long")).as("n_tokens_kept"))
    budgets.join(kept, Seq("source"), "left")
      .select(col("source"), col("budget_tokens"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        col("n_docs_total"), col("n_tokens_total"))
      .orderBy("source")
  }

  /** x90: RENDEZVOUS (highest-random-weight) sharding — the shard
    * assignment a GROWING corpus store needs where x33's `md5 mod n`
    * cannot serve: under mod-hashing, going from n to n+1 shards moves
    * ~n/(n+1) of ALL documents (every residue reshuffles); under
    * rendezvous hashing (Thaler & Ravishankar 1996), each doc picks the
    * shard maximizing md5(doc_id # shard), so adding a shard moves ONLY
    * the ~1/(n+1) of docs whose new-shard score wins — and every moved
    * doc moves INTO the new shard, never between old ones. That is the
    * property that keeps a 100 TB shard layout incrementally rebalanceable:
    * a reshard touches 1/(n+1) of the data instead of all of it (the spec
    * pins both properties).
    *
    * Plan: a pure per-row projection — the n candidate scores are an
    * inline array of (score, shard) structs and the pick is `array_max`
    * (struct ordering: score first); no join, no shuffle, no state. Score
    * = the md5-60-bit integer idiom, so the oracle re-derives identical
    * longs. */
  def rendezvousShards(spark: SparkSession, dir: String, shards: Int = 8): DataFrame = {
    require(shards > 0, s"rendezvous needs shards > 0, got $shards")
    val candidates = array((0 until shards).map { s =>
      struct(
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(s"#$s"))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("score"),
        lit(s).as("shard"))
    }: _*)
    Tables.documents(spark, dir)
      .select(col("doc_id"), array_max(candidates).getField("shard").as("shard"))
      .orderBy("doc_id")
  }

  /** x94: PRIORITY SAMPLING — weighted without-replacement sampling per
    * source by the Duffield–Lund–Thorup scheme (JACM 2007): each document
    * draws priority q = w / u with u uniform in (0, 1], and the k highest
    * priorities per source are the sample. Unlike uniform subsampling,
    * long documents (weight = n_chars, the token-mass proxy) are kept with
    * proportionally higher probability — the right invariant when the
    * sample must preserve token mass, not doc counts. The scheme's
    * unbiased weight estimator is included: with τ = the (k+1)-th priority
    * of the source, each sampled doc represents max(w, τ) of corpus mass,
    * so Σ est_weight across the sample estimates the source's total.
    *
    * Determinism contract: u = (h + 1) / 2^52 with h the first 52 bits of
    * md5(doc_id) — a dyadic rational, EXACT as a double; the priority is
    * then one IEEE division of two exact doubles, bit-identical in any
    * engine. No RNG state, no partition-order dependence: re-running on a
    * differently-partitioned 100 TB corpus reproduces the sample
    * bit-for-bit (the same property the x18 hash split relies on).
    *
    * Scale: one scan computes priorities map-side; top-(k+1) per source is
    * a per-key window — at lake scale the RewriteRowNumberTopK rule turns
    * it into the bounded per-key heap, so no source's full doc list is
    * ever materialized. */
  def prioritySample(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    prioritySampleOf(docsWide(spark, dir), k)

  /** Library form over any (doc_id, source, n_chars) frame. */
  def prioritySampleOf(docs: DataFrame, k: Int): DataFrame = {
    val h52 = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")
    val u = (h52 + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val pr = col("n_chars").cast("double") / u
    val w = Window.partitionBy("source").orderBy(desc("priority"), col("doc_id"))
    val ranked = docs
      .select(col("doc_id"), col("source"), col("n_chars").as("weight"),
        pr.as("priority"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k + 1)
      .localCheckpoint(eager = false)
    val tau = ranked.filter(col("rank") === k + 1)
      .select(col("source"), col("priority").as("tau"))
    ranked.filter(col("rank") <= k)
      .join(tau, Seq("source"), "left")
      .select(col("source"), col("rank"), col("doc_id"), col("weight"),
        col("priority"),
        greatest(col("weight").cast("double"), coalesce(col("tau"), lit(0.0)))
          .as("est_weight"))
      .orderBy("source", "rank")
  }

  /** x97: CURRICULUM ORDERING — the deterministic training-order builder:
    * documents are bucketed into quality deciles (ntile semantics over the
    * x8 score, best first), and WITHIN each decile the sources are
    * interleaved round-robin (1st doc of each source, then 2nd of each, …)
    * so no contiguous run of training batches is dominated by one source —
    * the ordering curriculum-learning setups and mixture-stability
    * arguments both want. Output is the full ordered manifest:
    * curriculum_rank is the position a data loader reads at.
    *
    * NO GLOBAL WINDOW touches the corpus (a naive ntile/row_number with no
    * partition spec moves the whole table to one task — PlanAuditSpec
    * rejects that shape). Instead the classic two-level rank construction:
    *  1. range-bucket by the score value (21 fixed buckets over [0,1]);
    *     per-BUCKET row_number (partitioned window) + the tiny per-bucket
    *     offset frame gives the exact global rank;
    *  2. ntile(10) is then ARITHMETIC on (rank, N) — SQL's "first N mod k
    *     tiles get one extra row" contract, computed map-side;
    *  3. the interleave position inside a decile is derived by joining the
    *     broadcast per-(decile, source) count table: docs ahead of (r, s)
    *     are Σ_{s'} min(c_{s'}, r−1) plus the same-rank sources before s —
    *     a 20-row-per-doc broadcast expansion collapsed by one hash-agg;
    *  4. decile offsets are closed-form: (d−1)·⌊N/10⌋ + min(d−1, N mod 10).
    * Every window is either partitioned or over an aggregate; the one
    * corpus shuffle is the final per-doc hash-agg. All keys exact
    * ints/longs, so the manifest is bit-stable under any partitioning. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val q = graft.llm.TextStats.qualityScore(spark, dir)
      .select("doc_id", "quality_score")
    curriculumOrderOf(docsWide(spark, dir).select("doc_id", "source").join(q, "doc_id"))
  }

  /** Library form over any (doc_id, source, quality_score ∈ [0,1]) frame. */
  def curriculumOrderOf(scored: DataFrame): DataFrame = {
    val docs = scored
      .withColumn("bucket", floor(col("quality_score") * 20).cast("int"))
      .localCheckpoint(eager = false)
    // tiny per-bucket frame: counts, descending-rank offsets, corpus total
    val bcounts = docs.groupBy("bucket").agg(count(lit(1)).as("bn"))
    val wOff = Window.orderBy(desc("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(desc("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = bcounts
      .withColumn("boff", coalesce(sum("bn").over(wOff), lit(0L)))
      .withColumn("total", sum("bn").over(wAll))
      .select("bucket", "boff", "total")
    val wInBucket = Window.partitionBy("bucket")
      .orderBy(desc("quality_score"), col("doc_id"))
    val ranked = docs
      .withColumn("rn", row_number().over(wInBucket))
      .join(broadcast(offs), "bucket")
      .withColumn("rank", col("boff") + col("rn"))
      // SQL ntile(10): tiles 1..N%10 hold ⌈N/10⌉ rows, the rest ⌊N/10⌋
      .withColumn("decile", expr(
        "CAST(CASE WHEN rank <= (total % 10) * (total div 10 + 1) " +
        "THEN (rank - 1) div (total div 10 + 1) + 1 " +
        "ELSE (total % 10) + (rank - (total % 10) * (total div 10 + 1) - 1) div (total div 10) + 1 END AS INT)"))
    val perSource = Window.partitionBy("decile", "source")
      .orderBy(desc("quality_score"), col("doc_id"))
    val sr = ranked.withColumn("src_rank", row_number().over(perSource))
      .select("doc_id", "source", "decile", "src_rank", "total")
      .localCheckpoint(eager = false)
    val counts = sr.groupBy(col("decile"), col("source").as("s2"))
      .agg(count(lit(1)).as("c2"))
    sr.join(broadcast(counts), Seq("decile"))
      .groupBy("doc_id", "source", "decile", "src_rank", "total")
      .agg(sum(least(col("c2"), col("src_rank").cast("long") - 1) +
        when(col("s2") < col("source") && col("c2") >= col("src_rank"), 1L)
          .otherwise(0L)).as("before"))
      .withColumn("curriculum_rank", expr(
        "CAST((decile - 1) * (total div 10) + least(decile - 1, total % 10) + before + 1 AS INT)"))
      .select("curriculum_rank", "doc_id", "source", "decile", "src_rank")
      .orderBy("curriculum_rank")
  }

  /** x105: PER-SOURCE DATA CARD — the datasheet a dataset release ships
    * per provenance (Gebru et al.'s "Datasheets for Datasets", reduced to
    * the fields a mixture owner actually reads): volume (docs, tokens),
    * quality (mean x8 score in exact ppm), language (modal x7 label and
    * its share), diversity (distinct-3-gram ratio, the x87 template-farm
    * signal), and redundancy (fraction of docs in near-dup clusters, from
    * the materialized x17 artifact). One row per source; every published
    * number is an exact long or a single IEEE division.
    *
    * Layout: quality + language + token count are all PROJECTIONS of the
    * text, so they fuse into ONE corpus scan feeding one per-source
    * hash-agg; the language mode is a per-(source, lang) count argmax
    * (max-of-struct, ties to the lexicographically larger label — the
    * oracle mirrors with its row_number order); diversity adds the x87
    * shingle-distinct agg (shuffle = distinct (source, shingle) keys);
    * redundancy joins the tiny clustered-doc set from the CC artifact. */
  def sourceDataCard(spark: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val base = docsWide(spark, dir)
      .select(col("doc_id"), col("source"), col("text"), size(t).as("n_tokens"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / size(t))
          .as("avg_token_len"))
      .withColumn("stop_ratio",
        graft.llm.TextStats.langScore(Seq(" the ", " a ", " of ", " and "))
          .cast("double") / col("n_tokens"))
      .withColumn("q_ppm", floor(graft.llm.TextStats.qualityExpr(
        col("n_tokens"), col("avg_token_len"), col("stop_ratio")) * 1000000.0)
        .cast("long"))
      .select(col("doc_id"), col("source"), col("text"),
        col("n_tokens").cast("long").as("n_tokens"), col("q_ppm"))
      .localCheckpoint(eager = false)
    val lang = base.select(Seq(col("doc_id"), col("source")) ++
        graft.llm.TextStats.langMarkers.map { case (l, m) =>
          graft.llm.TextStats.langScore(m).as(s"score_$l")
        }: _*)
      .withColumn("predicted_lang", graft.llm.TextStats.pickLang)
      .groupBy(col("source"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(max(struct(col("n"), col("predicted_lang"))).as("m"))
      .select(col("source"), col("m.predicted_lang").as("top_lang"),
        col("m.n").as("top_lang_docs"))
    val per = base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        expr("sum(q_ppm) div count(1)").as("mean_quality_ppm"))
    val sh = base
      .select(col("source"), explode(DocDedup.shingles(split(col("text"), " "))).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_sh"), countDistinct("g").as("n_sh_d"))
      .select(col("source"),
        (col("n_sh_d").cast("double") / col("n_sh")).as("distinct3_ratio"))
    val dup = base.select("doc_id", "source")
      .join(DocDedup.clusterLabels(spark, dir).select("doc_id"), Seq("doc_id"))
      .groupBy("source").agg(count(lit(1)).as("dup_docs"))
    per.join(lang, "source").join(sh, "source")
      .join(dup, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_quality_ppm"), col("top_lang"),
        expr("top_lang_docs * 1000000 div n_docs").as("top_lang_ppm"),
        col("distinct3_ratio"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        (coalesce(col("dup_docs"), lit(0L)).cast("double") / col("n_docs"))
          .as("dup_rate"))
      .orderBy("source")
  }

  /** The diff construction over arbitrary (doc_id, text) snapshot frames. */
  def snapshotDiffOf(oldV: DataFrame, newV: DataFrame): DataFrame = {
    val o = oldV.select(col("doc_id").as("o_id"),
      md5(col("text").cast("binary")).as("o_h"))
    val n = newV.select(col("doc_id").as("n_id"),
      md5(col("text").cast("binary")).as("n_h"))
    o.join(n, col("o_id") === col("n_id"), "full_outer")
      .select(coalesce(col("o_id"), col("n_id")).as("doc_id"),
        when(col("o_id").isNull, lit("added"))
          .when(col("n_id").isNull, lit("removed"))
          .when(col("o_h") =!= col("n_h"), lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"))
      .filter(col("change_type") =!= "unchanged")
      .orderBy("doc_id")
  }
}

package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: language-ID (marker-word heuristic), quality scoring,
  * token counting (whitespace + BPE-ish regex), and document
  * fingerprinting. Pure codegen'd expressions — no UDFs, no shuffles; each
  * query is a single scan at any scale.
  */
object TextStats {

  /** Documents scan widened to cores when the file layout is narrow (see
    * Tables.widen): the regex/hash scoring below is CPU-bound per row, so a
    * single-file scan must not pin the stage to one task. */
  private def docsWide(spark: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(spark, dir))

  /** Occurrences of `needle` in `hay` via length-difference — expressible
    * identically in Spark and DuckDB (replace/length), unlike regex counts. */
  def countOccurrences(hay: Column, needle: String): Column =
    (length(hay) - length(regexp_replace(hay, java.util.regex.Pattern.quote(needle), "")))
      ./(lit(needle.length)).cast("int")

  private def padded: Column = concat(lit(" "), col("text"), lit(" "))

  /** Marker-word language scores. The markers are standard high-frequency
    * function words per language; score = total marker hits. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "))

  def langScore(markers: Seq[String]): Column =
    markers.map(m => countOccurrences(padded, m)).reduce(_ + _)

  /** x7: language-ID — argmax of marker scores, 'unknown' when no marker
    * fires. Ties resolve in langMarkers order (greatest-first scan). */
  /** Argmax over the per-language `score_*` columns, 'unknown' when no
    * marker fires; earlier langs win ties (en first) — the when-chain is
    * built left to right. Expects the score columns to be present. */
  private[llm] def pickLang: Column = {
    val best = langMarkers.map { case (l, _) => col(s"score_$l") }.reduce((a, b) => greatest(a, b))
    langMarkers.reverse.foldLeft(lit("unknown")) { case (acc, (l, _)) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(col("doc_id") +: langMarkers.map { case (l, m) => langScore(m).as(s"score_$l") }: _*)
      .withColumn("predicted_lang", pickLang)
      .select("doc_id", "score_en", "score_de", "score_fr", "score_es", "predicted_lang")
      .orderBy("doc_id")

  /** x8's scoring formula over precomputed shape columns — shared by the
    * x8 gate and the fused x59 ensemble so the two can never drift. */
  private[llm] def qualityExpr(nTokens: Column, avgTokenLen: Column,
      stopRatio: Column): Column =
    least(lit(1.0), nTokens / lit(50.0)) * lit(0.4) +
      when(avgTokenLen.between(2.0, 10.0), 0.3).otherwise(0.0) +
      least(lit(0.3), stopRatio * 3)

  /** x8: quality scoring — length/stopword/shape heuristics in one pass. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .withColumn("n_chars_m", length(col("text")))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("avg_token_len",
        (length(regexp_replace(col("text"), " ", "")).cast("double")) / col("n_tokens"))
      .withColumn("stop_hits", langScore(Seq(" the ", " a ", " of ", " and ")))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        qualityExpr(col("n_tokens"), col("avg_token_len"), col("stop_ratio")))
      .select("doc_id", "n_chars_m", "n_tokens", "avg_token_len", "stop_ratio", "quality_score")
      .orderBy("doc_id")

  /** x135: QUALITY-DISTRIBUTION DRIFT between two corpus snapshots — the
    * release-monitoring table for the TEXT-quality axis (x109 is the same
    * motion for embeddings, x79 the per-source quality report): per score
    * decile, the historical (even doc_id — the x35 snapshot convention)
    * vs current (odd) share, and an integer chi-square-style divergence
    * contribution (p−q)²/(p+q) in ppm. PSI's ln term is deliberately
    * absent — libm ln differs by ulps across engines (the log-free-RSJ
    * lesson from BM25), while this surrogate ranks drifted bins
    * identically and is EXACT: shares are integer-ppm floor-divs of
    * exact counts, the contribution a floor-div of exact longs.
    *
    * Scale: one x8 scan → a ≤10-row (bin, half) aggregate; the share
    * denominators are window sums OVER THE AGGREGATE (bounded input —
    * the PlanAuditSpec-sanctioned global-window shape). */
  def qualityDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = qualityScore(spark, dir).select(
      least(floor(col("quality_score") * 10.0), lit(9.0)).cast("long").as("bin"),
      (col("doc_id") % 2 === 0).as("is_prev"))
    val w = Window.partitionBy()
    q.groupBy("bin")
      .agg(sum(when(col("is_prev"), 1L).otherwise(0L)).as("n_prev"),
        sum(when(!col("is_prev"), 1L).otherwise(0L)).as("n_cur"))
      .withColumn("tot_prev", sum("n_prev").over(w))
      .withColumn("tot_cur", sum("n_cur").over(w))
      // an absent half (every doc in one snapshot) is a legitimate input:
      // its shares are 0, never a division error
      .withColumn("p_ppm", expr(
        "CASE WHEN tot_prev = 0 THEN 0 ELSE n_prev * 1000000 div tot_prev END"))
      .withColumn("q_ppm", expr(
        "CASE WHEN tot_cur = 0 THEN 0 ELSE n_cur * 1000000 div tot_cur END"))
      .withColumn("drift_ppm", expr(
        "CASE WHEN p_ppm + q_ppm = 0 THEN 0 " +
        "ELSE (p_ppm - q_ppm) * (p_ppm - q_ppm) div (p_ppm + q_ppm) END"))
      .select("bin", "n_prev", "n_cur", "p_ppm", "q_ppm", "drift_ppm")
      .orderBy("bin")
  }

  /** x9: token counting — whitespace tokens and a BPE-ish regex token count
    * (letter runs / digit runs / single punctuation, the GPT-2 pre-tokenizer
    * shape). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .withColumn("n_tokens_ws", size(split(col("text"), " ")))
      .withColumn("n_tokens_bpe",
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))
      .select("doc_id", "n_tokens_ws", "n_tokens_bpe")
      .orderBy("doc_id")

  /** x10: content fingerprint — md5 over whitespace-normalized lowercase
    * text (the canonical exact-dedup key). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")))
      .select("doc_id", "fp")
      .orderBy("doc_id")

  /** x16: corpus token frequency — the Generator (explode) path: one
    * flatMap scan, then a hash aggregate over tokens with map-side partial
    * counts, so the shuffle carries (token, partial_count) not the token
    * stream. Top-N with a total-order tiebreak for determinism. */
  def tokenFreq(spark: SparkSession, dir: String, topN: Int = 20): DataFrame =
    docsWide(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(topN)

  /** x70: tokenizer vocabulary coverage — per-doc out-of-vocabulary rate
    * against the corpus top-V vocabulary. The go/no-go check before
    * committing a tokenizer: a vocab whose OOV rate spikes on a source
    * means that source fragments into bytes/unk at training time.
    *
    * Scale shape: the vocab is aggregated once (token hash-agg + top-V)
    * and collapsed to a ONE-ROW array that broadcasts onto the corpus
    * scan — the per-doc membership test is a codegen'd higher-order
    * filter over the token array, so the corpus side is map-only: no
    * explode shuffle, no per-doc aggregation exchange. oov_ppm is exact
    * integer arithmetic (`div`), bit-identical cross-engine. */
  def oovRate(spark: SparkSession, dir: String, vocabSize: Int = 50): DataFrame = {
    val vocab = tokenFreq(spark, dir, vocabSize)
      .agg(collect_list("token").as("vocab"))
    docsWide(spark, dir)
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), split(col("text"), " ").as("toks"), col("vocab"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), t => !array_contains(col("vocab"), t)))
          .cast("long").as("n_oov"))
      .withColumn("oov_ppm", expr("(n_oov * 1000000L) div n_tokens"))
      .orderBy("doc_id")
  }

  /** x22: top terms per document by df-normalized term frequency — the
    * TF-IDF shape with an EXACT integer weight (score = tf·10⁶ div df)
    * instead of a transcendental idf: `ln` is libm-dependent and can
    * differ in the last ulp across engines, while integer division is
    * bit-identical everywhere, so the gate stays hash-exact. Plan: one
    * explode scan → (doc,token) tf counts → token df by partial-agg →
    * broadcast df back → per-doc top-k window over ~|unique tokens per
    * doc| rows. The df table is vocabulary-sized: broadcastable at any
    * corpus size that fits a vocabulary. */
  def topTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = docsWide(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    // df derives from tf, not from the raw token stream: tf rows are
    // already distinct (doc, token) pairs, so count-per-token over tf ==
    // countDistinct(doc_id) over tokens — one explode pass instead of two,
    // and the barrier moves to the much smaller tf table (lazy local
    // checkpoint: plan-time barrier, GC-released — see DocDedup)
    val tf = tokens.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score"), asc("token"))
    // no broadcast hint on df: a driver-side broadcast build would have to
    // materialize the lazy tf checkpoint through the single broadcast-build
    // thread (the whole explode→agg serialized under the broadcast timeout
    // — measured as 0.45 s vs 22 s run-to-run swings). Left to AQE, the tf
    // exchange materializes on executor tasks first and the vocabulary-
    // sized df side still converts to a broadcast join at runtime, now fed
    // from the already-computed shuffle output.
    tf.join(df, "token")
      // `div`: exact integer division (a double quotient + floor can land
      // on the wrong side when the true ratio sits just below an integer)
      .withColumn("score", expr("(tf * 1000000L) div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"))
      .orderBy("doc_id", "rank")
  }

  /** x41: unigram-rarity scoring — the perplexity-proxy quality signal
    * (a KenLM-style filter ranks docs by average token surprisal; this is
    * the integer-exact analogue: surprisal ∝ frequency RANK, so
    * mean-rank-per-token orders documents the same way without a
    * transcendental `ln` crossing the engine boundary — libm logs can
    * differ in the last ulp and flip a floor()). Rank = position in the
    * corpus frequency table (count desc, token asc — total order);
    * mean_rank_ppm = sum(rank)·10⁶ div n_tokens, exact int64.
    *
    * Scale: one explode scan → map-side-combined vocab aggregate (the
    * global rank window runs on VOCAB rows, not the corpus) → broadcast
    * the vocab back over a second token scan → per-doc aggregate. The
    * vocabulary is the only globally-sorted object, and it is bounded by
    * language, not corpus size. */
  /** x77: FEATURE-HASHING text projection (the "hashing trick",
    * Weinberger et al. 2009) — the model-free featurizer that gives every
    * document a fixed-width vector at any corpus size with ZERO
    * vocabulary state: bucket = (md5-60-bit of token) % dim, sign = ±1
    * from the hash's next bit, feature[bucket] = Σ sign over the doc's
    * tokens. The signed sum makes collisions cancel in expectation —
    * that's what separates the hashing trick from a plain count bucket.
    * Output is LONG FORMAT (doc_id, bucket, feature): buckets a doc
    * never touches are absent (the sparse form a trainer ingests); a
    * bucket whose signs cancel to 0 still appears — it HAS evidence,
    * unlike an untouched one.
    *
    * 100 TB: explode → two-level hash agg on (doc_id, bucket) — map-side
    * partial sums collapse each doc's tokens before the shuffle, so the
    * exchange carries ≤ dim rows per doc. No vocabulary table, no
    * broadcast, no state: the property that makes this THE featurizer
    * that still works when the vocab would not fit anywhere. */
  def featureHash(spark: SparkSession, dir: String, dim: Int = 16): DataFrame =
    featureHashDocs(docsWide(spark, dir), dim)

  /** Core of x77 over an arbitrary (doc_id, text) frame. */
  def featureHashDocs(docs: DataFrame, dim: Int = 16): DataFrame = {
    require(dim > 0, "need a positive projection width")
    val h = conv(substring(md5(col("token").cast("binary")), 1, 15), 16, 10).cast("long")
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .select(col("doc_id"), (h % dim).cast("int").as("bucket"),
        // the hash's "dim place" decides the sign: ⌊h/dim⌋ % 2 == 0 ⇔
        // h % 2dim < dim — pure modular form because Spark's `/` on
        // longs is DOUBLE division (inexact at 2^60)
        when(h % (2 * dim) < dim, lit(1L)).otherwise(lit(-1L)).as("sgn"))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sgn")).as("feature"))
      .orderBy("doc_id", "bucket")
  }

  /** x79: PER-SOURCE QUALITY-DISTRIBUTION report — the monitoring table a
    * multi-source ingest watches per refresh (FineWeb publishes exactly
    * this per dump): for each (source, quality band) the doc count and
    * the share of that source's docs in integer ppm. Bands are fixed
    * tenths of the x8 score (⌊q·10⌋ clamped to 0..9) — the x8 doubles
    * are bit-identical cross-engine, so the banding is too. A source
    * whose distribution shifts between snapshots is the drift signal
    * that triggers re-tuning the filter cascade.
    *
    * 100 TB: one corpus scan (the x8 projection) + one hash agg on
    * (source, band) — ≤ 10·|sources| rows out; the per-source total
    * joins back from a second short agg of the SAME aggregated frame,
    * never the corpus. */
  def sourceQualityProfile(spark: SparkSession, dir: String): DataFrame = {
    val banded = qualityScore(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), Seq("doc_id"))
      .withColumn("band",
        least(lit(9), floor(col("quality_score") * 10)).cast("int"))
    val counts = banded.groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"))
    val totals = counts.groupBy("source").agg(sum("n_docs").as("n_total"))
    counts.join(totals, Seq("source"))
      // `div` (IntegralDivide), not `/`: Column `/` on longs is DOUBLE
      // division — the ppm must stay an exact integer cross-engine
      .select(col("source"), col("band"), col("n_docs"),
        expr("n_docs * 1000000 div n_total").as("share_ppm"))
      .orderBy("source", "band")
  }

  def rarityScore(spark: SparkSession, dir: String): DataFrame =
    rarityScoreDocs(docsWide(spark, dir))

  /** Core of x41 over an arbitrary (doc_id, text) frame — split out so
    * specs can run it on planted fixtures.
    *
    * r16 (closing the r15 `weak`): the vocabulary rank is a DISTRIBUTED
    * prefix-rank (range-partition on (n desc, token), per-partition
    * row_number + partition-offset sums — `DistributedRank`), never a
    * single-partition global window, and the occurrence→rank lookup is a
    * plain shuffle join on `token`, never `broadcast(vocab)`: the vocab
    * is Heaps-sublinear but UNBOUNDED (O(10⁹) tokens for 100 TB of web
    * text) — at gate scale AQE is free to pick a broadcast from measured
    * sizes, but the plan must not demand one. */
  def rarityScoreDocs(docs: DataFrame): DataFrame = {
    val tokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val vocab = graft.operators.DistributedRank.rank(
        tokens.groupBy("token").agg(count(lit(1)).as("n")),
        Seq(desc("n"), asc("token")), "rank")
      .select("token", "rank")
    tokens.join(vocab, Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("rank").as("sum_rank"),
        max("rank").as("max_rank"))
      .withColumn("mean_rank_ppm", expr("(sum_rank * 1000000L) div n_tokens"))
      .select("doc_id", "n_tokens", "sum_rank", "max_rank", "mean_rank_ppm")
      .orderBy("doc_id")
  }

  /** x23: inverted-index construction — token → sorted posting list of
    * doc_ids, for tokens above a document-frequency floor. One explode
    * scan, distinct (token, doc) pairs by hash-agg, postings assembled
    * with collect_set + sort (deterministic array). At corpus scale the
    * index is written partitioned by token hash; posting lists for
    * stop-word-frequency tokens are the skew to watch (the df floor here
    * is also the skew cap in reverse — production indexes chunk hot
    * postings). Postings surface as a comma-delimited string, not an
    * array: the correctness harness hashes flat cells, and the string is
    * a faithful (order-preserving, lossless for integer ids) encoding
    * both engines produce identically. */
  def invertedIndex(spark: SparkSession, dir: String, minDf: Int = 50): DataFrame =
    docsWide(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(countDistinct("doc_id").as("df"),
        array_join(sort_array(collect_set(col("doc_id"))).cast("array<string>"), ",")
          .as("postings"))
      .filter(col("df") >= minDf)
      .orderBy("token")

  /** x18: deterministic train/test split — the reproducible-sampling
    * primitive of a training pipeline. Bucket = first byte of
    * md5(doc_id): uniform over 0..255, so <205 ≈ 80.1% train; the split
    * is a pure per-row function of the key — stable across runs, engines,
    * partitionings, and appends (new rows never reshuffle old ones),
    * unlike rand()/sample() whose draw depends on partition layout. */
  def hashSplit(spark: SparkSession, dir: String, trainBuckets: Int = 205): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10)
          .cast("int") < trainBuckets, "train").otherwise("test").as("split"))
      .orderBy("doc_id")

  /** x11: rolling-hash fingerprint (winnowing-style): min/max xxhash64 over
    * 5-token shingles — robust to local edits, used as a near-dup
    * prefilter. Not ANSI-SQL-expressible (xxhash64): covered by ScalaTest,
    * rows-only at the gate. */
  def rollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val tokens = split(col("text"), " ")
    val n = size(tokens)
    val shingles = when(n >= 5,
      transform(sequence(lit(0), n - 5), i => concat_ws(" ", slice(tokens, i + 1, lit(5)))))
      .otherwise(array(concat_ws(" ", tokens)))
    docsWide(spark, dir)
      .withColumn("shingle_hashes", transform(shingles, s => xxhash64(s)))
      .select(col("doc_id"),
        array_min(col("shingle_hashes")).as("fp_min"),
        array_max(col("shingle_hashes")).as("fp_max"))
      .orderBy("doc_id")
  }

  /** x11b: winnowing fingerprint selection (the MOSS scheme) — the
    * oracle-checked witness for the rolling-fingerprint family: from the
    * 5-token shingle hash sequence, select the minimum of every sliding
    * window of `w` hashes, dedup and sort the selections. Guarantees any
    * shared run of w+4 tokens contributes a shared fingerprint, so it's
    * the near-dup prefilter that bounds fingerprints per doc at ~n/w.
    * Hashes are md5-derived longs (same construction DuckDB can mirror,
    * see x2b); the production path stays xxhash64 (x11). One scan, all
    * array ops codegen-friendly, no shuffle. */
  def winnow(spark: SparkSession, dir: String, w: Int = 4): DataFrame = {
    val tokens = split(col("text"), " ")
    val n = size(tokens)
    val shingles = when(n >= 5,
      transform(sequence(lit(0), n - 5), i => concat_ws(" ", slice(tokens, i + 1, lit(5)))))
      .otherwise(array(concat_ws(" ", tokens)))
    val hashes = transform(shingles,
      s => conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long"))
    val nh = size(col("hl"))
    val wins = when(nh >= w,
      transform(sequence(lit(0), nh - w), i => array_min(slice(col("hl"), i + 1, lit(w)))))
      .otherwise(array(array_min(col("hl"))))
    docsWide(spark, dir)
      .withColumn("hl", hashes)
      .withColumn("sel", array_sort(array_distinct(wins)))
      .select(col("doc_id"),
        size(col("sel")).as("n_fp"),
        array_join(transform(col("sel"), x => x.cast("string")), ",").as("fp_csv"))
      .orderBy("doc_id")
  }

  /** x37: fused curation report — the per-doc curation signals (language
    * ID, token count, repetition stats) in ONE scan and one Generator
    * pass, instead of the N separate report jobs the individual gates
    * run. The scalar signals (lang scores, n_tokens) are computed in the
    * pre-explode projection, ride the bigram rows, and are recovered with
    * `first()` inside the same hash aggregates that compute the
    * repetition stats — at 100 TB this is the difference between reading
    * the corpus once and reading it N times. Docs with fewer than two
    * tokens have no bigrams and drop out (x28 semantics). */
  def curationReport(spark: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val base = docsWide(spark, dir)
      .select(col("doc_id") +: col("text") +: size(t).as("n_tokens") +:
        langMarkers.map { case (l, m) => langScore(m).as(s"score_$l") }: _*)
      .withColumn("predicted_lang", pickLang)
    base
      .select(col("doc_id"), col("predicted_lang"), col("n_tokens"),
        explode(zip_with(t, slice(t, lit(2), size(t)),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .groupBy(col("doc_id"), col("p.w1"), col("p.w2"))
      .agg(count(lit(1)).as("n"),
        first("predicted_lang").as("predicted_lang"), first("n_tokens").as("n_tokens"))
      .groupBy("doc_id")
      .agg(first("predicted_lang").as("predicted_lang"),
        first("n_tokens").as("n_tokens"),
        sum("n").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max("n").as("top_bigram_n"))
      .select(col("doc_id"), col("predicted_lang"), col("n_tokens"),
        col("n_bigrams"), col("n_distinct_bigrams"),
        ((col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams"))
          .as("dup_bigram_frac"),
        (col("top_bigram_n").cast("double") / col("n_bigrams")).as("top_bigram_share"))
      .orderBy("doc_id")
  }

  /** x25: corpus-wide adjacent token-pair counts — the inner loop of BPE
    * tokenizer training (each merge round picks the most frequent pair).
    * Pairs come from zipping the token array with its own tail — a
    * per-row Generator, no self-join — then one hash-aggregate. The
    * shuffle after partial aggregation carries one row per distinct pair
    * per task: vocabulary-sized, not corpus-sized, at any scale. A full
    * BPE trainer is this query in a loop with a merge step applied
    * between rounds (same layout as dedupClusters' iterate-and-checkpoint). */
  def pairCounts(spark: SparkSession, dir: String, topN: Int = 30): DataFrame = {
    val t = split(col("text"), " ")
    // zip_with pads the shorter side with null: the final (last-token,
    // null) pair is dropped by the filter; single-token docs produce none
    docsWide(spark, dir)
      .select(explode(zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w1"), col("w2"))
      .limit(topN)
  }

  /** x28: repetition statistics — the Gopher-style quality-filter signal
    * (repetitious documents are boilerplate/spam and get dropped before
    * training): per document, the duplicate-bigram fraction and the share
    * of the single most frequent bigram. Layout: one zip-with-tail
    * Generator (no self-join) → per-(doc, bigram) counts → per-doc
    * aggregate; both aggregations are hash-aggs with map-side partials,
    * so the shuffles carry (doc, bigram)-distinct then doc-distinct rows.
    * Docs with fewer than two tokens have no bigrams and drop out —
    * mirrored by the oracle. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    repetitionStatsOf(docsWide(spark, dir))

  /** Library form over any (doc_id, text) frame. */
  def repetitionStatsOf(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val pairs = docs
      .select(col("doc_id"), explode(zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
    pairs.groupBy(col("doc_id"), col("p.w1"), col("p.w2"))
      .agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max("n").as("top_bigram_n"))
      .withColumn("dup_bigram_frac",
        (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams"))
      .withColumn("top_bigram_share",
        col("top_bigram_n").cast("double") / col("n_bigrams"))
      .select("doc_id", "n_bigrams", "n_distinct_bigrams", "dup_bigram_frac",
        "top_bigram_share")
      .orderBy("doc_id")
  }

  /** x27: per-source quota capping — web corpora cap documents per domain
    * so no single host dominates training. Keeps the first `maxPerSource`
    * docs per source in md5(doc_id) order: a deterministic "random"
    * sample that is stable across runs/engines/appends (same rationale as
    * hashSplit). One keyed window — scales with per-source cardinality;
    * a pathological mega-source would switch to the hash-threshold
    * sample (x21 stratifiedSample) which needs no sort at all. */
  def sourceQuota(spark: SparkSession, dir: String, maxPerSource: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxPerSource)
      .select(col("doc_id"), col("source"), col("rk").cast("int").as("rk"))
      .orderBy("doc_id")
  }

  /** x56: bigram language-model quality score — the CCNet/KenLM-style
    * filter signal: train a bigram LM on the corpus itself (conditional
    * probability of each adjacent token pair given its prefix token),
    * then score every document by its mean conditional probability.
    * Fluent, common phrasing scores high; rare or shuffled token
    * sequences score low. Probabilities are quantized to exact integer
    * ppm (c_bigram·10⁶ div c_prefix) BEFORE the cross-row mean so the
    * score is bit-identical across engines (the quantized-integer trick:
    * a final double division of two exact longs is association-free).
    *
    * 100 TB: the LM is vocabulary²-bounded — orders of magnitude smaller
    * than the corpus — and both count aggregations are hash-aggs whose
    * shuffles carry one row per DISTINCT pair/prefix per task. Scoring
    * re-joins the bigram stream to the LM on the short bigram key; the
    * tokenize+explode pass is computed once behind a lazy checkpoint and
    * shared by training and scoring. Docs with <2 tokens have no bigrams
    * and drop out (mirrored by the oracle). */
  def bigramLmScore(spark: SparkSession, dir: String): DataFrame =
    bigramLmScoreDocs(docsWide(spark, dir))

  /** Library form over any (doc_id, text) frame. */
  def bigramLmScoreDocs(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    // zip-with-tail bigram Generator (see pairCounts): per-row, no self-join
    val bigrams = docs
      .select(col("doc_id"), explode(zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("doc_id"), col("p.w1").as("w1"),
        concat(col("p.w1"), lit(" "), col("p.w2")).as("bigram"))
      .localCheckpoint(eager = false)
    // grouping by (w1, bigram) keeps one row per bigram (w1 is a function
    // of the bigram) while carrying the prefix key for the c_uni join
    val cBig = bigrams.groupBy("w1", "bigram").agg(count(lit(1)).as("c_big"))
    val cUni = bigrams.groupBy("w1").agg(count(lit(1)).as("c_uni"))
    val lm = cBig.join(cUni, "w1")
      .select(col("bigram"), expr("c_big * 1000000L div c_uni").as("ppm"))
    bigrams.join(lm, "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("ppm").as("ppm_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("ppm_sum").cast("double") / col("n_bigrams")).as("lm_score_ppm"))
      .orderBy("doc_id")
  }

  /** x57: hashed linear classifier margin — the fasttext-style quality
    * classifier applied at corpus scale: each token hashes into one of
    * `dim` feature buckets (md5 prefix — stable across engines/runs),
    * each bucket carries a fixed small integer weight (LCG-derived here;
    * trained weights would broadcast exactly the same way), and a
    * document's margin is the mean bucket weight over its tokens, with a
    * keep/drop verdict at margin 0. Entirely map-side: the token array
    * is folded in-row with aggregate() — no explode, no join, no
    * shuffle; the only exchange is the presentation sort. This is the
    * shape a real model-based quality filter takes on Spark: weights in
    * the closure, one codegen'd scan over the corpus. */
  def classifierMargin(spark: SparkSession, dir: String, dim: Int = 256): DataFrame =
    classifierMarginDocs(docsWide(spark, dir), dim)

  /** x59: quality-filter ENSEMBLE — production curation (FineWeb,
    * RefinedWeb, Dolma) never trusts one signal: each doc gets an
    * independent vote from the heuristic quality score (x8), the bigram
    * LM (x56), and the hashed classifier (x57); majority keeps. Docs the
    * LM cannot score (<2 tokens) get a 0 LM vote rather than dropping
    * out. All three signals are exact cross-engine (x8's arithmetic is
    * bit-identical IEEE; x56/x57 vote on exact integers), so the votes —
    * not just the scores — hash-match the oracle.
    *
    * FUSED to one corpus read (the x37 pattern): the per-row signals
    * (x8 quality, x57 classifier) fold inline in the SAME projection
    * that feeds the bigram Generator, ride the bigram rows, and are
    * recovered with `first()` in the per-doc aggregate. Docs without
    * bigrams emit one null-bigram sentinel row so the short-doc 0 vote
    * falls out of the same aggregate instead of a second doc-level scan
    * + outer join. The lazy checkpoint makes the bigram stream — the
    * input to the LM training aggregates AND the scoring join — a
    * compute-once frame; at 100 TB this reads the corpus once where the
    * unfused form read it three times. */
  def filterEnsemble(spark: SparkSession, dir: String,
      minLmPpm: Long = 200000L, minQuality: Double = 0.6): DataFrame = {
    val t = split(col("text"), " ")
    val nTok = size(t)
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio =
      langScore(Seq(" the ", " a ", " of ", " and ")).cast("double") / nTok
    val pairs = filter(
      zip_with(t, slice(t, lit(2), size(t)), (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)
    val nullPair = array(struct(lit(null).cast("string").as("w1"),
      lit(null).cast("string").as("w2")))
    // 64-bit hash keys, not the token strings: the bigram stream is the
    // checkpointed frame every LM aggregate AND the scoring join shuffle
    // on, so carrying (w1, "w1 w2") strings makes every exchange
    // string-width. Both sides of the LM derive and probe with the SAME
    // keys, so any injective-enough stand-in works: xxhash64 collides a
    // unigram/bigram pair w.p. ~v²/2⁶⁴ (v = vocab; ~5e-8 even at 1M
    // vocab) — the standard hashed-LM trade. Sentinel rows (short docs)
    // keep null keys via the when-guard (xxhash64 of NULL is the seed
    // hash, NOT null, so the guard is load-bearing for the 0-vote path).
    val w1h = when(col("p.w1").isNotNull, xxhash64(col("p.w1")))
    val bh = when(col("p.w1").isNotNull, xxhash64(col("p.w1"), col("p.w2")))
    val bigrams = docsWide(spark, dir)
      .select(col("doc_id"),
        (qualityExpr(nTok, avgTokLen, stopRatio) >= minQuality).cast("int").as("v_q"),
        (clfWSum(t) >= 0).cast("int").as("v_clf"),
        explode(when(size(pairs) > 0, pairs).otherwise(nullPair)).as("p"))
      .select(col("doc_id"), col("v_q"), col("v_clf"),
        w1h.as("w1h"), bh.as("bh"))
      .localCheckpoint(eager = false)
    val real = bigrams.filter(col("bh").isNotNull)
    val cBig = real.groupBy("w1h", "bh").agg(count(lit(1)).as("c_big"))
    val cUni = real.groupBy("w1h").agg(count(lit(1)).as("c_uni"))
    val lm = cBig.join(cUni, "w1h")
      .select(col("bh"), expr("c_big * 1000000L div c_uni").as("ppm"))
    bigrams.join(lm, Seq("bh"), "left")
      .groupBy("doc_id")
      .agg(first("v_q").as("v_q"), first("v_clf").as("v_clf"),
        count(col("bh")).as("n_bigrams"), sum("ppm").as("ppm_sum"))
      .select(col("doc_id"), col("v_q"),
        when(col("n_bigrams") > 0 &&
            col("ppm_sum").cast("double") / col("n_bigrams") >= minLmPpm, 1)
          .otherwise(0).as("v_lm"),
        col("v_clf"))
      .withColumn("votes", col("v_q") + col("v_lm") + col("v_clf"))
      .withColumn("verdict", when(col("votes") >= 2, "keep").otherwise("drop"))
      .select("doc_id", "v_q", "v_lm", "v_clf", "votes", "verdict")
      .orderBy("doc_id")
  }

  /** e16's trained model: the bigram LM TABLE over a training frame, in
    * oracle-expressible STRING form (bigram → conditional ppm) — the
    * artifact a lake persists after each refresh and serves to scoring
    * jobs. x59's in-corpus ensemble hashes the keys because its bigram
    * stream is also its shuffle spine; a persisted, externally-consumed
    * model keeps the readable keys. */
  def bigramLmTableOf(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val bigrams = docs
      .select(explode(zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("p.w1").as("w1"),
        concat(col("p.w1"), lit(" "), col("p.w2")).as("bigram"))
      .localCheckpoint(eager = false)
    val cBig = bigrams.groupBy("w1", "bigram").agg(count(lit(1)).as("c_big"))
    val cUni = bigrams.groupBy("w1").agg(count(lit(1)).as("c_uni"))
    cBig.join(cUni, "w1")
      .select(col("bigram"), expr("c_big * 1000000L div c_uni").as("ppm"))
  }

  /** x59b (r14 VERDICT ask #6): the filter ensemble with the bigram LM
    * CAPPED to the top-V bigrams by count — the documented contract
    * change that bounds the LM's state under vocabulary growth. x59's
    * sf1-equivalent time ratio was 6.1× at 10× data purely because the
    * DISTINCT-bigram vocabulary grows near-linearly (bigram Heaps
    * exponents ≈ 0.7–1): the LM build's aggregate output, its join build
    * side, and the scoring join's probe table all grew with it. With a
    * fixed V the training aggregates still scan every bigram occurrence
    * (honestly linear in the corpus — unavoidable), but the MODEL and
    * every structure derived from it stay CONSTANT as the corpus grows,
    * which is also what production quality LMs (KenLM-style pruned
    * models) ship. Selection is a deterministic total order, identical
    * cross-engine: count desc, doc-frequency desc, bigram asc (bigram is
    * unique — a full tiebreak). The LM vote follows
    * `ensembleVerdictAgainstLm`'s convention: mean conditional ppm over
    * bigrams the capped model KNOWS; no known bigram → 0 vote.
    *
    * Plan note: the top-V is `orderBy(...).limit(V)` — Spark plans
    * TakeOrderedAndProject (a bounded per-partition heap + one V-row
    * merge), NOT a global window sort; the ranked table is the distinct-
    * bigram vocabulary, already ≪ corpus. FUSED to one corpus read like
    * x59 (per-row quality/clf votes ride the bigram rows through the
    * scoring aggregate, short docs via the null-bigram sentinel) — both
    * for the single-scan plan and so the per-row vote work is inside the
    * measured aggregate rather than a prunable trailing projection. */
  def filterEnsembleCapped(spark: SparkSession, dir: String,
      topV: Int = 500, minLmPpm: Long = 200000L,
      minQuality: Double = 0.6): DataFrame = {
    val t = split(col("text"), " ")
    val nTok = size(t)
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio =
      langScore(Seq(" the ", " a ", " of ", " and ")).cast("double") / nTok
    val pairs = filter(
      zip_with(t, slice(t, lit(2), size(t)), (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)
    val nullPair = array(struct(lit(null).cast("string").as("w1"),
      lit(null).cast("string").as("w2")))
    // STRING keys here, unlike x59's xxhash64 spine: the cap's tiebreak is
    // lexicographic on the bigram text, and the shuffled vocab is capped
    val bigrams = docsWide(spark, dir)
      .select(col("doc_id"),
        (qualityExpr(nTok, avgTokLen, stopRatio) >= minQuality).cast("int").as("v_q"),
        (clfWSum(t) >= 0).cast("int").as("v_clf"),
        explode(when(size(pairs) > 0, pairs).otherwise(nullPair)).as("p"))
      .select(col("doc_id"), col("v_q"), col("v_clf"), col("p.w1").as("w1"),
        when(col("p.w1").isNotNull,
          concat(col("p.w1"), lit(" "), col("p.w2"))).as("bigram"))
      .localCheckpoint(eager = false)
    val lm = cappedLmFrom(
      bigrams.filter(col("bigram").isNotNull).select("doc_id", "w1", "bigram"),
      topV)
    // left join: sentinel (null-bigram) and outside-the-cap rows keep a
    // null ppm; count(ppm) = KNOWN bigrams only — the capped-LM scoring
    // convention (no known bigram → 0 vote), mirrored by the oracle's
    // inner-join + coalesce
    bigrams.join(lm, Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg(first("v_q").as("v_q"), first("v_clf").as("v_clf"),
        count(col("ppm")).as("n_scored"), sum("ppm").as("ppm_sum"))
      .select(col("doc_id"), col("v_q"),
        when(col("n_scored") > 0 &&
            col("ppm_sum").cast("double") / col("n_scored") >= minLmPpm, 1)
          .otherwise(0).as("v_lm"),
        col("v_clf"))
      .withColumn("votes", col("v_q") + col("v_lm") + col("v_clf"))
      .withColumn("verdict", when(col("votes") >= 2, "keep").otherwise("drop"))
      .select("doc_id", "v_q", "v_lm", "v_clf", "votes", "verdict")
      .orderBy("doc_id")
  }

  /** Top-V bigram LM table over a training frame (see
    * `filterEnsembleCapped`): `bigramLmTableOf` plus per-bigram doc
    * frequency, capped by (c_big desc, df desc, bigram asc). */
  def cappedBigramLm(docs: DataFrame, topV: Int): DataFrame = {
    val t = split(col("text"), " ")
    val bigrams = docs
      .select(col("doc_id"), explode(zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("doc_id"), col("p.w1").as("w1"),
        concat(col("p.w1"), lit(" "), col("p.w2")).as("bigram"))
      .localCheckpoint(eager = false)
    cappedLmFrom(bigrams, topV)
  }

  /** The capped-LM tail shared by the trained-model builder
    * (`cappedBigramLm`) and the fused gate (`filterEnsembleCapped`):
    * (doc_id, w1, bigram) occurrence rows → top-V conditional-ppm table
    * under the (c_big desc, df desc, bigram asc) total order. ONE
    * definition of the selection and the ppm formula, so the gate and
    * the inference-path model can never drift from each other (both are
    * mirrored by the x59b oracle SQL). */
  private[llm] def cappedLmFrom(occurrences: DataFrame, topV: Int): DataFrame = {
    val cBig = occurrences.groupBy("w1", "bigram")
      .agg(count(lit(1)).as("c_big"), countDistinct("doc_id").as("df"))
    val cUni = occurrences.groupBy("w1").agg(count(lit(1)).as("c_uni"))
    cBig.join(cUni, "w1")
      .select(col("bigram"), expr("c_big * 1000000L div c_uni").as("ppm"),
        col("c_big"), col("df"))
      .orderBy(desc("c_big"), desc("df"), asc("bigram"))
      .limit(topV)
      .select("bigram", "ppm")
  }

  /** Score any (doc_id, text) frame against a TRAINED LM table with
    * x59's three-vote contract — the production INFERENCE motion (train
    * once on the corpus refresh, score every incoming batch): quality and
    * classifier votes fold per-row; the LM vote means the doc's mean
    * conditional ppm over bigrams the model KNOWS (unseen bigrams drop
    * out — x56's convention) clears the threshold, with no scored bigram
    * → a 0 vote. Scale: the scoring join is a bigram-keyed equi-join of
    * the batch against the model table; everything else is map-side. */
  def ensembleVerdictAgainstLm(docs: DataFrame, lm: DataFrame,
      minLmPpm: Long = 200000L, minQuality: Double = 0.6): DataFrame = {
    val t = split(col("text"), " ")
    val nTok = size(t)
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio =
      langScore(Seq(" the ", " a ", " of ", " and ")).cast("double") / nTok
    val base = docs.select(col("doc_id"),
      (qualityExpr(nTok, avgTokLen, stopRatio) >= minQuality).cast("int").as("v_q"),
      (clfWSum(t) >= 0).cast("int").as("v_clf"))
    val bigrams = docs
      .select(col("doc_id"), explode(zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("doc_id"),
        concat(col("p.w1"), lit(" "), col("p.w2")).as("bigram"))
    val scored = bigrams.join(lm, Seq("bigram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_scored"), sum("ppm").as("ppm_sum"))
    base.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("v_q"),
        when(col("n_scored").isNotNull &&
            col("ppm_sum").cast("double") / col("n_scored") >= minLmPpm, 1)
          .otherwise(0).as("v_lm"),
        col("v_clf"))
      .withColumn("votes", col("v_q") + col("v_lm") + col("v_clf"))
      .withColumn("verdict", when(col("votes") >= 2, "keep").otherwise("drop"))
      .select("doc_id", "v_q", "v_lm", "v_clf", "votes", "verdict")
  }

  /** x138: FROZEN-MODEL COVERAGE — the staleness monitor for e16's
    * serving loop: per source, the share of INCOMING (odd-half) bigrams
    * the frozen even-half model knows. A source whose coverage decays is
    * drifting away from the training snapshot — the retrain signal; x70
    * watches token-level OOV against a corpus vocabulary, this watches
    * bigram-level coverage against a DEPLOYED model. Scale: one bigram
    * equi-join of the incoming scan against the model table, collapsed
    * to a per-source aggregate. */
  def lmCoverage(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWide(spark, dir)
    val known = bigramLmTableOf(docs.filter(col("doc_id") % 2 === 0))
      .select(col("bigram"), lit(1L).as("known"))
    val t = split(col("text"), " ")
    val bigrams = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"),
        explode(zip_with(t, slice(t, lit(2), size(t)),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("doc_id"), col("source"),
        concat(col("p.w1"), lit(" "), col("p.w2")).as("bigram"))
    bigrams.join(known, Seq("bigram"), "left")
      .groupBy("source")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("known"), lit(0L))).as("n_known"))
      .withColumn("coverage_ppm", expr("n_known * 1000000 div n_bigrams"))
      .orderBy("source")
  }

  /** x57's in-row folded weight sum — shared by the x57 gate and the
    * fused x59 ensemble so the two can never drift. */
  private[llm] def clfWSum(toks: Column, dim: Int = 256): Column = {
    val bucket = (tok: Column) =>
      conv(substring(md5(tok.cast("binary")), 1, 4), 16, 10).cast("long") % dim
    val weight = (b: Column) =>
      pmod(b * lit(1103515245L) + lit(12345L), lit(101L)) - lit(50L)
    aggregate(toks, lit(0L), (acc, tok) => acc + weight(bucket(tok)))
  }

  /** x87: per-source DISTINCT-N diversity report — the corpus-level
    * complement of x28's per-doc repetition: distinct-1 (token) and
    * distinct-3 (shingle) ratios per source, the standard diversity
    * metric for spotting a source whose documents repeat each other
    * (template farms, boilerplate mirrors, synthetic-data mode collapse)
    * even when every individual document looks fine. A ratio near 1 means
    * nearly every n-gram in the source is unique; near 0 means the source
    * is recycling the same material.
    *
    * Scale: two explode→aggregate passes over one checkpointed token
    * scan. The exact distinct counts are two-level hash aggregates
    * (partial distinct per partition, then per-source) — the shuffle
    * carries the DISTINCT (source, gram) pairs, not the corpus; at lake
    * scale the a21 idiom applies (swap count_distinct for
    * approx_count_distinct's HLL sketch, mergeable and bounded). Ratios
    * are exact-long divisions — cross-engine bit-safe. */
  def distinctNgrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), split(col("text"), " ").as("t"))
      .localCheckpoint(eager = false)
    val uni = docs.select(col("source"), explode(col("t")).as("g"))
      .groupBy("source").agg(count(lit(1)).as("n_tokens"),
        countDistinct("g").as("n_distinct_tokens"))
    val tri = docs.select(col("source"), explode(DocDedup.shingles(col("t"))).as("g"))
      .groupBy("source").agg(count(lit(1)).as("n_shingles"),
        countDistinct("g").as("n_distinct_shingles"))
    uni.join(tri, "source")
      .select(col("source"), col("n_tokens"), col("n_distinct_tokens"),
        (col("n_distinct_tokens").cast("double") / col("n_tokens")).as("distinct1_ratio"),
        col("n_shingles"), col("n_distinct_shingles"),
        (col("n_distinct_shingles").cast("double") / col("n_shingles")).as("distinct3_ratio"))
      .orderBy("source")
  }

  /** x91: VOCABULARY COVERAGE SIZING — the smallest frequency-ranked
    * vocabulary reaching a token-coverage target (the number x70's OOV
    * rate takes as GIVEN): rank tokens by corpus frequency (ties by token,
    * so the cut is deterministic), take the running occurrence sum, and
    * report the first rank whose cumulative share clears the target —
    * plus the coverage actually achieved there and at a 2× budget. This
    * is how tokenizer vocab budgets are actually chosen: "how big must V
    * be for ≤1% OOV?".
    *
    * Scale: the heavy step is the token-frequency aggregate (map-side
    * combine, shuffle carries distinct tokens); the rank AND the running
    * occurrence sum are a DISTRIBUTED prefix-rank over the vocab table
    * (r16, closing the r15 `weak`: Heaps' law keeps the vocab sublinear
    * in corpus size but UNBOUNDED — the old vocab-wide
    * `sum().over(Window.orderBy(...))` ran the whole vocabulary through
    * one task; `DistributedRank` range-partitions it and stitches
    * per-partition running sums with P-row offsets). All arithmetic is
    * exact longs and integer ppm; the one-row output hashes bit-for-bit. */
  def vocabCoverage(spark: SparkSession, dir: String,
      targetPpm: Long = 990000L): DataFrame = {
    val freq = docsWide(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val ranked = graft.operators.DistributedRank.rankWithRunningSums(
      freq, Seq(desc("n"), asc("token")), "rank", Seq("n" -> "cum"))
    val totals = freq.agg(sum("n").as("total_tokens"),
      count(lit(1)).as("distinct_tokens"))
    // `div` (integer division), not `/` (Spark's / on longs yields
    // double); cum*1e6 fits a long to ~9e12 corpus tokens — past that the
    // same expressions run in decimal(38,0), the x46 idiom
    val cut = ranked.crossJoin(broadcast(totals))
      .filter(col("cum") * 1000000L >= lit(targetPpm) * col("total_tokens"))
      .orderBy("rank").limit(1)
      .select(col("rank").cast("long").as("vocab_size"),
        expr("cum * 1000000 div total_tokens").as("coverage_ppm"),
        col("total_tokens"), col("distinct_tokens"))
    // coverage at a 2× budget (clamped to the full vocab) — the marginal
    // value of doubling V, the number the budget decision actually weighs
    val at2x = ranked.crossJoin(broadcast(cut.select(
        col("vocab_size").as("vs"), col("distinct_tokens").as("dt"))))
      .filter(col("rank") === least(col("vs") * 2, col("dt")))
      .select(col("cum").as("cum2x"))
    cut.crossJoin(broadcast(at2x))
      .select(col("vocab_size"), col("coverage_ppm"),
        expr("cum2x * 1000000 div total_tokens").as("coverage_ppm_2x"),
        col("total_tokens"), col("distinct_tokens"))
  }

  /** x93: BOILERPLATE RATIO — the CCNet-style boilerplate signal at
    * shingle granularity: a 3-gram shingle that appears in at least
    * `thresholdPct`% of a source's documents is that source's boilerplate
    * (headers, navigation chrome, license footers repeat across a crawl
    * source; organic content does not). Each document is then scored by
    * the fraction of its shingle OCCURRENCES that are boilerplate — the
    * quality filter drops or trims high-ratio docs before training.
    *
    * Layout: one Generator pass explodes (doc, source, shingle)
    * occurrences; the boilerplate set is a per-(source, shingle)
    * distinct-doc count compared against the source's doc count — both
    * hash-aggs whose shuffles carry DISTINCT (source, shingle [, doc])
    * keys, never the corpus text. The occurrence→boilerplate check is an
    * equi-join on (source, shingle); the boilerplate side is
    * source-vocabulary-sized (shingles crossing the df threshold), small
    * enough to broadcast per source at any corpus size. All counts are
    * exact longs; the ratio is one long/long division — bit-exact
    * cross-engine. */
  def boilerplateRatio(spark: SparkSession, dir: String,
      thresholdPct: Int = 30): DataFrame = {
    val occ = docsWide(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(DocDedup.shingles(split(col("text"), " "))).as("sh"))
      .localCheckpoint(eager = false)
    val srcDocs = occ.select("source", "doc_id").distinct()
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val boiler = occ.select("source", "sh", "doc_id").distinct()
      .groupBy("source", "sh").agg(count(lit(1)).as("df"))
      .join(srcDocs, "source")
      .filter(col("df") * 100 >= col("n_docs") * thresholdPct)
      .select("source", "sh")
    occ.join(boiler.withColumn("is_boiler", lit(1L)), Seq("source", "sh"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
      .withColumn("boiler_ratio",
        col("n_boiler").cast("double") / col("n_shingles"))
      .select("doc_id", "source", "n_shingles", "n_boiler", "boiler_ratio")
      .orderBy("doc_id")
  }

  /** x99: PMI COLLOCATIONS — pointwise-mutual-information-ranked adjacent
    * token pairs, the standard collocation extractor (x25's raw pair
    * counts rank frequent GENERIC pairs; PMI ranks pairs that co-occur
    * far above what their unigram frequencies predict — the multi-word
    * expressions a tokenizer or phrase miner wants). A minimum pair count
    * screens out the unstable low-frequency tail, as usual.
    *
    * Determinism contract: PMI is reported as the raw ASSOCIATION RATIO
    * p(ab)/(p(a)p(b)) — the log is monotone, so the ranking is identical
    * and the transcendental (whose last-bit behavior is libm-specific) is
    * avoided. Every count is an exact long; the three divisions and one
    * multiplication are IEEE-correctly-rounded double ops evaluated in a
    * fixed parenthesization — bit-exact cross-engine.
    *
    * Scale: pair counts via the x25 zip-with-tail Generator (no self
    * join); both count aggregates shuffle DISTINCT pairs / tokens
    * (vocabulary-sized, Heaps-sublinear). The unigram side joins twice on
    * the pair endpoints as PLAIN equi-joins (r16: it IS the vocabulary —
    * Heaps-sublinear but UNBOUNDED, the exact frame the x41 fix stopped
    * broadcasting; a hint would demand an O(vocab) broadcast at 100 TB,
    * while unhinted planning broadcasts from MEASURED sizes at gate scale
    * and degrades to a shuffle join when the vocab outgrows the
    * threshold). The two 1-row totals frames stay the sanctioned
    * broadcast-stat-probe shape (PlanAuditSpec). */
  def pmiCollocations(spark: SparkSession, dir: String,
      minCount: Int = 5, topN: Int = 30): DataFrame = {
    val t = split(col("text"), " ")
    val toks = docsWide(spark, dir).select(t.as("t"))
      .localCheckpoint(eager = false)
    val pairsAll = toks
      .select(explode(zip_with(col("t"), slice(col("t"), lit(2), size(col("t"))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(eager = false)
    val pairs = pairsAll.filter(col("n_ab") >= minCount)
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val totals = uni.agg(sum("n_w").as("n_uni"))
    // p(ab) normalizes by ALL adjacent pairs, not just those clearing the
    // min-count screen — the screen gates OUTPUT, not the distribution
    val pairTotal = pairsAll.agg(sum("n_ab").as("n_bi"))
    pairs
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(pairTotal))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab").cast("double") / col("n_bi")) /
          ((col("n_a").cast("double") / col("n_uni")) *
           (col("n_b").cast("double") / col("n_uni")))).as("assoc_ratio"))
      .orderBy(desc("assoc_ratio"), col("w1"), col("w2"))
      .limit(topN)
  }

  /** x101: MIXED-LANGUAGE DETECTION — the flag x7's single-label argmax
    * cannot express: a document whose SECOND-best language score is a
    * sizable fraction of the best is code-switched or a concatenation of
    * two languages, and monolingual training pipelines either drop or
    * segment it (the mC4/CCNet practice) rather than mislabel the whole
    * doc with the winner. Rule: mixed ⇔ second > 0 ∧ 2·second ≥ best —
    * pure integer marker-hit arithmetic, bit-exact cross-engine.
    *
    * Scale: identical to x7 — one codegen'd projection pass, no shuffle;
    * the second-best extraction is a 4-element array_sort per row. */
  def mixedLanguage(spark: SparkSession, dir: String): DataFrame = {
    val scores = langMarkers.map { case (l, m) => langScore(m).as(s"score_$l") }
    val arr = array_sort(array(langMarkers.map { case (l, _) => col(s"score_$l") }: _*))
    docsWide(spark, dir)
      .select(col("doc_id") +: scores: _*)
      .withColumn("predicted_lang", pickLang)
      // index relative to the marker-list size, not a hardcoded 4: adding
      // a language to langMarkers must not silently demote best_score
      .withColumn("best_score", element_at(arr, langMarkers.size))
      .withColumn("second_score", element_at(arr, langMarkers.size - 1))
      .withColumn("is_mixed",
        when(col("second_score") > 0 &&
          col("second_score") * 2 >= col("best_score"), lit(1)).otherwise(lit(0)))
      .select("doc_id", "predicted_lang", "best_score", "second_score", "is_mixed")
      .orderBy("doc_id")
  }

  /** Library form over any (doc_id, text) frame. */
  def classifierMarginDocs(docs: DataFrame, dim: Int = 256): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"), size(toks).as("n_tokens"),
        clfWSum(toks, dim).as("w_sum"))
      .withColumn("margin", col("w_sum").cast("double") / col("n_tokens"))
      .withColumn("verdict",
        when(col("margin") >= 0, lit("keep")).otherwise(lit("drop")))
      .orderBy("doc_id")
  }

  /** x113: CLASSIFIER CALIBRATION CURVE — per bin of the x57 hashed-
    * classifier margin, how often the INDEPENDENT heuristic quality gate
    * (x8's score at the x59 ensemble threshold 0.6) agrees the document
    * is good. This is the reliability diagram a curation owner reads
    * before moving the classifier's keep/drop cut: a well-calibrated
    * filter shows good-rate rising monotonically with the margin bin; a
    * flat curve means the cheap classifier adds nothing over the
    * heuristic, and a high-margin bin with a low good-rate is the
    * Goodhart drift check after retraining.
    *
    * Exactness: both signals are exact per row (w_sum is an integer fold;
    * x8's arithmetic is bit-identical IEEE), the bin is
    * floor(10·w_sum/n_tokens) computed with ONE double division of exact
    * values, and the published rate is an integer-ppm `div`.
    *
    * Scale: entirely map-side — both signals fold inline in the SAME
    * projection (the x59 fused-scan pattern, minus the LM), so one corpus
    * read feeds a hash-agg keyed by the handful of margin bins. */
  def classifierCalibration(spark: SparkSession, dir: String): DataFrame =
    classifierCalibrationOf(docsWide(spark, dir))

  /** The session-lifetime ensemble-votes artifact: x59's per-document
    * vote table materialized ONCE per corpus refresh (the pair-artifact /
    * KNN-graph contract) — the ensemble's LM-training scan is the
    * text-side cost every votes consumer would otherwise repeat. The
    * `x59_filter_ensemble` gate itself still runs the live fused
    * pipeline, so its cost stays measured; ints round-trip parquet
    * bit-exactly. */
  def ensembleVotesArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.materializeOnce(spark, s"x59_votes:$dir")(filterEnsemble(spark, dir))

  /** x120: TEMPLATE-PREFIX DETECTOR — per source, the most repeated
    * document OPENINGS (first-w-token prefixes) with their within-source
    * share: the decision table for header-stripping rules. x93 flags
    * boilerplate n-grams anywhere in a document; this table localizes
    * the template to the document START, which is what a strip rule can
    * actually act on — a prefix carried by a quarter of a crawl's
    * documents is a site template, not content, and it poisons both
    * near-dup banding (shared leading shingles) and the LM-based quality
    * scores.
    *
    * Exactness: prefixes are exact strings; shares integer-ppm
    * floor-divs; top-k by (count desc, prefix asc) is deterministic.
    *
    * Scale: one corpus scan projects (source, 8-token prefix); the
    * (source, prefix)-keyed count collapses map-side; the top-3 window
    * is the bounded per-key-heap shape, keyed by |sources| groups. */
  def templatePrefixes(spark: SparkSession, dir: String, width: Int = 8,
      k: Int = 3): DataFrame =
    templatePrefixesOf(docsWide(spark, dir), width, k)

  /** Library form over any (source, text) frame. */
  def templatePrefixesOf(docs: DataFrame, width: Int = 8,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col("source"),
        array_join(slice(split(col("text"), " "), 1, width), " ").as("prefix"))
      .groupBy("source", "prefix")
      .agg(count(lit(1)).as("n_docs"))
    val totals = counts.groupBy("source").agg(sum("n_docs").as("n_total"))
    counts
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(desc("n_docs"), asc("prefix"))))
      .filter(col("rnk") <= k)
      .join(broadcast(totals), "source")
      .select(col("source"), col("rnk"), col("prefix"), col("n_docs"),
        expr("(n_docs * 1000000L) div n_total").as("share_ppm"))
      .orderBy("source", "rnk")
  }

  /** x118: FILTER DISAGREEMENT MATRIX — where do the three quality
    * signals (x8 heuristic, x56 bigram LM, x57 hashed classifier) vote
    * differently, and in which sources? The x59 ensemble publishes the
    * majority verdict; THIS table is what its owner reads when tuning it:
    * each (source, vote-pattern) cell with its count and within-source
    * share. A source where the LM and the classifier systematically
    * disagree is where a threshold is mis-set for that domain — and
    * unanimous cells are the safe mass no tuning will move.
    *
    * Exactness: the votes are x59's (all exact cross-engine); shares are
    * integer-ppm floor-divs of exact counts.
    *
    * Scale: rides x59's fused one-read scan; the cell aggregate is keyed
    * by (source, 3 bits) — at most 8·|sources| rows — and the totals
    * join broadcasts. */
  def filterDisagreement(spark: SparkSession, dir: String): DataFrame = {
    val cells = ensembleVotesArtifact(spark, dir)
      .select("doc_id", "v_q", "v_lm", "v_clf")
      .join(graft.Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .groupBy("source", "v_q", "v_lm", "v_clf")
      .agg(count(lit(1)).as("n_docs"))
    val totals = cells.groupBy("source").agg(sum("n_docs").as("n_total"))
    cells.join(broadcast(totals), "source")
      .select(col("source"), col("v_q"), col("v_lm"), col("v_clf"), col("n_docs"),
        expr("(n_docs * 1000000L) div n_total").as("share_ppm"),
        (col("v_q") === col("v_lm") && col("v_lm") === col("v_clf"))
          .cast("int").as("unanimous"))
      .orderBy("source", "v_q", "v_lm", "v_clf")
  }

  /** x116: TOKENIZER FERTILITY BY LANGUAGE — per detected language, how
    * many BPE-ish tokens each whitespace word costs and how many
    * characters each BPE-ish token carries. Fertility is THE
    * tokenizer-evaluation table for a multilingual corpus: a language
    * whose bpe-per-word ratio is far above the corpus norm is being
    * over-segmented (its documents burn sequence budget faster, skewing
    * the x103 seq-len decision and the x63/x92 token budgets), and a
    * drifting chars-per-token after a tokenizer change flags a
    * regression for that language before training does.
    *
    * Exactness: all three counts are exact integers per row, summed as
    * longs (order-free); both fertility ratios publish as integer-ppm
    * floor-divs of exact totals.
    *
    * Scale: one fused corpus scan (the language argmax and the three
    * counts fold in the same projection — no join against x7's table);
    * the shuffle carries one 4-long row per document into a hash-agg
    * keyed by the handful of languages. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    tokenizerFertilityOf(docsWide(spark, dir))

  /** Library form over any (doc_id, text) frame. */
  def tokenizerFertilityOf(docs: DataFrame): DataFrame =
    docs
      .select(Seq(
        size(split(col("text"), " ")).cast("long").as("n_ws"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_bpe"),
        length(col("text")).cast("long").as("n_chars")) ++
        langMarkers.map { case (l, m) => langScore(m).as(s"score_$l") }: _*)
      .withColumn("lang", pickLang)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_ws").as("n_ws_tokens"),
        sum("n_bpe").as("n_bpe_tokens"), sum("n_chars").as("n_chars_total"))
      .withColumn("bpe_per_ws_ppm",
        expr("(n_bpe_tokens * 1000000L) div n_ws_tokens"))
      .withColumn("chars_per_bpe_ppm",
        expr("(n_chars_total * 1000000L) div n_bpe_tokens"))
      .orderBy("lang")

  /** Library form over any (doc_id, text) frame. */
  def classifierCalibrationOf(docs: DataFrame, dim: Int = 256,
      goodAt: Double = 0.6): DataFrame = {
    val t = split(col("text"), " ")
    val nTok = size(t)
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio =
      langScore(Seq(" the ", " a ", " of ", " and ")).cast("double") / nTok
    val q = qualityExpr(nTok, avgTokLen, stopRatio)
    docs
      .select(
        floor(clfWSum(t, dim).cast("double") * lit(10.0) / nTok.cast("double"))
          .cast("long").as("margin_bin"),
        when(q >= goodAt, 1L).otherwise(0L).as("good"))
      .groupBy("margin_bin")
      .agg(count(lit(1)).as("n_docs"), sum("good").as("n_good"))
      .withColumn("good_ppm", expr("(n_good * 1000000L) div n_docs"))
      .orderBy("margin_bin")
  }
}

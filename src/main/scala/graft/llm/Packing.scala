package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence construction for LLM training: packing short documents into
  * fixed token budgets and chunking long documents into overlapping
  * windows — the two layout transforms between a cleaned corpus and a
  * trainer's fixed-length batches.
  */
object Packing {

  /** x19: greedy sequence packing — assign each doc to a pack so packs
    * hold ~`budget` tokens. Distributed layout: docs first land in one of
    * 16 md5 hash buckets (pure function of doc_id — append-stable
    * like `TextStats.hashSplit`), then a per-bucket running token total
    * assigns pack = floor(tokens-before-me / budget). The window sorts
    * WITHIN buckets only — 16 independent partition sorts, never a global
    * sort — and pack ids are bucket-prefixed so they never collide across
    * buckets. A doc straddling a boundary belongs to the pack where it
    * starts (standard streaming-packing approximation; packs overshoot by
    * at most one doc). */
  def sequencePacking(spark: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    // 16 md5 buckets (one hex digit) — fixed, matching the oracle SQL;
    // a skew-heavier corpus would take more hex digits, not a parameter
    // this gate can vary
    val bucket = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1), 16, 10)
      .cast("int")
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("bucket", bucket)
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("n_tokens"),
        // 2⁴⁰ id stride: pack numbers are cumulative-token counts / budget,
        // which pass 10⁶ per bucket well inside the 100 TB target — a
        // narrow multiplier would silently collide adjacent buckets' ids.
        // 2⁴⁰ holds ~10¹² packs per bucket (≈ 5·10¹⁴ tokens at budget 512)
        // before overflow, with 2²³ buckets of headroom in the long
        (col("bucket").cast("long") * (1L << 40) +
          floor((col("cum") - col("n_tokens")) / budget)).as("pack_id"))
      .orderBy("doc_id")
  }

  /** x64: LENGTH-GROUPED batching — sort each shard's docs by token count
    * and cut fixed-size batches, so every batch holds similarly-sized
    * sequences and per-batch padding waste (batch_max − doc tokens) is
    * minimized — the standard dynamic-batching layout of LLM training
    * loaders. Shards are md5-derived (append-stable, like x33's export
    * order); the sort is WITHIN shards only — nShards independent
    * partition sorts, never a global sort; batch ids are shard-prefixed
    * so they never collide. Deterministic: (n_tokens, doc_id) is a total
    * order.
    *
    * 100 TB: one scan → per-shard window — the exact physical pattern of
    * a sharded training-data export; batch-level padding stats come from
    * one more hash-agg over (shard, batch). */
  def lengthBatches(spark: SparkSession, dir: String, nShards: Int = 8,
      batchDocs: Int = 16): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy("shard").orderBy("n_tokens", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("shard", (h % nShards).cast("int"))
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        // `div`: Spark's `/` is always double division. 2⁴⁰ id stride:
        // batch numbers are per-shard doc counts / batchDocs, which pass
        // 10⁶ beyond ~16M docs per shard — plausible at 100 TB; 2⁴⁰ holds
        // ~10¹² batches per shard before adjacent shards' ids can collide
        (col("shard").cast("long") * (1L << 40) +
          expr(s"(rn - 1) div $batchDocs")).as("batch_id"))
      .orderBy("doc_id")
  }

  /** x20: overlapping chunking — split each document into windows of
    * `size` chars every `stride` chars (size - stride chars of overlap),
    * the RAG/pretraining context-window transform. One Generator
    * (posexplode over an offset sequence) per row: no shuffle, no UDF,
    * output grows by len/stride per doc at any scale. */
  def chunkDocuments(spark: SparkSession, dir: String, size: Int = 200,
      stride: Int = 150): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val nChunks = (floor((length(col("text")) - 1) / stride) + 1).cast("int")
    // empty text → zero chunks (sequence(0, -1) would count DOWN and emit
    // two bogus chunks; the oracle's range(0) is empty — match it)
    val offsets = when(length(col("text")) > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        explode(offsets).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        expr(s"substring(text, chunk_idx * $stride + 1, $size)").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** x52: concat-and-chop sequence packing — the OTHER packing layout:
    * where x19 assigns whole documents to a pack (no doc ever splits,
    * packs overshoot), this concatenates the deterministically-shuffled
    * token stream (x33's order: md5(doc_id) within md5-keyed shards) and
    * chops it into EXACT `seqLen`-token training sequences, splitting a
    * document wherever it straddles a boundary — the GPT-style layout
    * where every sequence is full and attention masks handle the seams.
    * Output maps each (shard, seq_id) to the doc fragments filling it:
    * `frag_begin` (1-based token index within the doc) and `frag_len`.
    *
    * All arithmetic is integer: the within-shard running offset is a
    * cumulative token count in shuffle order, a doc's global span is
    * [begin0, begin0 + n_tok - 1], and it lands in sequences
    * begin0/L .. end0/L with fragment bounds clamped to each sequence's
    * [s*L, (s+1)*L - 1] window.
    *
    * 100 TB: one hash shuffle on the shard key + an in-shard sort — the
    * same movement as the x33 export it piggybacks on; the window is
    * PARTITIONED (per-shard), never a single-task global scan, and shard
    * count scales with the corpus (8 fits the local fixture). */
  def packChop(spark: SparkSession, dir: String, nShards: Int = 8,
      seqLen: Int = 256): DataFrame = {
    val L = seqLen.toLong
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val docs = Tables.widen(Tables.documents(spark, dir))
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"),
        h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("begin0", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("end0", col("begin0") + col("n_tok") - 1)
      // `div` (IntegralDivide), not `/`: float division would round token
      // offsets past 2^53 — an exact long stays exact at any corpus size
      .withColumn("seq_id",
        explode(sequence(expr(s"begin0 div $L"), expr(s"end0 div $L"))))
      .select(col("shard"), col("seq_id").cast("int").as("seq_id"), col("doc_id"),
        (greatest(col("begin0"), col("seq_id") * L) - col("begin0") + 1).as("frag_begin"),
        (least(col("end0"), (col("seq_id") + 1) * L - 1)
          - greatest(col("begin0"), col("seq_id") * L) + 1).as("frag_len"))
      .orderBy("shard", "seq_id", "doc_id")
  }

  /** x103: SEQUENCE-LENGTH BUDGET SIZING — the max_seq_len decision table
    * (x91's "how big must the budget be" question, asked of sequence
    * length instead of vocabulary): for each candidate budget, how many
    * documents get truncated, what fraction of corpus tokens is lost to
    * truncation, and what fraction of a doc-per-sequence batch is padding
    * waste. Truncation loss falls and padding waste rises with the
    * budget; the table exposes the tradeoff a pipeline picks its training
    * length from (then x52's concat-and-chop removes the padding term —
    * this table also quantifies what chopping saves).
    *
    * Scale: ONE corpus scan — each doc's token count fans out over the
    * candidate-budget array with a Generator (|budgets| rows per doc,
    * collapsed map-side by the hash-agg on budget); every stat is an exact
    * long, ratios are integer-ppm `div` arithmetic. */
  def seqlenBudget(spark: SparkSession, dir: String,
      budgets: Seq[Int] = Seq(128, 256, 512, 1024)): DataFrame =
    seqlenBudgetOf(Tables.widen(Tables.documents(spark, dir)), budgets)

  /** Library form over any (text) frame. */
  def seqlenBudgetOf(docs: DataFrame,
      budgets: Seq[Int] = Seq(128, 256, 512, 1024)): DataFrame = {
    docs
      .select(size(split(col("text"), " ")).cast("long").as("len"))
      .select(col("len"), explode(array(budgets.map(b => lit(b.toLong)): _*)).as("budget"))
      .groupBy("budget")
      .agg(count(lit(1)).as("n_docs"),
        sum("len").as("tokens_total"),
        sum(when(col("len") > col("budget"), 1L).otherwise(0L)).as("n_truncated"),
        sum(greatest(col("len") - col("budget"), lit(0L))).as("tokens_lost"),
        sum(col("budget") - least(col("len"), col("budget"))).as("pad_tokens"))
      .select(col("budget"), col("n_docs"), col("n_truncated"),
        col("tokens_total"), col("tokens_lost"),
        expr("tokens_lost * 1000000 div tokens_total").as("lost_ppm"),
        expr("pad_tokens * 1000000 div (n_docs * budget)").as("pad_ppm"))
      .orderBy("budget")
  }
}

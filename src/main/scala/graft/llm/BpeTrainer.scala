package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-loop TRAINER — the iterative operator whose inner
  * loop is the x25 pair-count gate: each round counts adjacent token pairs
  * across the corpus, promotes the most frequent pair to a new symbol, and
  * rewrites the corpus with that pair merged (greedy, left-to-right,
  * non-overlapping — reference BPE semantics).
  *
  * Scale layout mirrors the repo's other iterative operators
  * (`DocDedup.dedupClusters`, k-means): per round, ONE corpus-wide hash
  * aggregate with map-side partials (the shuffle carries
  * vocabulary-sized pair rows, never the token stream), ONE driver-side
  * row (the winning merge rule — the trainer state by definition), and a
  * lazy localCheckpoint to keep lineage flat across rounds. The merge
  * rewrite itself is a pure per-row fold — no shuffle.
  */
object BpeTrainer {

  /** Greedy left-to-right merge of adjacent (w1, w2) into one symbol.
    * Single sequential fold per row: the accumulator carries the emitted
    * prefix and a one-token lookbehind, so "a a a" with pair (a, a)
    * yields ["a+a", "a"] — a merge consumes its right token and cannot
    * overlap the next occurrence, exactly the reference BPE behavior. */
  def mergePair(toks: Column, w1: String, w2: String, sep: String = ""): Column = {
    val merged = w1 + sep + w2
    val init = struct(array().cast("array<string>").as("out"),
      lit(null).cast("string").as("prev"))
    aggregate(toks, init,
      (acc, t) => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        val flushed = when(prev.isNull, out).otherwise(concat(out, array(prev)))
        when(prev <=> lit(w1) && t <=> lit(w2),
          struct(concat(out, array(lit(merged))).cast("array<string>").as("out"),
            lit(null).cast("string").as("prev")))
          .otherwise(struct(flushed.cast("array<string>").as("out"),
            t.cast("string").as("prev")))
      },
      acc => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        when(prev.isNull, out).otherwise(concat(out, array(prev)))
      })
  }

  /** Adjacent-pair counts over a (doc_id, toks) corpus (the x25 layout). */
  private def pairCounts(corpus: DataFrame): DataFrame =
    corpus
      .select(explode(zip_with(col("toks"), slice(col("toks"), lit(2), size(col("toks"))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))

  /** One learned merge rule: the pair, its corpus count when promoted,
    * and its round index (0-based — the apply order at tokenize time). */
  final case class Merge(w1: String, w2: String, n: Long, round: Int)

  /** Tokenize-time twin of `train`: apply an ordered merge table by
    * folding the rules in learned order — the plan composes one fold per
    * rule, fine for the small merge tables trained here (a production
    * tokenizer with 50k merges would compile the table into a single
    * trie-walking expression instead; same dataflow, zero shuffles). */
  def tokenize(docs: DataFrame, merges: Seq[Merge], sep: String = ""): DataFrame =
    merges.sortBy(_.round).foldLeft(
      docs.select(col("doc_id"), split(col("text"), " ").as("toks"))) {
      (c, m) => c.withColumn("toks", mergePair(col("toks"), m.w1, m.w2, sep))
    }

  /** Train `nMerges` rounds over a (doc_id, text) frame; stops early when
    * no pair reaches `minCount`. Returns the ordered merge table and the
    * rewritten corpus (doc_id, toks). Ties break deterministically on
    * (count desc, w1, w2). */
  def train(docs: DataFrame, nMerges: Int, minCount: Long = 2,
      sep: String = ""): (Seq[Merge], DataFrame) = {
    require(nMerges >= 0 && minCount >= 1)
    var corpus = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .localCheckpoint(eager = false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = pairCounts(corpus)
        .orderBy(desc("n"), asc("w1"), asc("w2"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(a, b, n, round)
        corpus = corpus.withColumn("toks", mergePair(col("toks"), a, b, sep))
          .localCheckpoint(eager = false)
        round += 1
      }
    }
    (merges.toSeq, corpus)
  }
}

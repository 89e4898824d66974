package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("sequence packing: every doc packed once, packs near the token budget") {
    val packed = Packing.sequencePacking(spark, sfDir, budget = 512).cache()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(packed.count() == nDocs, "every doc in exactly one pack")
    val packs = packed.groupBy("pack_id").agg(sum("n_tokens").as("tok"),
      max(col("n_tokens")).as("maxdoc"))
    // greedy streaming packing: a pack never exceeds budget + its last doc
    assert(packs.filter(col("tok") > lit(512) + col("maxdoc")).count() == 0)
    // packs are reasonably full: mean utilization above half the budget
    // (excluding each bucket's final partial pack, at most 16 of them)
    val full = packs.count() - 16
    if (full > 0) {
      val meanTok = packs.orderBy(desc("tok")).limit(full.toInt)
        .agg(avg("tok")).head().getDouble(0)
      assert(meanTok > 256, s"mean pack fill $meanTok")
    }
  }

  test("chunking: chunks reassemble to the original text") {
    val docs = graft.Tables.documents(spark, sfDir)
    val chunks = Packing.chunkDocuments(spark, sfDir, size = 200, stride = 150)
    // stride < size -> 50-char overlap; strip it from every non-first
    // chunk, then reassemble in chunk_idx order (array_sort on structs —
    // collect_list order is nondeterministic)
    val rebuilt2 = chunks
      .withColumn("piece", when(col("chunk_idx") === 0, col("chunk_text"))
        .otherwise(expr("substring(chunk_text, 51, 150)")))
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("chunk_idx"), col("piece")))),
        x => x("piece")), "").as("joined"))
    val diff = rebuilt2.join(docs, "doc_id")
      .filter(col("joined") =!= col("text"))
    assert(diff.count() == 0, "overlap-stripped chunks must reassemble the document")
  }

  test("chunking: every chunk is at most `size` chars and strides align") {
    val chunks = Packing.chunkDocuments(spark, sfDir, size = 200, stride = 150)
    assert(chunks.filter(length(col("chunk_text")) > 200).count() == 0)
    assert(chunks.filter(length(col("chunk_text")) === 0).count() == 0,
      "no empty trailing chunks (offset formula bounds the sequence)")
  }

  test("pack-chop: fragments tile every document exactly and fill every sequence") {
    val frags = Packing.packChop(spark, sfDir, nShards = 8, seqLen = 256).cache()
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    // every token of every doc is placed exactly once: per-doc frag_len
    // sums to n_tok, fragments start at 1 and stay in bounds
    val perDoc = frags.groupBy("doc_id")
      .agg(sum("frag_len").as("placed"), min("frag_begin").as("fb"),
        max(col("frag_begin") + col("frag_len") - 1).as("fe"))
      .join(docs, "doc_id")
    assert(perDoc.filter(col("placed") =!= col("n_tok") ||
      col("fb") =!= 1 || col("fe") =!= col("n_tok")).count() == 0,
      "fragments must tile each document [1, n_tok] with no gap or overlap")
    // every sequence except each shard's last is EXACTLY seqLen tokens —
    // the whole point of chop-packing (x19's greedy form overshoots)
    val perSeq = frags.groupBy("shard", "seq_id").agg(sum("frag_len").as("tok"))
    val lastSeq = perSeq.groupBy("shard").agg(max("seq_id").as("seq_id"))
    val full = perSeq.join(lastSeq, Seq("shard", "seq_id"), "left_anti")
    assert(full.filter(col("tok") =!= 256).count() == 0,
      "every non-final sequence holds exactly seqLen tokens")
    assert(perSeq.join(lastSeq, Seq("shard", "seq_id")).filter(col("tok") > 256).count() == 0,
      "final sequences never exceed seqLen")
    frags.unpersist()
  }

  test("pack-chop: a doc splits across a boundary with contiguous fragments") {
    // with seqLen below the max doc length, at least one doc must split;
    // its fragments occupy consecutive seq_ids and abut within the doc
    val frags = Packing.packChop(spark, sfDir, nShards = 4, seqLen = 64).cache()
    val split = frags.groupBy("doc_id").agg(count(lit(1)).as("n"),
      (max("seq_id") - min("seq_id") + 1).as("span"))
      .filter(col("n") > 1)
    assert(split.count() > 0, "seqLen=64 must split some docs")
    assert(split.filter(col("n") =!= col("span")).count() == 0,
      "a split doc's fragments sit in consecutive sequences of one shard")
    frags.unpersist()
  }

  test("stratified sample: exact per-stratum budgets, deterministic, rewrite fires") {
    graft.functions.GraftFunctions.register(spark) // rule + TopK strategy
    val sampled = Curation.stratifiedSample(spark, sfDir, perStratum = 25)
    // the row_number idiom must hit the TopKPerKey rewrite (bounded heap,
    // no full-width spillable sort) — the optimizer showcase on a real stage
    assert(sampled.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val got = sampled.cache()
    val sizes = graft.Tables.documents(spark, sfDir).groupBy("lang")
      .agg(count(lit(1)).as("n"))
    val perLang = got.groupBy("lang").agg(count(lit(1)).as("k")).join(sizes, "lang")
    assert(perLang.filter(col("k") =!= least(col("n"), lit(25))).count() == 0,
      "each stratum yields min(25, stratum size) docs")
    // md5-keyed draw: a rerun reproduces the identical sample
    val again = Curation.stratifiedSample(spark, sfDir, perStratum = 25)
    assert(got.except(again).count() == 0 && again.except(got).count() == 0)
    got.unpersist()
  }

  test("length batches: contiguous by length, bounded size, less padding than naive") {
    val lb = Packing.lengthBatches(spark, sfDir).cache()
    // every doc batched exactly once
    assert(lb.count() == graft.Tables.documents(spark, sfDir).count())
    assert(lb.select("doc_id").distinct().count() == lb.count())
    // batch size bound: <= 16 docs; only the last batch per shard is short
    val sizes = lb.groupBy("shard", "batch_id").count()
    assert(sizes.filter(col("count") > 16).count() == 0)
    val shortPerShard = sizes.filter(col("count") < 16)
      .groupBy("shard").count().filter(col("count") > 1)
    assert(shortPerShard.count() == 0, "at most one short (tail) batch per shard")
    // length contiguity: within a shard, batch b's max tokens <= batch
    // (b+1)'s min tokens (the defining property of length grouping)
    val stats = lb.groupBy("shard", "batch_id")
      .agg(min("n_tokens").as("mn"), max("n_tokens").as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    stats.foreach { case (_, batches) =>
      val ordered = batches.sortBy(_._2).toSeq
      ordered.sliding(2).foreach { pair =>
        if (pair.size == 2)
          assert(pair(0)._4 <= pair(1)._3,
            "batches must be length-contiguous within a shard")
      }
    }
    // the point of the operator: per-batch padding waste (batch max − doc
    // tokens) is lower than naive doc_id-ordered batching on the same shards
    def waste(df: org.apache.spark.sql.DataFrame): Double = df
      .withColumn("mx", max("n_tokens").over(
        org.apache.spark.sql.expressions.Window.partitionBy("batch_id")))
      .agg(sum(col("mx") - col("n_tokens"))).head().getLong(0).toDouble
    val naive = lb.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id")))
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        (col("shard").cast("long") * (1L << 40) + expr("(rn - 1) div 16")).as("batch_id"))
    assert(waste(lb) < waste(naive),
      s"length grouping must cut padding: ${waste(lb)} vs naive ${waste(naive)}")
    lb.unpersist()
  }
}

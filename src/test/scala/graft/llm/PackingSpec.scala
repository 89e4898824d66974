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
}

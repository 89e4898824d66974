package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over the documents corpus: BM25 scoring and
  * lexical+vector hybrid fusion (reciprocal-rank fusion) — the search
  * side of a training-data platform (mining examples by query, hard-
  * negative selection, eval-set retrieval).
  *
  * ALL scoring is integer fixed-point (parts-per-million), so ranked
  * lists and scores are bit-identical across engines:
  *  - idf is the log-free Robertson–Spärck-Jones odds ratio
  *    `((N - df)·2 + 1)·1e6 div (df·2 + 1)` — monotone in the classical
  *    `log((N-df+0.5)/(df+0.5))`, so rankings agree, and exactly
  *    representable in integers (cross-engine `ln` is not guaranteed to
  *    round identically);
  *  - the tf saturation `tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))` uses
  *    k1 = 1.2, b = 0.75 as ppm constants with floor division at each
  *    step.
  *
  * Scale: the raw text is scanned ONCE into the (doc_id, token, tf)
  * term-frequency table (the classic TF index) behind a lazy checkpoint;
  * document lengths, the vocabulary ranking, and df all derive from that
  * aggregate. Query terms and df are #terms rows (broadcast); the final
  * top-N is a distributed TakeOrdered, never a global sort. */
object Retrieval {

  /** (doc_id, token, tf) + one checkpoint barrier = the single raw-text
    * scan everything else reuses. */
  private def tfIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)

  /** BM25 scores for the query made of vocabulary ranks [qLo, qHi] (by
    * corpus frequency desc, token asc — mid-frequency terms, so the
    * ranking exercises both idf spread and tf saturation).
    *
    * r16 (closing the r15 `weak`): the query terms only ever need the
    * top `qHi` vocabulary rows, so they come from two distributed
    * TakeOrdered top-k's (ranks 1..qHi minus ranks 1..qLo-1 via an
    * anti-join on the ≤qHi survivors) — the `hybridRrf` pattern below —
    * never a `row_number` window over the full (unbounded) vocabulary.
    * The vocab aggregate is computed once behind a lazy checkpoint and
    * both top-k's read it. */
  def bm25Scores(spark: SparkSession, dir: String,
      qLo: Int = 10, qHi: Int = 14): DataFrame = {
    val tf = tfIndex(spark, dir)
    val vocab = tf.groupBy("token").agg(sum("tf").as("n"))
      .localCheckpoint(eager = false)
    val top = vocab.orderBy(desc("n"), asc("token")).limit(qHi)
    val skip = vocab.orderBy(desc("n"), asc("token")).limit(qLo - 1)
    val q = top.join(skip.select("token"), Seq("token"), "left_anti")
      .select("token")
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), sum("dl").as("sum_dl"))
      .select(col("n"), expr("sum_dl * 1000000L div n").as("avgdl_ppm"))
    val dft = tf.join(broadcast(q), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(st)) // 1-row stats frame (N, avgdl)
      .withColumn("idf_ppm", expr("((n - df) * 2 + 1) * 1000000L div (df * 2 + 1)"))
      .withColumn("ratio_ppm", expr("dl * 1000000L * 1000000L div avgdl_ppm"))
      .withColumn("k_ppm",
        expr("1200000L * (1000000L - 750000L + 750000L * ratio_ppm div 1000000L) div 1000000L"))
      .withColumn("tfs_ppm", expr("tf * 2200000L * 1000000L div (tf * 1000000L + k_ppm)"))
      .withColumn("term_ppm", expr("idf_ppm * tfs_ppm div 1000000L"))
      .groupBy("doc_id").agg(sum("term_ppm").as("score_ppm"))
  }

  /** x47: top-N BM25 retrieval, deterministic tiebreak on doc_id. */
  def bm25Rank(spark: SparkSession, dir: String, topN: Int = 20): DataFrame =
    bm25Scores(spark, dir)
      .orderBy(desc("score_ppm"), asc("doc_id"))
      .limit(topN)

  /** x48: hybrid retrieval — BM25 top-`depth` fused with the cosine
    * top-`depth` for the query embedding (vec_id 0, the paired corpus
    * row) by reciprocal-rank fusion, `Σ 1e6 div (60 + rank)` (the
    * standard RRF k=60, integer form). Both arms end in distributed
    * TakeOrdered top-`depth`; only the two depth-row lists meet in the
    * full-outer fuse. */
  def hybridRrf(spark: SparkSession, dir: String,
      depth: Int = 50, topN: Int = 20): DataFrame = {
    val text = bm25Scores(spark, dir)
      .orderBy(desc("score_ppm"), asc("doc_id")).limit(depth)
      .withColumn("rank_text",
        row_number().over(Window.orderBy(desc("score_ppm"), asc("doc_id"))))
      .select(col("doc_id"), col("rank_text"))
    val e = Similarity.withNorm(Tables.embeddings(spark, dir))
      .localCheckpoint(eager = false)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("vec").as("qv"), col("norm").as("qn"))
    val vec = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv)) // 1-row query frame
      .withColumn("sim", Similarity.dot(col("qv"), col("vec")) / (col("qn") * col("norm")))
      .orderBy(desc("sim"), asc("vec_id")).limit(depth)
      .withColumn("rank_vec",
        row_number().over(Window.orderBy(desc("sim"), asc("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("rank_vec"))
    text.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_text"), lit(0)).as("rank_text"),
        coalesce(col("rank_vec"), lit(0)).as("rank_vec"))
      .withColumn("rrf_ppm",
        expr("CASE WHEN rank_text > 0 THEN 1000000L div (60 + rank_text) ELSE 0L END") +
          expr("CASE WHEN rank_vec > 0 THEN 1000000L div (60 + rank_vec) ELSE 0L END"))
      .orderBy(desc("rrf_ppm"), asc("doc_id"))
      .limit(topN)
  }
}

package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for training-data pipelines: k-means (the
  * centroid trainer behind the IVF index in `Similarity.topKIvf`, and the
  * standard tool for semantic dedup / domain balancing of web corpora).
  *
  * Scale layout: centroids are dim×k doubles — broadcast-sized at ANY
  * corpus size — so the assignment pass is map-only against a broadcast
  * seed table, and the centroid update shuffles k×dim aggregate rows
  * (never vectors). Iterating = re-running `lloydIter` with the previous
  * output as seeds; each iteration is one job, state stays in DataFrames.
  */
object Clustering {

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  /** Squared L2 distance as a sequential fold — the exact shape DuckDB's
    * `list_sum(list_transform(list_zip(a,b), …))` evaluates, so distances
    * are bit-identical cross-engine (same precedent as Similarity.dotHof). */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** One Lloyd iteration: assign every vector to its nearest of the k seed
    * centroids (deterministic seeds: vec_id < k), then emit the updated
    * per-cluster mean, one row per (cluster, dimension).
    *
    * Assignment is an argmin over an array of centroid LITERALS: the k
    * seed vectors (k×dim doubles — driver-sized at ANY corpus size) are
    * collected once and folded into the plan, so the assignment pass is a
    * pure map — no join of any kind, no window, no shuffle. This is the
    * 100 TB shape: the one collect is the k-means state itself (what a
    * driver-side Lloyd loop carries between iterations by definition),
    * never corpus data. Ties (equal d2) go to the smaller cell_id:
    * `array_position` returns the FIRST index holding the min and the
    * seed arrays are ordered by cell_id.
    *
    * Update: posexplode to (cluster, dim, component) and hash-aggregate —
    * the shuffle after partial aggregation is O(k × dim), independent of
    * corpus size. Means are rounded at 6 dp: summation order differs
    * between engines and partitionings, and 1e-6 is coarse enough that
    * the ~1e-13 relative fold error can never cross a rounding boundary
    * for unit-scale embedding components. */
  private def assigned(spark: SparkSession, dir: String, k: Int): DataFrame = {
    require(k > 0, s"k-means needs k > 0, got $k")
    val v = vecs(spark, dir)
    val seedRows = v.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long"), col("vec"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
      .sortBy(_._1)
    require(seedRows.nonEmpty, s"no seed vectors with vec_id < $k")
    val cellIds = array(seedRows.map { case (id, _) => lit(id) }: _*)
    val cvecs = array(seedRows.map { case (_, cv) => typedlit(cv) }: _*)
    val dists = transform(cvecs, cv => dist2(col("vec"), cv))
    // first occurrence of the min == smallest cell_id among ties; the min
    // is an exact element of the array so the equality probe is bit-safe
    val bestIdx = array_position(dists, array_min(dists)).cast("int")
    v.withColumn("cell_id", element_at(cellIds, bestIdx))
      .select(col("vec_id"), col("cell_id"), col("vec"))
  }

  def lloydIter(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    assigned(spark, dir, k)
      .select(col("cell_id"), posexplode(col("vec")).as(Seq("dim_idx", "x")))
      .groupBy("cell_id", "dim_idx")
      .agg(count(lit(1)).as("n_members"), round(avg("x"), 6).as("centroid"))
      .select(col("cell_id").as("cluster_id"), col("dim_idx").cast("int").as("dim_idx"),
        col("n_members"), col("centroid"))
      .orderBy("cluster_id", "dim_idx")

  /** Per-vector cluster assignment (the other half of the gate surface —
    * lloydIter's output hashes the means; this hashes the argmin itself). */
  def assign(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    assigned(spark, dir, k)
      .select(col("vec_id"), col("cell_id").as("cluster_id"))
      .orderBy("vec_id")

  /** x84: k-CENTER GREEDY coreset selection (farthest-point traversal,
    * Gonzalez 1985 — the classic 2-approximation to the k-center
    * objective, and the standard diversity/coreset sampler for training
    * data: pick the k most mutually-distant examples so a small budget
    * covers the embedding space instead of oversampling its densest
    * mode). Deterministic: seed = min vec_id; each step adds the vector
    * maximizing its min squared-L2 distance to the chosen set, ties to
    * the smaller vec_id.
    *
    * Scale shape: the greedy state is the chosen set itself — ≤ k×dim
    * doubles, driver-sized at ANY corpus size (the same contract as the
    * k-means seeds above) — folded into the plan as literals, so each of
    * the k rounds is a pure MAP (min-dist over ≤ k literal centers) plus
    * a TakeOrdered(1) reduction: no join, no window, no slow-growing
    * shuffle, k passes total. min_dist is the exact double at selection
    * time (NULL for the seed); cross-engine bit-equality of the fold is
    * the proven dist2/dotSql precedent. */
  def kcenterCoreset(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    require(k > 0, s"k-center needs k > 0, got $k")
    val v = vecs(spark, dir)
    val seed = v.orderBy("vec_id").limit(1).collect().head
    var chosen = Vector((seed.getLong(0), seed.getSeq[Double](1)))
    var out = Vector[(Int, Long, Option[Double])]((1, seed.getLong(0), None))
    for (rank <- 2 to k) {
      val cvecs = array(chosen.map { case (_, cv) => typedlit(cv) }: _*)
      val md = array_min(transform(cvecs, cv => dist2(col("vec"), cv)))
      val picked = v.filter(!col("vec_id").isin(chosen.map(_._1): _*))
        .withColumn("md", md)
        .orderBy(desc("md"), col("vec_id")).limit(1)
        .collect()
      require(picked.nonEmpty,
        s"k-center: corpus exhausted at rank $rank — k=$k exceeds the vector count")
      val next = picked.head
      chosen :+= ((next.getLong(0), next.getSeq[Double](1)))
      out :+= ((rank, next.getLong(0), Some(next.getDouble(2))))
    }
    import spark.implicits._
    out.toDF("rank", "vec_id", "min_dist").orderBy("rank")
  }
}

package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    * Assignment here is crossJoin(broadcast(seeds)) + per-vector
    * row_number — n×k rows through a keyed window, which is exact and
    * oracle-mirrorable. The 100 TB variant replaces the window with
    * `min_by(struct(dist2, cell_id))` aggregation (map-side partial
    * combine: the shuffle carries one row per vector, not k) or an
    * argmin over an array of broadcast centroid literals (no shuffle at
    * all); both pick the same (min dist2, min cell_id) winner.
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
    val seeds = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell_id"), col("vec").as("cvec"))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cell_id"))
    v.crossJoin(broadcast(seeds))
      .withColumn("d2", dist2(col("vec"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
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
}

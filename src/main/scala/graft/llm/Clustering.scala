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
}

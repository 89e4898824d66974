package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The shared md5 coin (ONE definition of the cross-engine contract —
    * see Curation.md5Long for the DuckDB mirror). */
  private def md5Long(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Curation.md5Long(c)

  /** x126: CLUSTER-BALANCED SAMPLING — a fixed per-cell budget drawn from
    * every k-means cell: x54's stratified draw with the stratum moved
    * from a metadata column (`lang`) to SEMANTIC space. This is the
    * "topic-balanced eval slice" primitive: a uniform sample oversamples
    * the corpus's densest mode, a cell-balanced one covers the embedding
    * space — the cheap streaming cousin of the x84 k-center coreset
    * (which maximizes spread but pays k passes; this pays ONE assignment
    * pass + one bounded top-k).
    *
    * Deterministic end to end: cells come from the literal-seed argmin
    * (`assigned`, ties to the smaller cell), the draw is the smallest
    * md5("bal:" ‖ vec_id) keys per cell — a uniform without-replacement
    * sample any engine reproduces bit-for-bit, stable under appends
    * (a new vector displaces at most the largest key of its cell).
    * Phrased as the row_number top-k idiom so RewriteRowNumberTopK plans
    * the bounded-heap TopKPerKey: each task retains ≤ k×perCell rows.
    *
    * 100 TB: assignment is a pure map against k×dim literal doubles; the
    * only shuffle is the k-key hash partition for the top-k heaps. */
  def cellBalancedSample(spark: SparkSession, dir: String,
      k: Int = 8, perCell: Int = 25): DataFrame =
    cellBalancedSampleOf(assigned(spark, dir, k), perCell)

  /** Library form over any (vec_id, cell_id, …) assignment frame. */
  def cellBalancedSampleOf(asg: DataFrame, perCell: Int): DataFrame = {
    require(perCell > 0, s"cell-balanced sample needs perCell > 0, got $perCell")
    val w = Window.partitionBy("cluster_id").orderBy("h", "vec_id")
    asg
      .select(col("cell_id").as("cluster_id"), col("vec_id"),
        md5Long(concat(lit("bal:"), col("vec_id").cast("string"))).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perCell)
      .drop("rn")
      .orderBy("cluster_id", "vec_id")
  }

  /** x127: CELL-QUALITY AUDIT — per k-means cell, the cohesion (mean
    * squared L2 distance of members to their centroid) and the
    * separation to the nearest OTHER centroid: the Davies–Bouldin-style
    * table a clustering owner reads before trusting the cells for IVF
    * probing (x12/x71b), SemDeDup pruning (x42), or the x126 balanced
    * draw — a cell whose cohesion rivals its separation is two topics
    * glued together; a near-zero separation pair is one topic split.
    *
    * Exactness (the x109/x112 integer pattern): with milli-quantized
    * components m = ⌊1000·v⌋ and per-(cell, dim) sums S over n members,
    *
    *   Σ‖x − c‖² · n² = n·Σ‖m‖² − Σ_d S_d²         (cohesion numerator)
    *   ‖c_a − c_b‖² · (n_a n_b)² = Σ_d (S_d^a n_b − S_d^b n_a)²  (separation)
    *
    * — both EXACT integers (decimal(38,0) / HUGEINT for the squared
    * cross terms, which clear int64 once n·S reaches ~3·10⁹), quantized
    * back by 10⁶. Each surfaced metric is ONE IEEE division of
    * identically-converted doubles, so values are bit-identical
    * cross-engine and the nearest-cell argmin (separation asc, cell id
    * asc) is deterministic. Aggregate widths: #cells × dim sum rows and
    * a k²-row pair table — driver-sized at ANY corpus size.
    *
    * Valid range: decimal(38,0) holds the separation cross term
    * (S_a·n_b − S_b·n_a)² ≲ 4·n⁴·max(m)², i.e. for unit-normalized
    * embeddings (|m| ≤ 1000) cells up to ~2×10⁷ members; DuckDB's
    * HUGEINT is 128-bit so overflow would otherwise be a SILENT
    * cross-engine divergence (Spark non-ANSI decimal overflow → NULL,
    * which `sum` then skips). Every squared cross term is therefore
    * null-guarded with raise_error: past the range the audit FAILS
    * LOUDLY instead of under-reporting. */
  def cellQualityAudit(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    cellQualityAuditOf(assigned(spark, dir, k))

  /** Library form over any (vec_id, cell_id, vec: array<double>) frame. */
  def cellQualityAuditOf(asg: DataFrame): DataFrame = {
    val m = asg
      .select(col("cell_id"), posexplode(col("vec")).as(Seq("dim", "v")))
      .select(col("cell_id"), col("dim"),
        floor(col("v") * 1000.0).cast("long").as("m"))
    // non-ANSI decimal overflow yields NULL, and `sum` SKIPS nulls — an
    // over-range cell would silently under-report instead of diverging
    // visibly; guard each squared cross term so overflow fails loudly
    // (see the valid-range note in the scaladoc)
    def guarded(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"x127 $what overflowed decimal(38,0) — cell exceeds the exact-" +
          "arithmetic range (see cellQualityAudit scaladoc)")).cast("decimal(38,0)"))
        .otherwise(c)
    val cnt = asg.groupBy("cell_id").agg(count(lit(1)).as("n"))
    val q = m.groupBy("cell_id").agg(sum(col("m") * col("m")).as("qq"))
    val sums = m.groupBy("cell_id", "dim").agg(sum("m").as("sd"))
    val s2 = sums.groupBy("cell_id")
      .agg(sum(guarded(expr("cast(sd as decimal(38,0)) * sd"), "sum-square term")).as("ss"))
    val coh = cnt
      .join(q, "cell_id").join(s2, "cell_id")
      .select(col("cell_id"), col("n"),
        (guarded(expr("cast(n as decimal(38,0)) * qq") - col("ss"), "cohesion numerator")
          .cast("double") /
          (col("n").cast("double") * col("n") * lit(1e6))).as("cohesion"))
    val sn = sums.join(cnt, "cell_id")
    val sep = sn.as("a")
      .join(sn.as("b"),
        col("a.dim") === col("b.dim") && col("a.cell_id") =!= col("b.cell_id"))
      .select(col("a.cell_id").as("ca"), col("b.cell_id").as("cb"),
        col("a.n").as("na"), col("b.n").as("nb"),
        expr("cast(a.sd as decimal(38,0)) * b.n - cast(b.sd as decimal(38,0)) * a.n").as("t"))
      .groupBy("ca", "cb", "na", "nb")
      .agg(sum(guarded(col("t") * col("t"), "separation cross term")).as("sep_num"))
      .select(col("ca"), col("cb"),
        (col("sep_num").cast("double") /
          (col("na").cast("double") * col("na") * col("nb") * col("nb") * lit(1e6)))
          .as("separation"))
    val wNear = Window.partitionBy("ca").orderBy(col("separation"), col("cb"))
    val nearest = sep
      .withColumn("rn", row_number().over(wNear))
      .filter(col("rn") === 1)
      .select(col("ca").as("cell_id"), col("cb").as("nearest_cell"),
        col("separation").as("centroid_sep"))
    // LEFT join: with a single non-empty cell the separation pair table
    // is empty (no a.cell_id <> b.cell_id rows) and an inner join would
    // silently drop the lone cell's cohesion row — 'no cells' instead of
    // 'one cohesive cell, no neighbor'. Null separation IS the answer.
    coh.join(nearest, Seq("cell_id"), "left")
      .select(col("cell_id").as("cluster_id"), col("n").as("n_members"),
        col("cohesion"), col("nearest_cell"), col("centroid_sep"))
      .orderBy("cluster_id")
  }

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

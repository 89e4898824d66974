package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `array<float>` embedding column — a core
  * training-data-pipeline operator the reference lacks.
  *
  * All math uses codegen'd higher-order functions (`zip_with` +
  * `aggregate`), NOT UDFs: the sequential left-fold in double precision is
  * bit-identical to the DuckDB oracle's `list_sum`/`list_transform` over
  * `DOUBLE[]`, so even the similarity VALUES hash-match exactly.
  *
  * Scale paths:
  *  - brute-force top-k: fine for a bounded query set (broadcast the
  *    queries; one pass over the corpus, no shuffle of the big side);
  *  - `annLsh`: random-hyperplane LSH — corpus bucketed by a 16-bit sign
  *    code, candidates only join within a bucket. At 100 TB the bucket join
  *    replaces the quadratic cross product with a shuffle on short codes.
  */
object Similarity {

  /** Σ x*y — reference formulation via higher-order functions (interpreted
    * per element; kept for documentation + equivalence testing). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normSqHof(a: Column): Column = aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** Hot-path versions: custom codegen'd Catalyst expressions with the
    * SAME sequential fold order (bit-identical results, ~100× faster at
    * N²-pair scale). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dotFast(a, b)

  def normSq(a: Column): Column = graft.functions.VectorExpressions.normSqFast(a)

  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Corpus with a precomputed L2 norm (one pass, reused by every pair). */
  def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("norm", sqrt(normSq(col("vec"))))

  /** x24: per-vector feature statistics — the higher-order-function
    * surface (`aggregate`, `filter`, `transform`, `array_max`) exercised
    * directly over the embedding column: L2 norm, positive-component
    * count, max |x|, and the L2-NORMALIZED vector's first component
    * (unit-scaling is the standard pre-index transform). One scan, all
    * codegen'd HOFs, no UDFs. */
  def vectorStats(spark: SparkSession, dir: String): DataFrame = {
    val vec = asDouble(col("embedding"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        sqrt(normSqHof(vec)).as("l2_norm"),
        size(filter(vec, x => x > 0)).as("n_pos"),
        array_max(transform(vec, x => abs(x))).as("max_abs"),
        (element_at(vec, 1) / sqrt(normSqHof(vec))).as("unit_first"))
      .orderBy("vec_id")
  }

  /** x129: INT8 QUANTIZATION AUDIT — per-vector fidelity of symmetric
    * int8 compression (q_j = floor(127·v_j / max|v|)), the check run
    * before shipping a serving index that stores int8 codes instead of
    * float32 (4× memory, SIMD distance kernels): per vector the scale,
    * the saturated-lane count (|q| = 127 — lanes pinned to the clip
    * rail, where a heavy-tailed coordinate eats the whole dynamic
    * range), and the reconstruction SSE/MSE. x88 answers "how much do I
    * lose truncating DIMENSIONS"; this answers "how much do I lose
    * truncating PRECISION" — together they are the memory-budget
    * decision table.
    *
    * Exactness contract (the x109/x127 pattern): the quantizer is
    * floor, not round (floor of an identical IEEE double is bit-equal
    * in Spark and DuckDB; round differs on representation ties), every
    * per-lane error is squared then pico-quantized to an exact long
    * BEFORE the cross-lane sum (float sums are association-order-
    * dependent; integer sums are not), and MSE is ONE IEEE division of
    * that exact long at the end. Scale shape: one scan, one row out per
    * row in — embarrassingly parallel map, no shuffle at any corpus
    * size (the ORDER BY is the gate's determinism, dropped by a real
    * consumer). */
  def int8QuantAudit(spark: SparkSession, dir: String): DataFrame =
    int8QuantAuditOf(Tables.embeddings(spark, dir))

  /** THE int8 quantizer — one definition shared by the x129 error audit
    * and the x131 ranking-parity eval, so the eval can never silently
    * audit a different quantizer than the one the error table reports
    * on. Adds `scale` (max |v|) and `q` (floor(127·v/scale) codes;
    * all-zero vectors quantize to all-zero codes instead of NaN-ing the
    * division — their error is exactly 0) to a frame with a `vec`
    * double-array column. */
  private def withInt8Codes(framed: DataFrame): DataFrame =
    framed
      .withColumn("scale", array_max(transform(col("vec"), x => abs(x))))
      .withColumn("q", transform(col("vec"), x =>
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(x * lit(127.0) / col("scale")))))

  /** Library form over any (vec_id, embedding: array<float|double>) frame. */
  def int8QuantAuditOf(emb: DataFrame): DataFrame = {
    val vec = asDouble(col("embedding"))
    withInt8Codes(emb.select(col("vec_id"), vec.as("vec")))
      .select(col("vec_id"), col("scale"),
        size(filter(col("q"), qq => abs(qq) === 127L)).as("n_sat"),
        aggregate(
          zip_with(col("vec"), col("q"), (x, qq) => {
            val e = x - qq.cast("double") * col("scale") / lit(127.0)
            floor(e * e * lit(1e12)).cast("long")
          }),
          lit(0L), (acc, t) => acc + t).as("sse_pico"),
        col("vec"))
      .withColumn("mse_recon",
        col("sse_pico") / (size(col("vec")).cast("double") * lit(1e12)))
      .drop("vec")
      .orderBy("vec_id")
  }

  /** x131: INT8 TOP-K PARITY — the eval that decides whether x129's
    * compression SHIPS: per query, how many of the float-cosine top-k
    * survive when the ranking runs on int8 codes instead (overlap@k and
    * top-1 agreement). x129 measures reconstruction error in vector
    * space; this measures the only thing a retrieval index actually
    * serves — the ranking. The pair is the compression twin of
    * x102/x110: error table + ranking-recall audit.
    *
    * The int8 score is EXACT cross-engine arithmetic end to end: with a
    * symmetric per-vector scale, cosine of the reconstructed vectors
    * equals (q_a·q_b)/(|q_a||q_b|) — the scales cancel — so the integer
    * dot and the two integer norm-squares are exact longs (|q| ≤ 127,
    * d = 64 ⇒ Σq² ≤ 1.04e6, products ≤ 1.1e12), and the only IEEE step
    * is the final / sqrt(n2a·n2b), written identically in both engines.
    * Scale shape: x6's layout verbatim — the bounded query set
    * broadcasts, the corpus streams, the per-query ranking is a
    * row_number ≤ k (the bounded-heap rewrite's shape); nothing but the
    * ≤ nQueries×k winners survives the windows. */
  def int8TopKParity(spark: SparkSession, dir: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    val e = withInt8Codes(withNorm(Tables.embeddings(spark, dir)))
      // an all-zero embedding has norm 0 AND n2 0 → both scores 0/0 = NaN,
      // and NaN enters the rankings with engine-specific ordering; exclude
      // zero vectors outright (they carry no direction to rank on), the
      // ranking-side twin of withInt8Codes' scale=0 guard
      .filter(col("norm") > 0)
      .withColumn("n2", aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
      .localCheckpoint(eager = false)
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"),
        col("norm").as("qn"), col("q").as("qq"), col("n2").as("qn2"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("vec").as("cv"),
      col("norm").as("cn"), col("q").as("cq"), col("n2").as("cn2"))
    val scored = c.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      .withColumn("simf", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("dotq",
        aggregate(zip_with(col("qq"), col("cq"), (a, b) => a * b),
          lit(0L), (acc, t) => acc + t))
      .withColumn("simq",
        col("dotq") / sqrt((col("qn2") * col("cn2")).cast("double")))
    val wf = Window.partitionBy("query_id").orderBy(desc("simf"), asc("neighbor_id"))
    val wq = Window.partitionBy("query_id").orderBy(desc("simq"), asc("neighbor_id"))
    scored
      .withColumn("rankf", row_number().over(wf))
      .withColumn("rankq", row_number().over(wq))
      .filter(col("rankf") <= k || col("rankq") <= k)
      .groupBy("query_id")
      .agg(
        sum(when(col("rankf") <= k && col("rankq") <= k, 1L).otherwise(0L))
          .as("n_overlap"),
        sum(when(col("rankf") === 1 && col("rankq") === 1, 1L).otherwise(0L))
          .as("top1_match"))
      .orderBy("query_id")
  }

  /** All pairs (i < j) with cosine ≥ threshold — embedding near-duplicate
    * detection. Quadratic BY DESIGN: this is the small-scale verifier the
    * LSH variant below (`annPairsLsh`) is recall-checked against, so its
    * input is HARD-CAPPED at `maxVecs` rows (a deterministic vec_id slice,
    * mirrored in the oracle SQL) — the all-pairs join can never touch an
    * unbounded corpus even if called against one by mistake. The capped
    * side broadcasts; the scale path is `annPairsLsh`. */
  def nearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.35,
      maxVecs: Int = 2000): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir).filter(col("vec_id") < maxVecs))
    val a = e.select(col("vec_id").as("id_a"), col("vec").as("va"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("vec").as("vb"), col("norm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
      .orderBy("id_a", "id_b")
  }

  /** x88: MATRYOSHKA (MRL) truncation fidelity — the measurement a
    * pipeline runs before swapping full-dim vectors for a cheap prefix
    * (Kusupati et al. 2022: matryoshka-trained embeddings keep most of
    * the signal in their leading components; the production pattern is
    * prefix-dim candidate search + full-dim rescore). For every x5
    * near-dup pair, report the full-dim cosine next to the cosine of the
    * `prefixDim`-component truncation (re-normalized) and the signed
    * error — the table that tells you whether a 16-dim prefilter is safe
    * at your threshold. Same hard input cap and arithmetic as x5 (the
    * fold-exact dot/norm expressions), so the oracle mirrors with list
    * slices; at scale the pair set comes from the x5b LSH path and this
    * stays a per-pair projection. */
  def matryoshkaFidelity(spark: SparkSession, dir: String, prefixDim: Int = 16,
      threshold: Double = 0.35, maxVecs: Int = 2000): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir).filter(col("vec_id") < maxVecs))
      .withColumn("p", slice(col("vec"), 1, prefixDim))
      .withColumn("pn", sqrt(normSq(col("p"))))
    val a = e.select(col("vec_id").as("id_a"), col("vec").as("va"),
      col("norm").as("na"), col("p").as("pa"), col("pn").as("pna"))
    val b = e.select(col("vec_id").as("id_b"), col("vec").as("vb"),
      col("norm").as("nb"), col("p").as("pb"), col("pn").as("pnb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .withColumn("sim_trunc", dot(col("pa"), col("pb")) / (col("pna") * col("pnb")))
      .select(col("id_a"), col("id_b"), col("sim"), col("sim_trunc"),
        (col("sim_trunc") - col("sim")).as("err"))
      .orderBy("id_a", "id_b")
  }

  /** Brute-force cosine top-k for a bounded query set (vec_id < nQueries):
    * the small side broadcasts, the corpus streams — no corpus shuffle. */
  def topKBruteForce(spark: SparkSession, dir: String, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"), col("norm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("vec").as("cv"), col("norm").as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
      .orderBy("query_id", "rank")
  }

  /** x67: HARD-NEGATIVE mining — the contrastive-training data op
    * (SimCSE/DPR/CLIP-style): for each query vector, the k most similar
    * candidates with a DIFFERENT label. These near-boundary negatives are
    * what make a contrastive batch informative; random negatives are too
    * easy and same-label candidates are positives, so the label-exclusion
    * join is the defining predicate, not a post-filter.
    *
    * Brute-force exact form (x6's layout + the label predicate): query
    * side broadcast, per-query top-k bounded by the WindowGroupLimit
    * rewrite. At lake scale the candidate stage swaps for the LSH
    * bucket join (x55's path) with the label predicate applied at
    * candidate time — same output contract, rescore unchanged. */
  def hardNegatives(spark: SparkSession, dir: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
      .join(Tables.embeddings(spark, dir).select("vec_id", "label"), Seq("vec_id"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"),
        col("norm").as("qn"), col("label").as("q_label"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("vec").as("cv"),
      col("norm").as("cn"), col("label").as("n_label"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("q_label") =!= col("n_label"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
      .orderBy("query_id", "rank")
  }

  /** x78: CONTRASTIVE-PAIR MANIFEST — the batch-construction artifact a
    * supervised-contrastive / embedding-model trainer consumes (SupCon,
    * sentence-embedding fine-tuning): for each anchor, its `kPos`
    * most-similar SAME-label vectors (pair_label 1, the in-class
    * positives) and its `kNeg` most-similar CROSS-label vectors
    * (pair_label 0 — x67's hard negatives), in one manifest. Both ranks
    * come out of ONE scored pass: the window partitions by
    * (query, pair_label), so positives and negatives rank independently
    * without a second corpus scan; the literal rank cap keeps the
    * two-phase WindowGroupLimit bounded-heap plan.
    *
    * Scale: x6's bounded-broadcast probe layout (the gate pins
    * `nQueries` anchors); full-corpus manifest construction swaps the
    * candidate stage for x55's LSH path exactly as x67 documents. */
  def contrastivePairs(spark: SparkSession, dir: String, nQueries: Int = 20,
      kPos: Int = 2, kNeg: Int = 5): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
      .join(Tables.embeddings(spark, dir).select("vec_id", "label"), Seq("vec_id"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"),
        col("norm").as("qn"), col("label").as("q_label"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("vec").as("cv"),
      col("norm").as("cn"), col("label").as("n_label"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("pair_label", (col("q_label") === col("n_label")).cast("int"))
    val w = Window.partitionBy("query_id", "pair_label")
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      // literal cap first (drives WindowGroupLimit), per-branch cap second
      .filter(col("rank") <= math.max(kPos, kNeg) &&
        col("rank") <= when(col("pair_label") === 1, kPos).otherwise(kNeg))
      .select("query_id", "pair_label", "rank", "neighbor_id", "sim")
      .orderBy(col("query_id"), desc("pair_label"), col("rank"))
  }

  /** Data-derived PQ codebooks: [subspace][centroid][component] — codebook
    * m is the m-th subvector of vectors 0..15 (the same first-k-vectors
    * seeding x12 uses for IVF cells; a 16-row driver collect, bounded like
    * Clustering's k×dim centroid fetch). Data-derived centroids quantize
    * far better than a random grid here (ADC recall@5 on sf0.001 was 0.13
    * with seeded random codebooks; the spec pins the recall with these).
    * Production would refine them with per-subspace Lloyd rounds
    * (`Clustering.lloydIter` over the sliced column); the oracle rebuilds
    * the SAME codebooks from the table, so the construction stays
    * hash-exact end to end. */
  private[graft] def pqCodebooks(spark: SparkSession, dir: String,
      m: Int = 8, subDim: Int = 8, ks: Int = 16): Seq[Seq[Seq[Double]]] = {
    val rows = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < ks)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Double](1))
    (0 until m).map(mi => rows.toSeq.map(_.slice(mi * subDim, (mi + 1) * subDim).toSeq))
  }

  /** x71: product-quantized ANN (IVF-PQ's compression arm) — the memory
    * story that makes billion-vector search fit a cluster: each 64-float
    * vector compresses to 8 one-byte codes (32× smaller), and query
    * distance is estimated by ADC (asymmetric distance computation) —
    * per-query lookup tables over the codebooks, summed by code, never
    * touching the original floats.
    *
    * Construction (exactly mirrored in the oracle SQL):
    *  - split each vector into 8 subvectors of 8 dims;
    *  - code_m = argmin over 16 codebook centroids of squared L2
    *    distance, first-min tie-break (`array_position` of the min);
    *  - for a query, dl_m = the 16-entry distance table per subspace;
    *    dist_est(q, x) = Σ_m dl_m[code_m] — 8 array lookups per pair.
    *
    * Scale shape: encoding is one map-only corpus scan (the codes table
    * IS the index — 8 bytes/vector); the 20-query probe broadcasts its
    * distance tables over the codes scan (x6's bounded-probe layout), and
    * the per-query top-k is the WindowGroupLimit/TopKPerKey bounded heap.
    * At full scale the probe composes with IVF cells (x12) so ADC runs
    * only within probed cells; distances here are estimates — a final
    * exact rescore of the top candidates (x6's arithmetic) is the
    * standard refinement step and is what the recall spec measures. */
  def pqTopK(spark: SparkSession, dir: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    val cbs = pqCodebooks(spark, dir)
    val m = cbs.length; val subDim = cbs.head.head.length
    def litArr(vs: Seq[Double]): Column = array(vs.map(lit): _*)
    // per-subspace staged columns: slice, the 16-entry distance table,
    // and the argmin code — all codegen'd, one pass. Each entry is a
    // SINGLE fold Σ(x−c)² (normSq over the zip_with difference): the
    // algebraically equivalent s2 − 2·dot + |c|² form is NOT cross-engine
    // safe — DuckDB's optimizer reassociates the trailing constant add
    // ((s2 + c²) − 2d), which moves the result by an ulp on ~13% of rows.
    def withTables(df: DataFrame): DataFrame = {
      val staged = (0 until m).foldLeft(df) { (acc, i) =>
        acc.withColumn(s"s$i", slice(col("vec"), i * subDim + 1, subDim))
      }
      (0 until m).foldLeft(staged) { (acc, i) =>
        val dists = cbs(i).map { c =>
          normSq(zip_with(col(s"s$i"), litArr(c), (x, y) => x - y))
        }
        acc.withColumn(s"dl$i", array(dists: _*))
          .withColumn(s"code$i",
            array_position(col(s"dl$i"), array_min(col(s"dl$i"))).cast("int"))
      }
    }
    val enc = withTables(Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec")))
    val codes = enc.select(col("vec_id").as("neighbor_id") +:
      (0 until m).map(i => col(s"code$i")): _*)
    val queries = enc.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id") +:
        (0 until m).map(i => col(s"dl$i").as(s"qdl$i")): _*)
    val distEst = (0 until m)
      .map(i => element_at(col(s"qdl$i"), col(s"code$i")))
      .reduceLeft(_ + _)
    val w = Window.partitionBy("query_id").orderBy(asc("dist_est"), asc("neighbor_id"))
    codes.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("dist_est", distEst)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "dist_est")
      .orderBy("query_id", "rank")
  }

  /** x71b: IVF-PQ — the composition x71 documents made EXECUTABLE: ADC
    * runs only within each query's `nProbe` closest IVF cells (x12's
    * cosine cells and probe rule, verbatim), so at lake scale the probe
    * touches nProbe/nCells of the codes table instead of all of it while
    * the per-pair cost stays 8 array lookups. This is the billion-vector
    * layout (IVF partition pruning × PQ compression); the gate pins the
    * same 20 queries / 16 cells / 4 probes as x12 so the two indexes are
    * directly comparable. One scored pass, bounded WindowGroupLimit
    * top-k, broadcast-sized probe and distance-table sides only. */
  def ivfPqTopK(spark: SparkSession, dir: String, nQueries: Int = 20,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cbs = pqCodebooks(spark, dir)
    val m = cbs.length; val subDim = cbs.head.head.length
    def litArr(vs: Seq[Double]): Column = array(vs.map(lit): _*)
    def withTables(df: DataFrame): DataFrame = {
      val staged = (0 until m).foldLeft(df) { (acc, i) =>
        acc.withColumn(s"s$i", slice(col("vec"), i * subDim + 1, subDim))
      }
      (0 until m).foldLeft(staged) { (acc, i) =>
        val dists = cbs(i).map { c =>
          normSq(zip_with(col(s"s$i"), litArr(c), (x, y) => x - y))
        }
        acc.withColumn(s"dl$i", array(dists: _*))
          .withColumn(s"code$i",
            array_position(col(s"dl$i"), array_min(col(s"dl$i"))).cast("int"))
      }
    }
    // x12's cell machinery: cosine centroids, max_by assignment, top-nProbe
    val e = withNorm(Tables.embeddings(spark, dir)).localCheckpoint(eager = false)
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    val assigned = e.join(broadcast(cents), lit(true))
      .withColumn("__csim", dot(col("vec"), col("cvec")) / (col("norm") * col("cnorm")))
      .groupBy("vec_id")
      .agg(max_by(col("cell_id"), struct(col("__csim"), -col("cell_id"))).as("cell_id"))
    val wProbe = Window.partitionBy("query_id").orderBy(desc("__qsim"), asc("cell_id"))
    val probes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"), col("norm").as("qn"))
      .join(broadcast(cents), lit(true))
      .withColumn("__qsim", dot(col("qv"), col("cvec")) / (col("qn") * col("cnorm")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nProbe)
      .select("query_id", "cell_id")
    // PQ arm: codes carry their cell; queries carry their distance tables
    val enc = withTables(Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec")))
    val codes = enc.select(col("vec_id").as("neighbor_id") +:
        (0 until m).map(i => col(s"code$i")): _*)
      .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
    val queries = enc.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id") +:
        (0 until m).map(i => col(s"dl$i").as(s"qdl$i")): _*)
    val probesDl = broadcast(probes.join(queries, Seq("query_id")))
    val distEst = (0 until m)
      .map(i => element_at(col(s"qdl$i"), col(s"code$i")))
      .reduceLeft(_ + _)
    val w = Window.partitionBy("query_id").orderBy(asc("dist_est"), asc("neighbor_id"))
    codes.join(probesDl, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist_est", distEst)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "dist_est")
      .orderBy("query_id", "rank")
  }

  /** x132: retrieve-then-rerank — THE production ANN serving motion: the
    * compressed index (x71's PQ/ADC estimate) retrieves a candidate pool
    * of `nCand` per query, then the ORIGINAL floats rescore only that
    * pool exactly and the final top-k ranks by exact squared L2. ADC
    * distances are estimates (codebook quantization error), so a rerank
    * over ~5× the wanted k recovers near-exact quality while the exact
    * arithmetic touches nQueries·nCand rows instead of the corpus.
    *
    * Scale shape: stage 1 is x71's audited plan (broadcast distance
    * tables over the 8-byte codes scan, bounded top-nCand heap); stage 2
    * semi-prunes the float table to candidate ids with an equi-join on
    * vec_id before any exact distance is computed — the expensive
    * full-width vectors are read for candidates only, never joined
    * all-pairs. At lake scale stage 1 composes with IVF cells (x71b)
    * unchanged. */
  def pqRerankTopK(spark: SparkSession, dir: String, nQueries: Int = 20,
      k: Int = 5, nCand: Int = 25): DataFrame = {
    val cand = pqTopK(spark, dir, nQueries, nCand)
      .select("query_id", "neighbor_id")
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val qv = vecs.select(col("vec_id").as("query_id"), col("vec").as("qv"))
    val nv = vecs.select(col("vec_id").as("neighbor_id"), col("vec").as("nv"))
    val w = Window.partitionBy("query_id").orderBy(asc("dist_exact"), asc("neighbor_id"))
    cand.join(broadcast(qv.filter(col("query_id") < nQueries)), Seq("query_id"))
      .join(nv, Seq("neighbor_id"))
      // single fold Σ(x−y)² — the x71 codebook caution: the expanded
      // s2 − 2·dot + n2 form reassociates differently across engines
      .withColumn("dist_exact", normSq(zip_with(col("qv"), col("nv"), (x, y) => x - y)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "dist_exact")
      .orderBy("query_id", "rank")
  }

  /** The PQ codes table alone (the 32×-compressed index a production
    * deployment persists): vec_id + 8 small-int codes. */
  def pqEncode(spark: SparkSession, dir: String): DataFrame = {
    val cbs = pqCodebooks(spark, dir)
    val m = cbs.length; val subDim = cbs.head.head.length
    def litArr(vs: Seq[Double]): Column = array(vs.map(lit): _*)
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    (0 until m).foldLeft(base) { (acc, i) =>
      val sub = slice(col("vec"), i * subDim + 1, subDim)
      val dists = cbs(i).map { c =>
        normSq(zip_with(sub, litArr(c), (x, y) => x - y))
      }
      acc.withColumn(s"code$i",
        array_position(array(dists: _*), array_min(array(dists: _*))).cast("int"))
    }.select(col("vec_id") +: (0 until m).map(i => col(s"code$i")): _*)
      .orderBy("vec_id")
  }

  /** Deterministic ±1 random hyperplanes (seeded, driver-side constants —
    * folded into the plan as literals, never shipped as data). Exposed
    * within the library so the oracle SQL embeds the SAME matrix. */
  private[graft] def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** LSH sharpness derived from corpus size: nPlanes = clamp(⌈log2(n/32)⌉,
    * 6, 28), i.e. hold expected per-table bucket occupancy at ~32 vectors
    * as the corpus grows. A FIXED plane count saturates: at 10× data the
    * same 2^6 buckets hold 10× the vectors each, so candidate pairs — and
    * the bucket self-join — grow ~quadratically (measured: x55 at 12.1×,
    * x5b at 10.1× time for 10× data in SCALE.md's rehearsal). Scaling
    * nPlanes with log2(n) keeps candidates ~linear; per-pair recall at a
    * given cosine drops per table ((1−θ/π)^nPlanes), which is the standard
    * trade — compensate with nTables if a sweep needs fixed recall. The
    * cap (28) bounds the literal plane matrix in the plan; the floor (6)
    * matches the gate oracles' baked matrix so tiny corpora are unchanged. */
  private[graft] def autoPlanes(nVecs: Long): Int = {
    // integer-exact ⌈log₂(n/32)⌉: count thresholds 32·2^k the corpus
    // exceeds. Equivalent to the float form away from boundaries, but
    // EXACT at n = 32·2^k where float log2 jitter could flip the ceil —
    // required because the auto ORACLE gates (x5b_auto/x55_auto) derive
    // the same value in SQL from count(*) and both engines must agree.
    math.max(6, (0 until 28).count(k => nVecs > (32L << k)))
  }

  /** Resolve an nPlanes argument: positive = caller-pinned (the gates pin 6
    * to match the oracle SQL's literal matrix); 0 = derive from a count(*)
    * of the embeddings table — parquet serves it from footer metadata, no
    * data scan. */
  private def resolvePlanes(spark: SparkSession, dir: String, nPlanes: Int): Int =
    if (nPlanes > 0) nPlanes
    else autoPlanes(Tables.embeddings(spark, dir).count())

  /** Random-hyperplane LSH bucket code: bit j = sign(v · h_j). */
  def lshCode(vec: Column, nPlanes: Int, dim: Int): Column = {
    val ps = planes(nPlanes, dim) // generate the matrix once, not per bit
    val bits = (0 until nPlanes).map { j =>
      when(dot(vec, typedlit(ps(j))) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** The deterministic IVF centroid sample (first nCells vec_ids) over a
    * normed frame — shared by the x12 probe path and the x128 profile. */
  private def ivfCentroids(e: DataFrame, nCells: Int): DataFrame =
    e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("vec").as("cvec"), col("norm").as("cnorm"))

  /** Assign every corpus vector to its best cell — max_by aggregate, not
    * a window: map-side partial combine collapses the n×k expansion
    * before the exchange (see semanticDedup; same tiebreak semantics:
    * highest similarity, then lowest cell_id). */
  private def ivfAssign(e: DataFrame, cents: DataFrame): DataFrame =
    e.join(broadcast(cents), lit(true))
      .withColumn("__csim", dot(col("vec"), col("cvec")) / (col("norm") * col("cnorm")))
      .groupBy("vec_id")
      .agg(first("vec").as("vec"), first("norm").as("norm"),
        max_by(col("cell_id"), struct(col("__csim"), -col("cell_id"))).as("cell_id"))

  /** x128: IVF CELL PROFILE — per-cell occupancy of the IVF assignment
    * (the persisted index's health table): vector count, corpus share,
    * and the load factor vs a perfectly uniform assignment. The check an
    * index owner runs before shipping: a cell at many × uniform load
    * makes its probes scan that multiple of the expected candidates
    * (latency skew), and empty cells mean the centroid sample wasted
    * capacity — both are invisible in x12's top-k output and in x102's
    * recall eval, which is why this is its own table. Empty cells are
    * emitted with zeros (the LEFT join from the centroid table), exactly
    * the rows the audit exists to surface.
    *
    * Scale shape: the assignment is x12's map-only broadcast argmax (the
    * nCells×dim centroid table is driver-sized at any corpus size); the
    * profile collapses it to ≤ nCells count rows, and the corpus total
    * comes from a window over THAT aggregate (bounded by nCells — the
    * sanctioned aggregate-fronted global window), so nothing after the
    * one scan is corpus-sized. Shares are integer-ppm floor-divs of
    * exact longs. */
  def ivfCellProfile(spark: SparkSession, dir: String, nCells: Int = 16): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir)).localCheckpoint(eager = false)
    val cents = ivfCentroids(e, nCells)
    val counts = ivfAssign(e, cents)
      .groupBy("cell_id").agg(count(lit(1)).as("n_raw"))
    val cnts = cents.select("cell_id")
      .join(broadcast(counts), Seq("cell_id"), "left")
      .select(col("cell_id"), coalesce(col("n_raw"), lit(0L)).as("n_vecs"))
    cnts
      .withColumn("t", sum("n_vecs").over(Window.partitionBy()))
      .select(col("cell_id"), col("n_vecs"),
        expr("n_vecs * 1000000 div t").as("share_ppm"),
        expr(s"n_vecs * $nCells * 100 div t").as("load_x100"))
      .orderBy("cell_id")
  }

  /** IVF (inverted-file) top-k: corpus vectors are assigned to their
    * most-similar centroid cell; a query probes only its `nProbe` nearest
    * cells. Centroids here are a deterministic corpus sample (first
    * nCells vec_ids) — a k-means refinement would drop in without changing
    * the dataflow. At 100 TB the assignment table is the persisted index;
    * the probe join shuffles on cell_id only. */
  def topKIvf(spark: SparkSession, dir: String, nQueries: Int = 20, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    // lazy local checkpoint: shared by centroids/assignment/queries without
    // recompute, released by GC (persist would pin it in the CacheManager)
    val e = withNorm(Tables.embeddings(spark, dir)).localCheckpoint(eager = false)
    // vec_id < nCells (not orderBy.limit): identical on dense 0-based ids
    // and exactly mirrors the oracle SQL predicate — no silent coupling to
    // id-domain assumptions
    val cents = ivfCentroids(e, nCells)
    val assigned = ivfAssign(e, cents)
    // each query probes its nProbe closest cells
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"), col("norm").as("qn"))
    val wProbe = Window.partitionBy("query_id").orderBy(desc("__qsim"), asc("cell_id"))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("__qsim", dot(col("qv"), col("cvec")) / (col("qn") * col("cnorm")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nProbe)
      .select("query_id", "qv", "qn", "cell_id")
    // search only the probed cells
    val wTop = Window.partitionBy("query_id").orderBy(desc("sim"), asc("vec_id"))
    probes.join(assigned, Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", dot(col("qv"), col("vec")) / (col("qn") * col("norm")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy("query_id", "rank")
  }

  /** x55: approximate KNN self-join — top-k nearest neighbors for EVERY
    * corpus vector (x6 answers a bounded query set; this builds the full
    * neighbor graph, the primitive under embedding dedup, clustering
    * refinement, and link-based curation). Candidates come from the same
    * multi-table hyperplane LSH as `annPairsLsh`, taken DIRECTED
    * (id_a ≠ id_b, both directions) so each vector ranks its own
    * candidate list; exact cosine rescoring; top-k per vector by
    * (sim desc, id). Approximate by contract: a vector sharing no bucket
    * with anyone emits no rows, and recall vs brute force is pinned in
    * the spec, not here.
    *
    * 100 TB: candidate generation is an EQUI-join on short (table, code)
    * keys — never text or a cartesian; the rescore joins shuffle on vec
    * ids; the per-vector top-k is WindowGroupLimit partial+final, so each
    * task retains ≤ k rows per vector before the exchange. */
  def knnJoin(spark: SparkSession, dir: String, k: Int = 5,
      nPlanes: Int = 0, nTables: Int = 8, dim: Int = 64): DataFrame = {
    val nP = resolvePlanes(spark, dir, nPlanes) // 0 → ~log2(n), see autoPlanes
    val allPlanes = planes(nP * nTables, dim)
    val codes = array((0 until nTables).map { t =>
      (0 until nP).map { j =>
        when(dot(col("vec"), typedlit(allPlanes(t * nP + j))) >= 0,
          shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    // barrier (see annPairsLsh): one evaluation of the nP×nTables-dot-
    // product code expression, shared by the bucket join and both rescores
    val e = withNorm(Tables.embeddings(spark, dir))
      .withColumn("codes", codes).localCheckpoint(eager = false)
    val coded = e.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("tbl", "code")))
    val cand = coded.select(col("tbl"), col("code"), col("vec_id").as("id_a"))
      .join(coded.select(col("tbl").as("tb"), col("code").as("cb"),
        col("vec_id").as("id_b")),
        col("tbl") === col("tb") && col("code") === col("cb")
          && col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val w = Window.partitionBy("id_a").orderBy(desc("sim"), asc("id_b"))
    cand
      .join(e.select(col("vec_id").as("id_a"), col("vec").as("va"), col("norm").as("na")),
        Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("vec").as("vb"), col("norm").as("nb")),
        Seq("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a").as("vec_id"), col("rank"), col("id_b").as("neighbor_id"),
        col("sim"))
      .orderBy("vec_id", "rank")
  }

  /** x29: symmetric int8 scalar quantization of embeddings — the
    * storage/bandwidth step before ANN indexing at corpus scale (4× smaller
    * than float32; dot products stay SIMD-friendly). Per vector:
    * scale = max|x|/127, q_i = ⌊x_i/scale + 0.5⌋ (floor-plus-half, NOT
    * `round`: the two engines agree bit-for-bit on floor over identical
    * IEEE intermediates, while round's half-case tie-breaking is
    * engine-defined). One scan, pure codegen'd HOFs; emits the quantized
    * vector as CSV (the harness hashes flat cells) plus the max absolute
    * reconstruction error. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val vec = asDouble(col("embedding"))
    Tables.embeddings(spark, dir)
      .withColumn("scale",
        greatest(array_max(transform(vec, x => abs(x))) / 127.0, lit(1e-30)))
      .withColumn("qv", transform(vec, x => floor(x / col("scale") + 0.5).cast("int")))
      .select(col("vec_id"), col("scale"),
        array_join(col("qv").cast("array<string>"), ",").as("q_csv"),
        array_max(zip_with(vec, col("qv"),
          (x, q) => abs(x - q * col("scale")))).as("max_abs_err"))
      .orderBy("vec_id")
  }

  /** x42: semantic dedup (the SemDeDup recipe, Abbas et al. 2023): cluster
    * embeddings around centroids, then prune near-duplicates WITHIN each
    * cluster — the clusters bound the quadratic so the all-pairs scan never
    * touches the whole corpus. Centroids are the deterministic sample used
    * by IVF (a k-means refinement drops in unchanged); within a cell, a
    * vector is dropped when ANY lower-id cell-mate has cosine ≥ threshold
    * (the standard keep-first greedy representative choice — deterministic,
    * order-independent across partitions because the rule is a pure
    * predicate on ids).
    *
    * Output: per vector, its cell, how many in-cell keepers it duplicates
    * (`n_dup_of`, 0 = kept), and the keep flag.
    *
    * Scale: assignment is the IVF probe (broadcast nCells rows, one pass);
    * the pair join is an EQUI-join on cell_id — shuffle on cell ids, each
    * cell's pair scan is (cell size)², the SemDeDup contract (cells are
    * sized by the centroid count, ~corpus/nCells). The id<id predicate and
    * threshold prune inside the join; no global cartesian exists. */
  def semanticDedup(spark: SparkSession, dir: String, nCells: Int = 16,
      threshold: Double = 0.35): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir)).localCheckpoint(eager = false)
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    // argmax as a max_by AGGREGATE, not a row_number window: partial
    // aggregation collapses the n×k scored expansion map-side, so the
    // exchange carries one row per vector instead of k (and no sort) —
    // the same fix the k-means assignment got. Ties on similarity break
    // to the LOWEST cell id via the negated struct component.
    // barrier: both sides of the pair join and the final attach reuse the
    // assignment — without it the n×k scoring recomputes three times
    val assigned = e.join(broadcast(cents), lit(true))
      .withColumn("__csim", dot(col("vec"), col("cvec")) / (col("norm") * col("cnorm")))
      .groupBy("vec_id")
      .agg(first("vec").as("vec"), first("norm").as("norm"),
        max_by(col("cell_id"), struct(col("__csim"), -col("cell_id"))).as("cell_id"))
      .localCheckpoint(eager = false)
    val a = assigned.select(col("cell_id"), col("vec_id").as("id_a"),
      col("vec").as("va"), col("norm").as("na"))
    val b = assigned.select(col("cell_id"), col("vec_id").as("id_b"),
      col("vec").as("vb"), col("norm").as("nb"))
    val dups = a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .groupBy(col("id_b").as("vec_id"))
      .agg(count(lit(1)).as("n_dup_of"))
    assigned.select("vec_id", "cell_id")
      .join(dups, Seq("vec_id"), "left")
      .withColumn("n_dup_of", coalesce(col("n_dup_of"), lit(0L)))
      .withColumn("kept", (col("n_dup_of") === 0).cast("int"))
      .select("vec_id", "cell_id", "n_dup_of", "kept")
      .orderBy("vec_id")
  }

  /** ANN near-dup pairs via MULTI-TABLE random-hyperplane LSH — the scale
    * path for embedding near-dup (the all-pairs `nearDupPairs` is its
    * small-scale verifier). Candidates are pairs sharing a full
    * `nPlanes`-bit code in ANY of the `nTables` tables: per-table recall
    * for cosine s is (1−θ(s)/π)^nPlanes and the tables union, so
    * (nPlanes, nTables) is the recall/candidate-volume dial — 6×8 suits a
    * mid-similarity threshold; a ≥0.9 near-dup sweep at corpus scale
    * would raise nPlanes (sharper buckets) and keep a handful of tables.
    *
    * Layout is exactly `DocDedup.minhashPairs`: one scan computes all
    * codes, the self-join shuffles (table, code, id) triples only,
    * id-pairs are deduped BEFORE vectors attach, and exact cosine
    * rescoring touches candidates only. No cartesian anywhere. */
  def annPairsLsh(spark: SparkSession, dir: String, threshold: Double = 0.35,
      nPlanes: Int = 0, nTables: Int = 8, dim: Int = 64): DataFrame = {
    val nP = resolvePlanes(spark, dir, nPlanes) // 0 → ~log2(n), see autoPlanes
    val allPlanes = planes(nP * nTables, dim) // one seeded matrix, sliced per table
    val codes = array((0 until nTables).map { t =>
      (0 until nP).map { j =>
        when(dot(col("vec"), typedlit(allPlanes(t * nP + j))) >= 0,
          shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    // barrier (see minhashPairs): without it the 48-dot-product code
    // expression inlines into both join sides and the rescore lookup
    val e = withNorm(Tables.embeddings(spark, dir))
      .withColumn("codes", codes).localCheckpoint(eager = false)
    val coded = e.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("tbl", "code")))
    val a = coded.select(col("tbl"), col("code"), col("vec_id").as("id_a"))
    val b = coded.select(col("tbl").as("tb"), col("code").as("cb"),
      col("vec_id").as("id_b"))
    val candidates = a.join(b, col("tbl") === col("tb") && col("code") === col("cb")
        && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(e.select(col("vec_id").as("id_a"), col("vec").as("va"), col("norm").as("na")),
        Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("vec").as("vb"), col("norm").as("nb")),
        Seq("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
      .orderBy("id_a", "id_b")
  }

  // ---- derived-parameter (auto) LSH, oracle-expressible ----

  /** Deterministic ±1 hyperplane from MD5 — the plane matrix both engines
    * can REBUILD: component i of plane (t, j) is +1 iff the low bit of the
    * first hex nibble of md5("pl_t_j_i") is set. Two properties the
    * seeded-Random matrix (`planes`) lacks: (a) DuckDB regenerates the
    * identical matrix from its own md5(), so the auto gates' oracle SQL
    * carries NO literal matrix and the whole construction — plane
    * derivation included — is cross-engine-checked; (b) the plane for
    * (t, j) is independent of the resolved plane count, so sharpening
    * nPlanes as the corpus grows only APPENDS bits to each code instead of
    * reshuffling the whole matrix (an incremental re-index reuses every
    * already-computed bit). */
  private[graft] def planeMd5(t: Int, j: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pl_${t}_${j}_$i".getBytes("UTF-8"))
      if (((dig(0) >> 4) & 1) == 1) 1.0 else -1.0
    }

  /** Per-table bucket codes over the md5-derived planes, nP bits each. */
  private def codesMd5(nP: Int, nTables: Int, dim: Int): Column =
    array((0 until nTables).map { t =>
      (0 until nP).map { j =>
        when(dot(col("vec"), typedlit(planeMd5(t, j, dim))) >= 0,
          shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** Corpus with norm + md5-plane codes behind the usual one-evaluation
    * localCheckpoint barrier (see annPairsLsh). */
  private def codedEmbeddings(spark: SparkSession, dir: String,
      nTables: Int, dim: Int): (DataFrame, Int) = {
    val nP = autoPlanes(Tables.embeddings(spark, dir).count())
    val e = withNorm(Tables.embeddings(spark, dir))
      .withColumn("codes", codesMd5(nP, nTables, dim))
      .localCheckpoint(eager = false)
    (e, nP)
  }

  private def lshCandidates(e: DataFrame, directed: Boolean): DataFrame = {
    val coded = e.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("tbl", "code")))
    val idPred =
      if (directed) col("id_a") =!= col("id_b") else col("id_a") < col("id_b")
    coded.select(col("tbl"), col("code"), col("vec_id").as("id_a"))
      .join(coded.select(col("tbl").as("tb"), col("code").as("cb"),
        col("vec_id").as("id_b")),
        col("tbl") === col("tb") && col("code") === col("cb") && idPred)
      .select("id_a", "id_b").distinct()
  }

  private def rescored(e: DataFrame, candidates: DataFrame): DataFrame =
    candidates
      .join(e.select(col("vec_id").as("id_a"), col("vec").as("va"), col("norm").as("na")),
        Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("vec").as("vb"), col("norm").as("nb")),
        Seq("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))

  /** x5b_auto: the PRODUCTION form of `annPairsLsh` — plane count derived
    * from a count(*) of the corpus (`autoPlanes` holds expected bucket
    * occupancy ~32 as the corpus grows; the pinned-6 gate saturates
    * quadratically at 10×, SCALE.md), planes themselves md5-derived so the
    * ORACLE REBUILDS the identical matrix and re-derives the identical
    * plane count from its own count(*). This is the construction you would
    * run at 100 TB, hash-checked end to end — candidate generation
    * included, not just the rescore. Same plan shape as `annPairsLsh`:
    * equi-join on short (table, code) keys, dedup before vectors attach,
    * exact rescore on candidates only. */
  def annPairsLshAuto(spark: SparkSession, dir: String, threshold: Double = 0.35,
      nTables: Int = 8, dim: Int = 64): DataFrame = {
    val (e, _) = codedEmbeddings(spark, dir, nTables, dim)
    rescored(e, lshCandidates(e, directed = false))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
      .orderBy("id_a", "id_b")
  }

  /** x80: SEMANTIC decontamination — the embedding-space complement of
    * x31's n-gram tier (the modern eval-hygiene stack runs BOTH: n-gram
    * collision catches verbatim/near-verbatim leakage, embedding cosine
    * catches paraphrases and translations that share no shingles). Every
    * train vector is scored against the eval set; the output names the
    * most-similar eval item (the attribution a curation team reads, like
    * x60) and flags contamination at `threshold`.
    *
    * Per-train argmax is `max(struct(sim, -eval_id))` — map-side
    * combinable (x60's layout), so each task reduces a train vector to
    * one candidate before the exchange; no window sort over the n×|eval|
    * expansion. The eval side broadcasts: eval suites are bounded by
    * construction (MBs — x31's same argument; the gate's deterministic
    * `vec_id % mod` split stands in for the external suite). At 100 TB
    * the expansion is |corpus|×|eval| dot products, embarrassingly
    * map-parallel — the same bounded-broadcast probe shape as x6/x67,
    * and at billion-scale the candidate stage swaps for x55's LSH path
    * with the threshold applied at rescore, output contract unchanged. */
  def semanticDecontaminate(spark: SparkSession, dir: String, mod: Int = 17,
      threshold: Double = 0.35): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir)).localCheckpoint(eager = false)
    val eval = e.filter(col("vec_id") % mod === 0)
      .select(col("vec_id").as("eval_id"), col("vec").as("ev"), col("norm").as("en"))
    e.filter(col("vec_id") % mod =!= 0)
      .join(broadcast(eval), lit(true))
      .withColumn("sim", dot(col("vec"), col("ev")) / (col("norm") * col("en")))
      .groupBy("vec_id")
      .agg(max(struct(col("sim").as("s"), (-col("eval_id")).as("ne"))).as("m"))
      .select(col("vec_id"), (-col("m.ne")).as("top_eval_id"),
        col("m.s").as("max_sim"),
        (col("m.s") >= threshold).cast("int").as("contaminated"))
      .orderBy("vec_id")
  }

  /** x80b: the BILLION-SCALE form of `semanticDecontaminate` the x80
    * Scaladoc promises — the broadcast all-pairs probe swaps for the x55
    * auto-LSH candidate tier (md5-derived planes, plane count from a
    * count(*)), with the threshold applied at the exact rescore. Train and
    * eval vectors share one coded pass; candidates are train×eval bucket
    * collisions on short (table, code) keys — the eval side never
    * broadcasts and the train side never expands |corpus|×|eval|, so the
    * same query runs when BOTH sides are huge. Output contract unchanged
    * (every train vector, argmax attribution, threshold flag) except that
    * a train vector colliding with NO eval bucket reports NULL attribution
    * and contaminated = 0 — the recall trade LSH makes by construction,
    * bounded by the multi-table OR (recall pinned vs brute force in
    * SimilaritySpec). Oracle: re-derives plane count AND matrix from its
    * own count(*)/md5, like x5b_auto. */
  def semanticDecontaminateAuto(spark: SparkSession, dir: String, mod: Int = 17,
      threshold: Double = 0.35, nTables: Int = 32, dim: Int = 64): DataFrame = {
    val (e, _) = codedEmbeddings(spark, dir, nTables, dim)
    val coded = e.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("tbl", "code")))
    val trainSide = coded.filter(col("vec_id") % mod =!= 0)
    val evalSide = coded.filter(col("vec_id") % mod === 0)
      .select(col("tbl").as("tb"), col("code").as("cb"), col("vec_id").as("eval_id"))
    val cands = trainSide
      .join(evalSide, col("tbl") === col("tb") && col("code") === col("cb"))
      .select("vec_id", "eval_id").distinct()
    val best = cands
      .join(e.select(col("vec_id"), col("vec").as("tv"), col("norm").as("tn")), Seq("vec_id"))
      .join(e.select(col("vec_id").as("eval_id"), col("vec").as("ev"), col("norm").as("en")),
        Seq("eval_id"))
      .withColumn("sim", dot(col("tv"), col("ev")) / (col("tn") * col("en")))
      .groupBy("vec_id")
      .agg(max(struct(col("sim").as("s"), (-col("eval_id")).as("ne"))).as("m"))
    e.filter(col("vec_id") % mod =!= 0).select("vec_id")
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), (-col("m.ne")).as("top_eval_id"),
        col("m.s").as("max_sim"),
        coalesce((col("m.s") >= threshold).cast("int"), lit(0)).as("contaminated"))
      .orderBy("vec_id")
  }

  /** x55_auto: the PRODUCTION form of `knnJoin` — auto-sized md5-derived
    * planes (see annPairsLshAuto), DIRECTED candidates so every vector
    * ranks its own list, exact rescore, per-vector top-k via the
    * WindowGroupLimit bounded heap. The scale-safe KNN graph build,
    * oracle-checked end to end. */
  def knnJoinAuto(spark: SparkSession, dir: String, k: Int = 5,
      nTables: Int = 8, dim: Int = 64): DataFrame = {
    val (e, _) = codedEmbeddings(spark, dir, nTables, dim)
    val w = Window.partitionBy("id_a").orderBy(desc("sim"), asc("id_b"))
    rescored(e, lshCandidates(e, directed = true))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a").as("vec_id"), col("rank"), col("id_b").as("neighbor_id"),
        col("sim"))
      .orderBy("vec_id", "rank")
  }

  /** The session-lifetime KNN-graph artifact: x55's production output
    * materialized ONCE per (corpus, k) — the same refresh contract as
    * the x15 pair artifact and the x17 labels. The KNN graph is the most
    * expensive embedding-side intermediate, and every consumer (x102's
    * eval, x114's vote, downstream retrieval joins) reads the persisted
    * table instead of re-running the LSH→rescore→top-k pipeline; the
    * `x55_auto_knn` gate itself still runs the live build so its cost
    * stays measured. Longs/ints/doubles round-trip parquet bit-exactly,
    * so consumer hashes are unchanged vs recomputation. */
  def knnGraphArtifact(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    graft.Tables.materializeOnce(spark, s"x55_knn:$k:$dir")(knnJoinAuto(spark, dir, k))

  /** x102: ANN INDEX QUALITY EVAL — recall@k and reciprocal rank of the
    * production LSH index (x55's derived-parameter KNN graph) against
    * LABEL ground truth: a returned neighbor is relevant iff it shares the
    * query's class label. This is the eval an embedding pipeline runs
    * BEFORE shipping an index build — "did the bucketing destroy recall?"
    * — and the per-query rows localize failures to specific vectors
    * instead of one corpus mean.
    *
    * Metrics stay exact: hits and the ideal (min(k, class_size − 1)) are
    * longs; recall@k and RR are single IEEE divisions; queries whose class
    * is a singleton get NULL recall (no relevant neighbor exists) and
    * queries whose LSH buckets returned nothing are absent — the honest
    * Append-style contract, mirrored by the oracle.
    *
    * Scale: rides the x55 auto-LSH KNN graph (bucket equi-joins on short
    * codes, no cartesian). The label table is corpus-sized (one row per
    * vector), so it is NOT broadcast — the two label joins are plain
    * vec_id equi-joins that co-partition with the KNN output; only the
    * label-cardinality class-size aggregate broadcasts. */
  def annQualityEval(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val labels = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val clsSizes = labels.groupBy("label").agg(count(lit(1)).as("cls_n"))
    val knn = knnGraphArtifact(spark, dir, k)
      .join(labels.select(col("vec_id"), col("label").as("q_label")), Seq("vec_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), Seq("neighbor_id"))
    knn.groupBy(col("vec_id"), col("q_label").as("label"))
      .agg(count(lit(1)).as("n_returned"),
        sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L)).as("hits"),
        min(when(col("n_label") === col("q_label"), col("rank"))).as("first_rel_rank"))
      .join(broadcast(clsSizes), Seq("label"))
      .withColumn("ideal", least(lit(k.toLong), col("cls_n") - 1))
      .select(col("vec_id"), col("label"), col("n_returned"), col("hits"),
        col("ideal"),
        when(col("ideal") > 0, col("hits").cast("double") / col("ideal"))
          .as("recall_at_k"),
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank")).otherwise(lit(0.0)).as("rr"))
      .orderBy("vec_id")
  }

  /** x96: EMBEDDING DIMENSION PROFILE — per-dimension distribution health
    * of the embedding table: mean, variance, and range for each of the d
    * coordinates. This is the drift/collapse monitor an embedding
    * pipeline runs after every encoder change: a dimension whose variance
    * falls to ~0 is dead (wasted capacity, and it silently degrades
    * IVF/PQ cell balance — x12/x71's codebooks train on these very
    * moments), and a mean far from 0 breaks the symmetric-quantizer
    * assumption PQ makes.
    *
    * Determinism contract: float sums are partition-order-dependent, so
    * moments are accumulated in EXACT INTEGER milli-units —
    * floor(v·1000) per value — making both aggregates (Σx, Σx²)
    * order-free exact longs (the x46 fixed-point idiom). Mean and
    * variance come back as single IEEE divisions of exact longs:
    * mean_milli = Σx/n, var_milli2 = (nΣx² − (Σx)²)/n² — bit-exact in any
    * engine, at any partitioning. min/max of floats are order-free
    * already and reported in natural units.
    *
    * Scale: one Generator pass (posexplode — d rows per vector), one
    * hash-agg keyed by the d dimension indices — map-side partials
    * collapse everything, the shuffle carries d rows per task. Long
    * bounds: |v| < 10³ ⇒ milli² < 10¹², so nΣx² overflows only past ~10⁹
    * vectors per run — past that the same expressions run in
    * decimal(38,0) (the x46 escape hatch). */
  def embeddingDimProfile(spark: SparkSession, dir: String): DataFrame =
    embeddingDimProfileOf(Tables.widen(Tables.embeddings(spark, dir)))

  /** Library form over any frame with an `embedding: array<float>` column. */
  def embeddingDimProfileOf(emb: DataFrame): DataFrame = {
    val milli = floor(col("v").cast("double") * 1000.0).cast("long")
    emb
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"), col("v"), milli.as("m"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("m").as("sum_milli"),
        sum(col("m") * col("m")).as("sumsq_milli"),
        min(col("v").cast("double")).as("min_v"),
        max(col("v").cast("double")).as("max_v"))
      .select(col("dim"), col("n"),
        (col("sum_milli").cast("double") / col("n")).as("mean_milli"),
        ((col("n") * col("sumsq_milli") - col("sum_milli") * col("sum_milli"))
          .cast("double") / (col("n") * col("n")).cast("double")).as("var_milli2"),
        col("min_v"), col("max_v"))
      .orderBy("dim")
  }

  /** x109: EMBEDDING DRIFT MONITOR — per label, the squared L2 distance
    * between the centroids of two md5-coin halves of the corpus (the A/B
    * proxy for "this crawl vs last crawl" — a refresh feeds real snapshot
    * ids instead of the coin). Near-zero drift per label is the
    * invariance check an embedding pipeline runs after every model or
    * corpus refresh; a label whose halves disagree flags either a corpus
    * shift in that class or an encoder regression.
    *
    * Exactness: per-dim sums are milli-quantized longs, so the centroid
    * difference is assembled from EXACT integers — the cross-multiplied
    * numerator Σ_d (sa·n_b − sb·n_a)² is a single BIGINT, and drift is
    * two IEEE divisions by the same double, bit-identical in any engine
    * at any partitioning. Long bounds: |t| ≤ 10³·|v|·n_a·n_b, so the
    * squared sum overflows only past ~10⁵ rows per label per half at
    * |v|≤1 — past that the same expressions run in decimal(38,0) (the
    * x46 escape hatch). A label missing one half reports NULL drift
    * rather than an infinity.
    *
    * Scale: one posexplode pass (d rows per vector), hash-aggs keyed by
    * (label, dim) — map-side partials collapse everything; the join with
    * the per-label count table is label-keyed (tiny, broadcastable). */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame =
    embeddingDriftOf(Tables.widen(Tables.embeddings(spark, dir)))

  /** Library form over any frame with (vec_id: long, label, embedding:
    * array<float>) — the refresh path passes real snapshot halves by
    * mapping its snapshot id onto the `half` coin column instead. */
  def embeddingDriftOf(emb: DataFrame): DataFrame = {
    val half = when(
      conv(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 2), 16, 10)
        .cast("int") < 128, lit("a")).otherwise(lit("b"))
    val e = emb
      .select(col("vec_id"), col("label"), col("embedding"), half.as("half"))
    val counts = e.groupBy("label")
      .agg(count(when(col("half") === "a", lit(1))).as("n_a"),
        count(when(col("half") === "b", lit(1))).as("n_b"))
      .withColumnRenamed("label", "clabel")
    val sums = e
      .select(col("label"), col("half"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("half"),
        col("dim"), floor(col("v").cast("double") * 1000.0).cast("long").as("m"))
      .groupBy("label", "dim")
      .agg(coalesce(sum(when(col("half") === "a", col("m"))), lit(0L)).as("sa"),
        coalesce(sum(when(col("half") === "b", col("m"))), lit(0L)).as("sb"))
    val denom = col("n_a").cast("double") * col("n_b").cast("double") * lit(1000.0)
    sums.join(broadcast(counts), col("label") <=> col("clabel"))
      .select(col("label"), col("n_a"), col("n_b"),
        (col("sa") * col("n_b") - col("sb") * col("n_a")).as("t"))
      .groupBy("label", "n_a", "n_b")
      .agg(sum(col("t") * col("t")).as("drift_num"))
      .select(col("label"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("drift_num").cast("double") / denom / denom).as("drift_sq"))
      .orderBy("label")
  }

  /** x111: EMBEDDING OUTLIER MONITOR — per label, the vectors farthest
    * from their label centroid: the mislabeled/garbage-vector triage
    * table an embedding owner reads after every encoder or corpus
    * refresh (top-k worst offenders by exact rank, plus how many vectors
    * sit past a fixed "far" radius). A label whose far-count jumps flags
    * either label noise in the new batch or an encoder regression for
    * that class.
    *
    * Exactness (x109's integer pattern): with milli-quantized components
    * m and per-(label,dim) sums S over n vectors, the squared distance
    * to the centroid cross-multiplies to the EXACT long
    * Σ_d (m·n − S_d)²; ranking, the top-k window, and the "far"
    * comparison (dist² > 1.02, i.e. num > D + D/50 with D = n²·10⁶ —
    * exact because 50 | D, and the big side stays unscaled) all
    * happen on exact longs, and dist² surfaces as ONE IEEE division of
    * two identically-converted doubles. Long bounds: |m·n − S_d| ≤
    * 2·10³·|v|·n, so the 64-dim squared sum overflows only past ~10⁵
    * vectors per label at |v|≤1 — past that the same expressions run in
    * decimal(38,0) (the x46 escape hatch).
    *
    * Scale: two corpus passes (per-(label,dim) sums, then the per-vector
    * rescore against the BROADCAST label×dim sum table — labels·dims
    * rows, tiny by construction); the per-vector numerator collapses
    * map-side keyed by vec_id. The top-k window is exactly the shape
    * RewriteRowNumberTopK bounds to a per-key heap, and the far-count is
    * a label-keyed long agg. Nothing shuffles wider than (vec_id, label,
    * two longs). */
  def embeddingOutliers(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    embeddingOutliersOf(Tables.widen(Tables.embeddings(spark, dir)), k)

  /** Library form over any (vec_id: long, label, embedding: array<float>)
    * frame. */
  def embeddingOutliersOf(emb: DataFrame, k: Int = 3): DataFrame = {
    def milli(e: DataFrame): DataFrame = e
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("v").cast("double") * 1000.0).cast("long").as("m"))
    val sums = milli(emb).groupBy("label", "dim")
      .agg(sum("m").as("sd"), count(lit(1)).as("n"))
    val t = col("m") * col("n") - col("sd")
    val num = milli(emb).join(broadcast(sums), Seq("label", "dim"))
      .select(col("vec_id"), col("label"), col("n"), (t * t).as("t2"))
      .groupBy("vec_id", "label", "n")
      .agg(sum("t2").as("d2num"))
    // 50·num > 51·D rewritten as num > D + D/50 (D = n²·10⁶ is always
    // divisible by 50, so the division is exact and the comparison is the
    // same integer predicate) — this keeps the big side UNSCALED, so the
    // overflow bound stays the d2num bound the scaladoc documents instead
    // of arriving 50× early
    val far = num.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("d2num") > col("n") * col("n") * lit(1000000L) +
          col("n") * col("n") * lit(20000L), 1L).otherwise(0L)).as("n_far"))
    val topk = num
      .withColumn("rnk", row_number().over(
        Window.partitionBy("label").orderBy(desc("d2num"), asc("vec_id"))))
      .filter(col("rnk") <= k)
    topk.join(broadcast(far), Seq("label"))
      .select(col("label"), col("rnk"), col("vec_id"), col("n_vecs"), col("n_far"),
        (col("d2num").cast("double") /
          ((col("n") * col("n")).cast("double") * lit(1e6))).as("dist2"))
      .orderBy("label", "rnk")
  }

  /** x115: JL SIGN-PROJECTION DISTORTION AUDIT — random-projection
    * dimensionality reduction (Achlioptas/JL: a deterministic ±1 sign
    * matrix, md5-derived so any engine regenerates it bit-identically)
    * from d=64 to k=16, plus the audit that justifies using the
    * projection as the cheap pre-ANN/clustering compressor at scale: per
    * distortion decile, how many sampled pairs' projected squared
    * distances stay within that ratio of k× their original distance
    * (E[‖Px‖²] = k·‖x‖² for ±1 entries, so a perfect projection
    * concentrates at ratio 1).
    *
    * Exactness: components milli-quantize to longs; each projected
    * coordinate is a ±1-weighted SUM of exact longs (order-free); both
    * squared distances and the ratio-ppm (an integer floor-div against
    * 16·d²orig) stay in exact integers end to end — no float until
    * never. The pair sample is the deterministic id-chain (vec_id,
    * vec_id+1), the arbitrary-id stand-in for a uniform pair draw.
    *
    * Scale: the sign matrix is k×d = 1024 rows — broadcast; projection is
    * one posexplode pass into a (vec_id, t)-keyed hash-agg (k rows out
    * per vector, map-side partials collapse). The audit joins projected
    * AND original vectors pairwise on the chain key — both sides are
    * k- or d-row-per-vector tables co-partitioned by vec_id. Long
    * bounds: |proj| ≤ d·10³·|v| so the squared diff overflows only past
    * |v|~10⁴ at d=64. */
  def jlDistortionAudit(spark: SparkSession, dir: String, kOut: Int = 16): DataFrame =
    jlDistortionAuditOf(Tables.widen(Tables.embeddings(spark, dir)), kOut)

  /** Library form over any (vec_id: long, embedding: array<float>)
    * frame. The source dimensionality d is probed from the frame itself
    * (one-row size(embedding) peek — metadata-cheap), so frames with
    * d ≠ 64 project over ALL their coordinates instead of silently
    * truncating the sign matrix to the first 64. */
  def jlDistortionAuditOf(emb: DataFrame, kOut: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    // min==max over ALL rows (one metadata-cheap agg), not one arbitrary
    // row: a heterogeneous-dim frame would otherwise silently project
    // only the probed row's first d coordinates through the inner join
    // below — wrong ratios, no error. NULL embeddings surface here too
    // (min/max skip them; a frame of only NULLs fails the require).
    val probe = emb.agg(min(size(col("embedding"))).as("dmin"),
      max(size(col("embedding"))).as("dmax")).collect()
    require(probe.nonEmpty && !probe(0).isNullAt(0),
      "jlDistortionAuditOf needs a non-empty embedding frame")
    val d = probe(0).getInt(0)
    require(d == probe(0).getInt(1),
      s"mixed embedding dimensionalities: $d vs ${probe(0).getInt(1)}")
    require(d > 0 && d <= 4096, s"implausible embedding dimensionality $d")
    // md5-derived ±1 entry for (t, d): any engine regenerates it exactly.
    // One flat range, (t, dim) unpacked arithmetically — no join at all
    val signs = broadcast(
      spark.range(kOut * d.toLong)
        .select(expr(s"CAST(id div $d AS INT)").as("t"),
          (col("id") % d).cast("int").as("dim"))
        .select(col("t"), col("dim"),
          (conv(substring(md5(concat(col("t").cast("string"), lit(":"),
            col("dim").cast("string")).cast("binary")), 1, 2), 16, 10)
            .cast("long") % 2 * 2 - 1).as("s")))
    val m = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        floor(col("v").cast("double") * 1000.0).cast("long").as("m"))
    val proj = m.join(signs, "dim")
      .groupBy("vec_id", "t").agg(sum(col("s") * col("m")).as("p"))
    // chain pairs (i, i+1): distances in exact longs on both sides
    val d2o = m.as("a")
      .join(m.as("b"), col("a.vec_id") + 1 === col("b.vec_id") && col("a.dim") === col("b.dim"))
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(sum((col("a.m") - col("b.m")) * (col("a.m") - col("b.m"))).as("d2_orig"))
    val d2p = proj.as("a")
      .join(proj.as("b"), col("a.vec_id") + 1 === col("b.vec_id") && col("a.t") === col("b.t"))
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(sum((col("a.p") - col("b.p")) * (col("a.p") - col("b.p"))).as("d2_proj"))
    d2o.join(d2p, "vec_id")
      .filter(col("d2_orig") > 0)
      .select(expr(s"(d2_proj * 1000000L) div (${kOut}L * d2_orig)").as("ratio_ppm"))
      .select(expr("ratio_ppm div 100000L").as("ratio_decile"), col("ratio_ppm"))
      .groupBy("ratio_decile")
      .agg(count(lit(1)).as("n_pairs"),
        min("ratio_ppm").as("min_ppm"), max("ratio_ppm").as("max_ppm"))
      .orderBy("ratio_decile")
  }

  /** x114: KNN LABEL AGREEMENT — the classifier view of embedding
    * quality, complementing x102's retrieval view: each vector's label is
    * predicted by majority vote of its k auto-LSH nearest neighbours
    * (ties to the smallest label — deterministic), and the table reports
    * per-label leave-one-out accuracy. This is the cheapest linear-probe
    * stand-in: a label whose accuracy is near chance is not learnable
    * from this embedding space, and the pair (x112 high centroid cosine,
    * x114 low accuracy) localizes WHICH classes collide.
    *
    * Caveat shared with x102: vectors whose LSH bucket yields no
    * candidates are absent (the graph has no row to vote with), so
    * n_queries can undercount tiny corpora — mirrored exactly by the
    * oracle.
    *
    * Scale: rides the x55 auto-LSH KNN graph; the label table is
    * corpus-sized, so both label joins are plain vec_id equi-joins that
    * co-partition with the KNN output. The vote is two short-key
    * hash-aggs and a k-bounded row_number window; accuracy is an
    * integer-ppm `div`. */
  def knnLabelAgreement(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val labels = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val votes = knnGraphArtifact(spark, dir, k)
      .join(labels.select(col("vec_id"), col("label").as("q_label")), Seq("vec_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), Seq("neighbor_id"))
      .groupBy("vec_id", "q_label", "n_label")
      .agg(count(lit(1)).as("cnt"))
    val winner = votes
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("cnt"), asc("n_label"))))
      .filter(col("rn") === 1)
    winner.groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("acc_ppm", expr("(n_correct * 1000000L) div n_queries"))
      .orderBy("label")
  }

  /** x122: INCREMENTAL INDEX APPEND — a new batch of vectors (the md5
    * coin carves ~10% as the stand-in for "today's embeddings") is
    * queried against the EXISTING index without any rebuild: the planes
    * are md5-derived constants, so new vectors code themselves with the
    * same matrix and bucket-join against the OLD side's codes only. This
    * is the daily production motion for an ANN index — x55 builds, x83
    * appends to the dedup graph, THIS appends to the index — and the
    * output is each new vector's top-k among existing vectors, ready to
    * union into the KNN-graph artifact.
    *
    * Scale: candidates are (new × old-in-bucket) — the new batch is the
    * small side by construction, and nothing over the old corpus
    * recomputes beyond its (persisted, in production) code table. The
    * rescore and k-bounded window are x55's shapes. */
  def knnIncrementalAppend(spark: SparkSession, dir: String, k: Int = 5,
      nTables: Int = 8, dim: Int = 64): DataFrame = {
    val (e, _) = codedEmbeddings(spark, dir, nTables, dim)
    val isNew = conv(substring(md5(col("vec_id").cast("string").cast("binary")),
      1, 2), 16, 10).cast("int") < 26
    val coded = e.select(col("vec_id"), isNew.as("is_new"),
      posexplode(col("codes")).as(Seq("tbl", "code")))
    appendTopK(e, coded.filter(col("is_new")), coded.filter(!col("is_new")), k)
  }

  /** The shared x122/x122b tail — batch codes bucket-join against index
    * codes, exact rescore, per-new-vector top-k. ONE definition so the
    * live and stored forms (which share one oracle and must return
    * identical rows) cannot drift. */
  private def appendTopK(vecs: DataFrame, codedNew: DataFrame,
      codedOld: DataFrame, k: Int): DataFrame = {
    val cand = codedNew.select(col("tbl"), col("code"), col("vec_id").as("id_a"))
      .join(codedOld.select(col("tbl").as("tb"), col("code").as("cb"),
        col("vec_id").as("id_b")),
        col("tbl") === col("tb") && col("code") === col("cb"))
      .select("id_a", "id_b").distinct()
    val w = Window.partitionBy("id_a").orderBy(desc("sim"), asc("id_b"))
    rescored(vecs, cand)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a").as("vec_id"), col("rank"),
        col("id_b").as("neighbor_id"), col("sim"))
      .orderBy("vec_id", "rank")
  }

  /** x122b: the STORED-INDEX append — x122's steady-state production
    * form. The corpus's coded index (vec_id, vec, norm, codes) is a
    * materialize-once ARTIFACT (the index table a lake persists after
    * each build); the daily batch codes itself LIVE with the index's
    * derived plane parameters and bucket-joins against the STORED codes
    * only. The measured cost is therefore batch coding + short-key join
    * + rescore — the honest daily increment, linear in the batch — while
    * the x122 twin keeps measuring the full live rebuild. Same result
    * row-for-row, same oracle. */
  def knnIncrementalAppendStored(spark: SparkSession, dir: String, k: Int = 5,
      nTables: Int = 8, dim: Int = 64): DataFrame = {
    // the key carries every parameter baked into the stored codes —
    // a same-session call with different nTables/dim must NOT silently
    // reuse an incompatible artifact (its buckets would only partially
    // match and the top-k would be quietly wrong)
    val idx = graft.Tables.materializeOnce(spark, s"x122_index:$nTables:$dim:$dir")(
      codedEmbeddings(spark, dir, nTables, dim)._1
        .select("vec_id", "vec", "norm", "codes"))
    val isNew = conv(substring(md5(col("vec_id").cast("string").cast("binary")),
      1, 2), 16, 10).cast("int") < 26
    // the batch codes live with the STORED index's parameters (plane count
    // derived from the full-corpus count the index was built at)
    val nP = autoPlanes(Tables.embeddings(spark, dir).count())
    val fresh = withNorm(Tables.embeddings(spark, dir).filter(isNew))
      .withColumn("codes", codesMd5(nP, nTables, dim))
      .localCheckpoint(eager = false)
    val codedNew = fresh
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("tbl", "code")))
    val codedOld = idx.filter(!isNew)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("tbl", "code")))
    // rescore vectors: new side live, old side read from the stored index
    val both = fresh.select("vec_id", "vec", "norm")
      .unionByName(idx.filter(!isNew).select("vec_id", "vec", "norm"))
    appendTopK(both, codedNew, codedOld, k)
  }

  /** x119: KNN RECIPROCITY PROFILE — per rank position, the fraction of
    * directed KNN edges whose reverse edge is also in the graph. Mutual
    * edges are the classic neighborhood-quality signal (mutual-kNN is
    * what clustering and label-propagation actually run on): a rank-1
    * reciprocity collapse after an encoder change means the space has
    * hubs (a few vectors appear in everyone's list but reciprocate
    * nothing), which silently degrades both x102's recall and x114's
    * votes. Rides the session KNN-graph artifact — the third consumer of
    * one build.
    *
    * Scale: the mutual check is a self semi-join of the k·n edge list on
    * the reversed (vec_id, neighbor_id) long pair — co-partitioned,
    * nothing wider than two longs and a rank; per-rank counts collapse
    * map-side. */
  def knnReciprocity(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val g = knnGraphArtifact(spark, dir, k).select("vec_id", "neighbor_id", "rank")
    val rev = g.select(col("neighbor_id").as("vec_id"), col("vec_id").as("neighbor_id"))
    val mutual = g.join(rev, Seq("vec_id", "neighbor_id"), "left_semi")
      .groupBy("rank").agg(count(lit(1)).as("n_mutual"))
    g.groupBy("rank").agg(count(lit(1)).as("n_edges"))
      .join(mutual, Seq("rank"), "left")
      .select(col("rank"), col("n_edges"),
        coalesce(col("n_mutual"), lit(0L)).as("n_mutual"))
      .withColumn("mutual_ppm", expr("(n_mutual * 1000000L) div n_edges"))
      .orderBy("rank")
  }

  /** x112: LABEL-CENTROID CONFUSION MATRIX — pairwise cosine similarity
    * between label centroids: the label-space collision check run before
    * trusting the labels for eval or hard-negative mining (x67). Two
    * labels whose centroids nearly coincide are not separable classes —
    * recall@k against them (x102) is noise, and contrastive pairs drawn
    * across them are false negatives.
    *
    * Exactness: the count-and-quantization factors cancel inside cosine,
    * so raw per-(label,dim) milli-sum vectors S stand in for centroids:
    * cos = Σ S_a·S_b / (√(Σ S_a²)·√(Σ S_b²)). Dot and norm sums are
    * EXACT longs (bounded by dims·(10³·|v|·n)² — overflow only past ~10⁶
    * vectors per label); IEEE sqrt/multiply/divide on identically-
    * converted doubles is bit-identical in any engine. The norm PRODUCT
    * is never formed as an integer (it would overflow) — each factor
    * takes its own sqrt first.
    *
    * Scale: one corpus pass builds the labels×dims sum table; everything
    * after is a self-join of that TINY table on dim (labels² ·dims
    * intermediate rows, all broadcast-sized by construction). */
  def labelCentroidConfusion(spark: SparkSession, dir: String): DataFrame =
    labelCentroidConfusionOf(Tables.widen(Tables.embeddings(spark, dir)))

  /** Library form over any (vec_id, label, embedding: array<float>)
    * frame. */
  def labelCentroidConfusionOf(emb: DataFrame): DataFrame = {
    val sums = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim"),
        floor(col("v").cast("double") * 1000.0).cast("long").as("m"))
      .groupBy("label", "dim").agg(sum("m").as("sd"))
    val q = sums.groupBy("label").agg(sum(col("sd") * col("sd")).as("qq"))
    val dots = sums.as("a")
      .join(sums.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.sd") * col("b.sd")).as("dot_num"))
    dots
      .join(broadcast(q.select(col("label").as("label_a"), col("qq").as("qa"))), "label_a")
      .join(broadcast(q.select(col("label").as("label_b"), col("qq").as("qb"))), "label_b")
      .select(col("label_a"), col("label_b"), col("dot_num"),
        (col("dot_num").cast("double") /
          (sqrt(col("qa").cast("double")) * sqrt(col("qb").cast("double"))))
          .as("cos_centroid"))
      .orderBy("label_a", "label_b")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: synthesize a ~10× documents/embeddings corpus from a
  * base scale-factor directory and time the x-family (LLM-pipeline) gates
  * at both scales, printing a ratio table for SCALE.md.
  *
  * The point is to catch hidden superlinearity the small corpus masks
  * (an accidental O(n²) pair stage, a collapsed-barrier recompute): with
  * replicas DECORRELATED (below), every pipeline's work should grow
  * ~linearly in rows, so a time ratio far above the data ratio flags a
  * quadratic.
  *
  * Decorrelation matters: naively copying the corpus 10× would make every
  * replica a near-duplicate of its siblings — candidate-pair counts would
  * grow ×100 (quadratic in cluster size) and every ratio would scream
  * superlinear for data reasons, not plan reasons. Instead:
  *  - documents: every token gets a per-replica suffix (`_r<i>`), so
  *    cross-replica Jaccard is 0 while the WITHIN-replica near-dup
  *    structure (what the pipelines chew on) is preserved exactly;
  *  - embeddings: replica i is the base vector cyclically rotated by i
  *    positions — norms and within-replica geometry are preserved, and
  *    rotations of high-dimensional vectors are ~orthogonal, so no new
  *    cross-replica near-dups appear.
  *
  * Other tables symlink to the base directory (the x-family only reads
  * documents/embeddings; gates that touch lineitem/events run unchanged
  * and act as fixed-size controls).
  *
  * Usage: scripts/run.sh graft.ScaleRehearsal [baseSfDir] [outDir] [factor]
  */
object ScaleRehearsal {

  private val idOffset = 1000000L // replica id stride, far above base ids

  /** r14 (VERDICT ask #7): also replicate the FACT tables — the sf1
    * rehearsal. lineitem/orders replicate with orderkey offsets (dims
    * stay fixed — facts grow faster than dims, the realistic shape;
    * l_suppkey/l_partkey survive unchanged so every dim join still
    * lands), events replicate with event_id AND user_id offsets (a
    * same-user replica would quadratically inflate the stream-stream
    * join fan-out for data reasons, not plan reasons — the same
    * decorrelation requirement the documents path solves with token
    * remapping). */
  def synthesizeFacts(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    // drop the control symlinks `synthesize` left FIRST: an overwrite
    // write through a live symlink could recurse into the (read-only)
    // base directory instead of replacing the link
    for (t <- Seq("lineitem", "orders", "events")) {
      val link = java.nio.file.Paths.get(s"$outDir/$t.parquet")
      if (java.nio.file.Files.isSymbolicLink(link))
        java.nio.file.Files.delete(link)
    }
    val reps = explode(sequence(lit(0), lit(factor - 1))).as("rep")
    // fact keys range far above documents ids (orderkeys reach ~6e6 at
    // sf1) — use a 1e9 stride so replicas can never collide
    val factOffset = 1000000000L
    val li = Tables.lineitem(spark, baseDir)
      .select(col("*"), reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * factOffset)
      .drop("rep")
    li.repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    val ord = Tables.orders(spark, baseDir)
      .select(col("*"), reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * factOffset)
      .drop("rep")
    ord.repartition(32).write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    val ev = Tables.events(spark, baseDir)
      .select(col("*"), reps)
      .withColumn("event_id", col("event_id") + col("rep") * factOffset)
      .withColumn("user_id", col("user_id") + col("rep") * factOffset)
      .drop("rep")
    ev.repartition(32).write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  def synthesize(spark: SparkSession, baseDir: String, outDir: String, factor: Int): Unit = {
    val reps = explode(sequence(lit(0), lit(factor - 1))).as("rep")
    // HEAPS-LAW decorrelation (replaces the r5–r8 per-replica token
    // suffixes): replica i > 0 maps every token t → "w" + (xxhash64(t, i)
    // mod V), V = the BASE corpus's distinct-token count. Properties:
    //  - within-replica structure is preserved exactly (the map is
    //    per-token, so shingle/Jaccard/dup-cluster geometry is unchanged
    //    up to ~1/V hash collisions) — dup cluster sizes stay CONSTANT as
    //    the corpus grows, the x72b fixture lesson;
    //  - cross-replica token overlap is ~1/V per token (~1/V³ per
    //    3-shingle) — decorrelated, like the suffixes;
    //  - token vocabulary stays ~V at ANY factor, where suffixes grew it
    //    ×factor — a real corpus's vocab follows Heaps' law (sublinear),
    //    and the linear-vocab fixture made the bigram-LM family (x56/x59)
    //    read superlinear when the PLAN was linear (r8 verdict). Bigram
    //    vocab still grows ~×factor (replicas share words, not word
    //    ORDER — decorrelation demands that), which matches real bigram
    //    Heaps exponents (β ≈ 0.7–1) far better than ×factor tokens; and
    //    the scrambled tokens are short, so the fixture no longer
    //    inflates every downstream shuffle byte with suffix characters.
    val vBase = Tables.documents(spark, baseDir)
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    val docs = Tables.documents(spark, baseDir)
      .select(col("*"), reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * idOffset)
      // replica 0 keeps the base text byte-identical (planted fixtures —
      // contamination shingles, PII spans, language markers — stay live)
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "), t =>
              concat(lit("w"), pmod(xxhash64(t, col("rep")), lit(vBase)))),
            " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    // wide layout on purpose: the scaled scan must exercise the
    // no-repartition branch of Tables.widen (thousands-of-splits shape)
    docs.repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val dim = 64
    val emb = Tables.embeddings(spark, baseDir)
      .select(col("*"), reps)
      .select(
        (col("vec_id") + col("rep") * idOffset).as("vec_id"),
        // cyclic rotation by rep positions: norm-preserving, ~orthogonal
        // across replicas in 64-dim
        transform(sequence(lit(0), lit(dim - 1)),
          i => element_at(col("embedding"),
            (((i + col("rep")) % dim) + 1).cast("int"))).as("embedding"),
        col("label"))
    emb.repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // control tables: symlink to the base directory. A prior --facts run
    // may have replaced lineitem/orders/events with REAL parquet
    // directories — deleteIfExists would throw DirectoryNotEmpty there, so
    // remove non-symlink leftovers recursively before re-linking.
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "events")) {
      val link = java.nio.file.Paths.get(s"$outDir/$t.parquet")
      if (java.nio.file.Files.isSymbolicLink(link))
        java.nio.file.Files.delete(link)
      else if (java.nio.file.Files.exists(link)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(link).iterator().asScala.toSeq
          .reverseIterator.foreach(java.nio.file.Files.delete)
      }
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$baseDir/$t.parquet"))
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    synthesize(spark, baseDir, outDir, factor)
    // `--facts` anywhere in args (VERDICT r13 ask #7): replicate lineitem/
    // orders/events too — a base of sf0.1 × factor 10 is the sf1-equivalent
    // rehearsal, fact-table gates included (q/a/w/e families all see 10×)
    if (args.contains("--facts")) {
      synthesizeFacts(spark, baseDir, outDir, factor)
      println(s"synthesized ${factor}x FACT tables at $outDir")
    }
    println(s"synthesized ${factor}x corpus at $outDir")

    // e-family (streaming drains) joins the selection since e15: the
    // streaming-ingest dedup reads documents, so it has a genuine 10× row
    // (the events-backed e-gates stay measurable too — their events input
    // is the fixed-size control table, so their rows isolate the
    // per-trigger machinery cost from data cost)
    val xFamily = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n.startsWith("x") || n.startsWith("m") || n.startsWith("e"))
    // derived-planes variants: the gates pin nPlanes=6 to match the
    // oracle's literal plane matrix; the production path derives
    // nPlanes ≈ log2(n/32) (Similarity.autoPlanes), which must keep
    // per-bucket occupancy — and thus candidate volume and time — linear
    // as the corpus grows. These rows prove the derived setting scales
    // where pinned-6 measurably saturated (r5: x55 12.1×, x5b 10.1×).
    // (x5b_auto_neardup / x55_auto_knn need no variant here anymore: the
    // derived-parameter md5-plane forms are REGISTERED oracle gates now
    // and ride the x-family selection directly)
    val autoVariants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "x73_bloom_prefilter_auto" ->
        ((s: SparkSession, d: String) => graft.llm.DocDedup.bloomPrefilter(s, d, mBits = 0)))
    // (the simhash auto path needs no variant here: x4e_simhash_auto is a
    // registered gate and rides the x-family selection directly)
    // optional: comma-separated substrings to focus the run — the first
    // non-flag arg after the positional three, so `--facts` can really sit
    // anywhere (args(3)="--facts" args(4)="x59" must not drop the filter
    // and silently run the WHOLE registry at 10×)
    val nameFilter = args.drop(3).find(_ != "--facts")
    // with --facts every family has genuine 10× input, so the whole
    // registry is selectable (the sf1 top-10 rehearsal names its gates
    // via the filter); without it only the documents/embeddings families
    // see scaled data
    val baseNames =
      if (args.contains("--facts")) SparkEntry.queries.keys.toSeq.sorted
      else xFamily
    val selected = (baseNames.map(n => n -> SparkEntry.queries(n)) ++ autoVariants)
      .filter { case (n, _) =>
        nameFilter.forall(_.split(",").exists(n.contains)) }
    // median-of-3: a one-shot in a fresh JVM can read 5× high on a single
    // query (GC pause / first-JIT of a code path — observed 48.8 s vs a
    // reproducible ~8 s); a superlinearity verdict needs stable samples
    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        // same isolation as Bench: clearCache() misses localCheckpoint RDD
        // blocks, which otherwise accumulate block-manager/GC pressure
        // across queries and pollute later samples
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }
      samples.sorted.apply(1)
    }
    // warm-up: JIT/codegen for the big expression families
    for (q <- Seq("x2b_minhash_md5", "x22_top_terms"))
      time(SparkEntry.queries(q), baseDir)
    println(f"| query | base (s) | ${factor}x (s) | ratio |")
    println("|---|---|---|---|")
    var worst = List.empty[(String, Double)]
    for ((name, fn) <- selected) {
      val tBase = time(fn, baseDir)
      val tBig = time(fn, outDir)
      val ratio = tBig / tBase
      worst = (name -> ratio) :: worst
      println(f"| $name | $tBase%.2f | $tBig%.2f | $ratio%.1f |")
    }
    val superlinear = worst.filter(_._2 > 4.0 * factor)
    println(if (superlinear.isEmpty)
      s"OK: no x-family query exceeded ${4 * factor}x time at ${factor}x data"
    else s"SUPERLINEAR: $superlinear")
    spark.stop()
  }
}

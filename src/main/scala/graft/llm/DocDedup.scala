package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication family for training-data pipelines, over the
  * `documents` table: exact (hash groupBy), MinHash+LSH, SimHash, and
  * n-gram Jaccard verification.
  *
  * Scale design: signatures (MinHash/SimHash) are pure per-row codegen'd
  * expressions — one scan, no shuffle. Candidate generation shuffles ONLY
  * on short band hashes (the LSH trick), never on text; exact Jaccard runs
  * only on the candidate pairs. This is the standard web-scale dedup
  * layout (shingle → minhash → band → bucket join).
  */
/** Typed failure for the chain-collapse data pathology (r14 VERDICT ask
  * #4): the incremental-CC/frozen-split maintenance paths broadcast
  * touched-component MEMBERSHIP — bounded by design for healthy dedup
  * graphs, but a chain-collapsed giant cluster (one component spanning a
  * large corpus fraction) would previously surface as a raw broadcast OOM
  * with no actionable message. This error names the upstream gate that
  * exists to catch exactly that pathology. */
final class TouchedMembershipExceeded(val observed: Long, val bound: Long,
    site: String) extends RuntimeException(
  s"$site: touched-component membership exceeds the broadcast bound " +
    s"(> $bound rows observed). This is the chain-collapsed giant-cluster " +
    "data pathology, not a plan failure: run the x136_cluster_coherence " +
    "audit to locate the offending cluster(s) and gate ingest with " +
    "x137_guarded_dedup upstream, or raise graft.cc.maxTouchedMembership " +
    "if the membership is genuinely expected to fit a broadcast.")

object DocDedup {

  /** Broadcast-bound guard for touched-component membership frames (used
    * by `EventsStream.ccStep` and `leakSafeSplitDelta`): counts at most
    * bound+1 rows (LIMIT-bounded — never a full scan of a pathological
    * set) and throws the typed error past the bound. The bound rides
    * session conf `graft.cc.maxTouchedMembership` (default 5M rows ≈
    * 80 MB of (doc_id, cluster_id) pairs — inside Spark's practical
    * broadcast ceiling with headroom). */
  private[graft] def requireBoundedMembership(members: DataFrame,
      site: String): Unit = {
    val key = "graft.cc.maxTouchedMembership"
    val raw = members.sparkSession.conf.get(key, "5000000")
    // r15 ADVICE: validate the conf BEFORE using it in limit() — a
    // non-numeric or non-positive value must fail naming the knob, not
    // surface as a NumberFormatException / negative-limit AnalysisException
    val parsed = scala.util.Try(raw.toLong).getOrElse(throw
      new IllegalArgumentException(s"$key must be an integer row bound, got '$raw'"))
    require(parsed >= 1,
      s"$key must be >= 1 (got $parsed) — the membership guard needs a " +
        "positive broadcast bound")
    // clamp: a bound past Int.MaxValue-1 rows could never fire (LIMIT is
    // Int-typed) and could never broadcast either (2³¹ × 16-byte rows ≫
    // any broadcast ceiling) — clamping keeps the guard live instead of
    // silently reintroducing the raw OOM for absurd configured bounds
    val bound = math.min(parsed, Int.MaxValue.toLong - 1)
    val seen = members.limit(bound.toInt + 1).count()
    if (seen > bound) throw new TouchedMembershipExceeded(seen, bound, site)
  }

  /** Documents scan decoupled from the file-split count: the hash stages
    * below (md5 per shingle × k, signature construction) are CPU-bound at
    * hundreds of µs/row, so partitioning must follow cores, not input
    * splits — a single small parquet file otherwise serializes the whole
    * stage onto one task (measured 27 s single-task vs ~1 s wide at sf0.1).
    * Conditional (Tables.widen): the round-robin shuffle is planned only
    * when the scan is narrower than half the cores; at lake scale the scan
    * already has thousands of splits and no exchange is added at all. */
  private def docsWide(spark: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(spark, dir))

  // ---- exact ----

  /** Exact dedup via content hash: one hash-aggregate; keeper = min doc_id
    * per hash (deterministic). */
  def exactGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .orderBy("content_hash")

  // ---- MinHash + LSH ----

  def tokensCol: Column = split(col("text"), " ")

  /** 3-token shingles (short docs fall back to the whole text). */
  def shingles(tokens: Column): Column = {
    val n = size(tokens)
    when(n >= 3, transform(sequence(lit(0), n - 3), i => concat_ws(" ", slice(tokens, i + 1, lit(3)))))
      .otherwise(array(concat_ws(" ", tokens)))
  }

  /** k-component MinHash signature over PRE-HASHED shingles: component i =
    * min over hashes h of xxh64(h, seed=i). Strings are hashed exactly once
    * (`xxhash64` below); the k× fan-out mixes longs in a custom codegen'd
    * expression — the naive k×transform(strings) formulation re-reads every
    * shingle k times interpreted (≈1000× slower at bench scale). */
  def minhashSignature(sh: Column, k: Int): Column =
    graft.functions.HashExpressions.minhashSig(transform(sh, s => xxhash64(s)), k)

  def withSignature(docs: DataFrame, k: Int = 64): DataFrame =
    docs.withColumn("sig", minhashSignature(shingles(tokensCol), k))

  /** Cross-engine mixing constants for the md5-witness MinHash below:
    * component i = min over shingles of ((h · mixA(i) + mixB(i)) mod P)
    * where h = (first 60 bits of md5(shingle)) mod P and P = 2³¹−1
    * (prime). Reducing h below 2³¹ first keeps every product under 2⁶² —
    * overflow-free in BOTH engines (DuckDB raises on BIGINT overflow;
    * Java would silently wrap, diverging). The per-component (multiplier,
    * offset) pairs form the standard universal linear-congruential hash
    * family, so estimator quality matches a per-component digest at 1/k
    * the hashing cost — md5 runs ONCE per shingle, not k times. */
  val mixP: Long = 2147483647L
  val mixA: Seq[Long] = Seq(1103515245L, 1299709L, 104729L, 179426549L,
    32452843L, 49979687L, 67867967L, 86028121L)
  val mixB: Seq[Long] = Seq(12345L, 54321L, 7919L, 104659L, 15485863L,
    982451653L, 57885161L, 37156667L)

  /** md5-based MinHash (k small): the oracle-checked correctness witness
    * for the MinHash construction — every step (md5, modular mixing, min)
    * is expressible identically in DuckDB. */
  def minhashMd5(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    require(k <= mixA.size, s"md5 witness carries ${mixA.size} mixing pairs, asked for $k")
    // explode-then-aggregate, not k× array_min(transform(shingles, …)):
    // the Generator materializes each shingle ONCE and hashes it ONCE; the
    // k components are arithmetic over the flat (doc_id, h) rows in one
    // codegen stage. The groupBy(doc_id) min is map-side partial, so the
    // shuffle carries one k-long row per doc.
    val hashed = docsWide(spark, dir)
      .select(col("doc_id"), explode(shingles(tokensCol)).as("s"))
      .select(col("doc_id"),
        (conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10).cast("long") % mixP)
          .as("h"))
    val comps = (0 until k).map { i =>
      min((col("h") * mixA(i) + mixB(i)) % mixP).as(s"mh$i")
    }
    hashed.groupBy("doc_id").agg(comps.head, comps.tail: _*)
      .orderBy("doc_id")
  }

  /** Per-doc signature digest (deterministic, rows-only gate entry). */
  def minhashDigest(spark: SparkSession, dir: String, k: Int = 64): DataFrame =
    withSignature(docsWide(spark, dir), k)
      .select(col("doc_id"), xxhash64(col("sig").cast("string")).as("sig_hash"))
      .orderBy("doc_id")

  /** LSH candidate pairs: signature split into `bands` bands of `rowsPer`
    * components; docs sharing any band hash become a candidate pair, then
    * estimated Jaccard (fraction of equal signature components) filters. */
  def minhashPairs(spark: SparkSession, dir: String, k: Int = 64, bands: Int = 16,
      minEstJaccard: Double = 0.5): DataFrame = {
    require(k % bands == 0, s"k=$k must divide evenly into bands=$bands " +
      "(truncated banding would silently exclude trailing signature components)")
    val rowsPer = k / bands
    // Materialization barrier: without it CollapseProject inlines the
    // 64-component signature expression into every band lambda AND both
    // join sides — a 32× recompute. localCheckpoint(eager=false) is the
    // right barrier: the plan becomes a LogicalRDD at build time (blocking
    // the collapse), computes lazily ONCE on first action, and — unlike
    // persist(), which the CacheManager pins until an explicit unpersist —
    // is RELEASED by the ContextCleaner when the result goes out of scope,
    // so library callers cannot leak cache across queries. At cluster
    // scale this would be a persisted parquet signature table (the natural
    // artifact of a dedup pipeline).
    val sigs = withSignature(docsWide(spark, dir), k)
      .select("doc_id", "sig").localCheckpoint(eager = false)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        j => xxhash64(slice(col("sig"), j * lit(rowsPer) + 1, lit(rowsPer)).cast("string"), j)))
        .as(Seq("band_idx", "band_hash")))
    val a = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_a"))
    val b = banded.select(col("band_idx").as("bi"), col("band_hash").as("bh"),
      col("doc_id").as("id_b"))
    // dedup candidate id-pairs BEFORE attaching signatures: the distinct
    // then shuffles 16 bytes per row, not two 64-long arrays
    val candidates = a.join(b, col("band_idx") === col("bi") && col("band_hash") === col("bh")
        && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / k)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("id_a", "id_b", "est_jaccard")
      .orderBy("id_a", "id_b")
  }

  // ---- SimHash ----

  /** 64-bit SimHash: bit i set iff Σ_tokens (±1 by bit i of xxhash64(token))
    * is positive. Tokens hashed once; bit voting in a codegen'd loop. */
  def simhash(tokens: Column): Column =
    graft.functions.HashExpressions.simhash64(transform(tokens, t => xxhash64(t)))

  /** md5-based 16-bit SimHash witness (oracle-checked; see minhashMd5 — the
    * same cross-engine-hash trick applied to the bit-vote construction).
    * Token hash = first 60 bits of md5(token); bit i of the fingerprint =
    * sign of Σ_tokens (±1 by bit i). */
  def simhashMd5(spark: SparkSession, dir: String, bits: Int = 16): DataFrame =
    simhashMd5Of(docsWide(spark, dir), bits).orderBy("doc_id")

  /** The md5-SimHash construction over an arbitrary (doc_id, text) frame
    * (shared by x4b and the incremental-ingest dedup). */
  def simhashMd5Of(docs: DataFrame, bits: Int = 16): DataFrame = {
    // explode-then-aggregate (see minhashMd5): each token is md5-hashed
    // ONCE, with the `bits` per-bit votes as aggregate sums over the flat
    // token rows — the per-bit `aggregate(hs, …)` formulation recomputed
    // the full token-hash array for every bit (bits× the md5 work).
    val hashed = docs
      .select(col("doc_id"), explode(tokensCol).as("t"))
      .select(col("doc_id"),
        conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10).cast("long").as("h"))
    val fp = (0 until bits).map { i =>
      val vote = sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed.groupBy("doc_id").agg(fp.as("simhash16"))
  }

  /** md5-witness SimHash near-dup PIPELINE (oracle-checked end to end —
    * the simhash analogue of x15): 16-bit md5 simhash, blocked on 2×8-bit
    * chunks, exact hamming filter. Blocking is EXACT for hamming ≤ 1
    * (pigeonhole: one bit flip cannot touch both chunks), which is why
    * maxHamming is capped; the production path (`simhashPairs`, 64-bit /
    * 4 chunks) covers hamming ≤ 3 the same way. */
  def simhashPairsMd5(spark: SparkSession, dir: String, maxHamming: Int = 1,
      maxDocs: Int = 10000): DataFrame = {
    require(maxHamming <= 1, "2-chunk blocking is exact only for hamming <= 1")
    // HARD-CAPPED witness (same policy as Similarity.nearDupPairs): a
    // 16-bit fingerprint space saturates quadratically (bucket population
    // n/256 per 8-bit chunk — measured 3.2k → 5.5M output pairs from 5k →
    // 50k docs), so the oracle-scale construction must never run against
    // an unbounded corpus. The deterministic doc_id slice is mirrored in
    // the oracle SQL; the production path (simhashPairs, 64-bit / 16-bit
    // chunks) is the one that scales, with chunk width as the knob.
    val sh = simhashMd5(spark, dir).filter(col("doc_id") < maxDocs)
      .localCheckpoint(eager = false)
    val chunked = sh.select(col("doc_id"), col("simhash16"),
      posexplode(array(col("simhash16").bitwiseAND(255L),
        shiftright(col("simhash16"), 8).bitwiseAND(255L)))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_a"), col("simhash16").as("sh_a"))
    val b = chunked.select(col("chunk_idx").as("ci"), col("chunk").as("ch"),
      col("doc_id").as("id_b"), col("simhash16").as("sh_b"))
    a.join(b, col("chunk_idx") === col("ci") && col("chunk") === col("ch")
        && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  def simhashDigest(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(col("doc_id"), simhash(tokensCol).as("simhash"))
      .orderBy("doc_id")

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 4×16-bit chunks (any pair within
    * hamming distance ≤ maxHamming shares at least one exact chunk), then
    * exact hamming filter. Same shuffle-on-short-keys layout as MinHash. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // 4-chunk blocking is exact only while maxHamming flips cannot touch
    // every chunk (pigeonhole) — a caller asking for 4+ would silently get
    // an incomplete pair set, so refuse instead
    require(maxHamming <= 3, s"4-chunk blocking is exact only for hamming <= 3, got $maxHamming")
    // barrier: see minhashPairs — prevents the 64-bit-vote expression from
    // being inlined into the 4 chunk lambdas and both join sides (lazy
    // plan-time barrier, GC-released)
    val sh = simhashDigest(spark, dir).localCheckpoint(eager = false)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk_idx").as("ci"), col("chunk").as("ch"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, col("chunk_idx") === col("ci") && col("chunk") === col("ch")
        && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** 128-bit simhash signature as two independent 64-bit halves (the
    * second half votes over a salted token-hash stream, so the halves are
    * independent functions of the same tokens). WHY: the 64-bit form
    * blocks on 4×16-bit chunks, and a 16-bit chunk table saturates at
    * corpus scale (occupancy n/2¹⁶ per chunk index → candidate pairs grow
    * ~n²/2¹⁶ — the knob SCALE.md documents). The 128-bit form blocks on
    * 4×32-bit chunks: same pigeonhole exactness for hamming ≤ 3, but
    * occupancy n/2³² — linear candidate volume out to ~10⁹ docs. */
  def simhashDigest128(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(col("doc_id"), simhash(tokensCol).as("sh_lo"),
        graft.functions.HashExpressions.simhash64(
          transform(tokensCol, t => xxhash64(concat(t, lit("#h2"))))).as("sh_hi"))
      .orderBy("doc_id")

  /** x4d: the SCALE path for simhash near-dup — 128-bit signature, 4×32-bit
    * chunk blocking, exact 128-bit hamming filter (sum of the two 64-bit
    * hammings). Hamming ≤ 3 over 4 blocks: pigeonhole guarantees a shared
    * exact chunk, so blocking is still exact — what changed vs
    * `simhashPairs` is only the per-chunk collision space (2³² vs 2¹⁶).
    * Same shuffle-on-short-keys layout; rows-only gate (xxhash64 is
    * engine-specific — the md5 witness x4b/x4c pins the construction
    * cross-engine; the spec pins this variant against all-pairs brute
    * force). */
  def simhashPairsWide(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // same pigeonhole bound as simhashPairs: 4 chunks cover ≤ 3 flips
    require(maxHamming <= 3, s"4-chunk blocking is exact only for hamming <= 3, got $maxHamming")
    val sh = simhashDigest128(spark, dir).localCheckpoint(eager = false)
    val chunked = sh.select(col("doc_id"), col("sh_lo"), col("sh_hi"),
      posexplode(array(
        col("sh_lo").bitwiseAND(0xFFFFFFFFL),
        shiftright(col("sh_lo"), 32).bitwiseAND(0xFFFFFFFFL),
        col("sh_hi").bitwiseAND(0xFFFFFFFFL),
        shiftright(col("sh_hi"), 32).bitwiseAND(0xFFFFFFFFL)))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_a"), col("sh_lo").as("lo_a"), col("sh_hi").as("hi_a"))
    val b = chunked.select(col("chunk_idx").as("ci"), col("chunk").as("ch"),
      col("doc_id").as("id_b"), col("sh_lo").as("lo_b"), col("sh_hi").as("hi_b"))
    a.join(b, col("chunk_idx") === col("ci") && col("chunk") === col("ch")
        && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("lo_a"), col("hi_a"),
        col("lo_b"), col("hi_b")).distinct()
      .withColumn("hamming",
        hamming(col("lo_a"), col("lo_b")) + hamming(col("hi_a"), col("hi_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** md5-witness for the x4d TWO-STREAM construction: two 16-bit md5
    * simhash halves over the same token stream — the second half votes
    * over md5(token ‖ "#h2"), mirroring simhashDigest128's salted second
    * xxhash64 stream — computed in ONE token pass (both hashes per
    * exploded token row, 32 vote sums in one aggregate). */
  def simhash2x16Md5Of(docs: DataFrame): DataFrame = {
    val hashed = docs
      .select(col("doc_id"), explode(tokensCol).as("t"))
      .select(col("doc_id"),
        conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(md5(concat(col("t"), lit("#h2")).cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h2"))
    def fp(h: Column): Column = (0 until 16).map { i =>
      val vote = sum(when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed.groupBy("doc_id")
      .agg(fp(col("h1")).as("sh_lo16"), fp(col("h2")).as("sh_hi16"))
  }

  /** x4d md5 witness PIPELINE (oracle-checked end to end): the 128-bit
    * two-stream near-dup shape at oracle-expressible width — 2×16-bit
    * salted-stream fingerprints, blocked on 4×8-bit chunks SPANNING BOTH
    * halves, exact combined hamming (ham(lo)+ham(hi)) ≤ 3. Pigeonhole
    * exactness is the same argument as `simhashPairsWide`: ≤3 flips across
    * 4 chunks leave at least one chunk identical — independent of which
    * half the flips land in. Every step (md5, salt concat, bit votes,
    * chunk split, xor/bit_count) runs identically in DuckDB, so this pins
    * the two-stream construction to a full hash match; x4d itself stays
    * rows-only (xxhash64 is engine-specific). Hard-capped like
    * `simhashPairsMd5`: an 8-bit chunk space saturates quadratically, so
    * the witness never runs unbounded — the production width is x4d's. */
  def simhashPairsWideMd5(spark: SparkSession, dir: String, maxHamming: Int = 3,
      maxDocs: Int = 10000): DataFrame = {
    require(maxHamming <= 3, s"4-chunk blocking is exact only for hamming <= 3, got $maxHamming")
    val sh = simhash2x16Md5Of(docsWide(spark, dir))
      .filter(col("doc_id") < maxDocs)
      .localCheckpoint(eager = false)
    val chunked = sh.select(col("doc_id"), col("sh_lo16"), col("sh_hi16"),
      posexplode(array(
        col("sh_lo16").bitwiseAND(255L),
        shiftright(col("sh_lo16"), 8).bitwiseAND(255L),
        col("sh_hi16").bitwiseAND(255L),
        shiftright(col("sh_hi16"), 8).bitwiseAND(255L)))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_a"), col("sh_lo16").as("lo_a"), col("sh_hi16").as("hi_a"))
    val b = chunked.select(col("chunk_idx").as("ci"), col("chunk").as("ch"),
      col("doc_id").as("id_b"), col("sh_lo16").as("lo_b"), col("sh_hi16").as("hi_b"))
    a.join(b, col("chunk_idx") === col("ci") && col("chunk") === col("ch")
        && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("lo_a"), col("hi_a"),
        col("lo_b"), col("hi_b")).distinct()
      .withColumn("hamming",
        hamming(col("lo_a"), col("lo_b")) + hamming(col("hi_a"), col("hi_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** Chunk width derived from corpus size — the autoPlanes analogue for
    * SimHash blocking (SCALE.md's "block bits ≈ log₂(n) + margin" knob):
    * hold expected per-chunk-bucket occupancy at ~32 docs, i.e.
    * chunkBits = ⌈log₂(n/32)⌉. A FIXED width saturates: candidate pairs
    * grow ~n²/2^bits once n outruns the chunk space (measured on the
    * 16-bit production path in SCALE.md). The signature only carries 4
    * chunks of ≤16 bits (64-bit) or ≤32 bits (128-bit), so the derivation
    * picks the CONSTRUCTION: ≤16 needed bits → the cheaper single-stream
    * 64-bit signature; more → the two-stream 128-bit one (~2× signature
    * cost, 2³² chunk space — linear out to ~10⁹ docs). */
  private[graft] def autoChunkBits(nDocs: Long): Int = {
    // integer-exact ⌈log₂(n/32)⌉ (see Similarity.autoPlanes): count the
    // thresholds 32·2^k the corpus exceeds — exact at power-of-two corpus
    // sizes where float log2 jitter could flip the ceil, so the SQL oracle
    // of the auto gate (deriving the same value from count(*)) always
    // agrees with this side.
    math.min(32, math.max(8, (0 until 32).count(k => nDocs > (32L << k))))
  }

  /** SimHash near-dup with size-derived blocking: chunkBits > 0 pins the
    * width (16 → 64-bit path, else wide); 0 derives it from a count(*) of
    * the documents table (parquet footer metadata, no data scan). */
  def simhashPairsAuto(spark: SparkSession, dir: String, maxHamming: Int = 3,
      chunkBits: Int = 0): DataFrame = {
    val bits =
      if (chunkBits > 0) chunkBits
      else autoChunkBits(Tables.documents(spark, dir).count())
    if (bits <= 16) simhashPairs(spark, dir, maxHamming)
    else simhashPairsWide(spark, dir, maxHamming)
  }

  /** x4e_md5: the derived-width DISPATCH itself, oracle-gated — the md5
    * witness of `simhashPairsAuto`: chunk width from a count(*) of the
    * corpus (`autoChunkBits`, integer-exact), then the width picks the
    * construction — ≤ 16 needed bits → the single-stream witness
    * (`simhashPairsMd5`), more → the two-stream wide witness
    * (`simhashPairsWideMd5`). The oracle SQL re-derives the same width
    * from ITS count(*) and dispatches between the same two mirrored
    * branch queries, so the size→construction decision — the thing the
    * rows-only x4e gate could not pin cross-engine — is hash-checked.
    * (xxhash64 production forms stay rows-only; this witness is their
    * oracle-domain twin, hard-capped like both branch witnesses.) */
  def simhashPairsAutoMd5(spark: SparkSession, dir: String,
      maxDocs: Int = 10000): DataFrame = {
    val bits = autoChunkBits(Tables.documents(spark, dir).count())
    if (bits <= 16) simhashPairsMd5(spark, dir, maxHamming = 1, maxDocs = maxDocs)
    else simhashPairsWideMd5(spark, dir, maxHamming = 3, maxDocs = maxDocs)
  }

  // ---- exact n-gram Jaccard (verification of candidates) ----

  /** End-to-end near-dup pipeline with an ORACLE-EXPRESSIBLE candidate
    * stage: md5-minhash components (the `minhashMd5` witness construction)
    * grouped into k/2 two-row LSH bands — docs agreeing on BOTH components
    * of ANY band become a candidate pair — then exact 3-gram Jaccard
    * verifies. Two-row bands collide with probability j² per band (j =
    * true Jaccard), so low-similarity noise pairs are quadratically
    * suppressed (measured 81k→~3k candidates at sf0.1) while ≥0.9-Jaccard
    * near-dups still surface w.p. ≥ 1-(1-0.81)⁴ ≈ 0.999. Same
    * shuffle-on-short-keys layout as the xxhash64 production path
    * (`minhashPairs`), but every stage runs identically in DuckDB, so the
    * whole LSH→verify composition is hash-checked, not just its pieces. */
  def ngramJaccardPairs(spark: SparkSession, dir: String, k: Int = 8,
      minJaccard: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    ngramJaccard(docs, bandCandidates(spark, dir, k))
      .filter(col("jaccard") >= minJaccard)
      .orderBy("id_a", "id_b")
  }

  /** Band-collision candidate pairs from the md5 minhash — the x15
    * candidate generator, factored for reuse. `directed = true` keeps
    * both orientations of each colliding pair (for asymmetric scores
    * like containment, where (A→B) and (B→A) differ). */
  def bandCandidates(spark: SparkSession, dir: String, k: Int = 8,
      directed: Boolean = false): DataFrame =
    bandCandidatesWith(spark, dir, k, rowsPer = 2, directed = directed)

  /** Parametric-geometry band candidates: k signature components grouped
    * into k/rowsPer bands of rowsPer rows; the band key is the ':'-joined
    * component string (injective — components are plain longs), so the
    * same construction serves every geometry the x15b auto-dispatch can
    * select. Scale shape is unchanged from the 2-row special case: the
    * self-join shuffles only (band index, short key) pairs. */
  def bandCandidatesWith(spark: SparkSession, dir: String, k: Int, rowsPer: Int,
      directed: Boolean = false): DataFrame = {
    require(rowsPer >= 1 && k % rowsPer == 0,
      s"k=$k must divide evenly into rowsPer=$rowsPer bands")
    // barrier: stop the k md5-minhash expressions collapsing into both
    // self-join sides (2× recompute of the per-shingle md5 pass)
    val mhWide = minhashMd5(spark, dir, k).localCheckpoint(eager = false)
    val bands = mhWide.select(col("doc_id"),
      posexplode(array((0 until k / rowsPer).map(j =>
        concat_ws(":", (0 until rowsPer).map(i =>
          col(s"mh${rowsPer * j + i}").cast("string")): _*)): _*))
        .as(Seq("j", "band")))
    val a = bands.select(col("j"), col("band"), col("doc_id").as("id_a"))
    val b = bands.select(col("j").as("bj"), col("band").as("bb"), col("doc_id").as("id_b"))
    val cond = if (directed) col("id_a") =!= col("id_b") else col("id_a") < col("id_b")
    a.join(b, col("j") === col("bj") && col("band") === col("bb") && cond)
      .select("id_a", "id_b").distinct()
  }

  /** Predicted recall (ppm) of `b` bands of `r` rows at the 0.5-Jaccard
    * dedup threshold: 1 − (1 − j^r)^b, with every power evaluated as a
    * CHAINED INTEGER FLOOR PRODUCT in ppm (x · base div 10⁶ repeated) —
    * the identical op sequence the oracle SQL runs, so the geometry
    * selection below is cross-engine bit-exact, never a float pow. */
  private[graft] def bandRecallPpm(r: Int, b: Int): Long =
    bandRecallPpmAt(500000L, r, b)

  /** The same chained-ppm curve at an arbitrary similarity j (ppm) —
    * Round12Spec evaluates it at x110's bucket edges to check the theory
    * the dispatch trusts against the measured witness recall. */
  private[graft] def bandRecallPpmAt(jPpm: Long, r: Int, b: Int): Long = {
    def powChain(base: Long, times: Int): Long =
      (1 to times).foldLeft(1000000L)((x, _) => x * base / 1000000L)
    1000000L - powChain(1000000L - powChain(jPpm, r), b)
  }

  /** x15b: rows-per-band derived from corpus size AND a recall target —
    * the `autoPlanes`/`autoChunkBits` dispatch applied to banding, closing
    * the loop the x110 audit opened (x110 MEASURES the deployed curve
    * against an independent witness; this derives the geometry from the
    * same theoretical curve, which Round12Spec pins against x110's
    * measurement). Two forces: (1) candidate-volume economics want MORE
    * rows per band as the corpus grows — expected false candidates scale
    * like b·Σj^r over sub-threshold pairs, so r must grow ~log n to keep
    * the band stage linear; the size-driven start is ⌈(⌊log₂n⌋+1)/4⌉
    * rounded UP to k's power-of-two divisor ladder {1,2,4}. (2) The recall
    * target is a floor: starting from r₀ the dispatch steps DOWN (more,
    * shorter bands) until the predicted 0.5-threshold recall clears
    * `targetRecallPpm`. All arithmetic is integer-exact (threshold-count
    * log₂, ppm floor-chains), so the oracle re-derives the identical
    * geometry from its own count(*). The witness k is 8 (the md5 minhash
    * the oracle can express); the xxhash64 production path scales the
    * same dispatch to k = 64. */
  private[graft] def autoBandRows(nDocs: Long, targetRecallPpm: Long = 600000L): Int = {
    val l = (0 until 48).count(i => nDocs > (1L << i)) // = ⌊log₂ n⌋ + 1
    val rRaw = (l + 3) / 4
    val r0 = if (rRaw <= 1) 1 else if (rRaw <= 2) 2 else 4
    Iterator.iterate(r0)(_ / 2).takeWhile(_ >= 1)
      .find(r => bandRecallPpm(r, 8 / r) >= targetRecallPpm)
      .getOrElse(1)
  }

  /** x15c: the x110→x15b feedback loop CLOSED with a MEASURED correction.
    * x110 measures the deployed (r=2, b=4) banding's recall against an
    * independent simhash witness; this folds that measurement into one
    * integer calibration factor: corr_ppm = found_pairs · 10¹² / Σ_pair
    * theory_ppm(pair's bucket low edge), capped at 10⁶ so a witness that
    * OVERPERFORMS theory can never loosen geometry — the correction only
    * tightens. The audit is ≤7 bucket rows at ANY corpus size (Jaccard
    * deciles ≥ 0.5), so the driver read is corpus-size-independent — the
    * Skew.keySkewProfile peek pattern. The truth sample rides the
    * hard-capped 16-bit witness, so found_pairs is bounded and the 10¹²
    * scaling can't overflow a long (require below documents the bound). */
  private[graft] def bandCalibrationPpm(spark: SparkSession, dir: String): Long = {
    val audit = bandRecallAudit(spark, dir)
      .select("j_bucket", "n_true_pairs", "n_found").collect()
    val found = audit.map(_.getLong(2)).sum
    require(found < 9000000L,
      s"witness found-pair count $found exceeds the capped-witness bound; " +
      "calibration arithmetic assumes the hard-capped 16-bit truth sample")
    // expected found under the deployed r=2,b=4 theory, each pair bounded
    // below by its bucket's LOW edge (the curve is monotone in j)
    val expected = audit.map(r =>
      r.getLong(1) * bandRecallPpmAt(r.getLong(0) * 100000L, 2, 4)).sum
    if (expected == 0L) 1000000L
    else math.min(1000000L, found * 1000000L * 1000000L / expected)
  }

  /** The x15b size/target ladder with the measured correction applied:
    * predicted recall at each candidate geometry is DERATED by corr_ppm
    * before the target comparison, so a witness that underperforms theory
    * forces more, shorter bands (higher recall) than theory alone would.
    * corr_ppm = 10⁶ (theory confirmed or overconfirmed) reduces exactly
    * to autoBandRows. */
  private[graft] def autoBandRowsCalibrated(nDocs: Long, corrPpm: Long,
      targetRecallPpm: Long = 600000L): Int = {
    val l = (0 until 48).count(i => nDocs > (1L << i))
    val rRaw = (l + 3) / 4
    val r0 = if (rRaw <= 1) 1 else if (rRaw <= 2) 2 else 4
    Iterator.iterate(r0)(_ / 2).takeWhile(_ >= 1)
      .find(r => bandRecallPpm(r, 8 / r) * corrPpm / 1000000L >= targetRecallPpm)
      .getOrElse(1)
  }

  /** x15c gate: x15b's derived-geometry pipeline with the measured recall
    * correction in the dispatch. The calibration factor and the geometry
    * it selected ride every output row, so the oracle's independent
    * re-derivation of BOTH (from its own x110-equivalent audit and its
    * own count(*)) is part of the hash check. */
  def ngramJaccardPairsCalibrated(spark: SparkSession, dir: String,
      targetRecallPpm: Long = 600000L): DataFrame = {
    val corr = bandCalibrationPpm(spark, dir)
    val docs = Tables.documents(spark, dir)
    val r = autoBandRowsCalibrated(docs.count(), corr, targetRecallPpm)
    ngramJaccard(docs, bandCandidatesWith(spark, dir, k = 8, rowsPer = r))
      .filter(col("jaccard") >= 0.5)
      .withColumn("rows_per_band", lit(r).cast("int"))
      .withColumn("n_bands", lit(8 / r).cast("int"))
      .withColumn("calib_ppm", lit(corr).cast("long"))
      .orderBy("id_a", "id_b")
  }

  /** x15b gate: the x15 pipeline with DERIVED band geometry — one
    * metadata-cheap count(*) picks (rows, bands), then the md5-witness
    * banding and exact-Jaccard verification run exactly as x15. The
    * derived geometry is emitted on every row so the oracle's own
    * derivation is part of the hash check, not just the pair set. */
  def ngramJaccardPairsAuto(spark: SparkSession, dir: String,
      targetRecallPpm: Long = 600000L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val r = autoBandRows(docs.count(), targetRecallPpm)
    ngramJaccard(docs, bandCandidatesWith(spark, dir, k = 8, rowsPer = r))
      .filter(col("jaccard") >= 0.5)
      .withColumn("rows_per_band", lit(r).cast("int"))
      .withColumn("n_bands", lit(8 / r).cast("int"))
      .orderBy("id_a", "id_b")
  }

  /** x58: asymmetric shingle CONTAINMENT — detects when one document's
    * content is (nearly) a subset of another's: quotes, boilerplate
    * inclusion, wrapped reposts. Symmetric Jaccard misses these (a short
    * doc fully quoted inside a long one has low Jaccard but containment
    * ≈ 1), which is why containment is its own primitive (LSH Ensemble,
    * Zhu et al. VLDB'16): containment(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|,
    * scored exactly per DIRECTED candidate pair.
    *
    * Candidates here are the minhash band collisions (directed) — tuned
    * for Jaccard, so extreme length-skewed containments can escape the
    * bands; at lake scale the LSH-Ensemble fix is banding within
    * per-length partitions, which changes only `bandCandidates`, not the
    * scoring. 100 TB: band join shuffles short band keys, scoring joins
    * shuffle doc ids; nothing quadratic. */
  def containmentPairs(spark: SparkSession, dir: String, k: Int = 8,
      minContainment: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // same semi-join prune as ngramJaccard: shingle arrays only for docs
    // that appear in a directed candidate — the rescore stays
    // candidate-sized as the corpus grows
    val cand = bandCandidates(spark, dir, k, directed = true)
      .localCheckpoint(eager = false)
    val ids = cand.select(col("id_a").as("doc_id"))
      .unionByName(cand.select(col("id_b").as("doc_id"))).distinct()
    val sh = Tables.widen(docs.join(ids, Seq("doc_id"), "left_semi"))
      .select(col("doc_id"), array_distinct(shingles(tokensCol)).as("sh"))
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") / size(col("sh_a")))
      .filter(col("containment") >= minContainment)
      .select("id_a", "id_b", "containment")
      .orderBy("id_a", "id_b")
  }

  /** Near-dup CLUSTER RESOLUTION — the last step of a dedup pipeline:
    * verified pairs form an undirected graph; each connected component is
    * one duplicate cluster and its minimum doc_id the canonical keeper.
    *
    * Large-star/small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14 — public algorithm):
    * edges are kept canonical (hi > lo) and each round applies
    *   large-star  — every node connects its strictly-LARGER neighbors to
    *                 its minimum neighbor-or-self, and
    *   small-star  — every node connects its smaller neighbors (and
    *                 itself) to that minimum,
    * until both operations are no-ops. Both preserve connectivity, and
    * their joint fixpoints are exactly star forests centered at each
    * component's minimum node — so rounds needed are O(log n) on ANY
    * graph shape (paths, expanders), not O(diameter) like plain min-label
    * propagation: a million-node chain converges in ~20 rounds instead of
    * a million. Each operation is one short-key hash-agg + one equi-join
    * on the SAME key + a distinct — the driver sees only per-round change
    * counts, never data. Labels then read directly off the final stars. */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // localCheckpoint, not persist: persist caches DATA but keeps the full
    // logical plan, so every round's plan would embed the previous round's
    // (the lineage DOUBLES per round — Catalyst re-analysis alone measured
    // 5-6 s/round on a 477-node graph by round 2). Checkpointing cuts the
    // (potentially huge — x15 is a whole LSH pipeline) upstream plan to a
    // flat scan, and does the same per round so analysis cost stays
    // constant. At lake scale this becomes reliable-storage checkpoint()
    // (or a per-round parquet round-trip) — same lineage-cut, executor-
    // failure-tolerant.
    // checkpoint pairs BEFORE deriving nodes/edges: both reference the
    // pairs plan, and each would otherwise recompute the whole pipeline
    val p = pairs.localCheckpoint()
    val nodes = p.select(col("id_a").as("doc_id"))
      .unionByName(p.select(col("id_b").as("doc_id"))).distinct()
    var e = p.filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("hi"),
        least(col("id_a"), col("id_b")).as("lo"))
      .distinct().localCheckpoint()
    // large-star: per node u over the SYMMETRIC adjacency, m = min(Γ(u) ∪
    // {u}); every neighbor v > u is rewired to m. Each undirected edge is
    // emitted by exactly one endpoint (its smaller one), so |E| never grows.
    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mn = sym.groupBy("u").agg(min("v").as("mn"))
      sym.join(mn, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), least(col("u"), col("mn")).as("lo"))
        .distinct()
    }
    // small-star: per node u over its SMALLER neighbors Γ⁻(u) (= the lo
    // side of canonical edges keyed hi = u), m = min(Γ⁻(u)); u and every
    // other smaller neighbor connect to m. (m < u and m < v throughout, so
    // outputs stay canonical with no self-loops by construction.)
    def smallStar(edges: DataFrame): DataFrame = {
      val g = edges.groupBy("hi").agg(min("lo").as("m"))
      g.select(col("hi"), col("m").as("lo"))
        .unionByName(edges.join(g, "hi").filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo")))
        .distinct()
    }
    var converged = false
    var iter = 0
    var eCount = e.count()
    while (!converged && iter < maxIters) {
      // ONE fused plan + ONE materialization per round (lazy checkpoint,
      // realized by the count): rounds on a near-dup graph are dominated
      // by fixed per-job latency, not data, so job count is the cost.
      val e2 = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val c2 = e2.count()
      // converged ⟺ the fused round is an identity on e. That implies
      // BOTH ops were individually no-ops — i.e. e is a fixpoint of each,
      // which is exactly the min-centered star forest: under either op
      // every output edge is componentwise ≤ its input edge (large-star
      // keeps hi, shrinks lo to m ≤ u; small-star maps (hi, lo) to
      // (hi, m) or (lo, m) with m ≤ lo), and distinct only removes rows —
      // so set equality of input and output forces every per-edge step to
      // have been an exact identity (a strict shrink anywhere would drop
      // the total Σ(hi+lo), and nothing can raise it back). A star
      // centered off-minimum therefore cannot stop the loop early: it is
      // a small-star fixpoint but large-star rewires it, changing the set.
      // Cheap-first: both sides are distinct sets, so equal counts + one
      // empty one-directional except ⟺ equality; the count compare (a
      // metadata-cheap job on the checkpointed RDD) short-circuits the
      // except shuffle on every still-shrinking round — only the final
      // stable round pays it.
      converged = c2 == eCount && e2.except(e).count() == 0
      e = e2
      eCount = c2
      iter += 1
    }
    // exiting via maxIters with edges still moving would return WRONG
    // cluster ids (components only partially merged) with no signal —
    // fail loudly instead; maxIters=20 covers any graph to ~2^20 nodes
    // per component and callers with genuinely larger ones raise it
    require(converged,
      s"connected-components did not converge after $maxIters " +
        s"large-star/small-star rounds — raise maxIters")
    // final e is a star forest: leaf hi → component-min lo; centers (and
    // nodes whose every edge got absorbed into a center) label themselves
    val lab = e.groupBy("hi").agg(min("lo").as("lab"))
      .select(col("hi").as("doc_id"), col("lab"))
    nodes.join(lab, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lab"), col("doc_id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Gate entry: clusters over the oracle-checked x15 near-dup pairs —
    * the full pipeline shingle→minhash→bands→exact-Jaccard→components is
    * hash-checked end to end (DuckDB side: recursive CTE reachability). */
  def dedupClustersGate(spark: SparkSession, dir: String): DataFrame =
    dedupClusters(ngramJaccardPairs(spark, dir).drop("jaccard"))

  /** x83: INCREMENTAL connected components — the daily-refresh path that
    * pairs with the x82 frozen split. Yesterday's labels are persisted;
    * today's crawl contributes only NEW edges (pairs touching a new doc,
    * from the incremental x35 candidate path). Rather than re-running CC
    * over the full corpus graph, the prior labels ARE re-usable structure:
    * a label table (doc_id → cluster_id) is exactly a star forest — the
    * converged output of large-star/small-star — so feeding (prior stars ∪
    * new edges) back through `dedupClusters` converges in rounds
    * proportional to how much the NEW edges entangle components, not to
    * the size or shape of the historical graph. The edge volume is
    * |prior docs| + |new edges| (one short edge per historical doc — the
    * same order as reading the label artifact at all), every shuffle key
    * is a long, and the result is CONTRACTUALLY equal to a full recompute
    * over the union graph: stars preserve connectivity, so
    * CC(stars(G_old) ∪ E_new) = CC(G_old ∪ E_new). Output covers every
    * prior doc (singletons keep self-labels) plus every endpoint of a new
    * edge; labels are component minima over ALL doc ids, old and new. */
  def incrementalClusters(priorLabels: DataFrame, newEdges: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val priorEdges = priorLabels.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("id_a"), col("cluster_id").as("id_b"))
    val merged =
      dedupClusters(priorEdges.unionByName(newEdges.select("id_a", "id_b")), maxIters)
    val nodes = priorLabels.select("doc_id")
      .unionByName(newEdges.select(col("id_a").as("doc_id")))
      .unionByName(newEdges.select(col("id_b").as("doc_id"))).distinct()
    nodes.join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  /** x83 gate: deterministic two-snapshot refresh over the REAL x15
    * near-dup pipeline. Old snapshot = doc_id % 10 ≠ 0 (~90% of the
    * corpus); prior labels = CC over pairs internal to the old snapshot
    * (old singletons self-labeled — the persisted artifact shape); new
    * edges = every pair touching a new doc. The oracle does NOT mirror
    * the incremental mechanics — it hash-checks the CONTRACT, recursive-
    * CTE reachability over the FULL pair set (+ old singletons), i.e.
    * incremental refresh ≡ full recompute. One checkpoint on the pairs:
    * prior-CC and new-edge filters both consume them, and without the
    * barrier the whole LSH pipeline would run twice. */
  def incrementalClustersGate(spark: SparkSession, dir: String): DataFrame = {
    // the refresh's pair set is itself a persisted table in production
    // (the pairArtifact contract) — prior-CC and new-edge filters both
    // read it, so the LSH pipeline runs at most once per session
    val pairs = pairArtifact(spark, dir).drop("jaccard")
    // the prior-day labels are a PERSISTED ARTIFACT in production (the
    // x17/x75 materialize-once contract) — the refresh never recomputes
    // yesterday's CC, it reads the table; memoize it the same way so the
    // gate measures the INCREMENTAL step plus the new-pair scan, not a
    // full historical re-resolution per run
    val prior = graft.Tables.materializeOnce(spark, s"cc_labels_prior:$dir") {
      val oldPairs = pairs.filter(col("id_a") % 10 =!= 0 && col("id_b") % 10 =!= 0)
      Tables.documents(spark, dir).select("doc_id")
        .filter(col("doc_id") % 10 =!= 0)
        .join(dedupClusters(oldPairs), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    }
    val newEdges = pairs.filter(col("id_a") % 10 === 0 || col("id_b") % 10 === 0)
    incrementalClusters(prior, newEdges)
  }

  /** The x15 verified pair set as a materialize-once ARTIFACT — the same
    * refresh contract as `clusterLabels`: a lake computes the
    * LSH→exact-Jaccard pairs once per crawl and persists them; the graph
    * analytics (x86 triangles, x106 k-core), the threshold sweep (x104)
    * and the CC build all read the table rather than re-running the
    * shingle/minhash pipeline per consumer. The x15 gate itself still
    * exercises the live pipeline. */
  def pairArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.materializeOnce(spark, s"x15_pairs:$dir")(
      ngramJaccardPairs(spark, dir))

  /** The x17 labels as a materialize-once ARTIFACT (Tables.materializeOnce):
    * six queries consume the component labels (x30 apply, x61 best-of-
    * cluster, x66 stats, x75 split, plus compositions) and re-running the
    * CC rounds per consumer is exactly what a lake refresh would NOT do —
    * labels are computed once per refresh and persisted; consumers read
    * the table. The x17 gate itself still exercises the live pipeline. */
  def clusterLabels(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.materializeOnce(spark, s"cc_labels:$dir")(
      dedupClusters(pairArtifact(spark, dir).drop("jaccard")))

  /** x75: LEAKAGE-SAFE train/val/test split — the assignment every
    * training-data pipeline needs but a naive per-doc coin gets wrong:
    * near-duplicate documents MUST land in the same split, or the
    * held-out sets are contaminated by paraphrases of training docs and
    * eval numbers inflate. The split coin is therefore thrown per
    * NEAR-DUP GROUP, not per doc: group = the x17 connected-component
    * label for clustered docs, the doc's own id for singletons; every
    * member inherits the group's throw.
    *
    * Coin: first md5 byte of the group id (the x46/x54 idiom) —
    * deterministic, engine-mirrorable, and uniform enough that the
    * 204/230 cut points give ≈ 80/10/10. The assignment is stable across
    * corpus refreshes EXACTLY as far as the cluster labels are: docs whose
    * group id is unchanged keep their split (the coin depends only on the
    * group id, unlike a random-number split). A refresh CAN move docs —
    * a new doc that bridges two existing clusters merges them, relabeling
    * the higher-min cluster's members and re-throwing their coin. A
    * production refresh therefore FREEZES prior assignments (anti-join new
    * docs against the persisted split before assigning) and uses this coin
    * only for never-before-seen groups; the frozen-union is a projection +
    * anti-join, no new machinery.
    *
    * 100 TB: clusters are the checkpointed CC labels (short-key
    * shuffles, measured linear); the group join is doc_id-keyed; the
    * coin is a projection. Nothing here is heavier than x17 itself. */
  def leakSafeSplit(spark: SparkSession, dir: String): DataFrame =
    leakSafeSplitOf(docsWide(spark, dir).select("doc_id"), clusterLabels(spark, dir))

  /** Library form over arbitrary (doc_id) docs + (doc_id, cluster_id)
    * labels; docs absent from `clusters` are their own group. */
  /** THE split coin — one definition shared by the fresh (x75) and frozen
    * (x82) paths: first md5 byte of the group id, cut at 204/230
    * (≈ 80/10/10). Any change here changes BOTH paths together; a drifted
    * copy would silently hand x82's 'coined' tier different splits than a
    * fresh x75 run. */
  private def splitCoinExpr(groupId: Column): Column = {
    val coin = conv(substring(md5(groupId.cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("int")
    when(coin < 204, "train").when(coin < 230, "val").otherwise("test")
  }

  def leakSafeSplitOf(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val g = docs.join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
    g.select(col("doc_id"), col("group_id"),
        splitCoinExpr(col("group_id")).as("split"))
      .orderBy("doc_id")
  }

  /** x82: FROZEN-refresh split — the production idiom the x75 split
    * promises made literal: on a corpus refresh, previously-assigned docs
    * NEVER change split (re-deriving would silently move docs whose
    * clusters merged — eval sets must be append-only or prior training
    * runs leak into them). Three tiers, each a projection over one join:
    *  - frozen    — the doc is in `priorSplit`: keep its split verbatim,
    *                whatever the new clustering says (reported under its
    *                CURRENT group_id so merges stay observable);
    *  - inherited — a NEW doc whose current group contains ≥ 1 frozen
    *                member takes the split of the group's minimum-doc_id
    *                frozen member (a near-dup of a train doc must train;
    *                if prior clusters straddling splits merged, that leak
    *                is historical — the min rule just keeps the verdict
    *                deterministic);
    *  - coined    — a NEW doc in a never-before-seen group throws the
    *                x75 md5 coin on its group id.
    *
    * 100 TB: `priorSplit` is the persisted split artifact (one row per
    * assigned doc); everything here is doc_id/group_id-keyed equi-joins
    * and one map-side-combinable min per group — strictly lighter than
    * re-running the split, and no text ever shuffles. */
  def leakSafeSplitFrozen(docs: DataFrame, clusters: DataFrame,
      priorSplit: DataFrame): DataFrame = {
    val g = docs.join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
    val withPrior = g.join(
      priorSplit.select(col("doc_id"), col("split").as("prior_split")),
      Seq("doc_id"), "left")
    val assigned = withPrior.filter(col("prior_split").isNotNull)
      // barrier: frozen rows AND the per-group inheritance read this side
      .localCheckpoint(eager = false)
    val frozen = assigned.select(col("doc_id"), col("group_id"),
      col("prior_split").as("split"), lit("frozen").as("assignment"))
    val groupSplit = assigned.groupBy("group_id")
      .agg(min_by(col("prior_split"), col("doc_id")).as("inherit_split"))
    val newDocs = withPrior.filter(col("prior_split").isNull)
      .select("doc_id", "group_id")
    val inherited = newDocs.join(groupSplit, Seq("group_id"))
      .select(col("doc_id"), col("group_id"),
        col("inherit_split").as("split"), lit("inherited").as("assignment"))
    val coined = newDocs.join(groupSplit, Seq("group_id"), "left_anti")
      .select(col("doc_id"), col("group_id"),
        splitCoinExpr(col("group_id")).as("split"),
        lit("coined").as("assignment"))
    frozen.unionByName(inherited).unionByName(coined).orderBy("doc_id")
  }

  /** DELTA form of the frozen refresh (e18's per-batch step): emit rows
    * for the NEW docs ONLY — frozen assignments are immutable by
    * contract, so a rolling ingest never needs to rewrite them; the split
    * store advances by APPEND and the per-batch cost is proportional to
    * the batch plus the membership of the groups it touches, not the full
    * known corpus (the r13 `weak` flag: `leakSafeSplitFrozen` re-projects
    * O(known) rows every micro-batch).
    *
    * Inputs: `newDocs` (doc_id — the batch, assumed disjoint from
    * `priorAssigned` by the each-doc-arrives-once stream contract),
    * `labels` (doc_id, cluster_id — the CURRENT clustering over the full
    * known set, i.e. the label store AFTER this batch's CC refresh), and
    * `priorAssigned` (doc_id, split — every doc assigned before this
    * batch). Output: (doc_id, group_id, split, assignment) with
    * assignment ∈ {inherited, coined}, exactly the non-frozen tiers of
    * `leakSafeSplitFrozen(newDocs ∪ assigned, labels, priorAssigned)`.
    *
    * Scale shape: `touched` (≤ |batch| group ids) is broadcast, so the
    * members lookup is a map-side semi-join on the label table (at lake
    * scale: partition-pruned if the label store is bucketed by
    * cluster_id) whose OUTPUT is ∝ touched-group membership; that small
    * side is then broadcast against the big `priorAssigned` store, so the
    * frozen artifact is scanned (map-only) but never shuffled, and every
    * shuffle in the plan carries only batch-proportional rows.
    *
    * Boundedness caveat: the broadcast member set is ∝ touched-group
    * MEMBERSHIP, which a degenerate dedup graph (one chain-collapsed
    * cluster spanning a large corpus fraction) could blow past broadcast
    * limits. That is a data-quality pathology, not a plan choice — the
    * x136 coherence audit exists to detect exactly those clusters and
    * x137's guarded survivorship to defuse them upstream; a deployment
    * seeing oversized touched sets should gate ingest on that audit
    * rather than silently switch this join to a corpus-wide shuffle.
    * r15: the bound is now ENFORCED — `requireBoundedMembership` throws
    * the typed `TouchedMembershipExceeded` (naming the x136/x137 gates)
    * instead of letting the broadcast OOM. */
  def leakSafeSplitDelta(newDocs: DataFrame, labels: DataFrame,
      priorAssigned: DataFrame): DataFrame = {
    // barrier: g feeds both the inherit join and the coin anti-join, and
    // without it the upstream batch plan would run twice
    val g = newDocs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
      .localCheckpoint(eager = false)
    val touched = g.select(col("group_id").as("cluster_id")).distinct()
    // all CURRENT members of batch-touched groups (frozen + new): output
    // rows ∝ touched membership, never ∝ corpus
    // r16: EAGER — one job streams the labels view through the semi-join
    // and pins the membership frame; the guard count reads local blocks
    // instead of running a separate partial scan (the e18 per-trigger
    // overhead the r15 verdict measured)
    val members = labels.join(broadcast(touched), Seq("cluster_id"), "left_semi")
      .localCheckpoint(eager = true)
    // `members` is the broadcast build side below — fail typed +
    // actionable on the giant-cluster pathology instead of a raw
    // broadcast OOM
    requireBoundedMembership(members, "leakSafeSplitDelta")
    // frozen members of those groups → per-group inheritance verdict; the
    // members side is the bounded one, so IT is the broadcast build side
    // and the big assigned store streams map-only
    val groupSplit = broadcast(members)
      .join(priorAssigned.select("doc_id", "split"), Seq("doc_id"))
      .groupBy(col("cluster_id").as("group_id"))
      .agg(min_by(col("split"), col("doc_id")).as("inherit_split"))
    val inherited = g.join(groupSplit, Seq("group_id"))
      .select(col("doc_id"), col("group_id"),
        col("inherit_split").as("split"), lit("inherited").as("assignment"))
    val coined = g.join(groupSplit, Seq("group_id"), "left_anti")
      .select(col("doc_id"), col("group_id"),
        splitCoinExpr(col("group_id")).as("split"),
        lit("coined").as("assignment"))
    inherited.unionByName(coined)
  }

  /** x82 gate: a deterministic two-snapshot refresh over the real corpus
    * ids. Snapshot 1 = the 80% of docs with doc_id % 5 ≠ 0, clustered as
    * consecutive PAIRS (cluster = doc_id − doc_id % 2) within the
    * doc_id % 20 < 8 stratum; the refresh adds the remaining docs and
    * MERGES each two adjacent pairs into a QUAD (cluster = doc_id −
    * doc_id % 4) — so refresh groups bridge prior clusters whose coins
    * landed on different splits, the exact relabeling hazard the freeze
    * exists for. Both snapshots are pure id arithmetic, so the oracle
    * re-derives the full prior artifact and all three tiers in SQL; the
    * cluster PIPELINE is x17's gate, not this one's. */
  def frozenSplitGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val priorDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val priorClusters = priorDocs.filter(col("doc_id") % 20 < 8)
      .select(col("doc_id"), (col("doc_id") - col("doc_id") % 2).as("cluster_id"))
    val nowClusters = docs.filter(col("doc_id") % 20 < 8)
      .select(col("doc_id"), (col("doc_id") - col("doc_id") % 4).as("cluster_id"))
    leakSafeSplitFrozen(docs, nowClusters,
      leakSafeSplitOf(priorDocs, priorClusters))
  }

  /** x139: SPLIT BALANCE AUDIT — the drift table a frozen split's owner
    * watches: the freeze (x82/e18) is append-only by design, so balance
    * error ACCUMULATES across refreshes (inherited members pile into
    * whichever split their group froze on) and nothing re-centers it.
    * Per split: exact count, integer-ppm share, the coin measure's exact
    * target (train 204/256 = 796875 ppm; val/test ⌊26·10⁶/256⌋ =
    * 101562), and the absolute deviation. Scale: one short-key count
    * aggregate over the split artifact; the totals window rides the
    * ≤3-row aggregate. */
  def splitBalance(spark: SparkSession, dir: String): DataFrame =
    splitBalanceOf(frozenSplitGate(spark, dir).select("split"))

  /** Library form over any frame with a `split` column. */
  def splitBalanceOf(split: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    split.groupBy("split").agg(count(lit(1)).as("n_docs"))
      .withColumn("tot", sum("n_docs").over(w))
      .withColumn("share_ppm", expr("n_docs * 1000000 div tot"))
      .withColumn("target_ppm",
        when(col("split") === "train", 796875L).otherwise(101562L))
      .withColumn("deviation_ppm", abs(col("share_ppm") - col("target_ppm")))
      .select("split", "n_docs", "share_ppm", "target_ppm", "deviation_ppm")
      .orderBy("split")
  }

  /** x61: quality-aware cluster REPRESENTATIVE selection — production
    * dedup keeps the BEST duplicate, not the first: crawls re-capture the
    * same page with different boilerplate/truncation, and keep-min-id
    * keeps whichever was crawled first. Per near-dup cluster, the keeper
    * is the member with the highest x8 quality score (ties → smallest
    * doc_id). The per-cluster argmax is `max(struct(quality, -doc_id))` —
    * map-side combinable, so each task reduces a cluster to one candidate
    * before the shuffle (no window sort over members).
    *
    * 100 TB: clusters come from the checkpointed CC labels (short-key
    * shuffles); quality is a per-row projection on the scan; the argmax
    * shuffles one short row per (cluster, task). */
  def bestOfCluster(spark: SparkSession, dir: String): DataFrame = {
    val clusters = clusterLabels(spark, dir)
    val q = TextStats.qualityScore(spark, dir).select("doc_id", "quality_score")
    clusters.join(q, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(
        max(struct(col("quality_score").as("q"), (-col("doc_id")).as("nd"))).as("m"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"), (-col("m.nd")).as("keeper_id"),
        col("m.q").as("keeper_quality"), col("cluster_size"))
      .orderBy("cluster_id")
  }

  /** x30: APPLY the dedup — the end product of the whole pipeline: the
    * corpus with every non-canonical near-duplicate removed (keeper = the
    * cluster's minimum doc_id, i.e. the row whose label equals itself).
    * One anti-join of the corpus against the (tiny) loser set; at lake
    * scale the loser list is the persisted artifact a re-run would reuse. */
  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    val losers = clusterLabels(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    Tables.documents(spark, dir)
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  /** x66: duplication-rate REPORT — the dedup observability artifact a
    * curation run publishes next to the deduped corpus: how many clusters
    * of each size, how many documents they cover, and how many the dedup
    * removes (cluster_size − 1 per cluster, keep-one semantics). Docs
    * that never paired are the cluster_size = 1 row (total − clustered),
    * so `sum(n_docs)` is always the corpus size and `sum(n_removed)`
    * reconciles exactly with x30's apply (spec-pinned).
    *
    * 100 TB: two short-key hash-aggs over the (already short) CC label
    * table plus one metadata count(*); the singleton row rides a 1-row
    * broadcast stat frame — nothing here touches text. */
  def dedupStats(spark: SparkSession, dir: String): DataFrame = {
    // checkpoint: the per-cluster sizes feed BOTH the histogram and the
    // clustered-doc total; without the barrier the whole x15+CC pipeline
    // would run twice
    val sizes = clusterLabels(spark, dir)
      .groupBy("cluster_id").agg(count(lit(1)).cast("int").as("cluster_size"))
      .localCheckpoint(eager = false)
    val hist = sizes.groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    val docsN = Tables.documents(spark, dir).agg(count(lit(1)).as("total"))
    val inC = sizes.agg(coalesce(sum("cluster_size"), lit(0L)).as("in_clusters"))
    val singles = docsN.crossJoin(broadcast(inC))
      .select(lit(1).as("cluster_size"),
        (col("total") - col("in_clusters")).as("n_clusters"))
    hist.unionByName(singles)
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size").cast("long") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1).cast("long") * col("n_clusters")).as("n_removed"))
      .orderBy("cluster_size")
  }

  /** x35: incremental ingestion dedup — the continuous-crawl pattern: a
    * new batch lands against the historical corpus and must not re-ingest
    * what's already there. Here the deterministic split is existing =
    * even doc_ids, incoming = odd. An incoming doc is dropped as
    * `dup_exact` when its content hash matches ANY existing doc, else as
    * `dup_near` when its 16-bit md5 simhash collides with an existing
    * signature, else `kept`.
    *
    * 100 TB design: the historical side reduces to two DISTINCT signature
    * sets (content hashes + simhashes) — the persisted index a daily
    * ingest would maintain incrementally; both joins are hash equi-joins
    * on short keys, and the incoming batch is scanned once behind a lazy
    * localCheckpoint barrier (the signature agg must not recompute per
    * branch; GC releases it, see minhashPairs). */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame =
    incrementalDedupOf(docsWide(spark, dir), col("doc_id") % 2 === 0)

  /** The incremental-dedup construction over an arbitrary (doc_id, text)
    * frame with an `isExisting` predicate marking the historical side. */
  def incrementalDedupOf(docs: DataFrame, isExisting: Column): DataFrame = {
    val sig = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ch"),
        isExisting.as("is_existing"))
      .join(simhashMd5Of(docs), Seq("doc_id"))
      .select("doc_id", "ch", "simhash16", "is_existing")
      .localCheckpoint(false)
    val exCh = sig.filter(col("is_existing"))
      .select("ch").distinct().withColumn("ex_ch", lit(1))
    val exSh = sig.filter(col("is_existing"))
      .select("simhash16").distinct().withColumn("ex_sh", lit(1))
    sig.filter(!col("is_existing"))
      .join(exCh, Seq("ch"), "left")
      .join(exSh, Seq("simhash16"), "left")
      .select(col("doc_id"),
        when(col("ex_ch") === 1, "dup_exact")
          .when(col("ex_sh") === 1, "dup_near")
          .otherwise("kept").as("status"))
      .orderBy("doc_id")
  }

  /** The x35 signature index as a PERSISTABLE artifact: each historical
    * doc's (content hash, 16-bit md5 simhash) row — what a daily ingest
    * stores after each corpus refresh and probes on arrival (the e15
    * streaming bridge reads it back from parquet via
    * `Tables.materializeOnce`, the x122b stored-index motion). Kept
    * per-doc rather than pre-distinct'd: the probe's left-semi shape
    * doesn't need distinctness, and the per-doc form also serves
    * survivorship/audit consumers. */
  def signatureIndexOf(existing: DataFrame): DataFrame =
    existing
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ch"))
      .join(simhashMd5Of(existing), Seq("doc_id"))
      .select("ch", "simhash16")

  /** Probe an incoming (doc_id, text) frame — e.g. one micro-batch of the
    * e15 ingest stream — against a stored signature index: `dup_exact` on
    * content-hash membership, else `dup_near` on simhash collision, else
    * `kept`. Per-doc pure (no cross-batch state), so ANY batching of the
    * incoming set yields the same statuses — the property that lets the
    * streamed form share x35's oracle. The index reduces to two DISTINCT
    * short-key sets and both probes are hash equi-joins; at 100 TB the
    * incoming batch is the small side by construction. */
  def probeSignatureIndexAny(batch: DataFrame, index: DataFrame): DataFrame = {
    val sig = batch
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ch"))
      .join(simhashMd5Of(batch), Seq("doc_id"))
    val exCh = index.select("ch").distinct().withColumn("ex_ch", lit(1))
    val exSh = index.select("simhash16").distinct().withColumn("ex_sh", lit(1))
    sig.join(exCh, Seq("ch"), "left")
      .join(exSh, Seq("simhash16"), "left")
      .select(col("doc_id"),
        when(col("ex_ch") === 1, "dup_exact")
          .when(col("ex_sh") === 1, "dup_near")
          .otherwise("kept").as("status"))
  }

  /** x73: Bloom-filter membership PRE-FILTER for incremental dedup — the
    * compact-index answer to "is this incoming doc already in 100 TB of
    * history?" when even the distinct content-hash set (x35's index) is
    * too big to join against cheaply. The filter is built and probed
    * RELATIONALLY, no bitmap UDF:
    *  - k = 3 positions per key, the t-th = (t-th 32-bit slice of
    *    md5(text)) % mBits — disjoint md5 slices, independent enough for
    *    the standard FPR model;
    *  - the "bitmap" is the DISTINCT position set of the historical keys:
    *    ≤ mBits rows — the relational rendering of an m-bit array, and
    *    like the array it's O(mBits) regardless of corpus size, so it
    *    broadcasts at ANY scale (mBits is sized to the key count:
    *    m ≈ 10·n gives ~1% FPR at k=3; a production build persists the
    *    position set and unions in each day's new keys);
    *  - a batch doc is a bloom HIT iff all k of its positions are present
    *    — posexplode + one broadcast left join + count == k.
    * Output per batch doc: (doc_id, bloom_hit, exact_dup) — exact_dup is
    * the ground-truth membership join the gate publishes so the oracle
    * pins BOTH the no-false-negative guarantee and the exact
    * false-positive set (deterministic given the hash). At lake scale the
    * exact join runs only on the hits (the pre-filter's whole point:
    * non-hits — the vast majority — never touch the historical index). */
  def bloomPrefilter(spark: SparkSession, dir: String, mBits: Int = 4096): DataFrame = {
    // the synthetic corpus has no exact text dups, so the gate PLANTS
    // them across the split: every odd doc_id ≡ 0 (mod 7) carries its
    // even neighbor's text — true membership hits the oracle can verify
    // alongside the deterministic false-positive set
    val docs = docsWide(spark, dir)
    val neighbor = docs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1).as("doc_id"), col("text").as("ntext"))
    val planted = docs.join(neighbor, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0 && col("ntext").isNotNull, col("ntext"))
          .otherwise(col("text")).as("text"))
    bloomPrefilterOf(planted, col("doc_id") % 2 === 0, mBits)
  }

  /** Size the filter to the key count: next power of two ≥ 10·n — ~1%
    * FPR at k = 3 by the standard model. The auto knob mirroring
    * `Similarity.autoPlanes`/`autoChunkBits`: the gate pins mBits = 4096
    * to match the oracle; production passes 0 and the filter keeps its
    * FPR as the corpus grows instead of saturating (a 4096-bit filter
    * over 10× keys measured all-hits in the rehearsal — correct Bloom
    * behavior, useless as a pre-filter). */
  private[graft] def autoMBits(nKeys: Long): Int = {
    val target = math.min(1L << 30, math.max(4096L, 10L * math.max(nKeys, 1L)))
    (java.lang.Long.highestOneBit(target - 1) << 1).toInt
  }

  /** The Bloom construction over an arbitrary (doc_id, text) frame.
    * mBits = 0 derives the size from a count of the historical side. */
  def bloomPrefilterOf(docs: DataFrame, isExisting: Column,
      mBits: Int = 4096, k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 4, "k positions are disjoint 8-hex-char md5 slices; md5 has 4")
    val mResolved = if (mBits > 0) mBits else autoMBits(docs.filter(isExisting).count())
    val sig = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ch"),
        isExisting.as("is_existing"))
      .localCheckpoint(false) // one corpus scan feeds three branches
    val posCols = (0 until k).map(t =>
      conv(substring(col("ch"), t * 8 + 1, 8), 16, 10).cast("long") % mResolved)
    val bloom = sig.filter(col("is_existing"))
      .select(explode(array(posCols: _*)).as("pos")).distinct()
      .withColumn("present", lit(1))
    val histKeys = sig.filter(col("is_existing"))
      .select(col("ch")).distinct().withColumn("known", lit(1))
    val batchPos = sig.filter(!col("is_existing"))
      .select(col("doc_id"), col("ch"),
        posexplode(array(posCols: _*)).as(Seq("t", "pos")))
    batchPos
      .join(broadcast(bloom), Seq("pos"), "left")
      .groupBy("doc_id", "ch")
      .agg((count(col("present")) === k).as("bloom_hit"))
      // ground-truth column for the gate; production probes it hits-only
      .join(histKeys, Seq("ch"), "left")
      .select(col("doc_id"), col("bloom_hit"),
        col("known").isNotNull.as("exact_dup"))
      .orderBy("doc_id")
  }

  /** The historical Bloom position set for `bloomProbeAny` — the tiny
    * (≤ mBits rows) table a production ingest persists and unions each
    * day's new keys into. The artifact CARRIES its own (m_bits, k)
    * parameters as constant columns: a probe configured with different
    * parameters than the build would silently yield false negatives —
    * "certainly new" verdicts on true duplicates, the one failure a Bloom
    * prefilter must never produce — so the probe reads the parameters
    * from the artifact instead of trusting its caller. mBits = 0 derives
    * the size from the key count (`autoMBits`), the production sizing. */
  def bloomPositions(docs: DataFrame, mBits: Int = 4096, k: Int = 3): DataFrame = {
    val m = if (mBits > 0) mBits else autoMBits(docs.count())
    docs.select(md5(col("text").cast("binary")).as("ch"))
      .select(explode(array((0 until k).map(t =>
        conv(substring(col("ch"), t * 8 + 1, 8), 16, 10).cast("long") % m): _*)).as("pos"))
      .distinct()
      .withColumn("m_bits", lit(m)).withColumn("k", lit(k))
  }

  /** STREAM-SAFE Bloom membership probe — the ingest-time form of x73:
    * the static position set collapses to ONE array row that attaches via
    * a 1-row stream-static broadcast join (append-mode legal, no state),
    * and the probe is a codegen'd `forall`/`array_contains` over the k
    * positions — a stateless row transform, so the SAME call runs on a
    * batch frame or a readStream; StreamingSpec asserts stream == batch.
    * Rows gain `bloom_hit`: false = certainly new (skip the expensive
    * exact-membership lookup entirely), true = candidate for it. */
  def bloomProbeAny(docs: DataFrame, positions: DataFrame,
      mBits: Int = 0, k: Int = 0): DataFrame = {
    // resolve (m, k) from the artifact itself when it carries them (every
    // `bloomPositions` build does) — a probe whose parameters disagree
    // with the build yields silent false negatives, so self-configuration
    // beats trusting the caller. The fetch reads the DISTINCT parameter
    // combinations (bounded: constant columns, ≤ a handful of rows even on
    // a malformed union) — never data. A positions table unioned from
    // builds with DIFFERENT autoMBits sizes is exactly the silent-false-
    // negative trap the self-configuration exists to prevent, so mixed
    // parameters are a hard failure, not an arbitrary-row pick.
    // Explicitly-passed parameters must agree.
    val (m, kk) =
      if (positions.columns.contains("m_bits")) {
        // bounded validation scan: the positions artifact is the DISTINCT
        // bit-position set, ≤ m_bits rows by construction (not corpus-
        // sized), so the distinct here reads at most a few thousand rows
        val r = positions.select("m_bits", "k").distinct().collect()
        require(r.nonEmpty, "empty Bloom positions artifact")
        require(r.length == 1,
          s"mixed Bloom parameters in positions artifact: ${r.map(x => (x.getInt(0), x.getInt(1))).mkString(", ")} — rebuild the union with one (m_bits, k)")
        val (am, ak) = (r(0).getInt(0), r(0).getInt(1))
        require(mBits == 0 || mBits == am,
          s"probe mBits=$mBits disagrees with the positions artifact's m_bits=$am")
        require(k == 0 || k == ak,
          s"probe k=$k disagrees with the positions artifact's k=$ak")
        (am, ak)
      } else {
        require(mBits > 0 && k > 0,
          "positions artifact carries no (m_bits, k) — pass them explicitly")
        (mBits, k)
      }
    val posArr = broadcast(
      positions.agg(collect_set(col("pos")).as("bloom_ps")).withColumn("kj", lit(1)))
    val ch = md5(col("text").cast("binary"))
    docs
      .withColumn("ps", array((0 until kk).map(t =>
        conv(substring(ch, t * 8 + 1, 8), 16, 10).cast("long") % m): _*))
      .withColumn("kj", lit(1))
      .join(posArr, Seq("kj"))
      .withColumn("bloom_hit", forall(col("ps"), p => array_contains(col("bloom_ps"), p)))
      .drop("ps", "bloom_ps", "kj")
  }

  /** x39: span-level (paragraph-level) exact dedup with document
    * reassembly — the C4/Dolma curation step that removes REPEATED SPANS
    * across the whole corpus, not just duplicate documents: split each doc
    * into fixed `spanTokens`-token spans (the corpus has no natural
    * paragraph breaks; a real corpus would split on "\n\n" instead — same
    * plan), keep only the globally FIRST occurrence of each distinct span
    * (min (doc_id, span_idx), deterministic), and rebuild every document
    * from its surviving spans in original order. Documents whose spans all
    * appeared earlier elsewhere vanish entirely, like boilerplate pages.
    *
    * Scale: two shuffles, both on short keys — the first-occurrence window
    * partitions by the 60-bit span hash (groups are duplicate-count-sized,
    * never skewed beyond boilerplate frequency), the reassembly aggregates
    * by doc_id with map-side partial collect. Span text rides the shuffle
    * only to be re-emitted in the rebuilt doc; a hash-only variant would
    * re-join against the corpus instead (more traffic, not less, at
    * typical span lengths). */
  def spanDedup(spark: SparkSession, dir: String, spanTokens: Int = 4): DataFrame =
    spanDedupDocs(docsWide(spark, dir), spanTokens)

  /** Core of x39 over an arbitrary (doc_id, text) frame — split out so
    * specs can run it on planted fixtures. */
  def spanDedupDocs(docs: DataFrame, spanTokens: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ts = split(col("text"), " ")
    val nSpans = (floor((size(ts) - 1).cast("double") / spanTokens) + 1).cast("int")
    val spans = docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nSpans - 1),
          i => concat_ws(" ", slice(ts, i * spanTokens + 1, lit(spanTokens))))))
      .withColumnRenamed("pos", "span_idx")
      .withColumnRenamed("col", "span")
    // integer composite (doc_id, span_idx) key: exact first-occurrence
    // ordering that hashes identically in the DuckDB oracle (span_idx is
    // bounded by the longest doc / spanTokens, far under 1e6)
    val key = col("doc_id") * 1000000L + col("span_idx")
    val firstKey = min(key).over(
      Window.partitionBy(conv(substring(md5(col("span").cast("binary")), 1, 15), 16, 10).cast("long")))
    spans
      .withColumn("keep", key === firstKey)
      .filter(col("keep"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_spans_kept"),
        array_join(transform(array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s("span")), " ").as("dedup_text"))
      .orderBy("doc_id")
  }

  /** Exact token-3-gram Jaccard for given candidate pairs (id_a, id_b):
    * |A∩B| / |A∪B| via array_intersect/array_union on distinct shingles.
    *
    * The shingle-array side is SEMI-JOIN PRUNED to the candidate ids
    * before the arrays are built (x110's rescore pattern): candidates are
    * ≪ corpus, so the rescore joins shuffle a candidate-sized set of
    * (KB-wide) shingle arrays instead of a corpus-sized one — the
    * difference between a linear and a corpus-dominated rescore at 10×
    * (measured: the unpruned form shuffled 600k array rows for 2.5k
    * pairs at the rehearsal's 10× point). */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame): DataFrame = {
    // barrier: the candidate plan (a whole banding pipeline for x15-family
    // callers) feeds the id prune AND the final join — run it once
    val p = pairs.localCheckpoint(eager = false)
    val ids = p.select(col("id_a").as("doc_id"))
      .unionByName(p.select(col("id_b").as("doc_id"))).distinct()
    // shingling is the same CPU-bound per-row shape as the signatures:
    // spread a narrow caller frame across cores (no-op when already wide)
    val sh = Tables.widen(docs.join(ids, Seq("doc_id"), "left_semi"))
      .select(col("doc_id"), array_distinct(shingles(tokensCol)).as("sh"))
    p
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("id_a", "id_b", "jaccard")
  }

  /** x69: cross-source content-overlap matrix — for every source pair,
    * how many distinct 3-shingles appear in BOTH (plus each side's
    * distinct total, so the reader can judge the rate). The source-level
    * view of what x66 reports corpus-wide: "is src3 mostly a re-crawl of
    * src1?" drives source-level keep/drop decisions before any per-doc
    * work. Shingle-level (not whole-doc hashes) because re-crawls and
    * mirrors rarely share byte-identical documents — they share content.
    *
    * Scale shape: the corpus collapses map-side to DISTINCT (source,
    * shingle-md5) — short fixed-width keys, one hash-agg, text never
    * shuffles; the overlap is a self equi-join on the hash (never
    * all-pairs: a shingle shared by s sources fans out to s(s-1)/2 pairs,
    * bounded by the source count squared, not the corpus). The per-source
    * totals are a #sources-row frame, broadcast back onto the pair rows. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlapOf(docsWide(spark, dir))

  /** The overlap construction over an arbitrary (source, text) frame. */
  def sourceOverlapOf(docs: DataFrame): DataFrame = {
    // lazy barrier: the distinct (source, hash) set feeds the self-join
    // twice AND the per-source totals — without it the scan+shingle+hash
    // pipeline runs 3×
    val sh = docs
      .select(col("source"), explode(shingles(tokensCol)).as("sgl"))
      .select(col("source"), md5(col("sgl").cast("binary")).as("h"))
      .distinct()
      .localCheckpoint(eager = false)
    val perSource = sh.groupBy("source").agg(count(lit(1)).as("n_distinct"))
    sh.select(col("source").as("source_a"), col("h"))
      .join(sh.select(col("source").as("source_b"), col("h")), Seq("h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(perSource.select(col("source").as("source_a"), col("n_distinct").as("n_a"))), Seq("source_a"))
      .join(broadcast(perSource.select(col("source").as("source_b"), col("n_distinct").as("n_b"))), Seq("source_b"))
      .select("source_a", "source_b", "n_shared", "n_a", "n_b")
      .orderBy("source_a", "source_b")
  }

  /** x89: SPLIT-LEAKAGE AUDIT — the report that closes the x75 loop: after
    * assigning a train/val/test split, MEASURE the cross-split shingle
    * overlap (x69's matrix keyed on split instead of source). This is the
    * number a training-data pipeline actually ships with its split: how
    * many distinct 3-shingles the held-out sets share with train — the
    * contamination the cluster-coherent coin exists to minimize. The spec
    * proves the point end-to-end: the same audit over a naive per-doc
    * hash split (x18) shows strictly MORE cross-split sharing on the
    * planted-near-dup corpus.
    *
    * Scale: the split join is doc_id-keyed; the distinct (split, shingle)
    * set is ≤ 3× the corpus shingle space and the pairwise join output is
    * 3 rows — the same bucketed shape as x69, measured linear there. */
  def splitLeakageAudit(spark: SparkSession, dir: String): DataFrame =
    splitLeakageAuditOf(
      docsWide(spark, dir).select("doc_id", "text")
        .join(leakSafeSplit(spark, dir).select("doc_id", "split"), "doc_id"))

  /** The audit construction over an arbitrary (doc_id, text, split) frame. */
  def splitLeakageAuditOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("split"), explode(shingles(tokensCol)).as("sgl"))
      .select(col("split"), md5(col("sgl").cast("binary")).as("h"))
      .distinct()
      .localCheckpoint(eager = false)
    val perSplit = sh.groupBy("split").agg(count(lit(1)).as("n_distinct"))
    sh.select(col("split").as("split_a"), col("h"))
      .join(sh.select(col("split").as("split_b"), col("h")), Seq("h"))
      .filter(col("split_a") < col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(perSplit.select(col("split").as("split_a"), col("n_distinct").as("n_a"))), Seq("split_a"))
      .join(broadcast(perSplit.select(col("split").as("split_b"), col("n_distinct").as("n_b"))), Seq("split_b"))
      .select("split_a", "split_b", "n_shared", "n_a", "n_b")
      .orderBy("split_a", "split_b")
  }

  /** x95: SOURCE OVERLAP MATRIX — pairwise content overlap between crawl
    * sources (distinct-shingle Jaccard per source pair), the
    * redundancy-diagnosis artifact mixture design reads BEFORE setting
    * weights: two sources that are 40% the same material should not both
    * get full temperature-scaled weight (x32), and a high-overlap pair is
    * the first place cross-source near-dup dedup (x17) pays off. x89 is
    * this shape keyed on SPLIT (a leakage audit); here the key is the
    * provenance the mixture is designed over.
    *
    * Scale: the join key is the distinct (shingle, source) table — the
    * corpus text never shuffles. The pair expansion per shingle is
    * bounded by #sources² (sources are tens, not millions, at any corpus
    * size), and aggregation collapses it map-side. At lake scale the
    * distinct-shingle sides swap for per-source HLL sketches union'd
    * pairwise (the a21 idiom) — this gate pins the exact semantics.
    * Jaccard = shared / (|A| + |B| − shared) in exact longs, one IEEE
    * division at the end. */
  def sourceOverlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val sh = docsWide(spark, dir)
      .select(col("source"), explode(shingles(split(col("text"), " "))).as("sh"))
      .distinct()
      .localCheckpoint(eager = false)
    val perSource = sh.groupBy("source").agg(count(lit(1)).as("n_distinct"))
    sh.select(col("source").as("source_a"), col("sh"))
      .join(sh.select(col("source").as("source_b"), col("sh")), Seq("sh"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(perSource.select(col("source").as("source_a"),
        col("n_distinct").as("n_a"))), Seq("source_a"))
      .join(broadcast(perSource.select(col("source").as("source_b"),
        col("n_distinct").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        (col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** x104: JACCARD THRESHOLD SWEEP — the dedup-threshold tuning table: for
    * each candidate threshold ≥ the band recall floor (0.5, the x15
    * construction's guarantee), how many verified pairs survive and how
    * many documents they touch. This is the table a curation owner reads
    * before picking the x17 clustering threshold: too low merges topical
    * siblings, too high leaves re-crawls in — the doc-count column shows
    * the blast radius of each choice.
    *
    * Scale: ONE pass over the (already bucketed-and-rescored) x15 pair
    * set — a Generator fans each pair over the 5 thresholds and two hash
    * aggregates collapse it; the corpus itself is never rescanned. All
    * counts exact longs. */
  def thresholdSweep(spark: SparkSession, dir: String,
      thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)): DataFrame = {
    // parquet-backed artifact, no checkpoint barrier needed
    val pairs = pairArtifact(spark, dir)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val fanned = pairs
      .select(col("id_a"), col("id_b"), col("jaccard"),
        explode(array(thresholds.map(t => lit(t)): _*)).as("threshold"))
      .filter(col("jaccard") >= col("threshold"))
    val nPairs = fanned.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
    val nDocs = fanned
      .select(col("threshold"), explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
      .groupBy("threshold").agg(count(lit(1)).as("n_docs_involved"))
    // every requested threshold gets a row, zeros included — a threshold
    // that kills ALL pairs is exactly the data point the tuner wants
    spark.range(1)
      .select(explode(array(thresholds.map(t => lit(t)): _*)).as("threshold"))
      .join(nPairs, Seq("threshold"), "left")
      .join(nDocs, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_involved"), lit(0L)).as("n_docs_involved"))
      .orderBy("threshold")
  }

  /** x100: DEDUP SURVIVORSHIP REPORT — the per-source bias audit published
    * alongside a deduped corpus: near-dup dedup (keeper = cluster min
    * doc_id, x30's contract) does NOT remove uniformly — a source that is
    * largely re-crawled material loses far more than an original-content
    * source, silently shifting the trained mixture away from the weights
    * x32 chose. This reports, per source, the doc and token mass before
    * and after dedup, so the mixture step can re-weigh on POST-dedup
    * counts (the x92 budgeter's correct input).
    *
    * Scale: reads the materialized cluster-label artifact (built once per
    * corpus, shared by 8 consumers); both aggregates are per-source
    * hash-aggs over exact longs. Ratios are single long/long IEEE
    * divisions. The losers join is UNHINTED (r16): dedup losers are a
    * corpus FRACTION (30–50% of a web crawl), not a dim — a broadcast
    * hint would demand an O(corpus) build at 100 TB, while unhinted
    * planning broadcasts from the artifact's measured size at gate scale
    * and degrades to a shuffle join past the threshold. */
  def dedupSurvivorship(spark: SparkSession, dir: String): DataFrame = {
    val losers = clusterLabels(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(1L).as("is_loser"))
    docsWide(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(losers, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_loser").isNull, 1L).otherwise(0L)).as("n_survivors"),
        sum("n_tokens").as("tokens_before"),
        sum(when(col("is_loser").isNull, col("n_tokens")).otherwise(0L))
          .as("tokens_after"))
      .select(col("source"), col("n_docs"), col("n_survivors"),
        (col("n_survivors").cast("double") / col("n_docs")).as("doc_survival"),
        col("tokens_before"), col("tokens_after"),
        (col("tokens_after").cast("double") / col("tokens_before")).as("token_retention"))
      .orderBy("source")
  }

  /** x107: CLUSTER-SIZE PROFILE — the dedup report's headline histogram:
    * how many near-dup components exist at each size, and how many
    * documents they hold. Size 1 = docs in no verified pair (the healthy
    * bulk); a fat tail of large components means template farms / mirror
    * sets and predicts the dedup's doc-count impact (n_docs − n_clusters
    * summed over sizes ≥ 2 is exactly the x30 removal count).
    *
    * Scale: reads the materialized CC-label artifact; two short hash-aggs
    * (labels→sizes→histogram, both keyed by longs); singletons come from
    * one anti-join against the label table collapsed map-side to a single
    * row. The anti-join is UNHINTED (r16): the label table covers every
    * doc in ≥1 verified pair — a corpus FRACTION at 100 TB, the same
    * hazard class as x41's broadcast(vocab); unhinted planning broadcasts
    * from the artifact's measured size at gate scale and degrades to a
    * shuffle anti-join past the threshold. */
  def clusterSizeProfile(spark: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(spark, dir)
    val hist = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    val singles = Tables.documents(spark, dir).select("doc_id")
      .join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_clusters"))
      .select(lit(1L).as("cluster_size"), col("n_clusters"))
    hist.unionByName(singles)
      .filter(col("n_clusters") > 0)
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy("cluster_size")
  }

  /** x133: duplicate-count SOFT WEIGHTING — the alternative to hard
    * dedup several training pipelines prefer: keep every document, but
    * weight each near-dup cluster member by 1/cluster_size, so one unit
    * of distinct content contributes one unit of training mass whether
    * it was crawled once or fifty times. Hard dedup (x30) is the
    * cluster_size→∞ limit; soft weighting preserves benign repetition
    * signal (templates, canonical texts) that survivorship would erase.
    *
    * weight_ppm = 10⁶ // cluster_size — integer-exact, never a float
    * share. Scale: rides the materialized CC labels (the x107 contract);
    * sizes is one count per cluster label and both joins are doc_id /
    * cluster_id equi-joins — no new shuffle family. */
  def dupWeighting(spark: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(spark, dir)
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    Tables.documents(spark, dir).select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .join(sizes, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        floor(lit(1000000L) / coalesce(col("cluster_size"), lit(1L)))
          .cast("long").as("weight_ppm"))
      .orderBy("doc_id")
  }

  /** x134: N-GRAM NOVELTY — per document, the share of its distinct
    * 3-shingles whose global FIRST occurrence (min doc_id — in a lake,
    * ingestion order) is this document. High-novelty docs introduce new
    * content; near-zero novelty marks late near-copies and template
    * assemblies even when no single pair crosses the dedup threshold —
    * the curriculum/memorization signal between x28 (within-doc
    * repetition) and x15 (cross-doc pairs).
    *
    * Scale: the shuffle carries distinct (shingle, doc) pairs exactly
    * like x93's boilerplate family; first-occurrence is a shingle-
    * partitioned window min, so ONE shingle-keyed exchange serves the
    * whole global step (a groupBy+re-join would shuffle the pair set on
    * the same key twice), then one doc-keyed aggregate. novelty_ppm is
    * an integer floor. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ds = Tables.documents(spark, dir).select(col("doc_id"),
      explode(array_distinct(shingles(split(col("text"), " ")))).as("s"))
    ds.withColumn("first_doc",
        min("doc_id").over(Window.partitionBy("s")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ppm",
        floor(col("n_novel") * lit(1000000L) / col("n_shingles")).cast("long"))
      .orderBy("doc_id")
  }

  /** x136: CLUSTER COHERENCE AUDIT — the chain-collapse detector for
    * transitive dedup: connected components glue A~B~C into one cluster
    * even when A and C share nothing, so a dedup owner needs, per
    * cluster, how tight the VERIFIED pair evidence actually is — pair
    * count vs the all-pairs possible (coverage), the weakest verified
    * link (min), and the mean similarity. Low coverage + a weak min link
    * marks a chained cluster whose survivorship (x30/x61) may be erasing
    * non-duplicates; x107 profiles SIZES, this profiles EVIDENCE.
    *
    * Exactness: the mean is the x121 micro-quantization pattern — each
    * jaccard floors to an exact micro-long, the sum is exact, ONE IEEE
    * division at the end; min of doubles is order-free. Scale: both
    * inputs are materialized artifacts (pairs, labels); the joins key on
    * long ids, the aggregate on cluster labels. */
  def clusterCoherence(spark: SparkSession, dir: String): DataFrame =
    clusterCoherenceOf(clusterLabels(spark, dir), pairArtifact(spark, dir))

  /** Library form over arbitrary (doc_id, cluster_id) labels and
    * (id_a, id_b, jaccard) verified pairs. */
  def clusterCoherenceOf(labels: DataFrame, pairs: DataFrame): DataFrame = {
    val byPair = pairs
      .join(labels.select(col("doc_id").as("id_a"), col("cluster_id").as("ca")), Seq("id_a"))
      .join(labels.select(col("doc_id").as("id_b"), col("cluster_id").as("cb")), Seq("id_b"))
      // CC labels make equal endpoints structural; the filter documents it
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("cluster_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min("jaccard").as("min_jaccard"),
        sum(floor(col("jaccard") * 1e6).cast("long")).as("jq_sum"))
    labels.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      .join(byPair, Seq("cluster_id"))
      .select(col("cluster_id"), col("n_members"), col("n_pairs"), col("min_jaccard"),
        (col("jq_sum").cast("double") / col("n_pairs")).as("mean_jaccard_micro"),
        expr("n_pairs * 1000000 div (n_members * (n_members - 1) div 2)")
          .as("coverage_ppm"))
      .orderBy("cluster_id")
  }

  /** x137: COHERENCE-GUARDED dedup apply — the x136 measure folded back
    * into the act (the third measure→act loop after x110→x15b banding and
    * x130→w6b salting): survivorship trusts a cluster's transitive glue
    * only when the pair EVIDENCE is strong — coverage ≥ `minCoveragePpm`
    * and weakest link ≥ `minLink`. Members of a chained cluster are kept
    * wholesale (`kept_guarded`) instead of being erased by a keeper they
    * were never directly compared to; healthy clusters keep x30's
    * min-id keeper and drop the rest. Statuses make the decision visible
    * and hashable per doc. Scale: both inputs are the materialized
    * artifacts; the flag table is cluster-count-sized. */
  def dedupApplyGuarded(spark: SparkSession, dir: String,
      minCoveragePpm: Long = 600000L, minLink: Double = 0.6): DataFrame =
    dedupApplyGuardedOf(Tables.documents(spark, dir).select("doc_id"),
      clusterLabels(spark, dir), clusterCoherence(spark, dir),
      minCoveragePpm, minLink)

  /** Library form over arbitrary doc ids, labels and a coherence table
    * (the planted-chain spec exercises the `kept_guarded` branch here —
    * the oracle fixture's clusters are all tight pairs/triangles, so at
    * principled thresholds the guard correctly never fires on it). */
  def dedupApplyGuardedOf(docIds: DataFrame, labels: DataFrame,
      coherence: DataFrame, minCoveragePpm: Long, minLink: Double): DataFrame = {
    val flags = coherence
      .select(col("cluster_id"),
        (col("coverage_ppm") < minCoveragePpm ||
          col("min_jaccard") < minLink).as("chained"))
    docIds
      .join(labels, Seq("doc_id"), "left")
      .join(flags, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        when(col("cluster_id").isNull, "singleton")
          .when(col("chained"), "kept_guarded")
          .when(col("doc_id") === col("cluster_id"), "keeper")
          .otherwise("dropped").as("status"))
      .orderBy("doc_id")
  }

  /** x108: CROSS-SOURCE DUPLICATION MATRIX — which source pairs share
    * verified near-duplicates, with pair volume and mean similarity.
    * The x95 shingle-overlap matrix estimates vocabulary sharing; this is
    * the verified-pair ground truth at the document level — the table
    * that tells a curation owner "crawl B is largely a mirror of crawl A,
    * drop one" (off-diagonal mass) vs "each source re-posts internally"
    * (diagonal mass). Pair orientation is normalized source-lexically so
    * (A,B) and (B,A) accumulate together.
    *
    * Scale: the pair artifact is tiny relative to the corpus (verified
    * near-dups only); the two source lookups are equi-joins on long doc
    * ids. Mean similarity sums exact micro-quantized longs (order-free),
    * one division at the end. */
  def crossSourceDup(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    pairArtifact(spark, dir)
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), Seq("id_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        floor(col("jaccard") * 1000000.0).cast("long").as("j_micro"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        (sum("j_micro").cast("double") / count(lit(1))).as("mean_jaccard_micro"))
      .orderBy("source_a", "source_b")
  }

  /** x121: NORMALIZATION ROBUSTNESS — does text cleaning CHANGE the
    * dedup verdicts? Every verified near-dup pair is rescored with exact
    * 3-gram Jaccard over the CLEANED token stream (x34's normalization:
    * lowercase, punctuation stripped, stopwords and short tokens
    * dropped), and the table reports, per raw-Jaccard decile, how many
    * pairs still clear the 0.5 dedup threshold and the mean cleaned
    * similarity. A dedup owner reads this before reordering the
    * pipeline (clean-then-dedup vs dedup-then-clean): a bucket whose
    * still-dup rate collapses means the raw pairs were held together by
    * punctuation/boilerplate tokens the cleaner removes — those are the
    * verdicts that flip if the pipeline order changes.
    *
    * Scale: pairs come from the persisted x15 artifact (never
    * recomputed); the corpus is semi-join-pruned to the paired ids
    * BEFORE cleaning and shingling (x110's pattern), so the rescore
    * touches only paired documents; mean similarity sums micro-quantized
    * exact longs. The semi-join is UNHINTED (r16): paired ids are a
    * corpus FRACTION — a hint would demand an O(dup-docs) broadcast at
    * 100 TB; unhinted planning broadcasts from measured sizes at gate
    * scale and degrades to a shuffle semi-join past the threshold. */
  def normalizationRobustness(spark: SparkSession, dir: String): DataFrame = {
    val pairs = pairArtifact(spark, dir)
    val ids = pairs.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val cleaned = Tables.documents(spark, dir)
      .join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        array_join(Curation.cleanedTokens(col("text")), " ").as("text"))
    val re = ngramJaccard(cleaned, pairs.select("id_a", "id_b"))
    pairs.select(col("id_a"), col("id_b"), col("jaccard").as("j_raw"))
      .join(re.select(col("id_a"), col("id_b"), col("jaccard").as("j_clean")),
        Seq("id_a", "id_b"))
      .select(floor(col("j_raw") * 10.0).cast("long").as("raw_bucket"), col("j_clean"))
      .groupBy("raw_bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("j_clean") >= 0.5, 1L).otherwise(0L)).as("n_still_dup"),
        sum(floor(col("j_clean") * 1000000.0).cast("long")).as("sum_jclean_micro"))
      .withColumn("mean_jclean", col("sum_jclean_micro").cast("double") /
        (col("n_pairs") * lit(1000000L)).cast("double"))
      .orderBy("raw_bucket")
  }

  /** x110: BAND RECALL AUDIT — measure, don't guess: the minhash banding
    * scheme's EMPIRICAL recall, per Jaccard decile, against an
    * INDEPENDENT candidate generator. The simhash chunk-blocking witness
    * (x4c's construction) surfaces a sample of true near-dup pairs by a
    * mechanism the bands know nothing about; each is rescored with exact
    * 3-gram Jaccard, and the audit reports how many the band stage also
    * surfaced. Theory says two-row bands find a j-similar pair w.p.
    * 1−(1−j²)⁴; this table is that curve measured on the corpus — the
    * number a dedup owner checks before trusting x15's pair set at the
    * next 10× crawl.
    *
    * Membership joins against the VERIFIED pair artifact: for a truth
    * pair (jaccard ≥ 0.5 by construction of this audit), being a band
    * candidate is equivalent to being in the verified set, so the audit
    * rides the persisted table instead of re-running the band pipeline.
    *
    * Scale: the simhash sample is the hard-capped witness (16-bit space;
    * the production-width x4d/x4e paths are the scale form); the rescore
    * touches only sampled pairs; the membership join keys on long id
    * pairs. Recall is one long/long IEEE division per bucket. */
  def bandRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    // the witness sample is itself refresh-persistable (same contract as
    // pairArtifact); docs are semi-join-pruned to the sampled pair ids
    // before shingling — the rescore touches only sampled documents.
    // UNHINTED semi-join (r16): witness ids are a corpus fraction — let
    // the planner broadcast from measured sizes, never demand it
    val sim = graft.Tables.materializeOnce(spark, s"x4c_pairs:$dir")(
      simhashPairsMd5(spark, dir)).select("id_a", "id_b")
    val ids = sim.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val docs = Tables.documents(spark, dir).join(ids, Seq("doc_id"), "left_semi")
    val truth = ngramJaccard(docs, sim).filter(col("jaccard") >= 0.5)
    val band = pairArtifact(spark, dir)
      .select(col("id_a"), col("id_b"), lit(1L).as("in_band"))
    truth.join(band, Seq("id_a", "id_b"), "left")
      .select(floor(col("jaccard") * 10.0).cast("long").as("j_bucket"),
        coalesce(col("in_band"), lit(0L)).as("f"))
      .groupBy("j_bucket")
      .agg(count(lit(1)).as("n_true_pairs"), sum("f").as("n_found"),
        (count(lit(1)) - sum("f")).as("n_missed"),
        (sum("f").cast("double") / count(lit(1))).as("recall"))
      .orderBy("j_bucket")
  }
}

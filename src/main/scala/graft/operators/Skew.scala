package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins — the 100 TB story for keys like
  * PULocationID where a handful of values (airports, midtown) dominate.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) covers sort-merge joins at runtime; explicit salting is the
  * deterministic plan-level tool for hash-partitioned aggregations and
  * joins where one side is replicable.
  */
object Skew {

  /** Inner equi-join with an N-way salted key: the large side gets a
    * deterministic salt derived from `saltBy` (any column that spreads the
    * hot key's rows, e.g. a row id); the small side is replicated N× so
    * every salted partition finds its match. Row-level semantics identical
    * to the unsalted inner join; the hot key's rows now spread over N
    * partitions instead of one straggler. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, saltBy: Column,
      numSalts: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", pmod(xxhash64(saltBy), lit(numSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** x130: KEY-SKEW PROFILE — the top-k heaviest join/group keys of a
    * frame with each key's corpus share and load factor vs a perfectly
    * uniform key distribution (the x128 load_x100 convention). This is
    * the DIAGNOSIS table the two mitigations above act on: a planner
    * reads it to decide whether a key needs `saltedJoin`'s explicit
    * spread (load ≫ 100), how many salts (≈ load_x100/100), or whether
    * AQE's runtime splitting suffices — closing the same measure→tune
    * loop x110 closes for banding (x110→x15b) at the shuffle layer.
    *
    * Scale shape: one hash aggregation on the key (map-side partial
    * combine collapses each partition to its distinct keys), a 1-row
    * global stat frame broadcast back onto it (sanctioned 1-row
    * crossJoin), and a TakeOrderedAndProject top-k — a bounded per-
    * partition heap, never a global sort. Shares are integer-ppm
    * floor-divs of exact longs; ties break on the key so the top-k cut
    * is deterministic in both engines. */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 20): DataFrame = {
    // internal names __-prefixed (the __salt convention) so a key column
    // named n/n_keys/total cannot alias-collide mid-plan; the OUTPUT
    // names are the table's contract, so a key colliding with them is a
    // caller error surfaced loudly. The internal names are rejected too:
    // a key literally named __n would duplicate-collide with the count
    // alias and surface as an opaque ambiguous-reference error instead.
    require(!Set("n", "share_ppm", "load_x100", "__n", "__n_keys", "__total")
      .contains(key),
      s"key column '$key' collides with a profile output/internal column")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
    val stats = counts.agg(count(lit(1)).as("__n_keys"), sum("__n").as("__total"))
    // decimal(38,0) intermediates: at 100 TB scale n×n_keys×100 can pass
    // Long.MaxValue (1e9-row key × 1e8 keys × 100 = 1e19) and a LONG
    // multiply would wrap silently negative — exactly where salting
    // matters most. `div` (IntegralDivide) on decimals is the EXACT
    // integral quotient (a decimal `/` would round at the result scale
    // before any cast could floor it), matching DuckDB's HUGEINT `//`.
    counts.crossJoin(broadcast(stats))
      .select(col(key), col("__n").as("n"),
        expr("CAST(__n AS DECIMAL(38,0)) * 1000000 div __total").as("share_ppm"),
        expr("CAST(__n AS DECIMAL(38,0)) * __n_keys * 100 div __total").as("load_x100"))
      .orderBy(col("n").desc, col(key))
      .limit(topK)
  }

  /** Derive the salt count FROM the measured profile (the x110→x15b
    * dispatch pattern, applied at the shuffle layer): the heaviest key's
    * load-vs-uniform, rounded up — a uniform frame (load 100) derives 1
    * salt (salting becomes a no-op), a key carrying 8× the uniform share
    * derives 8. The profile read is a driver-side single-row peek of an
    * aggregate (planner metadata, not a data path). */
  def autoSalts(df: DataFrame, key: String): Int = {
    // headOption: an empty frame has no profile rows; the plain join it
    // parameterizes returns empty for the same input, so degrade to the
    // no-op 1 salt rather than throw
    val top = keySkewProfile(df, key, topK = 1)
      .select("load_x100").limit(1).collect()
      .headOption.map(_.getLong(0)).getOrElse(100L)
    val derived = math.max(1, math.ceil(top / 100.0).toInt)
    // clamp at the shuffle-partition count: a hot key can spread over at
    // most one reducer per partition, so salts beyond that only replicate
    // the small side for nothing — and an EXTREME load (one key owning a
    // high-cardinality frame → load ~n_keys×100) would otherwise derive
    // millions of salts and explode() the small side into an OOM in
    // exactly the scenario this operator defends against
    val cap = math.max(1,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    math.min(derived, cap)
  }

  /** `saltedJoin` with the salt count derived from the large side's own
    * measured skew — the measure→act loop closed in one call. Row-level
    * semantics identical to the plain inner join (the w6 oracle). */
  def autoSaltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltBy: Column): DataFrame =
    saltedJoin(large, small, key, saltBy, autoSalts(large, key))

  /** Two-phase (salted partial → final) aggregation for skewed group keys:
    * groupBy(key, salt).agg(partials) then groupBy(key).agg(merge). For
    * algebraic aggregates Spark's own partial aggregation already does
    * this per-partition; explicit salting helps when the DISTRIBUTION of
    * one key overwhelms even the map-side combine (e.g. collect_list). */
  def saltedCount(df: DataFrame, key: String, saltBy: Column, numSalts: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(numSalts)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum("__partial").as("n"))
}

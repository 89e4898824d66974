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

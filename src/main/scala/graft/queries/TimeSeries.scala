package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling — pandas `resample('D').ffill()` re-expressed
  * Spark-first (the reference's dashboard charts daily series; pandas
  * fills calendar gaps implicitly when reindexing).
  *
  * Shape: aggregate to the daily grain FIRST (the only scan of the raw
  * data), then build each key's dense calendar by exploding
  * `sequence(min_d, max_d)` on the per-key span row — the grid is
  * generated from the AGGREGATE, so no cross join and nothing key×date
  * ever shuffles raw rows. Forward fill is `last(value, ignoreNulls)`
  * over an unbounded-preceding row frame per key.
  *
  * 100 TB: the raw scan reduces to (key × day) rows before anything else
  * happens; grid + fill run on that reduced table. The per-key window
  * sorts one key's days within a partition — days-per-key is bounded
  * (365/key/year), so no skew. */
object TimeSeries {

  /** x44: daily event counts for a sparse cohort (user_id % 97 == 0),
    * resampled to a dense per-type daily calendar with forward fill. */
  def resampleFfill(spark: SparkSession, dir: String): DataFrame = {
    // barrier: the daily aggregate feeds both the span grid and the fill
    // join — checkpointing it keeps the raw scan to exactly one pass
    val daily = Tables.events(spark, dir)
      .filter(col("user_id") % 97 === 0)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val grid = daily
      .groupBy("event_type")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("event_type", "d"), "left")
      .select(
        col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n_observed"),
        coalesce(last(col("n"), ignoreNulls = true).over(w), lit(0L)).as("n_filled"),
        when(col("n").isNull, 1).otherwise(0).as("was_gap"))
      .orderBy("event_type", "d")
  }

  /** x50: cumulative distinct users per day (the growth curve) — computed
    * the scale-right way: a running COUNT(DISTINCT) window is quadratic
    * state, but each user contributes exactly at their FIRST-SEEN date, so
    * distinct-to-date(d) = Σ new-users(d' ≤ d). Two map-side-combinable
    * aggregates collapse the events to day-grain rows; the only global
    * window frame runs on those (≤366 rows/year), the same pre-aggregate-
    * then-frame shape as a18. */
  def cumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    // first PURCHASE (conversion curve): the converting cohort spreads
    // across the timeline, unlike first-contact which saturates day 1
    val firstSeen = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("d"))
    val daily = firstSeen.groupBy("d").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum("new_users").over(w))
      .orderBy("d")
  }
}

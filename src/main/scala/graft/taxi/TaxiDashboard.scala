package graft.taxi

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference dashboard's KPI measures (`Dashboard/nyc taxi.png`,
  * BASELINE.md "Correctness targets"): median trip distance, average
  * commercial speed (mph → km/h), daily average revenue, and the
  * passenger-share donut by time period — re-expressed as Spark
  * aggregations over the transformed valid-trips table (the same input
  * Power BI imports).
  *
  * Scale notes: the KPI cards are single-pass whole-table aggregates
  * (`percentile` is the only sort-bearing one — for a 100 TB interactive
  * dashboard swap in `approx_percentile`, same call shape); the donut is a
  * low-cardinality hash aggregate plus a scalar total; dailyAvgRevenue
  * pre-aggregates per day before the scalar avg, so the second stage sees
  * one row per day.
  */
object TaxiDashboard {

  /** KPI cards: exact median(trip_distance) (dashboard "Median Trip
    * Distance 1.78"), avg speed ×1.609 ("Avg Commercial Speed", the
    * reference data is mph), and the trip count. */
  def kpiCards(valid: DataFrame): DataFrame =
    valid.agg(
      percentile(col("trip_distance"), lit(0.5)).as("median_trip_distance"),
      round(avg(col("avg_speed")) * 1.609, 2).as("avg_commercial_speed_kmh"),
      count(lit(1)).as("total_trips"))

  /** "Daily Avg Revenue": avg over per-day total_amount sums. */
  def dailyAvgRevenue(valid: DataFrame): DataFrame =
    valid.groupBy(to_date(col("tpep_pickup_datetime")).as("pickup_date"))
      .agg(sum("total_amount").as("s"))
      .agg(round(avg("s"), 2).as("daily_avg_revenue"))

  /** Donut: passenger share by time period (dashboard "Après-midi 37.08% /
    * Soir 34.51% / Matin 20.72% / Nuit 7.69%"). Input must carry
    * `time_period` (TaxiPipeline.addTimeFeatures). */
  def passengerDonut(valid: DataFrame): DataFrame =
    valid.groupBy("time_period")
      .agg(sum("passenger_count").as("passengers"))
      .withColumn("pct",
        round(col("passengers") * 100.0 / sum("passengers").over(Window.partitionBy()), 2))
      .orderBy(desc("passengers"), asc("time_period"))
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.5) — the dashboard/DAX query layer
  * plus the transform-stage quality report, phrased over harness tables.
  *
  * All are hash aggregations over low-cardinality keys → partial+final
  * `HashAggregateExec` with map-side combine; at 100 TB the shuffle carries
  * only one row per (partition, group). Double-valued aggregates are rounded
  * to 2 decimals so the DuckDB oracle hash-compares despite summation-order
  * ulps.
  */
object Aggs {

  /** Flagship: the reference's core transform+aggregate shape (TPC-H-Q1-ish
    * pricing summary; SURVEY.md §7 "minimum end-to-end slice"). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        // revenue terms are exactly-4dp decimals, so a 4dp round recovers
        // the true decimal sum identically in Spark and DuckDB regardless
        // of summation order; 2dp would sit ON the x.xx50 boundary ~1% of
        // the time and flip between engines.
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---- A2/D4: grouped value counts, desc-sorted (transform.py:71,135) ----
  def anomalyValueCounts(spark: SparkSession, dir: String): DataFrame =
    Etl.taggedLineitem(spark, dir)
      .filter(col("rejection_reason").isNotNull)
      .groupBy("rejection_reason").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("rejection_reason"))

  // ---- A5: trips per day (README.md:57-59, ALLEXCEPT analogue) ----
  def tripsPerDay(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("pickup_date"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pickup_date")

  // ---- A6: sum by category bar chart ("Total amount by payment type") ----
  def sumByCategory(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(round(sum("l_extendedprice"), 2).as("total_amount"))
      .orderBy("l_returnflag")

  // ---- A7: donut with %-of-total (window over unpartitioned frame) ----
  def shareOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(spark, dir)
      .withColumn("time_period", Funcs.timePeriod(hour(col("ts"))))
      .groupBy("time_period").agg(sum("value").as("s"))
    g.select(col("time_period"),
        round(col("s"), 2).as("total_value"),
        round(col("s") * 100 / sum("s").over(Window.partitionBy()), 2).as("pct"))
      .orderBy("time_period")
  }

  // ---- A8/F10: time-series revenue by year/quarter/month ----
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"),
        month(col("l_shipdate")).as("m"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy("y", "q", "m")

  // ---- A9: histogram / binned count ("Trip Distance Distribution") ----
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(floor(col("l_quantity") / 10).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bin")

  // ---- A10: median KPI ("Median Trip Distance") ----
  // exact median = full-sort shape; correct at oracle scale. At 100 TB use
  // medianApprox below (single-pass sketch, no sort).
  def medianKpi(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(round(median(col("l_quantity")), 2).as("median_qty"),
        round(median(col("l_extendedprice")), 2).as("median_price"))

  /** a10c: the documented 100 TB swap for A10, as an executable gate —
    * `percentile_approx` (KLL-style mergeable quantile sketch): one-pass
    * partial aggregate, O(sketch) shuffle bytes, no full sort anywhere in
    * the plan. Rows-only (sketch internals are engine-specific); AggsSpec
    * pins the estimates within tolerance of the exact medians. */
  def medianApprox(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        round(percentile_approx(col("l_quantity"), lit(0.5), lit(accuracy)), 2)
          .as("median_qty"),
        round(percentile_approx(col("l_extendedprice"), lit(0.5), lit(accuracy)), 2)
          .as("median_price"))

  /** a10d: DRIVER-VERIFIED tolerance gate for the A10 sketch swap — the
    * cross-engine check a10c (rows-only, sketch internals engine-specific)
    * cannot be: emit the EXACT medians (hash-matched against DuckDB's
    * median()) alongside a boolean per KPI asserting the sketch estimate
    * is within 1% relative of the exact value. DuckDB emits literal TRUE
    * for the booleans, so a sketch drifting past tolerance flips the
    * Spark side to false and FAILS the hash compare — the sketch quality
    * contract is checked by the driver, not just by AggsSpec. One pass
    * computes both (exact median + sketch in a single agg). */
  def medianApproxTol(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        round(median(col("l_quantity")), 2).as("median_qty"),
        round(median(col("l_extendedprice")), 2).as("median_price"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(accuracy)).as("__aq"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(accuracy)).as("__ap"),
        median(col("l_quantity")).as("__eq"),
        median(col("l_extendedprice")).as("__ep"))
      .select(col("median_qty"), col("median_price"),
        (abs(col("__aq") - col("__eq")) <= col("__eq") * 0.01).as("qty_within_tol"),
        (abs(col("__ap") - col("__ep")) <= col("__ep") * 0.01).as("price_within_tol"))

  /** Sketch-KPI gate: the 100 TB replacements for exact countDistinct
    * (`d6`) and exact percentile (`a10`/`a20`) — HyperLogLog++ and
    * KLL-style quantile sketches are MERGEABLE, so both run as one-pass
    * partial aggregates with O(sketch) shuffle bytes instead of a
    * per-group distinct shuffle / sort. Sketch internals differ across
    * engines, so this gate is rows-only; AggsSpec pins each estimate
    * within tolerance of its exact counterpart. */
  def sketchKpis(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_suppkey")).as("approx_suppliers"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_median_price"))
      .orderBy("l_returnflag")

  /** a21b: FULL-ORACLE tolerance witness for the a21 sketches (the a10d
    * pattern applied per group): emit the exact per-flag distinct counts
    * and median (hash-matched against DuckDB) alongside booleans asserting
    * each a21 sketch estimate is within tolerance of its exact
    * counterpart — HLL++ within 15% = 3× its default rsd (r14 ADVICE: the
    * rsd is a standard DEVIATION, not a bound — 1×rsd would legitimately
    * fail on a healthy sketch over a different dataset ~32% of the time;
    * 3σ holds for any fixture with ~99.7% headroom), the KLL-style
    * percentile within 1% of the exact median (percentile_approx's
    * accuracy=10000 guarantees ≤0.01% RANK error; 1% VALUE tolerance is
    * pinned to the tested fixtures' local density and documented as
    * such). DuckDB emits literal TRUE, so a drifting
    * sketch flips a boolean and hash-fails the gate: the sketch-quality
    * contract moves from spec-only to driver-verified. The exact
    * distincts/medians here are the WITNESS cost, paid in this audit gate
    * only — the production path (a21) stays one-pass mergeable. */
  def sketchKpisTol(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("exact_suppliers"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        round(median(col("l_extendedprice")), 2).as("median_price"),
        approx_count_distinct(col("l_suppkey")).as("__as"),
        approx_count_distinct(col("l_partkey")).as("__ap"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("__mp"),
        median(col("l_extendedprice")).as("__em"))
      .select(col("l_returnflag"), col("exact_suppliers"), col("exact_parts"),
        col("median_price"),
        (abs(col("__as") - col("exact_suppliers"))
          <= col("exact_suppliers") * 0.15).as("suppliers_within_tol"),
        (abs(col("__ap") - col("exact_parts"))
          <= col("exact_parts") * 0.15).as("parts_within_tol"),
        (abs(col("__mp") - col("__em")) <= col("__em") * 0.01).as("price_within_tol"))
      .orderBy("l_returnflag")

  /** Scale path for A10: percentile_approx sketch (mergeable, one pass). */
  def medianApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("median_qty_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("median_price_approx"))

  /** Dashboard query over the WAREHOUSE (join-once aggregate-many): revenue
    * by payment label from fact × dim_payment — the reference's BI queries
    * hit the star schema, not the raw trips. Dim broadcast; fact scan only. */
  def factDashboard(spark: SparkSession, dir: String): DataFrame = {
    val star = graft.warehouse.StarSchema
    // one-scan grouping-sets dim build (see StarSchema.dims) + lazy
    // localCheckpoint barriers (GC-released, no CacheManager pinning) on
    // the dims reused across the fact joins and the final lookup
    val (t, loc, pay0) = star.dims(spark, dir)
    val pay = pay0.localCheckpoint(eager = false)
    val fact = star.factTripsWith(spark, dir, t,
      loc.localCheckpoint(eager = false), pay)
    fact.join(broadcast(pay), Seq("payment_pk"))
      .groupBy("payment_type")
      .agg(round(sum("fare_amount"), 2).as("total_amount"), count(lit(1)).as("n_trips"))
      .orderBy("payment_type")
  }

  // ---- A11: avg of per-day sums ("Daily Avg Revenue") ----
  def dailyAvgRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("pickup_date"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("s"))
      .agg(round(avg("s"), 2).as("daily_avg_revenue"))

  // ---- A12: ratio-of-aggregates KPIs (utilization/tipping-rate analogues) ----
  def ratioKpis(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) / sum(col("l_quantity")), 2)
          .as("revenue_per_unit"),
        round(avg(col("l_discount")) * 100, 2).as("avg_discount_pct"),
        round(sum(when(col("l_returnflag") === "R", 1).otherwise(0)) * lit(100.0) / count(lit(1)), 2)
          .as("return_rate_pct"))

  // ---- A13: sum by location key (map visual) ----
  def sumByLocation(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("location_id"))
      .agg(round(sum("l_extendedprice"), 2).as("total_amount"))
      .orderBy("location_id")

  // ---- §2.7: window function attached per-row (DAX ALLEXCEPT analogue) ----
  def tripsPerDayWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(to_date(col("l_shipdate")))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        count(lit(1)).over(w).as("trips_same_day"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- cube: precomputes every dashboard slicer combination (the
  // reference's Power BI slicers re-aggregate interactively; a cube
  // materializes all 4 grouping sets in one pass) ----
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      // Exact grand-total sum via scaled integers: the true revenue term is
      // a 4dp decimal, so round(x*10000) sits within ~1e-7 of an integer —
      // never near a .5 boundary — and both engines recover the SAME long.
      // (A double→decimal(18,4) cast here is NOT portable: Spark rounds the
      // shortest decimal string of the double, DuckDB the exact binary
      // value, and ~1/10k rows land on a x.xxxx5 boundary and flip.)
      // Long summation is order-independent and exact; the final /10000.0
      // is one deterministic IEEE op.
      .cube(year(col("l_shipdate")).as("y"), col("l_returnflag"))
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("y"), asc_nulls_first("l_returnflag"))

  // ---- pivot: the Power BI matrix visual (rows × slicer columns) as a
  // one-pass pivoted aggregation. Explicit value list ⇒ single shuffle
  // (no values-discovery pre-pass) and a fixed output schema at any SF. ----
  def pivotQuantity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(year(col("l_shipdate")).as("y"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum("l_quantity"))
      .orderBy("y")

  // ---- window frame: cumulative revenue over time (running-total KPI
  // line). Two-level: per-day partial aggregation first (shuffle carries
  // one row per day), THEN the ordered frame over the tiny daily series —
  // never a global sort of the raw fact. Integer-valued doubles keep the
  // running sum exact in both engines regardless of accumulation order. ----
  def cumulativeQuantity(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum("l_quantity").as("s"))
    daily
      .withColumn("cum", sum("s").over(
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("d")
  }

  // ---- rollup: hierarchical subtotals (year ⊃ quarter ⊃ grand total) —
  // the drill-down axis of the dashboard's time slicer in one pass.
  // Same scaled-integer revenue trick as the cube (see cubeRevenue). ----
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"))
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("y"), asc_nulls_first("q"))

  // ---- exact per-group percentiles (the A10b construction, grouped):
  // interpolated quantiles per category. Exact percentile is a per-group
  // sort; at 100 TB swap in percentile_approx (mergeable sketch, one
  // pass) — see medianApprox. ----
  def groupQuartiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.25)).as("q1"),
        percentile(col("l_extendedprice"), lit(0.5)).as("q2"),
        percentile(col("l_extendedprice"), lit(0.75)).as("q3"))
      .orderBy("l_returnflag")

  // ---- A1/A3/A4/A14: one-pass quality report (transform.py:131-144) ----
  // Single aggregation over the tagged frame computes totals, anomaly rate,
  // and valid-branch means/sums in ONE scan — the reference needs two
  // DataFrames and four passes.
  def qualityReport(spark: SparkSession, dir: String): DataFrame = {
    val t = Etl.taggedLineitem(spark, dir)
    val isAnom = col("rejection_reason").isNotNull
    t.agg(
      count(lit(1)).as("total_processed"),
      sum(when(isAnom, 1).otherwise(0)).as("anomaly_count"),
      round(sum(when(isAnom, 1).otherwise(0)) * lit(100.0) / count(lit(1)), 2).as("anomaly_rate_pct"),
      round(avg(when(!isAnom, col("l_quantity"))), 2).as("avg_trip_duration"),
      round(avg(when(!isAnom, col("unit_price"))), 2).as("avg_speed"),
      round(sum(when(!isAnom, col("l_extendedprice"))), 2).as("total_fare_amount"))
  }
}

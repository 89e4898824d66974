package graft.warehouse

import graft.Tables
import graft.queries.Funcs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's star-schema warehouse load (`Scripts_ETL/load.py`),
  * re-expressed engine-side: dimensions are deduped and keyed INSIDE Spark
  * (row_number surrogate keys), which removes the reference's
  * insert-then-read-back round trip (`load.py:121-152`) entirely.
  *
  * Dims: dim_time (distinct shipdate + time features, load.py:19-26),
  * dim_location (PU ∪ DO ids, load.py:28-33 / 127-130), dim_payment
  * (distinct labels, load.py:35-40). Fact: 4-way inner join chain
  * (load.py:155-172) with inner-join row-loss preserved, NUMERIC(8,2)
  * casts at the sink contract (load.py:209-220) expressed as round().
  *
  * Scale: location/payment dims are tiny by domain (≤265 zones, a handful
  * of labels) → row_number surrogate keys over them are safe and broadcast
  * joins apply. dim_time is NOT bounded by domain — at the reference's
  * second-grain pickup timestamps it is ~O(fact rows) — so its key is
  * derived ARITHMETICALLY from the timestamp (`unix_micros`, unique per
  * distinct datetime by construction) instead of a global row_number
  * window that would serialize the whole dim through one task. The fact
  * build is one scan of lineitem with zero fact-side shuffles.
  */
object StarSchema {

  /** dim_time surrogate key: epoch micros of the timestamp — deterministic,
    * unique per distinct datetime, computed per-row with NO window (a
    * global row_number would single-task the dim, which dies at the
    * reference's real second grain). The cast lifts TIMESTAMP_NTZ parquet
    * columns to TIMESTAMP in the session zone (pinned UTC), so the value
    * equals DuckDB's naive `epoch_us(datetime)` bit-for-bit. */
  private[graft] def timeKey(datetime: org.apache.spark.sql.Column) =
    unix_micros(datetime.cast("timestamp"))

  def dimTime(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_shipdate").as("datetime")).distinct()
      .withColumn("hour", hour(col("datetime")))
      .withColumn("day_of_week", date_format(col("datetime"), "EEEE"))
      .withColumn("time_period", Funcs.timePeriod(col("hour")))
      .withColumn("time_pk", timeKey(col("datetime")))
      .select("time_pk", "datetime", "hour", "day_of_week", "time_period")

  /** Synthetic TLC-style zone lookup (reference `README.md:41` joins a
    * taxi-zone table; `load.py:31` defaults missing boroughs to
    * 'Inconnu'): deterministic (location_id, borough) rows with ids
    * ≡ 6 (mod 7) deliberately ABSENT so the left-join default path stays
    * exercised. Tiny (fits any broadcast threshold) at every scale —
    * NYC has 265 zones; this covers the harness id domain. */
  def zoneLookup(spark: SparkSession): DataFrame = {
    val boroughs = Seq("Manhattan", "Brooklyn", "Queens", "Bronx",
      "Staten Island", "EWR")
    spark.range(0, 200000)
      .filter(col("id") % 7 =!= 6)
      .select(col("id").as("location_id"),
        element_at(typedlit(boroughs), (col("id") % 7).cast("int") + 1).as("borough"))
  }

  /** Borough resolution shared by both dim builds: broadcast left join
    * against the zone lookup, unmatched ids → 'Inconnu' (load.py:31). */
  private def withBorough(ids: DataFrame): DataFrame =
    ids.join(broadcast(zoneLookup(ids.sparkSession)), Seq("location_id"), "left")
      .withColumn("borough", coalesce(col("borough"), lit("Inconnu")))

  def dimLocation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ids = li.select(col("l_partkey").as("location_id"))
      .unionByName(li.select(col("l_suppkey").as("location_id")))
      .distinct()
      .withColumn("location_pk", row_number().over(Window.orderBy("location_id")))
    withBorough(ids).select("location_pk", "location_id", "borough")
  }

  /** Payment dim from the label-encoded fact column; 'N' is deliberately
    * unmapped (label null) and the null never reaches the dim (the
    * reference's dim insert skips NaN the same way the fact join drops it). */
  def dimPayment(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(Funcs.labelMap(col("l_returnflag"), Seq("R" -> "Retour", "A" -> "Accepté"))
        .as("payment_type"))
      .filter(col("payment_type").isNotNull)
      .distinct()
      .withColumn("payment_pk", row_number().over(Window.orderBy("payment_type")))
      .select("payment_pk", "payment_type")

  /** The fact build: surrogate-key lookups via broadcast inner joins
    * (load.py:155-172), measures rounded to the NUMERIC(8,2) contract
    * (load.py:209-220), CHECK(>0) constraints as validation filters
    * (load.py:52-57), trip_id as a deterministic BIGSERIAL analogue. */
  def factTrips(spark: SparkSession, dir: String): DataFrame = {
    // all three dims from the ONE-SCAN grouping-sets path (`dims`): at
    // 100 TB the repeated fact scans are 3× the IO of the dim build.
    // dim_location gets its own lazy-localCheckpoint barrier: it is shared
    // between the PU/DO aliases — without the barrier each alias re-runs
    // the union+distinct+window (and the zone join would print as a 5th
    // BroadcastHashJoin inside the fact plan).
    val (t, loc, pay) = dims(spark, dir)
    factTripsWith(spark, dir, t, loc.localCheckpoint(eager = false), pay)
  }

  /** Scale path: all three dims from ONE scan of the fact table via
    * grouping sets, instead of three separate scans. At 100 TB the repeated
    * fact scans dominate the dim build (3× the IO); the Expand operator
    * multiplies rows 4× but partial aggregation collapses them to the
    * distinct values before the (tiny) shuffle. Values are identical to
    * dimTime/dimLocation/dimPayment — spec-asserted. The grouped result is
    * persisted: it is dim-sized (thousands of rows), never fact-sized.
    *
    * grouping_id bit i (MSB = first grouping column) is 1 where the column
    * is aggregated away, so with columns (shipdate, partkey, suppkey,
    * label): {shipdate}=0111=7, {partkey}=1011=11, {suppkey}=1101=13,
    * {label}=1110=14. */
  def dims(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val base = Tables.lineitem(spark, dir).select(
      col("l_shipdate"), col("l_partkey"), col("l_suppkey"),
      Funcs.labelMap(col("l_returnflag"), Seq("R" -> "Retour", "A" -> "Accepté"))
        .as("payment_label"))
    val g = base.groupingSets(
        Seq(Seq(col("l_shipdate")), Seq(col("l_partkey")), Seq(col("l_suppkey")),
          Seq(col("payment_label"))),
        col("l_shipdate"), col("l_partkey"), col("l_suppkey"), col("payment_label"))
      .agg(grouping_id().as("gid"))
      .localCheckpoint(eager = false) // barrier, GC-released (see factTrips)
    val t = g.filter(col("gid") === 7).select(col("l_shipdate").as("datetime"))
      .withColumn("hour", hour(col("datetime")))
      .withColumn("day_of_week", date_format(col("datetime"), "EEEE"))
      .withColumn("time_period", Funcs.timePeriod(col("hour")))
      .withColumn("time_pk", timeKey(col("datetime")))
      .select("time_pk", "datetime", "hour", "day_of_week", "time_period")
    val locIds = g.filter(col("gid") === 11).select(col("l_partkey").as("location_id"))
      .unionByName(g.filter(col("gid") === 13).select(col("l_suppkey").as("location_id")))
      .distinct()
      .withColumn("location_pk", row_number().over(Window.orderBy("location_id")))
    val loc = withBorough(locIds).select("location_pk", "location_id", "borough")
    val pay = g.filter(col("gid") === 14).select(col("payment_label").as("payment_type"))
      .filter(col("payment_type").isNotNull)
      .withColumn("payment_pk", row_number().over(Window.orderBy("payment_type")))
      .select("payment_pk", "payment_type")
    (t, loc, pay)
  }

  /** Fact build over PREBUILT dims — callers composing multiple
    * star-schema queries build each dim once and pass it in. */
  def factTripsWith(spark: SparkSession, dir: String, t: DataFrame, loc: DataFrame,
      p: DataFrame): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("payment_label",
        Funcs.labelMap(col("l_returnflag"), Seq("R" -> "Retour", "A" -> "Accepté")))
    val locPu = loc
      .select(col("location_id").as("pu_id"), col("location_pk").as("pickup_loc_pk"))
    val locDo = loc
      .select(col("location_id").as("do_id"), col("location_pk").as("dropoff_loc_pk"))

    li.join(broadcast(t), li("l_shipdate") === t("datetime"), "inner")
      .join(broadcast(locPu), li("l_partkey") === locPu("pu_id"), "inner")
      .join(broadcast(locDo), li("l_suppkey") === locDo("do_id"), "inner")
      .join(broadcast(p), li("payment_label") === p("payment_type"), "inner")
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0) // CHECK(>0)
      // BIGSERIAL analogue: a key-DERIVED id, not a global row_number — a
      // global window would single-partition-sort the whole fact, which
      // dies at 100 TB. Deriving from the natural key is deterministic AND
      // fully distributed (linenumber < 10 in TPC-H-shaped data).
      .withColumn("trip_id", (col("l_orderkey") * 10 + col("l_linenumber")).cast("long"))
      .select(col("trip_id"), col("time_pk"), col("pickup_loc_pk"), col("dropoff_loc_pk"),
        col("payment_pk"),
        col("l_quantity").cast("smallint").as("passenger_count"),
        // raw doubles, not round(): IEEE products/divisions are bit-equal
        // across engines, per-row round() is not (x.xx5 boundary).
        col("l_extendedprice").as("fare_amount"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_amount"),
        (col("l_extendedprice") / col("l_quantity")).as("avg_speed"))
  }

  def factTripsOrdered(spark: SparkSession, dir: String): DataFrame =
    factTrips(spark, dir).orderBy("trip_id")
}

package graft.queries

import graft.Tables
import graft.etl.Anomalies
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ShortType

/** The reference's extract/transform operators (SURVEY.md §2.1-§2.2),
  * phrased over the harness `lineitem`/`events` tables.
  *
  * Trip-analogue mapping (documented once, used everywhere):
  *   - a trip            = a lineitem row
  *   - pickup timestamp  = l_shipdate
  *   - trip_duration     = l_quantity          (minutes analogue)
  *   - fare_amount       = l_extendedprice
  *   - revenue (derived) = l_extendedprice * (1 - l_discount)
  *   - avg_speed         = unit_price = l_extendedprice / l_quantity, rounded
  *
  * Anomaly rules mirror the reference's five prioritized rules
  * (`Scripts_ETL/transform.py:47-53`), first-match-wins, with the same
  * French reason labels.
  */
object Etl {

  /** Derived metrics (reference `transform.py:35-40`): a duration-like and a
    * speed-like column. NOTE: deliberately UNROUNDED — raw IEEE arithmetic
    * is bit-identical between Spark and the DuckDB oracle, while round()
    * semantics differ on exact x.xx5 boundaries (which 2dp×2dp products hit
    * constantly). The reference's per-row round (`transform.py:40`) is
    * preserved in the taxi-domain pipeline (graft.taxi), where no
    * cross-engine hash compare applies. */
  def withMetrics(li: DataFrame): DataFrame =
    li.withColumn("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .withColumn("unit_price", col("l_extendedprice") / col("l_quantity"))

  /** Prioritized anomaly rules (reference `transform.py:47-53`, same order). */
  def rules: Seq[(String, Column)] = Seq(
    "Durée invalide"             -> (col("l_quantity") <= 2),
    "Distance hors limites"      -> !col("l_extendedprice").between(1000, 100000),
    "Montant de course invalide" -> (col("l_tax") <= 0.005),
    "Passagers invalides"        -> (col("l_discount") <= 0.005),
    "Vitesse irréaliste"         -> !col("unit_price").between(50, 5000)
  )

  def taggedLineitem(spark: SparkSession, dir: String): DataFrame =
    Anomalies.tagged(withMetrics(Tables.lineitem(spark, dir)), rules)

  // ---- S1/P1: scan + explicit column projection (extract.py:35-39) ----
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P2: datetime parse with coercion (extract.py:42-44) ----
  // Round-trip through a string to exercise to_timestamp's null-on-bad-input
  // coercion; truncates to second precision deterministically.
  def tsCoerce(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("ts_sec"))
      .orderBy("event_id")

  // ---- P3: drop rows with null keys (extract.py:47) ----
  def nullDrop(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .na.drop(Seq("l_shipdate", "l_orderkey"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P4: null-fill + type narrowing (extract.py:51-52) ----
  def narrowCast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        coalesce(col("l_linenumber"), lit(0)).cast(ShortType).as("linenumber_i16"),
        col("l_quantity").cast("int").as("quantity_int"))
      .orderBy("l_orderkey", "linenumber_i16")

  // ---- P8 + §4 pushdown: a selective predicate that must reach the
  // parquet scan (PushedFilters asserted in OperatorsSpec) ----
  def pushdownFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P6/P7/F1/F7/F8: derived metric columns (transform.py:35-40) ----
  def derivedMetrics(spark: SparkSession, dir: String): DataFrame =
    withMetrics(Tables.lineitem(spark, dir))
      .select("l_orderkey", "l_linenumber", "revenue", "unit_price")
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P8/P9: prioritized multi-rule tagging (transform.py:47-61) ----
  def anomalyTag(spark: SparkSession, dir: String): DataFrame =
    taggedLineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "rejection_reason")
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P10: split valid branch (transform.py:64-65) ----
  def validSplit(spark: SparkSession, dir: String): DataFrame =
    Anomalies.splitValid(taggedLineitem(spark, dir))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "revenue", "unit_price")
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P10: split anomaly branch + S4 side-output shape (transform.py:64-69) ----
  def anomalySplit(spark: SparkSession, dir: String): DataFrame =
    Anomalies.splitAnomalies(taggedLineitem(spark, dir))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "rejection_reason")
      .orderBy("l_orderkey", "l_linenumber")
}

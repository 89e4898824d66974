package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function operators (SURVEY.md §2.3): time features and
  * categorical label encoding, phrased over `events` / `lineitem` / `orders`.
  */
object Funcs {

  /** Hour → time-of-day bucket (reference `transform.py:80-88`): chained
    * `when` reproduces `np.select` with its 'Inconnu' default. */
  def timePeriod(hourCol: Column): Column =
    when(hourCol.between(0, 5), "Nuit")
      .when(hourCol.between(6, 11), "Matin")
      .when(hourCol.between(12, 17), "Après-midi")
      .when(hourCol.between(18, 23), "Soir")
      .otherwise("Inconnu")

  /** Dict-map label encode with null on no-match (reference
    * `transform.py:93-99` — pandas `.map` leaves unmatched keys NaN).
    * A chained `when` with NO otherwise yields null, matching exactly. */
  def labelMap(c: Column, labels: Seq[(String, String)]): Column =
    labels.tail.foldLeft(when(c === labels.head._1, lit(labels.head._2))) {
      case (acc, (k, v)) => acc.when(c === k, lit(v))
    }

  /** event_type → French label; 'error' intentionally unmapped → null,
    * mirroring payment_type 5 → NaN in the reference. */
  val eventLabels: Seq[(String, String)] = Seq(
    "view" -> "Vue", "click" -> "Clic", "purchase" -> "Achat", "signup" -> "Inscription")

  /** o_orderpriority → label, all five matched (ratecode analogue,
    * reference `transform.py:101-109`). */
  val priorityLabels: Seq[(String, String)] = Seq(
    "1-URGENT" -> "Urgent", "2-HIGH" -> "Haute", "3-MEDIUM" -> "Moyenne",
    "4-NOT SPECIFIED" -> "Non spécifiée", "5-LOW" -> "Basse")

  // ---- F2/F4: hour extraction + time_period bucketing (transform.py:77-88) ----
  def timeFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("event_hour", hour(col("ts")))
      .withColumn("time_period", timePeriod(col("event_hour")))
      .groupBy("event_hour", "time_period").agg(count(lit(1)).as("n"))
      .orderBy("event_hour")

  // ---- F3: weekday-name derivation (transform.py:78) ----
  def dayOfWeek(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("day_of_week", date_format(col("l_shipdate"), "EEEE"))
      .groupBy("day_of_week").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("day_of_week"))

  // ---- F5: label encode with null-on-unmatched (transform.py:93-99) ----
  def labelEncodeEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("event_label", labelMap(col("event_type"), eventLabels))
      .groupBy("event_label").agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("event_label"))

  // ---- F6: second label map, all keys matched (transform.py:101-109) ----
  def labelEncodePriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("priority_label", labelMap(col("o_orderpriority"), priorityLabels))
      .groupBy("priority_label").agg(count(lit(1)).as("n"))
      .orderBy("priority_label")

  // ---- F10: month/quarter/year extraction (dashboard axes) ----
  def dateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"))
      .orderBy("o_orderkey")
}

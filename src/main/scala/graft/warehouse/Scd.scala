package graft.warehouse

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: turn a change-event
  * log into versioned dimension rows with [valid_from, valid_to)
  * intervals and an is_current flag — the standard warehouse pattern for
  * tracking attribute history (the reference's star schema rebuilds dims
  * from scratch; SCD2 is what the same warehouse needs once dims change
  * over time).
  *
  * Shape: ONE keyed window (`lead(ts)` per key) — shuffles once on the
  * dimension key, sorts each key's events within a partition. Event
  * counts per key are bounded (changes, not facts), so no skew; nothing
  * resembling a global sort or a self-join appears at any scale. */
object Scd {

  /** Version an event log: each (key, ts)-event closes at the next
    * event's ts for that key; the last stays open (is_current = 1). */
  def scd2(events: DataFrame, key: String, ts: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    events
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** w8: customer-priority history — change events are the distinct
    * (custkey, order-date) pairs carrying the day's min priority (the
    * deterministic one-event-per-day reduction), versioned by scd2. */
  def customerPriorityHistory(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .agg(min("o_orderpriority").as("priority"))
    scd2(ev, "o_custkey", "d")
      .select("o_custkey", "priority", "valid_from", "valid_to", "is_current")
      .orderBy("o_custkey", "valid_from")
  }
}

package graft.dashboard

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's query layer (entry point 4, SURVEY.md §3: Power BI/DAX
  * measures over an imported table) re-expressed as SQL views: register the
  * harness tables + the transformed trip analogue as temp views, then run
  * dashboard measures through `spark.sql` — the full Catalyst
  * parse→analyze→optimize→physical pipeline.
  */
object Views {

  def register(spark: SparkSession, dir: String): Unit = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region",
      "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    graft.queries.Etl.taggedLineitem(spark, dir).createOrReplaceTempView("trips_tagged")
    graft.etl.Anomalies.splitValid(graft.queries.Etl.taggedLineitem(spark, dir))
      .createOrReplaceTempView("trips")
  }

  /** DAX measure analogues (README.md:44-59) as SQL text — total trips,
    * total revenue, average fare, trips per day. */
  val measures: Map[String, String] = Map(
    "total_trips" -> "SELECT count(*) AS total_trips FROM trips",
    "total_revenue" -> "SELECT round(sum(revenue), 4) AS total_revenue FROM trips",
    "average_fare" -> "SELECT round(avg(l_extendedprice), 2) AS average_fare FROM trips",
    "trips_per_day" ->
      ("SELECT CAST(l_shipdate AS DATE) AS pickup_date, count(*) AS n FROM trips " +
       "GROUP BY 1 ORDER BY 1"))

  def measure(spark: SparkSession, name: String): DataFrame = spark.sql(measures(name))
}

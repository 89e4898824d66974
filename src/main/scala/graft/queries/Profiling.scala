package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-pass dataset profiling — the "describe my table" operator every
  * analytics engine ships (the reference's EDA notebook opens with
  * `df.info()` / `df.describe()`; see reference `Dashboard/` EDA cells).
  *
  * Design: ONE scan computes every per-column statistic as columns of a
  * single aggregate row; a literal-array explode then pivots that row into
  * the long (column_name, stats...) shape. Nothing wide ever shuffles:
  * partial aggregates combine map-side and exactly one 1-row result moves.
  *
  * Exact `count(DISTINCT)` over several columns plans one Expand (m× the
  * input rows map-side, but only distinct values reach the shuffle) — the
  * standard exact path. At 100 TB swap `approx_count_distinct` (HLL++, a
  * constant-size sketch per column) — same plan minus the Expand; the gate
  * keeps the exact form so DuckDB can mirror it bit-for-bit.
  */
object Profiling {

  /** x43: per-column profile (null count, exact distinct count, min/max)
    * of the lineitem key columns, long format, one scan. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"${c}__cnt"),
          countDistinct(col(c)).as(s"${c}__dist"),
          min(col(c)).as(s"${c}__min"),
          max(col(c)).as(s"${c}__max"))
      }
    val one = Tables.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        (col("n_rows") - col(s"${c}__cnt")).as("n_nulls"),
        col(s"${c}__cnt").as("n_non_null"),
        col(s"${c}__dist").as("n_distinct"),
        col(s"${c}__min").cast("long").as("min_val"),
        col(s"${c}__max").cast("long").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select("p.*")
      .orderBy("column_name")
  }
}

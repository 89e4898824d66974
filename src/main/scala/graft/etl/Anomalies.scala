package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-match-wins rule tagging — the heart of the reference's transform
  * stage (reference `Scripts_ETL/transform.py:44-73`: a dict of boolean
  * masks applied in priority order, each assigning `rejection_reason` only
  * where still null).
  *
  * Spark-first re-expression: one chained `when(...).when(...)` expression.
  * `when` is first-match-wins, so the whole priority loop collapses into a
  * single codegen'd scalar expression — no per-rule passes over the data,
  * no mutable state. At 100 TB this is a single scan with zero shuffles.
  */
object Anomalies {

  /** Build the `rejection_reason` column from ordered (reason, predicate)
    * rules. Returns NULL when no rule matches (i.e. the row is valid). */
  def tag(rules: Seq[(String, Column)]): Column = {
    require(rules.nonEmpty, "at least one rule")
    val head = when(rules.head._2, lit(rules.head._1))
    rules.tail.foldLeft(head) { case (acc, (reason, cond)) => acc.when(cond, lit(reason)) }
  }

  /** Tag a frame, returning it with a `rejection_reason` column appended. */
  def tagged(df: DataFrame, rules: Seq[(String, Column)],
             reasonCol: String = "rejection_reason"): DataFrame =
    df.withColumn(reasonCol, tag(rules))

  /** The two disjoint branches of the split (reference `transform.py:64-65`):
    * valid rows (reason null, reason column dropped) and anomalies (reason
    * kept). Callers evaluating BOTH branches should `.cache()` the tagged
    * frame (or rely on parquet re-scan, which Catalyst prunes per-branch). */
  def splitValid(tagged: DataFrame, reasonCol: String = "rejection_reason"): DataFrame =
    tagged.filter(col(reasonCol).isNull).drop(reasonCol)

  def splitAnomalies(tagged: DataFrame, reasonCol: String = "rejection_reason"): DataFrame =
    tagged.filter(col(reasonCol).isNotNull)
}

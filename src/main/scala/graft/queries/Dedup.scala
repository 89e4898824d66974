package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication / set operators (SURVEY.md §2.6). */
object Dedup {

  /** D1: dedup on a composite natural key (reference `transform.py:171`
    * `drop_duplicates(subset=[pickup, dropoff])`, keep='first'). pandas
    * keep-first is row-order-defined; the distributed equivalent with a
    * DEFINED order is row_number over (key) ordered by a total tiebreak —
    * deterministic on any cluster size, unlike `dropDuplicates`. */
  def dedupSubset(spark: SparkSession, dir: String): DataFrame =
    // min(struct(tiebreak…)) instead of a row_number window: the window
    // shuffles EVERY row then sorts each partition; the aggregate gets
    // map-side partial aggregation, so only one candidate row per key per
    // mapper reaches the shuffle — at 100 TB that is the difference
    // between shuffling the table and shuffling the (smaller) key set.
    // struct comparison is lexicographic, and (orderkey, linenumber) is
    // unique, so the kept row is identical to the rn=1 window pick.
    Tables.lineitem(spark, dir)
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(struct(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))).as("r"))
      .select(col("r.l_orderkey").as("l_orderkey"), col("r.l_linenumber").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("r.l_quantity").as("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  /** D2: full-row distinct (dimension build, load.py:117,130,140). */
  def distinctDims(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** D3: vertical union of two key columns (load.py:127-130 — PU ∪ DO
    * location ids) then distinct. */
  def unionLocations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.select(col("l_partkey").as("location_id"))
      .unionByName(li.select(col("l_suppkey").as("location_id")))
      .distinct()
      .orderBy("location_id")
  }

  /** D5: surrogate key generation (SERIAL analogue, load.py:21-47):
    * contiguous, deterministic pks via row_number over the natural key.
    * Dimensions are small by construction, so the single-partition window
    * sort is fine at any fact scale. */
  def surrogateKeys(spark: SparkSession, dir: String): DataFrame =
    unionLocations(spark, dir)
      .withColumn("location_pk", row_number().over(Window.orderBy("location_id")))
      .orderBy("location_id")

  /** D7: EXCEPT — customers who ordered in 1996 but not in 1997 (churn
    * cohort). Spark plans `except` as a left-anti join over distinct rows:
    * both sides reduce to distinct keys BEFORE the shuffle (partial agg),
    * so the exchange carries key sets, not order rows. */
  def exceptKeys(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def inYear(y: Int) = o.filter(year(col("o_orderdate")) === y).select("o_custkey")
    inYear(1996).except(inYear(1997)).orderBy("o_custkey")
  }

  /** D8: INTERSECT — parts that appear in both returned ('R') and
    * accepted ('A') lineitems. Planned as a left-semi join over distinct
    * rows — same key-set-only shuffle shape as D7. */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def flagged(f: String) = li.filter(col("l_returnflag") === f).select("l_partkey")
    flagged("R").intersect(flagged("A")).orderBy("l_partkey")
  }

  /** D9: string aggregation (group_concat) — label sets rolled up into
    * one delimited string per group, the report/export shape. Determinism
    * requires imposing the order explicitly: collect_set is
    * order-arbitrary, so sort the array BEFORE joining (DuckDB mirrors
    * with `string_agg(DISTINCT … ORDER BY …)`). */
  def stringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("int").as("y"))
      .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), "|")
        .as("priorities"),
        countDistinct("o_orderpriority").as("n_priorities"))
      .orderBy("y")

  /** x49: fuzzy string matching (entity resolution) — edit-distance join
    * over part names with BLOCKING, the standard data-cleaning recipe:
    * collapse to distinct names first (the entity universe is orders of
    * magnitude smaller than the fact table), block on a cheap key (here
    * the head noun, i.e. last token), and run `levenshtein` only on
    * within-block candidate pairs. The all-pairs edit-distance join is
    * quadratic; blocking makes the candidate count Σ|block|², bounded by
    * the largest block, and the block join shuffles short name strings
    * only.
    *
    * 100 TB: distinct-collapse is one partial-agg shuffle; real pipelines
    * add more blocking passes (length bands, token prefixes, phonetic
    * keys) and union candidates — same dataflow, more block keys. Spark's
    * `levenshtein` is codegen'd and matches DuckDB's definition exactly. */
  def fuzzyNameJoin(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val names = Tables.part(spark, dir).select("p_name").distinct()
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("name_a"), col("blk"))
    val b = names.select(col("p_name").as("name_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
      .orderBy("name_a", "name_b")
  }
}

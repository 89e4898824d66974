package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking — the classic range-partition
  * prefix-rank, as a reusable primitive.
  *
  * `row_number().over(Window.orderBy(...))` with an empty partition spec
  * funnels the ENTIRE input through one task (Spark plans an
  * `Exchange SinglePartition` under the Window) — correct at gate scale,
  * a scale-killer on any frame that grows with the corpus (the r15
  * verdict's x41/x91/x47 finding: the token vocabulary is
  * Heaps-sublinear but unbounded, O(10⁹) for 100 TB of web text).
  *
  * This primitive assigns the exact same ranks with bounded per-task
  * state:
  *   1. `repartitionByRange` on the order key — equal keys land in the
  *      same partition, partitions hold contiguous key ranges (P = the
  *      session's shuffle parallelism);
  *   2. a per-partition `row_number` window PARTITIONED by the captured
  *      `spark_partition_id()` — P concurrent sorts of ~N/P rows each,
  *      never one task;
  *   3. global rank = local row number + the count of all rows in
  *      earlier-range partitions. The offsets come from a P-row count
  *      aggregate prefix-summed via a triangular self-join (P² ≤ ~10⁶
  *      pairs at any sane parallelism — metadata-sized, no window, no
  *      driver collect).
  *
  * Running sums ride the same machinery: a value column's global
  * cumulative sum = its per-partition running sum + the sum of that
  * column over earlier partitions (same P-row offset join).
  *
  * The range-parted frame is pinned with a localCheckpoint before the
  * partition id is consumed twice (offsets + ranking): range partition
  * boundaries come from sampling, so an unpinned recompute could move
  * rows between partition ids mid-query.
  */
object DistributedRank {

  private val PID = "__graft_rank_pid"
  private val LRN = "__graft_rank_lrn"
  private val OFF = "__graft_rank_off"

  /** `df` plus a `rankCol` column holding the exact 1-based global rank
    * under `order` (which must be a total order — include a tiebreak). */
  def rank(df: DataFrame, order: Seq[Column], rankCol: String): DataFrame =
    rankWithRunningSums(df, order, rankCol, Nil)

  /** `rank` plus, for every `(valueCol, outCol)` in `sums`, a column
    * `outCol` = running sum of `valueCol` over the global `order`
    * (inclusive of the current row) — the distributed form of
    * `sum(v).over(Window.orderBy(order).rowsBetween(unboundedPreceding,
    * currentRow))`. */
  def rankWithRunningSums(df: DataFrame, order: Seq[Column], rankCol: String,
      sums: Seq[(String, String)]): DataFrame = {
    val pinned = df
      .repartitionByRange(order: _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(eager = false)
    // P rows: per-range-partition row count + per-value-column sum
    val perPart = pinned.groupBy(PID).agg(
      count(lit(1)).as("__cnt"),
      sums.map { case (v, o) => sum(col(v)).as(s"__sum_$o") }: _*)
    // prefix sums over the P-row frame via a triangular self-join —
    // deliberately NOT a window (this file exists to kill the
    // single-partition window shape, not to hide one in the helper)
    val offCols = coalesce(sum(col(s"b.__cnt")), lit(0L)).as(OFF) +:
      sums.map { case (_, o) =>
        coalesce(sum(col(s"b.__sum_$o")), lit(0L)).as(s"${OFF}_$o")
      }
    val offsets = perPart.as("a")
      .join(perPart.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left")
      .groupBy(col(s"a.$PID").as(PID))
      .agg(offCols.head, offCols.tail: _*)
    val w = Window.partitionBy(PID).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(
      pinned.withColumn(LRN, row_number().over(
        Window.partitionBy(PID).orderBy(order: _*)))) {
      case (d, (v, o)) => d.withColumn(s"__lsum_$o", sum(col(v)).over(w))
    }
    val joined = local.join(broadcast(offsets), Seq(PID))
      .withColumn(rankCol, (col(OFF) + col(LRN)).cast("long"))
    sums.foldLeft(joined) { case (d, (_, o)) =>
      d.withColumn(o, col(s"${OFF}_$o") + col(s"__lsum_$o"))
        .drop(s"${OFF}_$o", s"__lsum_$o")
    }.drop(PID, LRN, OFF)
  }
}

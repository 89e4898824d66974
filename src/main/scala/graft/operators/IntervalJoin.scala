package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-×-large trailing-interval join: for each left row, the right rows
  * whose timestamp falls in `(leftTs - window, leftTs]`.
  *
  * A naive non-equi join plans as BroadcastNestedLoop/cartesian — O(|L|×|R|)
  * comparisons, which dies when neither side broadcasts. This operator
  * time-buckets both sides at the window width and equi-joins on the bucket
  * id first: a right row in `(leftTs - w, leftTs]` can only live in the
  * left row's bucket or the one before it, so the left side fans out ×2 on
  * bucket ids, the join shuffles on the bucket key like any equi-join, and
  * the exact predicate refines inside the join. Cost: O(|L|+|R|) shuffle
  * bytes + per-bucket pair refinement — the standard interval-bucketing
  * layout. Skew follows bucket population (rows per window width); hotter
  * windows can sub-bucket with a salt on the same layout.
  *
  * The two bucket copies of a left row match DISJOINT right rows (each
  * right row has exactly one bucket), so no dedup pass is needed.
  */
object IntervalJoin {

  /** Column names must already be disjoint between `left` and `right`
    * (alias before calling). `joinType` "left" keeps unmatched left rows
    * (right columns null) — note a left row appears once per bucket copy,
    * so aggregate by a left key afterwards rather than counting rows. */
  def joinTrailing(left: DataFrame, leftTs: String, right: DataFrame, rightTs: String,
      windowSec: Long, joinType: String = "left"): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val w = windowSec * 1000000L // micros: exact integer bucket arithmetic
    val lBucket = floor(unix_micros(col(leftTs)) / w)
    val lb = left.withColumn("__ivl_bucket", explode(array(lBucket, lBucket - 1)))
    val rb = right.withColumn("__ivr_bucket", floor(unix_micros(col(rightTs)) / w))
    lb.join(rb,
        col("__ivl_bucket") === col("__ivr_bucket") &&
          unix_micros(col(rightTs)) > unix_micros(col(leftTs)) - w &&
          col(rightTs) <= col(leftTs),
        joinType)
      .drop("__ivl_bucket", "__ivr_bucket")
  }
}

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
  * right row has exactly one bucket), so matches need no dedup pass; for
  * "left" semantics the bucket join runs INNER and unmatched left rows
  * re-enter exactly once via an anti-join (a naive left bucket join would
  * emit a spurious null-right row whenever ONE bucket copy matches
  * nothing, even though the sibling copy matched).
  */
object IntervalJoin {

  /** Column names must already be disjoint between `left` and `right`
    * (alias before calling). `joinType` "left" keeps unmatched left rows
    * (right columns null) with exact row-level left-join semantics. */
  def joinTrailing(left: DataFrame, leftTs: String, right: DataFrame, rightTs: String,
      windowSec: Long, joinType: String = "left"): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    require(Set("inner", "left")(joinType), s"joinType must be inner|left, got $joinType")
    val w = windowSec * 1000000L // micros: exact integer bucket arithmetic
    // row identity for the anti-join restore, derived from CONTENT (a
    // 96-bit xxhash64+murmur3 composite over every left column), not from
    // monotonically_increasing_id: the id column is evaluated independently
    // in the matched branch and the anti-join restore, and a position-based
    // id could diverge between the two evaluations under recompute/
    // speculation/AQE repartitioning — a content hash is identical however
    // the plan re-executes. Duplicate left rows share an id, which is
    // exact here: identical content ⇒ identical bucket and predicate ⇒
    // identical matched/unmatched outcome, so duplicates always travel
    // together through either the matched branch or the anti-join.
    val lcols = left.columns.toSeq.map(col)
    val lid = left.withColumn("__ivl_id",
      struct(xxhash64(lcols: _*).as("h64"), hash(lcols: _*).as("h32")))
    // `div`, not floor(a/b): long/long promotes to DOUBLE division, whose
    // rounding can misassign a bucket near boundaries at wide windows;
    // integer division is exact (post-1970 timestamps are non-negative, so
    // truncation == floor)
    def bucket(tsCol: String) = expr(s"unix_micros($tsCol) div ${w}L")
    val lBucket = bucket(leftTs)
    val lb = lid.withColumn("__ivl_bucket", explode(array(lBucket, lBucket - 1)))
    val rb = right.withColumn("__ivr_bucket", bucket(rightTs))
    val matched = lb.join(rb,
        col("__ivl_bucket") === col("__ivr_bucket") &&
          unix_micros(col(rightTs)) > unix_micros(col(leftTs)) - w &&
          col(rightTs) <= col(leftTs),
        "inner")
      .drop("__ivl_bucket", "__ivr_bucket")
    val result =
      if (joinType == "inner") matched
      else {
        // unmatched lefts re-enter ONCE (not once per bucket copy), right
        // columns null — the anti-join shuffles ids only, never right rows
        val nullRight = right.schema.fields.toSeq
          .map(f => lit(null).cast(f.dataType).as(f.name))
        val unmatched = lid
          .join(matched.select("__ivl_id").distinct(), Seq("__ivl_id"), "left_anti")
          .select(lid.columns.map(col).toSeq ++ nullRight: _*)
        matched.unionByName(unmatched)
      }
    result.drop("__ivl_id")
  }
}

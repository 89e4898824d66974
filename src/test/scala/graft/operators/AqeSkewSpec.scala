package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join cross-check (VERDICT r13 ask #6): the same skewed join
  * the explicit-salting path (`Skew.saltedJoin` / w6/w6b) handles is run
  * under `spark.sql.adaptive.skewJoin` with thresholds scaled to spec
  * data, asserting (a) the OptimizeSkewedJoin rule actually fired
  * (`skew=true` in the final adaptive plan — not just "the conf was on")
  * and (b) row-for-row result equality with both the plain join and the
  * salted join. Division of labor this pins: AQE's runtime split covers
  * SORT-MERGE joins — hand-salting can retire exactly there once a
  * cluster runs with skewJoin enabled — while explicit salting remains
  * the tool for the paths AQE's rule does not touch: broadcast-able small
  * sides where the skew sits in a downstream hash AGGREGATION
  * (`saltedCount`), and deterministic plan-level spreading where runtime
  * re-planning is unavailable (`Skew.scala:64`). */
class AqeSkewSpec extends SparkSpec {

  test("AQE skew split fires on the skewed SMJ and matches hand-salting row-for-row") {
    import spark.implicits._
    // one hot key with 40k rows vs 99 cold keys with ~20 rows each: at the
    // 16 KB thresholds below the hot shuffle partition is unambiguously
    // skewed while the cold ones are not
    val large = spark.range(0, 40000)
      .select(lit("hot").as("k"), col("id").as("rid"))
      .unionByName(spark.range(0, 2000)
        .select(concat(lit("k"), col("id") % 99).as("k"),
          (col("id") + 100000L).as("rid")))
    val small = (Seq("hot") ++ (0 until 99).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "lbl")
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("lbl").as("s"))
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    try {
      // plain + salted twins measured BEFORE the conf flip, so they run
      // under the session's normal settings
      val plain = agg(large.join(small, "k"))
      val salted = agg(Skew.saltedJoin(large, small, "k", col("rid")))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      // coalescing would re-merge the split partitions at these tiny sizes
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force the sort-merge path: OptimizeSkewedJoin only rewrites
      // shuffled joins, a broadcast of `small` would bypass the rule
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = large.join(small, "k")
      val aqeRows = agg(joined)
      // the adaptive plan is final only after execution — assert the rule
      // FIRED, not merely that the conf was set
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire — no skew=true in:\n${plan.take(2000)}")
      assert(aqeRows == plain, "AQE skew-join changed join semantics")
      assert(aqeRows == salted, "AQE and hand-salted joins diverged")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

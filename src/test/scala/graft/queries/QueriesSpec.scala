package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Invariant checks for the oracle-registered queries at sf0.001 (the
  * value-exact check against DuckDB runs via Verify + the driver gate;
  * these specs assert structural properties cheaply in CI). */
class QueriesSpec extends SparkSpec {

  test("every query has oracle SQL or is explicitly rows-only") {
    // xxhash64-based sketches are not ANSI-SQL-expressible, and HLL/KLL
    // sketch estimates are engine-specific → rows-only
    val rowsOnly = Set("x2_minhash_digest", "x3_minhash_pairs",
      "x4_simhash_digest", "x4d_simhash_wide", "x4e_simhash_auto",
      "x11_rolling_fingerprint", "a21_sketch_kpis", "a10c_median_approx")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    assert((rowsOnly -- SparkEntry.queries.keySet).isEmpty)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("anomaly split partitions lineitem") {
    val total = Tables.lineitem(spark, sfDir).count()
    val v = Etl.validSplit(spark, sfDir).count()
    val a = Etl.anomalySplit(spark, sfDir).count()
    assert(v + a == total)
  }

  test("every anomaly row violates its named rule") {
    val t = Etl.taggedLineitem(spark, sfDir)
    val bad = Etl.rules.map { case (reason, cond) =>
      t.filter(col("rejection_reason") === reason && !cond).count()
    }.sum
    assert(bad == 0)
  }

  test("surrogate keys are contiguous and unique") {
    val pks = Dedup.surrogateKeys(spark, sfDir).select("location_pk")
      .collect().map(_.getInt(0))
    assert(pks.toSeq == (1 to pks.length))
  }

  test("one-pass grouping-sets dims equal the three individual dim builds") {
    val star = graft.warehouse.StarSchema
    val (t, loc, pay) = star.dims(spark, sfDir)
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(same(t, star.dimTime(spark, sfDir)))
    assert(same(loc, star.dimLocation(spark, sfDir)))
    assert(same(pay, star.dimPayment(spark, sfDir)))
  }

  test("fact join drops exactly the unmatched-label rows") {
    val li = Tables.lineitem(spark, sfDir)
    val expected = li.filter(col("l_returnflag").isin("R", "A")).count()
    assert(graft.warehouse.StarSchema.factTrips(spark, sfDir).count() == expected)
  }

  test("share-of-total percentages sum to 100") {
    val pctSum = Aggs.shareOfTotal(spark, sfDir).agg(sum("pct")).head().getDouble(0)
    assert(math.abs(pctSum - 100.0) < 0.05)
  }

  test("sketch KPIs land within tolerance of their exact counterparts") {
    val approx = Aggs.sketchKpis(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("s"), countDistinct(col("l_partkey")).as("p"),
        percentile(col("l_extendedprice"), lit(0.5)).as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (as, ap, am)) <- approx) {
      val (es, ep, em) = exact(k)
      assert(math.abs(as - es).toDouble / es < 0.05, s"$k suppliers: $as vs $es")
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$k parts: $ap vs $ep")
      // percentile_approx with accuracy 10000 is near-exact at this scale
      assert(math.abs(am - em) / em < 0.01, s"$k median: $am vs $em")
    }
  }

  test("a10c approx medians land within tolerance of the exact a10 medians") {
    val a = Aggs.medianApprox(spark, sfDir).head()
    val e = Aggs.medianKpi(spark, sfDir).head()
    // percentile_approx at accuracy 10000 is near-exact at spec scale; the
    // gate exists so the documented 100 TB swap is executable, not notional
    assert(math.abs(a.getDouble(0) - e.getDouble(0)) / e.getDouble(0) < 0.01)
    assert(math.abs(a.getDouble(1) - e.getDouble(1)) / e.getDouble(1) < 0.01)
    // and it is genuinely the sketch plan: no Sort/Window in the physical plan
    val plan = Aggs.medianApprox(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), "approx median must not plan a sort")
  }
}

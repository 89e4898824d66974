package graft.llm

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-13 pure dispatch/arithmetic forms:
  * the calibrated band ladder, the drift surrogate, and the coverage
  * arithmetic must satisfy their algebraic contracts on RANDOM inputs,
  * not just the fixture's. Generators drawn with fixed seeds, as in the
  * earlier properties suites. */
class Round13PropertiesSpec extends SparkSpec {

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: calibrated ladder is monotone — a worse witness never coarsens bands") {
    val nGen = Gen.chooseNum(1L, 1L << 45)
    val cGen = Gen.chooseNum(1L, 1000000L)
    for (seed <- 1 to 300) {
      val n = draw(nGen, seed.toLong)
      val c1 = draw(cGen, seed.toLong + 1000)
      val c2 = draw(cGen, seed.toLong + 2000)
      val (lo, hi) = (math.min(c1, c2), math.max(c1, c2))
      val (rLo, rHi) =
        (DocDedup.autoBandRowsCalibrated(n, lo), DocDedup.autoBandRowsCalibrated(n, hi))
      // fewer rows per band (smaller r) = more bands = higher recall: a
      // LOWER correction must never select a LARGER r than a higher one
      assert(rLo <= rHi, s"n=$n: corr $lo -> r=$rLo but corr $hi -> r=$rHi")
      // the ladder only emits k's divisors, and the cap reduces to theory
      assert(Set(1, 2, 4)(rHi) && Set(1, 2, 4)(rLo))
      assert(DocDedup.autoBandRowsCalibrated(n, 1000000L) == DocDedup.autoBandRows(n))
    }
  }

  test("property: the calibrated geometry actually clears the derated target when it claims to") {
    val nGen = Gen.chooseNum(2L, 1L << 45)
    val cGen = Gen.chooseNum(1L, 1000000L)
    for (seed <- 1 to 300) {
      val n = draw(nGen, seed.toLong)
      val c = draw(cGen, seed.toLong + 500)
      val r = DocDedup.autoBandRowsCalibrated(n, c)
      val derated = DocDedup.bandRecallPpm(r, 8 / r) * c / 1000000L
      // either the selected geometry clears the target, or the ladder is
      // exhausted at r=1 (best recall available) and no geometry clears
      if (derated < 600000L) {
        assert(r == 1, s"n=$n corr=$c: r=$r misses the target but is not the floor")
        assert(Seq(1, 2, 4).forall(rr =>
          DocDedup.bandRecallPpm(rr, 8 / rr) * c / 1000000L < 600000L))
      }
    }
  }

  test("property: the drift surrogate is symmetric, zero iff shares equal, and bounded") {
    val gen = Gen.chooseNum(0L, 1000000L)
    def surrogate(p: Long, q: Long): Long =
      if (p + q == 0) 0L else (p - q) * (p - q) / (p + q)
    for (seed <- 1 to 500) {
      val p = draw(gen, seed.toLong)
      val q = draw(gen, seed.toLong + 7000)
      assert(surrogate(p, q) == surrogate(q, p), "symmetry")
      assert(surrogate(p, p) == 0L, "identity of indiscernibles")
      // |p-q| <= p+q for non-negative shares, so (p-q)^2/(p+q) <= |p-q| <= 1e6
      assert(surrogate(p, q) <= math.abs(p - q) && surrogate(p, q) >= 0L, "bounds")
      // monotone in |p-q| at fixed sum: widen the gap, never shrink the score
      val m = math.min(p, q)
      if (m > 0) assert(surrogate(p + 1, q - 1) >= surrogate(p, q) ||
        math.abs((p + 1) - (q - 1)) < math.abs(p - q),
        s"gap-monotonicity at ($p, $q)")
    }
  }

  test("property: chain coverage flags exactly the clusters with missing comparisons") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // a path graph on n nodes has n-1 of n(n-1)/2 pairs: coverage
    // 2e6/n floored — below the 600k guard exactly when n >= 4
    for (n <- 2 to 8) {
      val pairs = (1 until n).map(i => (i.toLong, i + 1L, 0.8)).toDF("id_a", "id_b", "jaccard")
      val labels = (1 to n).map(i => (i.toLong, 1L)).toDF("doc_id", "cluster_id")
      val row = DocDedup.clusterCoherenceOf(labels, pairs).head()
      val possible = n.toLong * (n - 1) / 2
      assert(row.getLong(5) == (n - 1) * 1000000L / possible, s"n=$n coverage")
      assert((row.getLong(5) < 600000L) == (n >= 4),
        s"a path on $n nodes must ${if (n >= 4) "" else "not "}trip the guard")
    }
  }
}

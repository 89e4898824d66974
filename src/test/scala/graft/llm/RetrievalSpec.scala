package graft.llm

import graft.SparkSpec

/** BM25 + hybrid RRF retrieval, checked against an independent scalar
  * implementation of the integer ppm scoring on the sf0.001 corpus. */
class RetrievalSpec extends SparkSpec {

  /** Scalar BM25 (same integer arithmetic as Retrieval.bm25Scores). */
  private def scalarBm25(): Map[Long, Long] = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t) -> g.length.toLong }
    }.toMap
    val vocab = tf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val ranked = vocab.toSeq.sortBy { case (t, n) => (-n, t) }.map(_._1)
    val q = ranked.slice(9, 14).toSet // ranks 10..14, 1-based
    val dl = docs.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val n = docs.length.toLong
    val avgdlPpm = dl.values.sum * 1000000L / n
    val df = q.map(t => t -> tf.keys.count(_._2 == t).toLong).toMap
    val scores = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    tf.foreach { case ((id, t), f) =>
      if (q(t)) {
        val idfPpm = ((n - df(t)) * 2 + 1) * 1000000L / (df(t) * 2 + 1)
        val ratioPpm = dl(id) * 1000000L * 1000000L / avgdlPpm
        val kPpm = 1200000L * (1000000L - 750000L + 750000L * ratioPpm / 1000000L) / 1000000L
        val tfsPpm = f * 2200000L * 1000000L / (f * 1000000L + kPpm)
        scores(id) += idfPpm * tfsPpm / 1000000L
      }
    }
    scores.toMap
  }

  test("bm25: top-20 matches the scalar integer implementation exactly") {
    val expected = scalarBm25().toSeq
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Retrieval.bm25Rank(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.head._2 > 0)
  }

  test("hybrid rrf: fused scores are consistent with the arm rankings") {
    val out = Retrieval.hybridRrf(spark, sfDir).collect()
    assert(out.length == 20)
    var prev = Long.MaxValue
    out.foreach { r =>
      val (rt, rv, rrf) = (r.getInt(1), r.getInt(2), r.getLong(3))
      assert(rt >= 0 && rt <= 50 && rv >= 0 && rv <= 50)
      assert(rt > 0 || rv > 0, "fused doc must appear in at least one arm")
      val expected = (if (rt > 0) 1000000L / (60 + rt) else 0L) +
        (if (rv > 0) 1000000L / (60 + rv) else 0L)
      assert(rrf == expected)
      assert(rrf <= prev, "output must be rrf-descending"); prev = rrf
    }
    // both arms must contribute to the fused top-20
    assert(out.exists(_.getInt(1) > 0) && out.exists(_.getInt(2) > 0))
  }
}

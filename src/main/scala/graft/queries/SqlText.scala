package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-TEXT entry path (r14): the same engine driven through
  * `spark.sql(...)` over registered temp views — the full
  * parse→analyze→optimize pipeline on raw SQL text, including the custom
  * Catalyst function surface (`GraftFunctions`), where every other gate
  * builds its plan with the DataFrame API. sql1/sql2 run text that is
  * VERBATIM-identical in Spark and DuckDB (one string serves both the
  * gate and its oracle — the strongest possible dialect-compat claim);
  * sql3 calls `graft_dot` from SQL, which only the Spark side can, so its
  * oracle re-derives the dot product with DuckDB list functions over the
  * same milli-quantized integers (exact in doubles ≤ 2⁵³, so the
  * cross-engine compare is bit-deterministic, the x109 integer pattern).
  */
object SqlText {

  /** a6's oracle text, runnable verbatim by both engines. */
  val sumByCategorySql: String =
    "SELECT l_returnflag, round(sum(l_extendedprice),2) AS total_amount FROM lineitem " +
      "GROUP BY 1 ORDER BY l_returnflag"

  /** a9's oracle text, runnable verbatim by both engines. */
  val histogramSql: String =
    "SELECT CAST(floor(l_quantity/10) AS INT) AS bin, count(*) AS n FROM lineitem " +
      "GROUP BY 1 ORDER BY bin"

  /** All-pairs exact integer dot products over the first 16 embeddings,
    * with the CUSTOM `graft_dot` expression invoked from SQL text (Spark
    * dialect: lambda in `transform`, the registered function in the
    * projection). Components are milli-quantized to integers first, so
    * the double-typed sum graft_dot computes is exactly integral. */
  val dotPairsSparkSql: String =
    "WITH q AS (SELECT vec_id, " +
      "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000.0) AS DOUBLE)) AS e " +
      "FROM embeddings WHERE vec_id < 16) " +
      "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      "CAST(graft_dot(a.e, b.e) AS BIGINT) AS dot_milli2 " +
      "FROM q a JOIN q b ON a.vec_id < b.vec_id ORDER BY id_a, id_b"

  /** sql4 (r14 VERDICT ask #7): the custom `graft_minhash` expression
    * driven from raw SQL text. Its internal mixing is XXH64.hashLong —
    * not DuckDB-expressible — so the witness is LAYERED, the
    * a10d/a21b-boolean pattern on top of x2b's md5 arithmetic:
    *  - exact hash-matched VALUES: `min_h` (min of the md5-derived token
    *    hashes — pins the whole hash-array pipeline cross-engine) and
    *    `mh0` (the x2b mixing formula's first component, computed in SQL
    *    text — parser→analyzer coverage for the witness arithmetic);
    *  - literal-TRUE algebraic invariants of graft_minhash itself:
    *    signature(reverse(hs)) = signature(hs) (permutation invariance)
    *    and signature(array_distinct(hs)) = signature(hs) (multiset→set
    *    invariance) — the defining set-reduce properties a MinHash MUST
    *    satisfy; a component that read positions or counts would flip a
    *    boolean and hash-fail. */
  val minhashTextSparkSql: String =
    "WITH h AS (SELECT doc_id, transform(split(text, ' '), t -> " +
      "CAST(conv(substring(md5(CAST(t AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 2147483647) AS hs " +
      "FROM documents), " +
      "sig AS (SELECT doc_id, graft_minhash(hs, 8) AS s, " +
      "graft_minhash(reverse(hs), 8) AS sp, " +
      "graft_minhash(array_distinct(hs), 8) AS sd, " +
      "array_min(hs) AS min_h, " +
      "array_min(transform(hs, x -> (x * 1103515245 + 12345) % 2147483647)) AS mh0 FROM h) " +
      "SELECT doc_id, (s = sp) AS perm_invariant, (s = sd) AS dedup_invariant, " +
      "min_h, CAST(mh0 AS BIGINT) AS mh0 FROM sig ORDER BY doc_id"

  /** sql4's oracle: the exact columns re-derived with DuckDB list
    * functions; the invariance booleans are literal TRUE (the a21b
    * tolerance-witness pattern — here exact algebra, not tolerance). */
  val minhashTextOracleSql: String =
    "WITH h AS (SELECT doc_id, list_transform(string_split(text, ' '), t -> " +
      "CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT) % 2147483647) AS hs " +
      "FROM documents) " +
      "SELECT doc_id, TRUE AS perm_invariant, TRUE AS dedup_invariant, " +
      "list_min(hs) AS min_h, " +
      "CAST(list_min(list_transform(hs, x -> (x * 1103515245 + 12345) % 2147483647)) AS BIGINT) AS mh0 " +
      "FROM h ORDER BY doc_id"

  /** sql5 (r14 VERDICT ask #7): the custom `graft_simhash` expression
    * driven from raw SQL text, FULLY md5-witnessed (the x2b pattern):
    * graft_simhash votes bit i of each input hash with ±1 and sets output
    * bit i on a positive sum — pure arithmetic over the caller's hashes,
    * so feeding it the md5-derived 60-bit token hashes and masking the
    * low 16 bits reproduces x4b's `simhash16` EXACTLY, and the oracle is
    * x4b's CTE verbatim. A voting/tie-break/bit-order bug in the codegen'd
    * expression cannot hash-match. */
  val simhashTextSparkSql: String =
    "WITH h AS (SELECT doc_id, transform(split(text, ' '), t -> " +
      "CAST(conv(substring(md5(CAST(t AS BINARY)), 1, 15), 16, 10) AS BIGINT)) AS hs " +
      "FROM documents) " +
      "SELECT doc_id, CAST(graft_simhash(hs) & 65535 AS BIGINT) AS simhash16 " +
      "FROM h ORDER BY doc_id"

  /** sql3's oracle: the same quantized pairs via DuckDB list arithmetic. */
  val dotPairsOracleSql: String =
    "WITH q AS (SELECT vec_id, " +
      "list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000.0) AS BIGINT)) AS e " +
      "FROM embeddings WHERE vec_id < 16) " +
      "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      "CAST(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i] * b.e[i])) AS BIGINT) AS dot_milli2 " +
      "FROM q a JOIN q b ON a.vec_id < b.vec_id ORDER BY id_a, id_b"

  /** Register the views + custom functions and run one SQL text. */
  def gate(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    Tables.widen(Tables.documents(spark, dir))
      .createOrReplaceTempView("documents")
    graft.functions.GraftFunctions.register(spark)
    spark.sql(sql)
  }
}

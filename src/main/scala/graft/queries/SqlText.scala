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
    graft.functions.GraftFunctions.register(spark)
    spark.sql(sql)
  }
}

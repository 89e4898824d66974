package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Genuine JDBC sink / upsert / key read-back (S5/S6/S7) against an
  * embedded Apache Derby database — Derby ships in Spark's jar directory,
  * so it resolves with zero network egress where Postgres (reference
  * `load.py:92-228`) cannot.
  *
  * The reference loads each dimension with `INSERT … ON CONFLICT DO
  * NOTHING` and then reads surrogate keys back to build the fact. Derby
  * has no ON CONFLICT clause, so the upsert here is the same engine-side
  * left-anti the parquet warehouse uses (`warehouse/Upsert.scala`), with
  * the EXISTING side read back over JDBC — identical semantics (existing
  * rows win on key conflict), but against a genuinely mutable,
  * transactional store.
  *
  * Scale: dimensions are broadcast-sized by construction, so the JDBC
  * round-trip moves KB–MB per batch; the anti-join runs on executors
  * against the (broadcastable) key read-back. Embedded Derby lives in
  * the local JVM — correct for local[n]; on a cluster the SAME code
  * points at a client/server URL (only the URL string changes; the
  * dataflow — read keys, anti-join, append — is unchanged). Facts never
  * go through JDBC at 100 TB: they stay parquet (S8); JDBC is the
  * dimension/metadata path, exactly the reference's split.
  */
object Jdbc {

  val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Embedded database URL rooted at `dbDir` (created on first use). */
  def url(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", driver)
    p
  }

  /** S5: JDBC sink — full-table overwrite (drop + recreate + insert). */
  def writeTable(df: DataFrame, jdbcUrl: String, table: String): Unit =
    df.write.mode("overwrite").jdbc(jdbcUrl, table, props)

  /** S7: read-back (whole table; callers project keys). */
  def readTable(spark: SparkSession, jdbcUrl: String, table: String): DataFrame =
    spark.read.jdbc(jdbcUrl, table, props)

  /** S6: `INSERT … ON CONFLICT DO NOTHING` — anti-join the incoming batch
    * against the table's current keys, append only the survivors.
    * Existing rows win; intra-batch duplicates collapse to one row per
    * key (same contract as `Upsert.upsertDoNothing`). Returns the number
    * of rows actually inserted. */
  def upsertDoNothing(incoming: DataFrame, jdbcUrl: String, table: String,
      keys: Seq[String]): Long = {
    val existingKeys = readTable(incoming.sparkSession, jdbcUrl, table)
      .select(keys.map(col): _*)
    val fresh = incoming.dropDuplicates(keys)
      .join(broadcast(existingKeys), keys, "left_anti")
      // one JDBC batch per key-set evaluation: materialize the survivors
      // once so the count and the append see the same rows
      .localCheckpoint()
    val n = fresh.count()
    if (n > 0) fresh.write.mode("append").jdbc(jdbcUrl, table, props)
    n
  }
}

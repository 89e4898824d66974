package graft.sources

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet sinks matching the reference's writer contract.
  *
  * S3 (reference `extract.py:61-66`, `transform.py:118-121`): snappy
  * parquet, no index column (Spark never writes one).
  * S4 (`transform.py:124-127`): timestamped anomaly side-output path.
  *
  * Scale: `writePartitioned` is the 100 TB shape — partition pruning on
  * `pickup_date` (or any low-cardinality derived column) replaces the
  * reference's Postgres indexes (`load.py:62-67`); a date-partitioned fact
  * lets every dashboard query scan only its slice.
  */
object Sinks {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)

  /** Timestamped side-output (anomalies_<yyyyMMdd_HHmmss>.parquet). */
  def writeTimestamped(df: DataFrame, dir: String, prefix: String = "anomalies",
      now: LocalDateTime = LocalDateTime.now()): String = {
    val stamp = now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    val path = s"$dir/${prefix}_$stamp.parquet"
    writeParquet(df, path)
    path
  }

  /** Date-partitioned fact write: the scalable sink. `partitionCol` must be
    * low-cardinality (a date, not a timestamp). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy")
      .partitionBy(partitionCol).parquet(path)

  /** Bucketed table write: pre-shuffles ONCE at write time into
    * `nBuckets` hash buckets on the join key (+ sorted within buckets).
    * Two tables bucketed identically join with ZERO exchanges — the
    * shuffle that dominates repeated fact⋈fact joins at 100 TB is paid
    * once and amortized over every later query. Requires a catalog table
    * (bucket metadata lives in the metastore), hence saveAsTable. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int = 8): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog forgets managed tables at JVM exit but their
    // files survive in the warehouse dir; a later CREATE then fails with
    // LOCATION_ALREADY_EXISTS — clear both the entry and the orphan dir
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .option("compression", "snappy")
      .format("parquet").saveAsTable(table)
  }

  /** S10: CSV sink/source (the reference's Power BI ingestion path,
    * README.md:34-37). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON-lines sink/source: the interchange format for event feeds and
    * annotation payloads. Reads take an EXPLICIT schema — at lake scale
    * schema inference is a full extra pass over the data (and silently
    * widens types); a declared schema also lets the scan prune columns. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC sink/source: the other columnar lake format (zlib-compressed
    * here to match its ecosystem default, as snappy is parquet's). Same
    * pushdown/pruning contract as parquet — predicate and column pruning
    * reach the ORC reader — so pipelines can ingest either format without
    * plan changes. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)

  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Plain-text source: one row per line (`value: string`) — the raw-crawl
    * ingest edge for the document pipeline; pair with a projection that
    * stamps doc ids (e.g. xxhash64 of the line + file). */
  def readText(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** P13: non-empty validation (reference `extract.py:56-57`). `isEmpty`
    * runs a LocalLimit(1) job — O(first partition), not a full count. */
  def requireNonEmpty(df: DataFrame, what: String): DataFrame = {
    if (df.isEmpty) throw new IllegalStateException(s"Aucune donnée valide après traitement: $what")
    df
  }
}

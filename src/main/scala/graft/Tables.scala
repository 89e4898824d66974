package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the harness test tables (TESTDATA.md).
  *
  * Every operator in the engine is parameterized by `dir` (a scale-factor
  * directory) so the same code runs from sf0.001 to a 100 TB lake — the
  * reads are plain parquet scans that Catalyst prunes/pushes into.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
    * for; sessions set spark.sql.legacy.parquet.nanosAsLong=true and we
    * convert here (integer `div` — double division would lose precision on
    * 1e18-scale nanos). Sub-microsecond digits are truncated. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // defensive: required to read TIMESTAMP(NANOS) parquet at all; runtime-
    // settable, so set it here rather than relying on session-builder config
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Decouple a CPU-bound downstream stage (per-row hashing/shingling at
    * hundreds of µs/row) from the scan's file-split count — a single small
    * parquet file otherwise serializes the whole stage onto one task
    * (measured 27 s single-task vs ~1 s wide at sf0.1). CONDITIONAL: the
    * round-robin exchange is added only when the planned scan is narrower
    * than half the cores; at lake scale the scan already has thousands of
    * splits and the extra full-data shuffle would be pure waste, so the
    * frame passes through untouched. (Partition counting is plan-time file
    * listing — no job runs.) */
  def widen(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // the split probe plans the scan and lists its files — ~100 ms that
    // would otherwise be paid on EVERY query build over the same table
    // (dozens of builds per bench/verify run), so the verdict is memoized
    // per (session, canonicalized plan). Bounded: a handful of distinct
    // scans exist per session; cleared wholesale if it ever grows odd.
    val key = (df.sparkSession, df.queryExecution.logical.canonicalized.hashCode)
    if (widenCache.size > 256) widenCache.clear()
    val narrow = widenCache.computeIfAbsent(key,
      _ => df.queryExecution.toRdd.getNumPartitions < cores / 2)
    if (narrow) df.repartition(cores) else df
  }
  private val widenCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int), java.lang.Boolean]()

  // typed variants (Dataset[T]) for pipelines that want field checks
  def lineitemDs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[graft.schema.LineItem] = {
    import spark.implicits._
    lineitem(spark, dir).as[graft.schema.LineItem]
  }
  def eventsDs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[graft.schema.Event] = {
    import spark.implicits._
    events(spark, dir).as[graft.schema.Event]
  }
  def documentsDs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[graft.schema.Document] = {
    import spark.implicits._
    documents(spark, dir).as[graft.schema.Document]
  }
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function operators (SURVEY.md §2.3): time features and
  * categorical label encoding, phrased over `events` / `lineitem` / `orders`.
  */
object Funcs {

  /** Hour → time-of-day bucket (reference `transform.py:80-88`): chained
    * `when` reproduces `np.select` with its 'Inconnu' default. */
  def timePeriod(hourCol: Column): Column =
    when(hourCol.between(0, 5), "Nuit")
      .when(hourCol.between(6, 11), "Matin")
      .when(hourCol.between(12, 17), "Après-midi")
      .when(hourCol.between(18, 23), "Soir")
      .otherwise("Inconnu")

  /** Dict-map label encode with null on no-match (reference
    * `transform.py:93-99` — pandas `.map` leaves unmatched keys NaN).
    * A chained `when` with NO otherwise yields null, matching exactly. */
  def labelMap(c: Column, labels: Seq[(String, String)]): Column =
    labels.tail.foldLeft(when(c === labels.head._1, lit(labels.head._2))) {
      case (acc, (k, v)) => acc.when(c === k, lit(v))
    }

  /** event_type → French label; 'error' intentionally unmapped → null,
    * mirroring payment_type 5 → NaN in the reference. */
  val eventLabels: Seq[(String, String)] = Seq(
    "view" -> "Vue", "click" -> "Clic", "purchase" -> "Achat", "signup" -> "Inscription")

  /** o_orderpriority → label, all five matched (ratecode analogue,
    * reference `transform.py:101-109`). */
  val priorityLabels: Seq[(String, String)] = Seq(
    "1-URGENT" -> "Urgent", "2-HIGH" -> "Haute", "3-MEDIUM" -> "Moyenne",
    "4-NOT SPECIFIED" -> "Non spécifiée", "5-LOW" -> "Basse")

  // ---- F2/F4: hour extraction + time_period bucketing (transform.py:77-88) ----
  def timeFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("event_hour", hour(col("ts")))
      .withColumn("time_period", timePeriod(col("event_hour")))
      .groupBy("event_hour", "time_period").agg(count(lit(1)).as("n"))
      .orderBy("event_hour")

  // ---- F3: weekday-name derivation (transform.py:78) ----
  def dayOfWeek(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("day_of_week", date_format(col("l_shipdate"), "EEEE"))
      .groupBy("day_of_week").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("day_of_week"))

  // ---- F5: label encode with null-on-unmatched (transform.py:93-99) ----
  def labelEncodeEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("event_label", labelMap(col("event_type"), eventLabels))
      .groupBy("event_label").agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("event_label"))

  // ---- F6: second label map, all keys matched (transform.py:101-109) ----
  def labelEncodePriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("priority_label", labelMap(col("o_orderpriority"), priorityLabels))
      .groupBy("priority_label").agg(count(lit(1)).as("n"))
      .orderBy("priority_label")

  // ---- gap-based sessionization (batch): session = maximal run of events
  // per user with < 30 min between consecutive events. lag + running sum
  // of session-start flags — the standard windowed formulation; the
  // streaming stateful variant lives in streaming.EventsStream. ----
  def sessionizeEvents(spark: SparkSession, dir: String, gapSec: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // micros on both sides — a seconds cast would truncate while the
      // DuckDB oracle compares fractional seconds
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapSec * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_sess").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
      .orderBy("user_id", "session_id")
  }

  // ---- lag/lead: inter-event gap per user (the raw feature under
  // sessionization). Same keyed-window shuffle shape as sessionizeEvents;
  // null delta on each user's first event. ----
  def eventGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("gap_sec",
        ((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))) / 1e6))
      .select("event_id", "user_id", "gap_sec")
      .orderBy("event_id")
  }

  // ---- ntile: per-group decile assignment (feature bucketing for model
  // inputs). Partitioned by the group key, so each decile sort is a
  // per-key partition sort — never a global sort. Total order inside the
  // window (price, orderkey, linenumber) makes tile edges deterministic. ----
  def decileByGroup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_returnflag")
      .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        ntile(10).over(w).as("decile"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- deterministic stratified downsampling: per-class keep rates as
  // md5-bucket thresholds (class rebalancing for training data). Same
  // pure-function-of-the-key stability as TextStats.hashSplit — no
  // rand(), so the sample is reproducible across runs/engines/appends and
  // a row's fate never depends on partition layout. One scan, no
  // shuffle; the filter pushes nothing to parquet (hash of a column) but
  // costs one md5 per row. ----
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("event_id").cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("int")
    val keepBelow = when(col("event_type") === "view", 26) // ~10%
      .when(col("event_type") === "click", 128) // 50%
      .otherwise(256) // purchase/signup/error: keep all
    Tables.events(spark, dir)
      .filter(bucket < keepBelow)
      .select("event_id", "event_type", "value")
      .orderBy("event_id")
  }

  // ---- text normalization: lower, accent-strip, punctuation removal,
  // whitespace collapse (the canonicalization step before dedup) ----
  val accented = "àâäéèêëîïôöùûüç"
  val unaccented = "aaaeeeeiioouuuc"
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(translate(lower(c), accented, unaccented), "[^a-z0-9 ]", " "),
      " +", " "))

  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), normalizeText(col("text")).as("norm_text"))
      .orderBy("doc_id")

  // ---- F10: month/quarter/year extraction (dashboard axes) ----
  def dateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"))
      .orderBy("o_orderkey")

  // ---- e4: ordered funnel (view → click → purchase) per user. Each
  // stage is "earliest event of this type AT OR AFTER the previous
  // stage's timestamp": three filtered min-aggregates chained by
  // per-user joins. Every intermediate is one row per user (partial
  // aggregation collapses before each shuffle), so stage joins are
  // user-cardinality, never event-cardinality, at any scale. Left joins
  // preserve drop-off (null = user never reached the stage) — the
  // conversion-rate readout is count(stage_ts) / count(*). ----
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    def stage(t: String) = e.filter(col("event_type") === t).select("user_id", "ts")
    val v = stage("view").groupBy("user_id").agg(min("ts").as("view_ts"))
    val c = stage("click").join(v, "user_id").filter(col("ts") >= col("view_ts"))
      .groupBy("user_id").agg(min("ts").as("click_ts"))
    val p = stage("purchase").join(c, "user_id").filter(col("ts") >= col("click_ts"))
      .groupBy("user_id").agg(min("ts").as("purchase_ts"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select("user_id", "view_ts", "click_ts", "purchase_ts")
      .orderBy("user_id")
  }

  // ---- f13: Z-order layout key (functions.LayoutExpressions.ZOrderKey,
  // a codegen'd Morton interleave). The gate hashes the key itself; the
  // layout USE — repartitionByRange(zkey) + sortWithinPartitions at write
  // time for two-dimensional row-group pruning — is spec-asserted
  // (OperatorsSpec) and documented in SCALE.md. Inputs mod 2^16 keep the
  // oracle SQL's bit-arithmetic mirror at 32 terms. ----
  def zorderKey(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.LayoutExpressions.zorder(
          pmod(col("l_partkey"), lit(65536)), pmod(col("l_suppkey"), lit(65536)))
          .as("zkey"))
      .orderBy("l_orderkey", "l_linenumber")
}

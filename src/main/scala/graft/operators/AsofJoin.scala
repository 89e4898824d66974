package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed as-of join — for each left row, the single right row with the
  * greatest right timestamp <= the left timestamp within the same key
  * (the attribution / point-in-time-lookup operator; DuckDB spells it
  * `ASOF JOIN`, Spark has no built-in).
  *
  * Implementation is the scalable union-and-scan formulation, NOT a
  * per-left-row range join: tag both inputs, union them, and run ONE
  * `last(<right ts>, ignoreNulls) OVER (PARTITION BY key ORDER BY ts,
  * side ROWS UNBOUNDED PRECEDING)` pass. Cost is a single shuffle on the
  * key plus a per-key sort — the same plan shape as sessionization — and
  * it never materializes the |left| × |right-candidates| intermediate a
  * range join would. Right rows sort BEFORE left rows at equal
  * timestamps (side 0 < 1), making the match inclusive (>=), matching
  * DuckDB's `ON l.ts >= r.ts`.
  *
  * Skew note: partitioning is by the as-of key, so a pathological key
  * holding most rows serializes that key's sort; at lake scale pre-split
  * hot keys by a time-bucket prefix and as-of within buckets.
  */
object AsofJoin {

  /** Left rows + `outCol` = greatest right `rightTs` <= left `tsCol` for
    * the same `keys` (null when no prior right row exists — filter
    * `outCol.isNotNull` for inner-asof semantics). Only the matched
    * TIMESTAMP is attached: when several right rows tie on (key, ts) the
    * result is still deterministic — callers needing right payload
    * columns use `asof` with tie columns instead. Thin wrapper over
    * `asof` (the matched ts rides as a one-column payload). */
  def asofTs(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightTs: String, outCol: String): DataFrame =
    asof(left,
      right.withColumn(outCol, col(rightTs).cast("timestamp")),
      keys, tsCol, rightTs, rightCols = Seq(outCol))

  /** Full as-of join: left rows + the PAYLOAD of the matched right row
    * (null-struct when no prior right row exists). Payload columns ride
    * the same single window pass inside one struct; ties on (key, ts) are
    * broken deterministically by taking the struct-max over `tieCols`
    * (appended to the struct ordering AFTER ts, so later tie columns win
    * only within the same timestamp). `rightCols` must not collide with
    * left column names. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightTs: String, rightCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    val sideTag = "__asof_side"
    val payload = "__asof_payload"
    val probe = left.withColumn(sideTag, lit(1))
    val rightStruct = struct(
      (Seq(col(rightTs).cast("timestamp").as("__ts")) ++
        tieCols.map(col) ++ rightCols.map(col)): _*)
    val build0 = right
      .select(keys.map(col) :+ col(rightTs).cast("timestamp").as(tsCol)
        :+ rightStruct.as(payload): _*)
      .withColumn(sideTag, lit(0))
    val build = probe.columns.foldLeft(build0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
    }
    val withPayload = probe.withColumn(payload,
      lit(null).cast(build0.schema(payload).dataType))
    val outCols = withPayload.columns
    // max over the running frame: struct comparison is lexicographic, so
    // the greatest (__ts, tieCols…) payload at or before the current row
    // wins — equal timestamps resolve by tieCols, deterministically
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideTag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = withPayload.unionByName(build.select(outCols.map(col): _*))
      .withColumn(payload, max(col(payload)).over(w))
      .filter(col(sideTag) === 1)
      .drop(sideTag)
    rightCols.foldLeft(matched) { (df, c) =>
      df.withColumn(c, col(s"$payload.$c"))
    }.drop(payload)
  }
}

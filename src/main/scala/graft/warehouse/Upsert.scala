package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert semantics without a mutable store (reference `load.py:121-146`:
  * `INSERT … ON CONFLICT DO NOTHING` per dimension). Spark has no native
  * upsert into parquet; the equivalent operator is existing ∪ (incoming
  * ANTI-JOIN existing) — existing rows win on key conflict, exactly ON
  * CONFLICT DO NOTHING. The anti join shuffles on the key (or broadcasts
  * when `existing` keys are dimension-sized), which is the scalable shape;
  * on a Delta/Iceberg table this becomes MERGE INTO.
  */
object Upsert {

  def upsertDoNothing(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    // dropDuplicates mirrors the row-wise insert keeping ONE row per new
    // key (which of an intra-batch duplicate set survives is arbitrary in
    // a distributed insert too; pass a pre-deduped frame for determinism)
    existing.unionByName(
      incoming.dropDuplicates(keys)
        .join(existing.select(keys.map(col): _*), keys, "left_anti"))

  /** The other standard merge: INSERT … ON CONFLICT DO UPDATE (upsert
    * where INCOMING wins on key conflict). One union + one keyed window
    * keep-first — a single shuffle on the key regardless of table size,
    * the same dataflow MERGE INTO compiles to on Delta/Iceberg.
    * `orderCol` (desc) breaks intra-batch duplicates deterministically:
    * incoming beats existing, then highest orderCol wins. */
  def upsertMerge(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String], orderCol: String): DataFrame = {
    val tagged = existing.withColumn("_prio", lit(0))
      .unionByName(incoming.withColumn("_prio", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(desc("_prio"), desc(orderCol))
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_prio", "_rn")
  }
}

package graft.warehouse

import org.apache.spark.sql.DataFrame
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
}

package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per key.
  *
  * The built-in formulation (`row_number().over(partitionBy(key).orderBy(o))
  * .filter(rn <= k)`) SORTS every partition fully — O(n log n) per key and
  * a full materialized sort buffer. This operator keeps a bounded k-row
  * heap per key — O(n log k), no full sort — which at 100 TB is the
  * difference between a spilling sort and a streaming pass.
  *
  * Ladder level (c): LogicalPlan + SparkStrategy + SparkPlan, registered
  * either via `spark.experimental.extraStrategies` (GraftFunctions.register)
  * or `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions).
  */
case class TopKPerKeyPlan(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object TopKPerKeyExec {
  /** Per-partition cap on retained rows (Σ heap sizes). The default
    * (8M rows ≈ hundreds of MB at typical row widths) is far above any
    * sane top-k working set but below the silent-OOM line. */
  val maxBufferedRowsConf = "spark.graft.topkRewrite.maxBufferedRowsPerPartition"
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** All rows of a key must meet in one partition (the shuffle this
    * requests carries the RAW rows once — same as the window formulation). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    // resolved on the driver, captured into the task closure
    val maxBuffered = org.apache.spark.sql.internal.SQLConf.get
      .getConfString(TopKPerKeyExec.maxBufferedRowsConf, "8000000").toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val rowOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(order, childOutput)
      // max-heap per key: the head is the WORST retained row; a new row
      // replaces it when better. O(log k) per row, k rows retained per key.
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      // retained-row census: the heap map has no spill path, so memory is
      // O(#keys·k) — near-unique keys approach the whole partition. Fail
      // LOUDLY with the remedy named instead of dying in an opaque OOM.
      var buffered = 0L
      iter.foreach { row =>
        val key = keyProj(row).copy()
        val heap = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[InternalRow](rowOrd))
        if (heap.size < k) {
          heap += row.copy()
          buffered += 1
          if (buffered > maxBuffered) throw new IllegalStateException(
            s"TopKPerKey buffered more than $maxBuffered rows in one partition " +
              s"(high-cardinality keys × k=$k; the per-key heap map does not spill). " +
              s"Raise ${TopKPerKeyExec.maxBufferedRowsConf}, add partitions, or set " +
              s"spark.graft.topkRewrite.enabled=false to keep the spillable window plan.")
        }
        else if (rowOrd.compare(row, heap.head) < 0) { heap.dequeue(); heap += row.copy() }
      }
      heaps.valuesIterator.flatMap(_.toSeq.sorted(rowOrd))
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top-k rows per key. `orderCols` should include a unique tiebreak for
    * deterministic results (same requirement as the window formulation). */
  def apply(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"TopKPerKey requires k > 0, got $k (with k<=0 the per-key " +
      "heap would be read while empty at execution time, deep inside a task)")
    val keys = keyCols.map(GraftBridge.convertedExpression)
    val order = orderCols.map(GraftBridge.convertedExpression).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(k, keys, order, GraftBridge.logicalPlan(df)))
  }
}

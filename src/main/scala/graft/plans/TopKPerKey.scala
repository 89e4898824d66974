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
    * sane top-k working set but below the silent-OOM line. Exceeding it
    * no longer fails the query: the operator degrades to sorted-run
    * spills + a k-way streaming merge (see doExecute). */
  val maxBufferedRowsConf = "spark.graft.topkRewrite.maxBufferedRowsPerPartition"

  /** Unsigned lexicographic byte order: any total order that keeps
    * byte-equal keys adjacent works for run-merge grouping (UnsafeRow
    * equality IS byte equality for a fixed schema). */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
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
      import TopKPerKeyExec.compareBytes
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val rowOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(order, childOutput)
      // max-heap per key: the head is the WORST retained row; a new row
      // replaces it when better. O(log k) per row, k rows retained per key.
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      // retained-row census: memory is O(#keys·k), so near-unique keys
      // approach the whole partition. At `maxBuffered` the operator
      // DEGRADES instead of failing: the current heaps flush to disk as a
      // sorted run (keys in byte order, rows within a key in rowOrd, ≤k
      // rows per key — per-chunk top-k prunes the spill), heap-filling
      // resumes, and a final k-way streaming merge takes the first k rows
      // per key across runs. Any globally-top-k row is top-k within its
      // chunk, so the run union is a superset of the answer; memory is
      // bounded by the cap plus one buffered record per run.
      var buffered = 0L
      val spills = mutable.ArrayBuffer.empty[java.io.File]
      def spillHeaps(): Unit = {
        val sortedKeys = heaps.keysIterator
          .map(k => (k.asInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeRow].getBytes, k))
          .toArray.sortWith((a, b) => compareBytes(a._1, b._1) < 0)
        val f = java.io.File.createTempFile("graft_topk_spill", ".run")
        f.deleteOnExit()
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
        try sortedKeys.foreach { case (kb, key) =>
          heaps(key).toSeq.sorted(rowOrd).foreach { r =>
            val rb = toUnsafe(r).getBytes // getBytes copies out of the shared buffer
            out.writeInt(kb.length); out.write(kb)
            out.writeInt(rb.length); out.write(rb)
          }
        } finally out.close()
        spills += f
        heaps.clear()
        buffered = 0L
      }
      iter.foreach { row =>
        val key = keyProj(row).copy()
        val heap = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[InternalRow](rowOrd))
        if (heap.size < k) {
          heap += row.copy()
          buffered += 1
          if (buffered >= maxBuffered) spillHeaps()
        }
        else if (rowOrd.compare(row, heap.head) < 0) { heap.dequeue(); heap += row.copy() }
      }
      if (spills.isEmpty) heaps.valuesIterator.flatMap(_.toSeq.sorted(rowOrd))
      else {
        spillHeaps() // flush the in-memory tail as the last run
        // streaming reader over one sorted run; record arrays are freshly
        // allocated per advance, so emitted rows never alias a reused buffer
        final class RunReader(f: java.io.File, val idx: Int) {
          private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
            new java.io.FileInputStream(f), 1 << 16))
          private var closed = false
          def close(): Unit = if (!closed) { closed = true; in.close() }
          var curKey: Array[Byte] = _
          var curRow: org.apache.spark.sql.catalyst.expressions.UnsafeRow = _
          def advance(): Boolean = try {
            val kl = in.readInt()
            val kb = new Array[Byte](kl); in.readFully(kb)
            val rl = in.readInt()
            val rb = new Array[Byte](rl); in.readFully(rb)
            val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(childOutput.length)
            r.pointTo(rb, rl)
            curKey = kb; curRow = r
            true
          } catch { case _: java.io.EOFException => close(); f.delete(); false }
        }
        val readers = spills.zipWithIndex
          .map { case (f, i) => new RunReader(f, i) }.filter(_.advance())
        // a downstream operator may abandon the merge before it drains
        // (limit, early-out join): close the still-open run streams at task
        // completion BEFORE deleting the files — an exhausted reader
        // already closed itself (close() is idempotent), and deleting an
        // open-handle file fails outright on some platforms
        val ctx = org.apache.spark.TaskContext.get()
        if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
          readers.foreach(_.close()); spills.foreach(_.delete())
        }
        // min-first on (key bytes, row order, run index): equal keys drain
        // adjacently; the run-index tiebreak makes rowOrd ties stable
        val pq = mutable.PriorityQueue.empty[RunReader](new Ordering[RunReader] {
          override def compare(x: RunReader, y: RunReader): Int = {
            val c = compareBytes(x.curKey, y.curKey)
            if (c != 0) return -c
            val r = rowOrd.compare(x.curRow, y.curRow)
            if (r != 0) -r else y.idx - x.idx
          }
        })
        readers.foreach(pq.enqueue(_))
        new Iterator[InternalRow] {
          private var outRow: InternalRow = _
          private var curKey: Array[Byte] = _
          private var emitted = 0
          private def advanceOut(): Unit = {
            outRow = null
            while (outRow == null && pq.nonEmpty) {
              val r = pq.dequeue()
              val kb = r.curKey; val row = r.curRow
              if (r.advance()) pq.enqueue(r)
              if (curKey == null || compareBytes(kb, curKey) != 0) { curKey = kb; emitted = 0 }
              if (emitted < k) { emitted += 1; outRow = row }
            }
          }
          advanceOut()
          override def hasNext: Boolean = outRow != null
          override def next(): InternalRow = { val r = outRow; advanceOut(); r }
        }
      }
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

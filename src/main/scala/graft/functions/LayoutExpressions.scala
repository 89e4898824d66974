package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Data-layout expressions: space-filling-curve keys for write-time
  * clustering.
  *
  * A Z-order (Morton) key bit-interleaves two dimensions so rows close in
  * BOTH dimensions land close in key order. Sorting/range-partitioning a
  * table by this key at write time gives parquet row-group min/max stats
  * that are selective for predicates on EITHER dimension — the open-lake
  * equivalent of the reference's two single-column Postgres indexes
  * (`Scripts_ETL/load.py:62-67`): one clustered layout serving both
  * `pickup_loc` and `dropoff_loc` dashboards at once. At 100 TB this is
  * the difference between scanning every row group and pruning ~√N of
  * them per point predicate.
  *
  * Ladder level (b): a codegen'd Catalyst expression — the column-algebra
  * formulation (32 shift/mask/or terms) works but evaluates as a 60-node
  * expression tree; the fused loop is one generated call.
  */
object LayoutExpressions {

  /** 64-bit Morton key from the low 32 bits of each input: bit i of `left`
    * lands at position 2i, bit i of `right` at 2i+1. Inputs must be
    * non-negative (keys/ids); values ≥ 2³² contribute only their low bits. */
  case class ZOrderKey(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {
    // children are cast to LongType by the zorder() constructor below
    override def dataType: DataType = LongType
    override protected def nullSafeEval(x: Any, y: Any): Any =
      LayoutExpressions.mortonJava(x.asInstanceOf[Long], y.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) => s"graft.functions.LayoutExpressions.mortonJava($x, $y)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Bit-parallel interleave (Hacker's Delight / classic Morton spread):
    * spread each 32-bit half into even positions with 5 mask-shift rounds,
    * OR the odd-shifted second dimension. O(1), no loop, branch-free. */
  def mortonJava(x: Long, y: Long): Long =
    spread(x & 0xFFFFFFFFL) | (spread(y & 0xFFFFFFFFL) << 1)

  private def spread(vIn: Long): Long = {
    var v = vIn
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def zorder(x: Column, y: Column): Column =
    GraftBridge.column(ZOrderKey(GraftBridge.expression(x.cast("long")),
      GraftBridge.expression(y.cast("long"))))
}

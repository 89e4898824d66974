package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically right but the
  * higher-order lambdas evaluate interpreted, per element — at N² pair
  * scale that dominates the query. These expressions generate a tight Java
  * loop (doGenCode) with the SAME sequential left-fold order, so results
  * stay bit-identical to the higher-order formulation (and to the DuckDB
  * oracle's list_sum) while running ~2 orders of magnitude faster.
  */
object VectorExpressions {

  /** Σ a(i)*b(i) over array<double> — codegen'd. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {
    override def dataType: DataType = DoubleType

    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      // mismatched dimensions → null, matching the zip_with+aggregate
      // formulation (zip_with null-pads, the sum becomes null) — a silent
      // partial sum would hide dimension bugs
      if (x.numElements() != y.numElements()) null
      else {
        val n = x.numElements()
        var acc = 0.0
        var i = 0
        while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |if ($x.numElements() != $y.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $x.numElements();
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += $x.getDouble($i) * $y.getDouble($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Σ a(i)² over array<double> — codegen'd. */
  case class NormSq(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) { val v = x.getDouble(i); acc += v * v; i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => "graft.functions.VectorExpressions.normSqJava(" + x + ")")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Called from generated code (keeps the generated snippet tiny). */
  def normSqJava(x: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) { val v = x.getDouble(i); acc += v * v; i += 1 }
    acc
  }

  /** Callers must pass array<double> columns (cast upstream). */
  def dotFast(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
  def normSqFast(a: Column): Column =
    GraftBridge.column(NormSq(GraftBridge.expression(a)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketch expressions for the dedup hot path.
  *
  * Layout: shingle/token strings are hashed ONCE upstream
  * (`xxhash64(s)` — bytes touched a single time), then these expressions
  * derive the k-component sketches from the 64-bit hashes with cheap long
  * mixing (XXH64.hashLong) in a tight generated loop. The naive
  * formulation (k × higher-order lambdas, each re-hashing strings)
  * evaluates interpreted and re-reads every string k times — a ~1000×
  * slowdown observed at bench scale.
  */
object HashExpressions {

  /** MinHash signature: out[i] = min over hashes h of XXH64.hashLong(h, i).
    * Input array<long> (pre-hashed shingles), output array<long> of size k. */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(a: Any): Any = {
      val hs = a.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val out = new Array[Long](k)
      var i = 0
      while (i < k) {
        var best = Long.MaxValue
        var j = 0
        while (j < n) {
          val v = XXH64.hashLong(hs.getLong(j), i)
          if (v < best) best = v
          j += 1
        }
        out(i) = best
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"graft.functions.HashExpressions.minHashJava($x, $k)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minHashJava(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = XXH64.hashLong(hs.getLong(j), i)
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash from pre-hashed tokens: bit i of the result is set iff
    * Σ_tokens (bit i of hash ? +1 : −1) > 0. */
  case class SimHash64(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any): Any =
      simHashJava(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.HashExpressions.simHashJava($x)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def simHashJava(hs: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def minhashSig(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(hashes), k))

  def simhash64(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))
}

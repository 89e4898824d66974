package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the custom Catalyst expressions: after registration,
  * `graft_dot`, `graft_norm_sq`, `graft_minhash`, `graft_simhash` are
  * callable from `spark.sql` text — the engine's operators compose with
  * plain SQL exactly like built-ins (and stay codegen'd).
  */
object GraftFunctions {

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "dot product of two array<double>",
      (es: Seq[Expression]) => VectorExpressions.DotProduct(es(0), es(1))),
    ("graft_norm_sq", "squared L2 norm of array<double>",
      (es: Seq[Expression]) => VectorExpressions.NormSq(es.head)),
    ("graft_minhash", "k-component minhash signature from array<long> hashes; arg2 = k literal",
      (es: Seq[Expression]) => HashExpressions.MinHashSignature(es.head,
        es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_simhash", "64-bit simhash from array<long> hashes",
      (es: Seq[Expression]) => HashExpressions.SimHash64(es.head)))

  /** Imperative registration on a live session: SQL functions + the TopK
    * planner strategy (spark.experimental.extraStrategies is public API). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteRowNumberTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteRowNumberTopK
  }
}

/** Config-based injection: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * wires the functions into every session of the application — the standard
  * extension-library deployment (SparkSessionExtensions is public API). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRowNumberTopK)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Ladder level (d): a custom optimizer `Rule[LogicalPlan]`.
  *
  * Rewrites the universal "top-k per key" SQL idiom
  *
  *   row_number().over(partitionBy(keys).orderBy(o)).as("rn")
  *     .filter(rn <= k).drop("rn")
  *
  * into the bounded-heap [[TopKPerKeyPlan]] operator. The window
  * formulation fully SORTS every key's rows (O(n log n), spill-prone at
  * 100 TB); the operator keeps a k-row heap per key (O(n log k), no full
  * sort). Users keep writing the idiomatic window; the engine swaps in
  * the streaming operator — the same contract as Spark's own
  * `LimitPushDown`-family rewrites.
  *
  * The rewrite fires only when it is provably safe:
  *  - exactly one window expression, and it is `row_number()` with the
  *    standard (UnboundedPreceding, CurrentRow) row frame;
  *  - the filter is a single `rn <= k` / `rn < k` / `rn = 1` comparison
  *    against an integer literal (k > 0);
  *  - a Project above discards the rn column (so the operator's
  *    child-only output matches) and references only child columns;
  *  - the partition spec is non-empty (a global top-k is TakeOrdered's
  *    job, which Spark already plans for orderBy+limit).
  *
  * Row-set semantics are identical; like the window form, a total order
  * (unique tiebreak) makes the kept rows deterministic. Neither form
  * guarantees downstream row ORDER (Spark adds sorts where required —
  * the exec declares no outputOrdering).
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {

  private def limitFromCond(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k)
    // k > 1 guard BEFORE decrementing: with k = Int.MinValue the naive
    // `k - 1` wraps to Int.MaxValue and would pass the k > 0 positivity
    // check below, turning an always-false filter (row_number >= 1 is
    // never < Int.MinValue) into keep-2³¹-1-rows-per-key. k <= 1 simply
    // doesn't rewrite — the window form computes the (empty) result.
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) && k > 1 => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) && k == 1 => Some(1)
    case EqualTo(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) && k == 1 => Some(1)
    case _ => None
  }

  private def isPlainRowNumber(e: NamedExpression): Option[Alias] = e match {
    case a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) => Some(a)
    case _ => None
  }

  /** Memory trade-off (and the reason for the kill switch below): the
    * exec buffers one k-row heap per DISTINCT key per partition with no
    * spill path, so resident memory is O(min(#keys·k, partition rows)) —
    * for near-unique keys (e.g. an upsert keyed on a primary key, where
    * #keys ≈ #rows) that approaches the whole partition, where the window
    * sort it replaces is external/spillable. The exec fails LOUDLY (clear
    * message, this conf key named) rather than OOMing when a partition
    * exceeds [[TopKPerKeyExec.maxBufferedRowsConf]]; flip this conf off to
    * keep the idiomatic-but-spillable window plan. */
  val enabledConf = "spark.graft.topkRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(enabledConf, "true").toBoolean) plan
    else plan.transform {
      case p @ Project(projectList, Filter(cond, w: Window))
          if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
        isPlainRowNumber(w.windowExpressions.head).flatMap { a =>
          limitFromCond(cond, a.toAttribute).collect {
            case k if k > 0 && projectList.forall(_.references.subsetOf(w.child.outputSet)) =>
              Project(projectList, TopKPerKeyPlan(k, w.partitionSpec, w.orderSpec, w.child))
          }
        }.getOrElse(p)
    }
}

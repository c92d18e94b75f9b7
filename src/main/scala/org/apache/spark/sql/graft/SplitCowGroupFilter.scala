package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{And,
  DynamicPruningExpression, InSubquery, ListQuery, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Decompose the row-level operations' MULTI-KEY runtime group filter
  * into per-attribute IN subqueries over the copy-on-write scan.
  *
  * Spark's `RowLevelOperationRuntimeGroupFiltering` builds ONE
  * `InSubquery(pruningKeys, ...)` over ALL of the scan's declared
  * `filterAttributes` — with more than one key that is a struct-IN the
  * V2 runtime-filter translation rejects (`translateRuntimeFilterV2`
  * only accepts a plain column child), so the filter silently never
  * reaches the scan and a two-key MERGE rewrites every dir both keys
  * could have pruned. This rule rewrites
  *
  *   DynamicPruningExpression(InSubquery(Seq(k1..kn), ListQuery(p)))
  *   →  AND_i DynamicPruningExpression(
  *        InSubquery(Seq(ki), ListQuery(Project(p.output(i), p))))
  *
  * — each conjunct single-column, so each translates, arrives at
  * [[graft.engine.GraftLakeCowScan.filter]], and the dir-granular
  * pruning INTERSECTS them. Sound: per-dimension the IN set
  * over-approximates the matching groups (every matching row's value
  * is in its projection), and DynamicPruning conjuncts over a V2 scan
  * are planned as scan-level runtime filters only — never evaluated
  * row-wise — so weakening the conjunction can only keep extra DIRS,
  * never lose rows.
  *
  * Scoped to Filters directly over the graft COW scan (the only scan
  * declaring multiple group-filter attributes), and registered via
  * `spark.experimental.extraOptimizations` ("User Provided
  * Optimizers" is the one batch that runs AFTER "PartitionPruning",
  * where Spark builds the struct-IN — no SparkSessionExtensions
  * injection point lands there). */
object SplitCowGroupFilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, r: DataSourceV2ScanRelation)
        if r.scan.isInstanceOf[graft.engine.GraftLakeCowScan] =>
      val newCond = cond transform {
        case DynamicPruningExpression(InSubquery(values, l: ListQuery))
            if values.length > 1 &&
              l.plan.output.length == values.length =>
          values.zipWithIndex.map { case (v, i) =>
            val out = l.plan.output(i)
            DynamicPruningExpression(InSubquery(Seq(v),
              ListQuery(Project(Seq(out), l.plan), Seq.empty,
                NamedExpression.newExprId, 1, Seq(out))))
              : org.apache.spark.sql.catalyst.expressions.Expression
          }.reduce(And(_, _))
      }
      if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
  }
}

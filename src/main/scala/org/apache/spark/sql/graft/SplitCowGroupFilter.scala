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
  * injection point lands there). Installed by [[graft.Sessions]] AND
  * lazily at every [[graft.engine.GraftLakeTable]] resolution
  * (GraftLakeTable.ensureRuntimeRules), so extension-only sessions
  * get the rule the moment they first touch a lake table. */
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

/** Inject JOIN-DRIVEN runtime file pruning into MERGE-ON-READ plans.
  *
  * Spark gives delta-based row-level plans NO runtime group
  * filtering: `RowLevelOperationRuntimeGroupFiltering` matches
  * `ReplaceData` (group-based) only, and the generic
  * `PartitionPruning` rule does not fire inside `WriteDelta`'s query
  * — so a KB-sized MERGE source joined to a 100 TB delta target scans
  * the whole lake. This rule replays `PartitionPruning`'s shape for
  * exactly that case: for each equi-join key whose lineage lands on a
  * [[graft.engine.GraftLakeDeltaScan]] relation and whose OTHER side
  * carries a likely-selective filter, wrap the relation in
  * `Filter(DynamicPruningSubquery(key, otherSide, …), relation)`.
  * The physical planner turns the subquery into the standard
  * `InSubqueryExec` runtime filter; the V2 strategy routes
  * DynamicPruning conjuncts into the scan's runtime filters (never
  * row-evaluated), and the delta scan's sidecar probes drop files
  * whose stats/bloom exclude every build key.
  *
  * Sound per key: the subquery produces EVERY value of the join key
  * on the filtering side, so a pruned file provably holds no matching
  * row — and a delta scan that misses an unmatched row misses nothing
  * (unlike the COW scan, nothing is replaced). Pruning the target
  * side is join-type-safe for Inner/LeftSemi (and RightOuter when the
  * target is left), the shapes Spark's own `canPruneLeft` allows.
  * `onlyInBroadcast = false`: the filtering side of a row-level plan
  * is typically tiny, so running the subquery even without a reusable
  * broadcast is the right trade at lake scale. Idempotent (fixedPoint
  * batch): a relation already wrapped by a DynamicPruning filter is
  * left alone. */
object InjectDeltaRuntimeFilter extends Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{DynamicPruning,
    DynamicPruningSubquery, EqualTo, Expression}
  import org.apache.spark.sql.catalyst.plans.logical.Join
  import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi, RightOuter}

  private def selective(plan: LogicalPlan): Boolean = plan.exists {
    case f: Filter => isLikelySelective(f.condition)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, joinType, Some(cond), _)
        if (joinType == Inner || joinType == LeftSemi ||
          joinType == RightOuter) && selective(right) =>
      var newLeft = left
      splitConjunctivePredicates(cond).foreach {
        case EqualTo(a, b) =>
          val lr: Option[(Expression, Expression)] =
            if (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet)) Some((a, b))
            else if (b.references.subsetOf(left.outputSet) &&
              a.references.subsetOf(right.outputSet)) Some((b, a))
            else None
          lr.foreach { case (lk, rk) =>
            findExpressionAndTrackLineageDown(lk, newLeft).foreach {
              case (resExp, r: DataSourceV2ScanRelation)
                  if r.scan.isInstanceOf[graft.engine.GraftLakeDeltaScan]
                    && resExp.references.subsetOf(r.outputSet) =>
                val already = newLeft.exists {
                  case Filter(c, rel) if rel eq r =>
                    c.exists(_.isInstanceOf[DynamicPruning])
                  case _ => false
                }
                if (!already)
                  newLeft = newLeft.transformUp {
                    case rel: DataSourceV2ScanRelation if rel eq r =>
                      Filter(DynamicPruningSubquery(resExp, right,
                        Seq(rk), Seq(0), onlyInBroadcast = false,
                        NamedExpression.newExprId, None), rel)
                  }
              case _ => ()
            }
          }
        case _ => ()
      }
      if (newLeft eq left) j else j.copy(left = newLeft)
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.types._

/** The engine's Catalyst EXTENSION SEAM (SURVEY §7.4 tier (c)):
  * session-registered optimizer/physical rules, installed through the
  * standard `spark.sql.extensions` conf — the mechanism that carries
  * engine-level policy to a 1000-executor cluster without call-site
  * discipline (every session built from the same conf gets the same
  * optimizations and guards, including ad-hoc user sessions).
  *
  * Three rules, each load-bearing:
  *  - [[GraftRewrites]] (logical): self-dot strength reduction — every
  *    cosine denominator builds `graft_dot(x, x)`, which evaluates the
  *    child twice and reads each element from two array cursors;
  *    [[SelfDot]] evaluates the child once and squares in one pass.
  *    Also collapses `normalize_utf8(normalize_utf8(x))` — NFC
  *    canonicalization is idempotent, and composed curation pipelines
  *    (extract → normalize → defensive re-normalize) hit exactly this.
  *  - [[GuardedScanRule]] (physical, query-stage prep): the reference's
  *    "avoid full scans" policy (README.md:29-31) enforced INSIDE the
  *    session — any file scan of a path under
  *    `spark.graft.scanGuard.paths` (comma-separated prefixes) that is
  *    partitioned but arrives with no partition filter fails the query
  *    before it reads a byte. [[graft.engine.ScanGuard]] remains the
  *    call-site form; this is the fleet-wide deployment of the same
  *    rule.
  *
  * Rewrite-safety contract: [[SelfDot]] runs the IDENTICAL sequential
  * multiply-add the two-cursor form runs (same IEEE op order), so every
  * DuckDB-hash-verified query is bit-for-bit unchanged under the rule —
  * re-verified suite-wide, and pinned by ExtensionsSpec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => GraftRewrites)
    ext.injectQueryStagePrepRule(s => GuardedScanRule(s))
  }
}

/** Sum of squares `Σ x_i²` — [[DotProduct]] strength-reduced for the
  * self-join case: one child evaluation, one array cursor, same
  * sequential left-to-right double summation (bit-identical to
  * `graft_dot(x, x)`). Introduced ONLY by [[GraftRewrites]]; builders
  * keep writing the declarative `dot(x, x)` contract. */
case class SelfDot(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_self_dot"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $x.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Logical rewrites over the engine's own expressions. Both rewrites
  * are exact (bit-identical results); both require deterministic
  * children — a non-deterministic child evaluated once vs twice is a
  * semantics change, not an optimization. */
object GraftRewrites extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(l, r) if l.deterministic && l.semanticEquals(r) =>
        SelfDot(l)
      case NormalizeUtf8Text(inner @ NormalizeUtf8Text(_))
          if inner.deterministic =>
        inner
    }
}

/** Physical enforcement of the no-full-scan policy for guarded paths:
  * runs at query-stage preparation (partition filters are bound by
  * then), throws before execution on an offending scan. Opt-in via the
  * RUNTIME conf `spark.graft.scanGuard.paths` so a session — or a
  * single guarded job — can arm it without rebuilding the session. */
case class GuardedScanRule(spark: SparkSession) extends Rule[SparkPlan] {
  override def apply(plan: SparkPlan): SparkPlan = {
    val prefixes = spark.conf.get("spark.graft.scanGuard.paths", "")
      .split(',').map(_.trim).filter(_.nonEmpty)
      .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath)
    if (prefixes.nonEmpty) {
      plan.foreach {
        case s: FileSourceScanExec
            if s.relation.partitionSchema.nonEmpty &&
              s.partitionFilters.isEmpty &&
              s.relation.location.rootPaths.exists(rp =>
                prefixes.exists(rp.toUri.getPath.startsWith)) =>
          throw new IllegalStateException(
            "full scan of guarded partitioned data at " +
              s"${s.relation.location.rootPaths.mkString(",")} — add a " +
              s"filter on ${s.relation.partitionSchema.fieldNames
                .mkString("/")} (reference README.md:29-31 policy, " +
              "session-enforced)")
        case _ =>
      }
    }
    plan
  }
}

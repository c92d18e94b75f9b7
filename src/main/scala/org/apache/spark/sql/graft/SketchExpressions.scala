package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Native Catalyst point-query over a serialized Count-Min sketch.
  *
  * Spark registers the `count_min_sketch` AGGREGATE (binary sketch out)
  * but no estimate/probe function — the only stock way to read a CMS
  * back is driver-side `CountMinSketch.readFrom`. That makes the
  * natural 100 TB heavy-hitter shape (merge per-slice sketches once,
  * then probe candidate keys WHERE the candidates live — distributed)
  * inexpressible without a collect. This expression closes that gap:
  * the sketch argument must be FOLDABLE (a literal of the merged
  * sketch's bytes, deserialized once per operator instance, shipped to
  * executors as a codegen reference object — the same mechanism as a
  * broadcast scalar), and the key is probed per row inside whole-stage
  * codegen.
  *
  * Key type is LONG, matching `count_min_sketch` over a BIGINT column:
  * both sides route through the sketch's long-item hash, so build and
  * probe hash identically (differentially asserted in SketchSpec).
  * Estimates are deterministic: counters sum, so partitioning and
  * merge order cannot change the answer. Null key → null
  * (BinaryExpression null-intolerance); the sketch literal is never
  * null by construction.
  */
case class CmsEstimate(sketch: Expression, key: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = sketch
  override def right: Expression = key

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!sketch.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sketch argument must be foldable (a literal of the merged sketch)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(sketch.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(sk: Any, k: Any): Any =
    cms.estimateCount(java.lang.Long.valueOf(k.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, k) => {
      val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
      s"${ev.value} = $ref.estimateCount((Object) java.lang.Long.valueOf($k));"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, key = newRight)
}

/** Column-API surface for the native sketch expressions. */
object SketchFunctions {

  /** Codegen'd CMS point estimate: `sketchBytes` is the serialized
    * merged sketch (becomes a foldable literal), `key` a long column. */
  def cmsEstimate(sketchBytes: Array[Byte], key: Column): Column =
    ExpressionUtils.column(CmsEstimate(
      org.apache.spark.sql.catalyst.expressions.Literal(sketchBytes),
      ExpressionUtils.expression(key)))
}

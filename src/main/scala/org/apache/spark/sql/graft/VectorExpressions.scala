package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector hot path (SURVEY §7.4: custom
  * Expression only where the built-in form costs — the higher-order
  * `aggregate(zip_with(x, y, *), 0d, +)` allocates an intermediate array
  * per row and interprets a lambda per element; this is a fused
  * multiply-add loop compiled into the enclosing WholeStageCodegen span).
  *
  * Lives under `org.apache.spark.sql` because the extension seams it
  * needs (`AbstractDataType`, `ExpressionUtils.column`) are
  * `private[sql]` — the standard placement for third-party native
  * expressions.
  *
  * Semantics are IDENTICAL to the HOF form on equal-length null-free
  * arrays: sequential left-to-right double summation — the same order
  * DuckDB's `list_dot_product` uses, so oracle parity stays bit-exact.
  * Mismatched lengths take the common prefix; null ELEMENTS are not
  * supported (embedding vectors are dense by contract); a null ARRAY on
  * either side yields null via BinaryExpression null-intolerance.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native vector expressions. */
object VectorFunctions {

  /** Codegen'd dot product of two `array<double>` columns. */
  def dotNative(x: Column, y: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))

  /** Cosine similarity composed from the native dot product. */
  def cosineNative(x: Column, y: Column): Column =
    dotNative(x, y) / (org.apache.spark.sql.functions.sqrt(dotNative(x, x)) *
      org.apache.spark.sql.functions.sqrt(dotNative(y, y)))
}

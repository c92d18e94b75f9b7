package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

/** Carter–Wegman MinHash slot vector: hash the input string ONCE into two
  * independent 64-bit base hashes (XXH64 under two seeds), then derive the
  * k permutation approximations as affine combinations `h1 + i * h2` (h2
  * forced odd so every map is a bijection mod 2^64). Replaces k salted
  * string re-hashes (`xxhash64(concat(sh, salt_i))` — k string
  * concatenations + k variable-length hashes per row) with 2 string hashes
  * + k wrapping long multiply-adds, the standard MinHash trick (Indyk;
  * also how DataSketches derives its k minhash slots).
  *
  * Wrapping arithmetic is REQUIRED here, which is why this is a native
  * expression: SQL-level `h1 + i * h2` under ANSI mode (the Spark 4
  * default) throws ARITHMETIC_OVERFLOW, while Java long arithmetic wraps —
  * the intended modular semantics.
  *
  * Output is `array<long>` of length k (never null elements); a null
  * input string yields a null array via UnaryExpression null-intolerance.
  */
case class MinHashSlots(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, s"k must be positive: $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_slots"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val h1 = XXH64.hashUTF8String(s, MinHashSlots.Seed1)
    val h2 = XXH64.hashUTF8String(s, MinHashSlots.Seed2) | 1L
    val arr = new Array[Long](k)
    var i = 0
    while (i < k) { arr(i) = h1 + i * h2; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |long $h1 = $xxh.hashUTF8String($s, ${MinHashSlots.Seed1}L);
         |long $h2 = $xxh.hashUTF8String($s, ${MinHashSlots.Seed2}L) | 1L;
         |long[] $arr = new long[$k];
         |for (int $i = 0; $i < $k; $i++) { $arr[$i] = $h1 + $i * $h2; }
         |${ev.value} = $uad.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSlots {
  /** Spark's conventional xxhash64 seed — slot 0 therefore matches what a
    * plain `xxhash64(sh)` family would produce, handy when debugging. */
  val Seed1: Long = 42L
  /** 2^64 / golden ratio, the splitmix64 increment — a fixed, public,
    * maximally-irrational odd constant for the second hash stream. */
  val Seed2: Long = 0x9E3779B97F4A7C15L
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

  /** k Carter–Wegman MinHash slot values for a string column, as
    * `array<long>` (see [[MinHashSlots]]). */
  def minhashSlots(s: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSlots(ExpressionUtils.expression(s), k))
}

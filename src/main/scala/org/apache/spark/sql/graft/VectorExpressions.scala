package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
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

/** Carter–Wegman MinHash slot vector: digest the input string ONCE
  * (md5), derive two base values from its leading bytes, and emit the k
  * permutation approximations as affine combinations `(a + i·b) mod P`
  * with P = 2^31−1 prime (b ≠ 0, so every map is a bijection mod P).
  * Replaces k salted string re-hashes (`xxhash64(concat(sh, salt_i))` —
  * k string concatenations + k variable-length hashes per row) with one
  * digest + k modular adds, the standard MinHash trick (Indyk; also how
  * DataSketches derives its k minhash slots).
  *
  * md5-mod-prime instead of the earlier wrapping-XXH64 form is what
  * makes the WHOLE MinHash-LSH pipeline SQL-replayable: DuckDB computes
  * the identical md5 hex and the identical non-overflowing `%`
  * arithmetic, so q40's signatures, bands, buckets, and survivors all
  * sit under a full hash-compare oracle (the contract is spelled out at
  * [[MinHashSlots.slots]]). The native expression remains the hot path:
  * the declarative md5/conv/substring form evaluates the digest per
  * base and allocates hex strings per shingle; this is one thread-local
  * digest and a primitive loop inside the enclosing codegen stage
  * (bit-equality with the declarative form is property-tested in
  * VectorExpressionsSpec).
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

  override def nullSafeEval(input: Any): Any =
    MinHashSlots.slots(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = "org.apache.spark.sql.graft.MinHashSlots"
      s"${ev.value} = $cls.slots($s, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSlots {

  /** 2^31 − 1, the Mersenne prime — the Carter–Wegman modulus. Chosen
    * so every intermediate (`a + i·b` stays < 2·P·k < 2^38) fits a
    * signed 64-bit integer on BOTH engines: DuckDB BIGINT arithmetic
    * raises on overflow, so the earlier wrapping-xxhash64 form was
    * unreplayable and q40 could only be checked rows-only. */
  val P: Long = 2147483647L

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The k slot values for one shingle. CONTRACT (this exact arithmetic
    * is the q40 oracle, replayed verbatim in SQL over the md5 hex):
    *   m = md5(sh)
    *   a = uint(hex chars 1..8  of m) % P          -- md5 bytes 0..3
    *   b = uint(hex chars 9..16 of m) % (P−1) + 1  -- md5 bytes 4..7, ≠ 0
    *   slot_i = (a + i·b) % P
    * Shared-base affine slots: the same pairwise-independence
    * approximation as before (two base streams per shingle), with the
    * LSH threshold behavior re-pinned empirically by DedupSpec's
    * planted-pair recall. Called from generated code. */
  def slots(s: UTF8String, k: Int): UnsafeArrayData = {
    val dg = md5.get().digest(s.getBytes)
    val a = (((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
      ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)) % P
    val b = ((((dg(4) & 0xffL) << 24) | ((dg(5) & 0xffL) << 16) |
      ((dg(6) & 0xffL) << 8) | (dg(7) & 0xffL)) % (P - 1)) + 1L
    val arr = new Array[Long](k)
    var i = 0
    var v = a
    while (i < k) { // v ≡ (a + i·b) mod P: a,b < P ⇒ one subtract suffices
      arr(i) = v
      v += b
      if (v >= P) v -= P
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }
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

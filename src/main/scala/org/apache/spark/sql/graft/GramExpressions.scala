package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling k-token gram-hash build —
  * the hot loop of substring dedup (q147) and shingle-graph edge
  * generation (q151). The declarative form — the documented contract the
  * DuckDB oracles replay —
  *
  *   `transform(sequence(0, n-k), i -> md5(concat_ws(' ', slice(toks, i+1, k))))`
  *
  * does not participate in whole-stage codegen (higher-order functions
  * run interpreted), and per window it materializes a sliced array, a
  * joined string, and a hex rendering through three interpreted
  * dispatches. This expression computes the IDENTICAL hex digests in one
  * compiled loop: each token's UTF-8 bytes are fetched ONCE and reused
  * by every window containing it, each window STREAMS its bytes
  * (token, ' ', token, …) through one thread-local MessageDigest —
  * bit-identical to md5 of the joined string, with no slice and no gram
  * string ever allocated — and only the 32-char output hex survives.
  *
  * Null behavior matches the declarative form's effective use here
  * (inputs come from `split`, which never yields null elements): a null
  * tokens ARRAY yields null; a null element yields a null result, the
  * conservative poisoned-output convention ([[HashedNgramLogit]]).
  * Equality with the declarative form is property-tested in
  * VectorExpressionsSpec; the oracles keep replaying the declarative
  * contract, so drift here breaks the q147/q151 hashes. */
case class RollingGramHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "window length must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    RollingGramHashes.hashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingGramHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, x => {
      val res = ctx.freshName("grams")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  $cls.hashes($x, $k);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingGramHashes {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(dg: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((dg(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexDigits(dg(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** All `n − k + 1` window digests (empty array when n < k); null on a
    * null element. Called from generated code. */
  def hashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      bytes(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val m = md5.get()
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      var j = i
      while (j < i + k) {
        if (j > i) m.update(' '.toByte)
        m.update(bytes(j))
        j += 1
      }
      out(i) = hex(m.digest())
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-API surface for the native gram hasher. */
object GramFunctions {

  /** Codegen'd rolling k-token md5 window hashes over a TOKENS array
    * column — `transform(sequence(0, n-k), i -> md5(concat_ws(' ',
    * slice(toks, i+1, k))))` in one compiled pass. */
  def gramHashes(toks: Column, k: Int): Column =
    ExpressionUtils.column(RollingGramHashes(
      ExpressionUtils.expression(toks), k))
}

package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the hashed-n-gram quality scorer's hot
  * loop (q133). The declarative form — build the uni+bigram array with
  * `transform`/`concat`, then `aggregate(grams, 0L, (acc, g) -> acc +
  * w[pmod(conv(substring(md5(g),1,8),16,10), D)])` — is the documented
  * oracle contract, but Spark higher-order functions do not participate in
  * whole-stage codegen: every gram pays an interpreted lambda dispatch, a
  * full 32-char hex rendering of the md5 digest, a base-16 string parse,
  * and the materialization of the bigram strings themselves. This
  * expression computes the IDENTICAL logit in one compiled loop over the
  * tokens array:
  *
  *   - the bucket is the first 4 digest bytes read big-endian as an
  *     unsigned 32-bit value, which is by construction equal to
  *     `conv(substring(md5(g),1,8),16,10)` (8 hex chars = 4 bytes), taken
  *     `pmod` D (the value is non-negative, so `%` suffices);
  *   - bigram digests are computed by STREAMING the md5 update over
  *     (left, ' ', right) — bit-identical to md5 of the concatenated
  *     string, with no bigram string ever allocated;
  *   - each token's bytes are fetched once and reused for its unigram and
  *     both adjacent bigrams.
  *
  * Semantics match the fold exactly, including null behavior: a null
  * tokens array yields null (UnaryExpression null-intolerance), and a null
  * ELEMENT yields null, mirroring how `acc + null` poisons the SQL
  * aggregate. Overflow cannot occur (|w| ≤ 500 milli-units, so the sum is
  * bounded by 500·grams — astronomically inside Long).
  *
  * Equality with the declarative form is property-tested in
  * VectorExpressionsSpec; the DuckDB oracle keeps replaying the
  * declarative contract, so a drift here breaks the q133 hash.
  */
case class HashedNgramLogit(child: Expression, weights: Array[Int])
    extends UnaryExpression with ExpectsInputTypes {
  require(weights.nonEmpty, "weights must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  // A non-null array with a null element still yields null.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_ngram_logit"

  override def nullSafeEval(input: Any): Any =
    HashedNgramLogit.score(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("scorerWeights", weights, "int[]")
    val cls = classOf[HashedNgramLogit].getName
    nullSafeCodeGen(ctx, ev, x => {
      val res = ctx.freshName("logit")
      s"""
         |java.lang.Long $res = $cls.score($x, $w);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedNgramLogit {

  /** MessageDigest is stateful and not thread-safe; one per task thread
    * amortizes `getInstance` across every row of a partition. */
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 digest bytes as an unsigned big-endian int, mod D — equal to
    * `pmod(conv(substring(md5(g),1,8),16,10), D)`. */
  private def bucket(dg: Array[Byte], d: Int): Int = {
    val v = ((dg(0) & 0xFFL) << 24) | ((dg(1) & 0xFFL) << 16) |
      ((dg(2) & 0xFFL) << 8) | (dg(3) & 0xFFL)
    (v % d).toInt
  }

  /** The fold: Σ w[bucket(md5(gram))] over token unigrams then adjacent
    * bigrams (joined by a single space — streamed, never concatenated).
    * Called from generated code via the Scala static forwarder. Returns
    * null if any element is null (poisoned accumulator semantics). */
  def score(arr: ArrayData, weights: Array[Int]): java.lang.Long = {
    val n = arr.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      bytes(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val m = md5.get()
    val d = weights.length
    var acc = 0L
    i = 0
    while (i < n) {
      acc += weights(bucket(m.digest(bytes(i)), d))
      i += 1
    }
    i = 0
    while (i < n - 1) {
      m.update(bytes(i))
      m.update(' '.toByte)
      m.update(bytes(i + 1))
      acc += weights(bucket(m.digest(), d))
      i += 1
    }
    acc
  }
}

/** Column-API surface for the native scorer expression. */
object ScorerFunctions {

  /** Codegen'd hashed-n-gram logit over a TOKENS array column (grams =
    * unigrams + space-joined bigrams, matching
    * [[graft.engine.TextAnalysis.ngramGrams]]). */
  def ngramLogitNative(toks: Column, weights: Array[Int]): Column =
    ExpressionUtils.column(HashedNgramLogit(
      ExpressionUtils.expression(toks), weights))
}

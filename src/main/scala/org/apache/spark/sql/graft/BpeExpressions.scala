package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for BPE tokenizer application's hot loop
  * (q135). The declarative contract — per word, a chain of `aggregate`
  * folds (one per merge, greedy left-to-right pair fusion over the
  * character array) guarded by an `instr` prefilter — is what the DuckDB
  * oracle replays, but Spark higher-order functions are interpreted:
  * each merge level re-walks the word through lambda dispatch, allocates
  * a fresh symbol array per element via `concat(slice(...))`, and the
  * chain nests 8 deep, so every MERGING word pays O(merges · |word|)
  * interpreted array copies. This expression computes the IDENTICAL
  * per-document piece count in one compiled pass:
  *
  *   - symbols live in ONE reusable array per word, each merge level
  *     compacting it in place (write index chases read index — zero
  *     allocation per level; the merged string itself is precomputed
  *     once per merge at plan time);
  *   - the [[graft.engine.TextAnalysis.bpePieceCount]] word-level guard
  *     is kept: a word containing none of the merged-pair substrings is
  *     exactly its character count, skipping the fold entirely — same
  *     observable semantics, since a merge can only fire on a word whose
  *     original text contains a+b contiguously;
  *   - characters are code points (Spark's `split(wv, '')` / `length`
  *     semantics), so multi-byte text segments identically.
  *
  * Null behavior mirrors the SQL fold: a null tokens array yields null
  * (UnaryExpression), and a null ELEMENT yields null (the poisoned
  * `acc + null` aggregate). Equality with the declarative fold is
  * property-tested in TextSpec on the real corpus plus adversarial
  * merge-overlap words; the q135 oracle keeps replaying the declarative
  * contract, so drift here breaks its hash.
  */
case class BpePieceCount(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  require(merges.nonEmpty, "merge list must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_bpe_piece_count"

  @transient private lazy val table = BpePieceCount.MergeTable(merges)

  override def nullSafeEval(input: Any): Any =
    BpePieceCount.count(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpePieceCount.MergeTable].getName)
    val cls = classOf[BpePieceCount].getName
    nullSafeCodeGen(ctx, ev, x => {
      val res = ctx.freshName("pieces")
      s"""
         |java.lang.Long $res = $cls.count($x, $t);
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

object BpePieceCount {

  /** Plan-time-precomputed merge data: left/right symbols, the fused
    * result, and the original-text substrings for the word-level guard.
    * One object per expression instance, shipped by reference into
    * generated code. */
  final case class MergeTable(merges: Array[(String, String)]) {
    val a: Array[String] = merges.map(_._1)
    val b: Array[String] = merges.map(_._2)
    val ab: Array[String] = merges.map(m => m._1 + m._2)
  }

  /** Per-document piece count: Σ over words of the symbol count after
    * applying every merge greedily left-to-right. Called from generated
    * code via the static forwarder. */
  def count(arr: ArrayData, t: MergeTable): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var wi = 0
    var buf = new Array[String](16)
    while (wi < n) {
      if (arr.isNullAt(wi)) return null
      val w = arr.getUTF8String(wi).toString
      // guard: a word containing no merged-pair substring is its
      // character (code point) count — the overwhelming majority.
      var anyPair = false
      var mi = 0
      while (mi < t.ab.length && !anyPair) {
        if (w.contains(t.ab(mi))) anyPair = true
        mi += 1
      }
      if (!anyPair) {
        acc += w.codePointCount(0, w.length)
      } else {
        // split into code-point symbols (split('') + non-empty filter)
        val nCp = w.codePointCount(0, w.length)
        if (buf.length < nCp) buf = new Array[String](nCp)
        var len = 0
        var ci = 0
        while (ci < w.length) {
          val cp = w.codePointAt(ci)
          val cc = Character.charCount(cp)
          buf(len) = w.substring(ci, ci + cc)
          len += 1
          ci += cc
        }
        // each merge level compacts in place, greedy left-to-right
        mi = 0
        while (mi < t.a.length) {
          val ma = t.a(mi); val mb = t.b(mi); val mab = t.ab(mi)
          var widx = 0
          var ridx = 0
          while (ridx < len) {
            val s = buf(ridx)
            // the accumulator's LAST symbol (possibly itself a fresh
            // merge result) is what the pair's left side compares to —
            // exactly the SQL fold's element_at(acc, -1)
            if (widx > 0 && buf(widx - 1) == ma && s == mb) {
              buf(widx - 1) = mab
            } else {
              buf(widx) = s
              widx += 1
            }
            ridx += 1
          }
          len = widx
          mi += 1
        }
        acc += len
      }
      wi += 1
    }
    acc
  }
}

/** Column-API surface for the native BPE expression. */
object BpeFunctions {

  /** Codegen'd BPE piece count over a TOKENS array column, applying
    * `merges` in training order with greedy left-to-right fusion —
    * matching [[graft.engine.TextAnalysis.bpePieceCount]]'s declarative
    * fold exactly. */
  def bpePieceCountNative(toks: Column,
      merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpePieceCount(
      ExpressionUtils.expression(toks), merges.toArray))
}

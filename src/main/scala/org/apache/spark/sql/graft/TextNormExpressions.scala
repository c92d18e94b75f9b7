package org.apache.spark.sql.graft

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for web-text canonicalization (q148) — the
  * unicode-normalize step of a crawl-curation pipeline (the CCNet /
  * RefinedWeb "normalize before hashing" convention): accents stripped,
  * case folded, whitespace runs collapsed, ends trimmed.
  *
  * The declarative contract — what the DuckDB oracle replays — is
  *
  *   `trim(regexp_replace(strip_accents(lower(s)), '\s+', ' ', 'g'))`
  *
  * Spark has no `strip_accents` built-in (the usual route is a Scala UDF
  * around `java.text.Normalizer`, which blocks whole-stage codegen), so
  * this expression computes the identical result natively: NFD
  * decomposition, combining-mark (`\p{Mn}`) removal, `Locale.ROOT`
  * lowercase, then an ASCII-whitespace collapse. Strip-then-lower vs
  * lower-then-strip commute for the Latin accent range (the decomposed
  * base letter lowercases to the same base the lowercased accent
  * decomposes to); `\s` is the same set in java.util.regex and RE2
  * (`[ \t\n\x0B\f\r]`). Equality against hand-computed vectors is pinned
  * in TextSpec; the cross-engine check is the q148 oracle hash.
  *
  * Scale shape: row-local, inside whole-stage codegen via a single
  * static call — no UDF boundary, no shuffle; composes with pushdown
  * like any scalar expression.
  */
case class NormalizeUtf8Text(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeUtf8Text.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NormalizeUtf8Text.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUtf8Text {

  /** NFD + strip combining marks. The ASCII fast path skips the
    * Normalizer walk entirely — on a mostly-ASCII crawl that is the hot
    * branch. */
  private val CombiningMarks = Pattern.compile("\\p{Mn}+")

  private def stripAccents(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { ascii = s.charAt(i) < 0x80; i += 1 }
    if (ascii) s
    else CombiningMarks.matcher(Normalizer.normalize(s, Normalizer.Form.NFD))
      .replaceAll("")
  }

  /** Collapse `[ \t\n\x0B\f\r]+` runs to one space and trim ends — one
    * forward pass, no regex allocation. */
  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' ||
        c == '\r'
      if (ws) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Called from generated code. */
  def normalize(in: UTF8String): UTF8String =
    UTF8String.fromString(
      collapseWs(stripAccents(in.toString.toLowerCase(Locale.ROOT))))
}

/** Column-API surface for the native normalizer. */
object TextNormFunctions {
  def normalizeText(c: Column): Column =
    ExpressionUtils.column(NormalizeUtf8Text(ExpressionUtils.expression(c)))
}

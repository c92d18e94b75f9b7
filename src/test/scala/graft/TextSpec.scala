package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Expression}
import graft.engine._

/** Winnowing fingerprint assertions: value-level against an independent
  * Scala reference implementation, and PLAN-level against the nested-HOF
  * shape that hung the round-7 bench (grams re-evaluated per window —
  * O(n²) interpreted evals). The plan test is the regression gate: if
  * CollapseProject ever learns to inline the staged gram array back into
  * the minima lambda, it fails before the bench does. */
class TextSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Reference winnowing: same normalization, same binary-order minima.
    * ASCII-only inputs so Java String order == UTF-8 binary order. */
  private def winnowRef(text: String, k: Int, w: Int): Set[String] = {
    val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val grams = (0 to norm.length - k).map(i => norm.substring(i, i + k))
    (0 to grams.length - w).map(j => grams.slice(j, j + w).min).toSet
  }

  private val docs = Seq(
    (1L, "The quick  brown fox Jumps over the lazy dog near the river bank"),
    (2L, "abcdefghijklmnopqrstuvwxyz0123456789 abcdefghijklmnopqrstuvwxyz"),
    (3L, "to be or not to be that is the question whether tis nobler"))

  test("winnowStaged matches the reference implementation") {
    val out = TextAnalysis
      .winnowStaged(docs.toDF("doc_id", "text"), col("text"), 8, 4, "fps")
      .select(col("doc_id"), col("fps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .toMap
    docs.foreach { case (id, text) =>
      assert(out(id) == winnowRef(text, 8, 4), s"doc $id")
    }
  }

  test("winnowStaged guarantee: shared substrings of length ≥ k+w-1 share a fingerprint") {
    val shared = "common shared fragment of respectable length here"
    val a = s"left prefix junk $shared and an unrelated tail xyz"
    val b = s"totally different opening words $shared closing remarks"
    assert((winnowRef(a, 8, 4) & winnowRef(b, 8, 4)).nonEmpty)
    val out = TextAnalysis
      .winnowStaged(Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
        col("text"), 8, 4, "fps")
      .select(col("fps")).collect().map(_.getSeq[String](0).toSet)
    assert((out(0) & out(1)).nonEmpty)
  }

  test("optimized plan keeps grams staged — no ArrayTransform nested in the minima lambda") {
    val df = TextAnalysis
      .winnowStaged(docs.toDF("doc_id", "text"), col("text"), 8, 4, "fps")
      .select(col("doc_id"), size(col("fps")).as("n_fp"))
    def hasNestedTransform(e: Expression): Boolean = e match {
      case ArrayTransform(_, fn) =>
        fn.exists(_.isInstanceOf[ArrayTransform]) ||
          fn.children.exists(hasNestedTransform)
      case other => other.children.exists(hasNestedTransform)
    }
    val nested = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.exists(hasNestedTransform)
    }.exists(identity)
    assert(!nested,
      "gram transform was inlined into the window-minima lambda — " +
        "O(n²) re-evaluation (the round-7 bench killer)")
  }
}

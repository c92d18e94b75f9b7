package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Expectations._

/** Closed-form rule semantics the q167 oracle exercises only at corpus
  * scale: 3-valued-logic null handling per rule class, the excess-rows
  * uniqueness arithmetic, and id validation.
  */
class ExpectationsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def viol(df: org.apache.spark.sql.DataFrame, r: Rule): Long =
    check(df, Seq(r)).head().getLong(3)

  test("nulls violate range/set/regex claims but only NotNull reports " +
      "presence") {
    val df = Seq[(java.lang.Double, String)]((1.0, "A"), (null, null),
      (60.0, "X")).toDF("x", "f")
    assert(viol(df, NotNull("r", "x")) == 1) // just the null
    assert(viol(df, InRange("r", "x", 0, 50)) == 2) // null AND 60
    assert(viol(df, OneOf("r", "f", Seq("A", "B"))) == 2) // null AND X
    assert(viol(df, MatchesRegex("r", "f", "^[AB]$")) == 2)
  }

  test("unique counts rows in excess of one per key, ignores null keys") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    // key 1 has 3 rows → 2 excess; nulls don't collide
    assert(viol(df, Unique("r", "k")) == 2)
    assert(viol(Seq(1L, 2L, 3L).toDF("k"), Unique("r", "k")) == 0)
  }

  test("ref integrity counts orphans, passes on full coverage, ignores " +
      "null foreign keys") {
    val dim = () => Seq(10L, 20L).toDF("id")
    val fact = Seq(Some(10L), Some(20L), Some(30L), None).toDF("fk")
    assert(viol(fact, RefIntegrity("r", "fk", dim, "id")) == 1) // 30
    val covered = Seq(Some(10L), None).toDF("fk")
    assert(viol(covered, RefIntegrity("r", "fk", dim, "id")) == 0)
  }

  test("one report row per rule, ordered by id, passed = zero violations") {
    val df = Seq((1.0, "A"), (2.0, "B")).toDF("x", "f")
    val rows = check(df, Seq(
      InRange("b_range", "x", 0, 10), NotNull("a_null", "x"),
      Unique("c_uni", "f"))).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("a_null", "b_range", "c_uni"))
    assert(rows.forall(_.getBoolean(4)))
    intercept[IllegalArgumentException] {
      check(df, Seq(NotNull("dup", "x"), NotNull("dup", "f")))
    }
    intercept[IllegalArgumentException] { check(df, Seq.empty) }
  }
}

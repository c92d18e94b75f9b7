package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** CDC-merge resolution rules on a fixture exercising every branch, and
  * blocked fuzzy matching's tie order, blocking recall, and miss
  * surfacing. */
class CdcErSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("Cdc.merge applies every resolution rule") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val ch = Seq(
      (2L, Some(25L), 1, "U"), (2L, Some(28L), 2, "U"), // superseded U
      (3L, Option.empty[Long], 1, "D"), // delete base row
      (4L, Some(40L), 1, "I"), // plain insert
      (5L, Some(50L), 1, "U"), // update of unknown key → dropped
      (6L, Some(60L), 1, "I"), (6L, Some(65L), 2, "U"), // upd-after-ins
      (7L, Some(70L), 1, "I"), (7L, Option.empty[Long], 2, "D") // ins+del
    ).toDF("k", "v", "seq", "op")
    val got = Cdc.merge(base, ch, "k", "seq", "op", Seq("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got == Map(
      1L -> ((10L, "base")),
      2L -> ((28L, "upd")),
      4L -> ((40L, "ins")),
      6L -> ((65L, "upd"))))
  }

  test("Cdc.merge result is invariant under input partitioning") {
    val base = spark.range(0, 200)
      .select(col("id").as("k"), (col("id") * 10).as("v"))
    val ch = spark.range(0, 200).filter(col("id") % 3 === 0)
      .select(col("id").as("k"), (col("id") * 100).as("v"),
        lit(1).as("seq"), lit("U").as("op"))
    def run(parts: Int) =
      Cdc.merge(base.repartition(parts), ch.repartition(parts + 1),
          "k", "seq", "op", Seq("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
    assert(run(1) == run(11))
  }

  test("fuzzyMatch: best match by (distance, id), ties to smallest id") {
    val e = Seq((1L, "alpha beta"), (2L, "alpha bets"), (3L, "gamma delta"))
      .toDF("eid", "name")
    val q = Seq((10L, "alpha bet"), (11L, "Alpha beta"), (12L, "zzzz"),
      (13L, "gamma delt")).toDF("qid", "qname")
    val got = EntityResolution
      .fuzzyMatch(q, e, "qid", "qname", "eid", "name", 2, 4)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(got(10L).contains((1L, 1L)), "tie at d=1 → smallest entity id")
    assert(got(11L).contains((1L, 1L)), "case corruption within block")
    assert(got(12L).isEmpty, "no candidate block → unmatched, surfaced")
    assert(got(13L).contains((3L, 1L)))
  }

  test("fuzzyMatch blocking contract: first-block corruption is missed") {
    val e = Seq((1L, "alpha beta")).toDF("eid", "name")
    val q = Seq((10L, "Xlpha beta")).toDF("qid", "qname") // d=1 but blocked
    val got = EntityResolution
      .fuzzyMatch(q, e, "qid", "qname", "eid", "name", 2, 4)
      .collect()
    assert(got.length == 1 && got.head.isNullAt(1),
      "documented recall trade: corruption inside the block key misses")
  }

  test("url helpers parse host, tld, and strip queries") {
    val row = Seq("https://sub.example.org/p/9?utm=x&y=1").toDF("u")
      .select(WebText.urlHost(col("u")),
        WebText.urlTld(WebText.urlHost(col("u"))),
        WebText.urlStripQuery(col("u")))
      .collect().head
    assert(row.getString(0) == "sub.example.org")
    assert(row.getString(1) == "org")
    assert(row.getString(2) == "https://sub.example.org/p/9")
  }
}

package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._

class WarcSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def mkRecord(wtype: String, uri: Option[String], id: String,
      payload: String): String = {
    val uriLine = uri.map(u => s"WARC-Target-URI: $u\r\n").getOrElse("")
    val len = payload.getBytes(UTF_8).length
    s"WARC/1.0\r\nWARC-Type: $wtype\r\n$uriLine" +
      s"WARC-Record-ID: <urn:graft:$id>\r\nContent-Length: $len\r\n\r\n" +
      payload + "\r\n\r\n"
  }

  test("walk honors Content-Length: payloads containing WARC/1.0 do not split") {
    val evil = "body with an embedded\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n head"
    val bytes = (mkRecord("warcinfo", None, "f", "isPartOf: x") +
      mkRecord("response", Some("https://a/1"), "1", evil) +
      mkRecord("response", Some("https://a/2"), "2", "plain")).getBytes(UTF_8)
    val recs = Warc.walk(7L, bytes).toList
    assert(recs.map(_.warc_type) == List("warcinfo", "response", "response"))
    assert(recs.map(_.rec_idx) == List(0, 1, 2))
    assert(new String(recs(1).payload, UTF_8) == evil)
    assert(recs(1).target_uri.contains("https://a/1"))
    assert(recs(2).content_length == 5L)
  }

  test("walk counts bytes, not chars, for multibyte payloads") {
    val zh = "中文内容 with ascii"
    val bytes = mkRecord("response", Some("https://a/zh"), "z", zh)
      .getBytes(UTF_8)
    val recs = Warc.walk(0L, bytes).toList
    assert(recs.size == 1)
    assert(recs.head.content_length == zh.getBytes(UTF_8).length.toLong)
    assert(new String(recs.head.payload, UTF_8) == zh)
  }

  test("corrupt framing stops the walk without scanning past a lying length") {
    val good = mkRecord("response", Some("https://a/1"), "1", "ok")
    // Content-Length far past EOF
    val lying = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999999\r\n\r\nshort\r\n\r\n"
    val recs = Warc.walk(0L, (good + lying + good).getBytes(UTF_8)).toList
    assert(recs.size == 1) // first record parsed, walk stopped at the liar
    // garbage version line → nothing
    assert(Warc.walk(0L, "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)).isEmpty)
    // truncated header block → nothing, no exception
    assert(Warc.walk(0L, "WARC/1.0\r\nWARC-Type: res".getBytes(UTF_8)).isEmpty)
  }

  test("foreign segment names get a stable md5 id instead of failing") {
    val a = Warc.fileIdOf("/drop/CC-MAIN-2026-33-00042.warc.gz")
    val b = Warc.fileIdOf("/elsewhere/CC-MAIN-2026-33-00042.warc.gz")
    val c = Warc.fileIdOf("/drop/CC-MAIN-2026-33-00043.warc.gz")
    assert(a == b, "id must depend on the NAME only, not the directory")
    assert(a != c && a >= 0L && c >= 0L)
    assert(Warc.fileIdOf("/drop/crawl-7.warc") == 7L)
    assert(Warc.fileIdOf("/drop/crawl-x.warc") >= 0L,
      "digitless crawl- name must fall back, not throw")
  }

  test("gzip tier: a gzipped file parses identically to its plain twin") {
    val dir = s"${Sessions.scratchRoot}/warcspec_crawl"
    Warc.stageCrawl(spark, Tables.table(spark, sf, "documents"), dir,
      nFiles = 4)
    val files = new java.io.File(dir).list().sorted.toSeq
    assert(files.count(_.endsWith(".warc.gz")) == 2)
    assert(files.count(_.endsWith(".warc")) == 2)
    val recs = Warc.records(spark, dir)
    // every doc comes back exactly once, through either tier
    val docs = Tables.table(spark, sf, "documents")
    val nDocs = docs.count()
    val resp = recs.filter(col("warc_type") === "response")
    assert(resp.count() == nDocs)
    assert(recs.filter(col("warc_type") === "warcinfo").count() == 4)
    // payload bytes survive byte-exact through both tiers: md5 of the
    // parsed payload equals md5 of the source text (+ planted suffix)
    val expected = docs.select(
      md5(concat(col("text"),
        when(col("doc_id") % 11 === 0, lit(Warc.AdversarialSuffix))
          .otherwise(lit(""))).cast("binary")).as("h"))
    val got = resp.select(md5(col("payload")).as("h"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("records plan: one binaryFile scan, no shuffle") {
    val dir = s"${Sessions.scratchRoot}/warcspec_crawl"
    val plan = Warc.records(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}

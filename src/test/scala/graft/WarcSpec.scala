package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SyntheticWeb, Warc}

/** WARC source/sink: a hand-written WARC-1.0 fixture parses to the right
  * records, non-response records are skipped, truncated tails do not throw,
  * and write → read round-trips the synthetic corpus byte-identically.
  */
class WarcSpec extends AnyFunSuite with SparkTestSession {

  private val CRLF = "\r\n"

  private def record(typ: String, uri: String, payload: String, extra: String = ""): String = {
    val p = payload.getBytes(StandardCharsets.UTF_8)
    s"WARC/1.0${CRLF}WARC-Type: $typ${CRLF}WARC-Target-URI: $uri$CRLF" +
      s"WARC-Date: 2024-03-01T12:00:00Z$CRLF$extra" +
      s"Content-Length: ${p.length}$CRLF$CRLF$payload$CRLF$CRLF"
  }

  test("hand-written fixture: response records parse, others are skipped") {
    val http = s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html$CRLF$CRLF<html>hi</html>"
    val warc =
      record("warcinfo", "ignored:war", "software: test") +
        record("response", "http://a.ex/p1", http) +
        record("request", "http://a.ex/p1", s"GET /p1 HTTP/1.1$CRLF$CRLF") +
        record("response", "http://b.ex/p2", "<bare-body/>")
    val recs = Warc.records(warc.getBytes(StandardCharsets.UTF_8)).toSeq
    assert(recs.map(_.recordType) == Seq("warcinfo", "response", "request", "response"))
    val responses = recs.filter(_.recordType == "response")
    assert(responses.map(_.targetUri.get) == Seq("http://a.ex/p1", "http://b.ex/p2"))
    assert(new String(Warc.httpBody(responses.head.payload), StandardCharsets.UTF_8)
      == "<html>hi</html>")
    // payload without HTTP headers comes back whole
    assert(new String(Warc.httpBody(responses(1).payload), StandardCharsets.UTF_8)
      == "<bare-body/>")
    assert(responses.head.date.get.toInstant.toString == "2024-03-01T12:00:00Z")
  }

  test("truncated tail ends iteration instead of throwing") {
    val good = record("response", "http://a.ex/p", "<x/>")
    val truncated = good + s"WARC/1.0${CRLF}WARC-Type: response${CRLF}Content-Length: 999$CRLF$CRLF<cut"
    val recs = Warc.records(truncated.getBytes(StandardCharsets.UTF_8)).toSeq
    assert(recs.length == 1 && recs.head.targetUri.contains("http://a.ex/p"))
    // garbage-only input yields no records
    assert(Warc.records("not a warc at all".getBytes).isEmpty)
    assert(Warc.records(Array.emptyByteArray).isEmpty)
  }

  test("write -> read round-trips the synthetic corpus byte-identically") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_warc_").toString
    val pages = SyntheticWeb.pages(
      spark, SyntheticWeb.WebConfig(seed = 42L, nPages = 200, nHosts = 8)).toDF()
    Warc.writePages(pages.repartition(3), dir)

    val back = Warc.readPages(spark, dir)
    assert(back.count() == 200)
    val orig = pages.select(col("url"), col("warc_ts"), xxhash64(col("html")).as("h"))
    val rt = back.toDF().select(col("url"), col("warc_ts"), xxhash64(col("html")).as("h"))
    assert(orig.except(rt).count() == 0 && rt.except(orig).count() == 0,
      "round-trip lost or altered records")

    // the read path feeds extraction exactly like fresh fetches: X1 works
    val linked = back.toDF().select(
      col("url"), graft.functions.UrlFunctions.extractLinksUdf(col("html")).as("links"))
    assert(linked.where(size(col("links")) > 0).count() > 0)
  }
}

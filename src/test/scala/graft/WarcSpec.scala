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

  test("non-2xx response records are not ingested as pages") {
    import org.apache.spark.sql.functions._
    // status-line parsing unit cases
    def st(s: String) = Warc.httpStatus(s.getBytes(StandardCharsets.UTF_8))
    assert(st(s"HTTP/1.1 200 OK$CRLF$CRLF<x/>") == 200)
    assert(st(s"HTTP/1.1 404 Not Found$CRLF$CRLF<err/>") == 404)
    assert(st(s"HTTP/1.0 301 Moved$CRLF$CRLF") == 301)
    assert(st("<bare-body/>") == 200) // no status line: nothing contradicts success
    assert(st("HTTP/1.1 xx") == -1) // malformed digits → dropped by the /100==2 filter
    assert(Warc.httpStatus(Array.emptyByteArray) == 200)

    val dir = Files.createTempDirectory("graft_warc_status_").toString
    val ok = s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html$CRLF$CRLF<html>ok</html>"
    val notFound = s"HTTP/1.1 404 Not Found$CRLF$CRLF<html>error page</html>"
    val redirect = s"HTTP/1.1 301 Moved Permanently${CRLF}Location: http://a.ex/new$CRLF$CRLF"
    val warc =
      record("response", "http://a.ex/ok", ok) +
        record("response", "http://a.ex/missing", notFound) +
        record("response", "http://a.ex/old", redirect) +
        record("response", "http://b.ex/bare", "<bare-body/>")
    Files.write(java.nio.file.Paths.get(dir, "f.warc"),
      warc.getBytes(StandardCharsets.UTF_8))
    val urls = Warc.readPages(spark, dir).toDF()
      .select(col("url")).collect().map(_.getString(0)).toSet
    assert(urls == Set("http://a.ex/ok", "http://b.ex/bare"),
      s"non-2xx records leaked into pages: $urls")
  }

  test("UTF-8 WARC-Target-URI survives header decoding") {
    val uri = "http://exämple.example/päge→1"
    val warc = record("response",
      uri, s"HTTP/1.1 200 OK$CRLF$CRLF<x/>")
    val recs = Warc.records(warc.getBytes(StandardCharsets.UTF_8)).toSeq
    assert(recs.length == 1)
    assert(recs.head.targetUri.contains(uri),
      s"mojibake'd URI: ${recs.head.targetUri}")
  }

  test("sink stages to attempt-unique tmp and publishes atomically (no orphans)") {
    val dir = Files.createTempDirectory("graft_warc_stage_").toString
    val pages = SyntheticWeb.pages(
      spark, SyntheticWeb.WebConfig(seed = 42L, nPages = 50, nHosts = 4)).toDF()
    Warc.writePages(pages.repartition(4), dir)
    val names = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString.split("/").last).sorted.toSeq
    assert(names == (0 until 4).map(i => f"part-$i%05d.warc"),
      s"unexpected sink output (tmp orphan or missing part): $names")
    // re-running over the same dir replaces the files, still no orphans
    Warc.writePages(pages.repartition(4), dir)
    val again = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString.split("/").last).sorted.toSeq
    assert(again == names)
    assert(Warc.readPages(spark, dir).count() == 50)
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

  test("crawl over WARC-ingested pages equals crawl over the original pages") {
    import org.apache.spark.sql.functions._
    import graft.model.CrawlConfig
    import graft.plans.{Crawler, CrawlRound}
    import graft.sources.StateTable
    val web = SyntheticWeb.WebConfig(seed = 42L, nPages = 400, nHosts = 12)
    val cfg = CrawlConfig(buckets = 16, roundBudget = 60, maxDepth = 10)
    val pages = SyntheticWeb.pages(spark, web).toDF().cache()
    val robots = SyntheticWeb.robotsTable(spark, web)
    val seeds = SyntheticWeb.seeds(web, 5)

    val warcDir = Files.createTempDirectory("graft_warc_crawl_").toString
    Warc.writePages(pages, warcDir)
    val ingested = Warc.readPages(spark, warcDir).toDF().cache()

    val d1 = Files.createTempDirectory("graft_crawl_orig_").toString
    val d2 = Files.createTempDirectory("graft_crawl_warc_").toString
    val c1 = Crawler.crawl(spark, d1, pages, robots, seeds, cfg, 3)
    val c2 = Crawler.crawl(spark, d2, ingested, robots, seeds, cfg, 3)
    assert(c1.map(r => (r.admitted, r.fetched200, r.newUrls)) ==
      c2.map(r => (r.admitted, r.fetched200, r.newUrls)), "per-round counters diverge")

    val f1 = CrawlRound.readFrontier(spark, d1).select("surt", "depth", "score")
    val f2 = CrawlRound.readFrontier(spark, d2).select("surt", "depth", "score")
    assert(f1.except(f2).count() == 0 && f2.except(f1).count() == 0,
      "frontiers diverge between original and WARC-ingested pages")
    assert(f1.count() > 0, "trivially-empty comparison")
  }

  test("gzip archives stream through, including multi-member (Common Crawl layout)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_warc_gz_").toString
    val pages = SyntheticWeb.pages(
      spark, SyntheticWeb.WebConfig(seed = 42L, nPages = 60, nHosts = 6)).toDF()
    Warc.writePages(pages.repartition(2), dir)

    // whole-file single-member gzip for part 0; per-record MEMBERS for part 1
    // (each record compressed separately, members concatenated — the CC shape)
    val parts = Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString).sorted
    def gz(bytes: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(bytes); g.close(); bo.toByteArray
    }
    val whole = Files.readAllBytes(java.nio.file.Paths.get(parts(0)))
    Files.write(java.nio.file.Paths.get(parts(0) + ".gz"), gz(whole))
    val members = Warc.records(Files.readAllBytes(java.nio.file.Paths.get(parts(1)))).map { r =>
      val hdr = (s"WARC/1.1${CRLF}WARC-Type: ${r.recordType}$CRLF" +
        s"WARC-Target-URI: ${r.targetUri.get}$CRLF" +
        s"WARC-Date: ${r.headers("warc-date")}$CRLF" +
        s"Content-Length: ${r.payload.length}$CRLF$CRLF").getBytes(StandardCharsets.UTF_8)
      gz(hdr ++ r.payload ++ s"$CRLF$CRLF".getBytes)
    }.reduce(_ ++ _)
    Files.write(java.nio.file.Paths.get(parts(1) + ".gz"), members)
    parts.foreach(p => Files.delete(java.nio.file.Paths.get(p))) // only .gz remain

    val back = Warc.readPages(spark, dir).toDF()
    assert(back.count() == 60)
    val orig = pages.select(col("url"), xxhash64(col("html")).as("h"))
    val rt = back.select(col("url"), xxhash64(col("html")).as("h"))
    assert(orig.except(rt).count() == 0 && rt.except(orig).count() == 0,
      "gz round-trip lost or altered records")
  }
}

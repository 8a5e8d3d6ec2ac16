package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sitemaps

/** Sitemap seed source: urlset and sitemapindex docs parse, XML entities
  * unescape, malformed input degrades instead of throwing, gz payloads
  * stream, and readSeeds feeds the crawl's seed shape end-to-end.
  */
class SitemapsSpec extends AnyFunSuite with SparkTestSession {

  test("urlset: locs in order, entities unescaped, extra elements ignored") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>http://a.ex/p?x=1&amp;y=2</loc><lastmod>2024-01-01</lastmod></url>
        |  <url><loc> http://a.ex/q </loc><priority>0.8</priority></url>
        |  <url><changefreq>daily</changefreq></url>
        |</urlset>""".stripMargin
    val doc = Sitemaps.parse(xml.getBytes(StandardCharsets.UTF_8))
    assert(doc.urls == Seq("http://a.ex/p?x=1&y=2", "http://a.ex/q"))
    assert(doc.sitemaps.isEmpty)
  }

  test("sitemapindex: child references, no page urls") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>http://a.ex/sitemap1.xml.gz</loc></sitemap>
        |  <sitemap><loc>http://a.ex/sitemap2.xml.gz</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val doc = Sitemaps.parse(xml.getBytes(StandardCharsets.UTF_8))
    assert(doc.urls.isEmpty)
    assert(doc.sitemaps == Seq("http://a.ex/sitemap1.xml.gz", "http://a.ex/sitemap2.xml.gz"))
  }

  test("malformed / empty / corrupt-gz input degrades to empty, never throws") {
    assert(Sitemaps.parse("not xml at all".getBytes).urls.isEmpty)
    assert(Sitemaps.parse("<urlset><url><loc>http://x/".getBytes).urls.isEmpty)
    assert(Sitemaps.parse(Array.emptyByteArray).urls.isEmpty)
    assert(Sitemaps.parse(null).urls.isEmpty)
    assert(Sitemaps.parse(Array(0x1f.toByte, 0x8b.toByte, 0x00)).urls.isEmpty)
    // unterminated FINAL url element still yields its loc (truncated tail)
    val t = Sitemaps.parse("<urlset><url><loc>http://x/a</loc>".getBytes)
    assert(t.urls == Seq("http://x/a"))
  }

  test("CDATA-wrapped locs unwrap to the literal URL (no entity decode inside)") {
    val xml =
      """<urlset>
        |  <url><loc><![CDATA[http://a.ex/p?x=1&y=2]]></loc></url>
        |  <url><loc> <![CDATA[ http://a.ex/q ]]> </loc></url>
        |  <url><loc>http://a.ex/plain&amp;esc</loc></url>
        |</urlset>""".stripMargin
    val doc = Sitemaps.parse(xml.getBytes(StandardCharsets.UTF_8))
    // CDATA content is literal (the raw & stays raw, nothing double-decodes);
    // non-CDATA locs still entity-unescape
    assert(doc.urls == Seq("http://a.ex/p?x=1&y=2", "http://a.ex/q", "http://a.ex/plain&esc"))
    // sitemapindex CDATA too
    val idx = Sitemaps.parse(
      "<sitemapindex><sitemap><loc><![CDATA[http://a.ex/s1.xml]]></loc></sitemap></sitemapindex>"
        .getBytes(StandardCharsets.UTF_8))
    assert(idx.sitemaps == Seq("http://a.ex/s1.xml"))
  }

  test("protocol-scale sitemap streams through (50k URLs, multi-MB document)") {
    // ~6 MB uncompressed: the streaming scanner holds at most one <loc> at a
    // time — this also pins order and completeness at the 50k protocol cap
    val n = 50000
    val bo = new java.io.ByteArrayOutputStream(8 << 20)
    val w = new java.io.OutputStreamWriter(bo, StandardCharsets.UTF_8)
    w.write("""<?xml version="1.0" encoding="UTF-8"?><urlset>""")
    (1 to n).foreach { i =>
      w.write(s"<url><loc>http://big.ex/deep/path/segment/p$i</loc>" +
        s"<lastmod>2024-01-01</lastmod><priority>0.5</priority></url>")
    }
    w.write("</urlset>"); w.flush()
    val bytes = bo.toByteArray
    assert(bytes.length > (4 << 20), s"fixture too small: ${bytes.length}")
    val doc = Sitemaps.parseStream(new java.io.ByteArrayInputStream(bytes))
    assert(doc.urls.length == n)
    assert(doc.urls.head == "http://big.ex/deep/path/segment/p1")
    assert(doc.urls.last == s"http://big.ex/deep/path/segment/p$n")
    // and gz'd: same result through the same streaming path
    val gzo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(gzo)
    g.write(bytes); g.close()
    val gzDoc = Sitemaps.parseStream(new java.io.ByteArrayInputStream(gzo.toByteArray))
    assert(gzDoc.urls == doc.urls)
  }

  test("property: randomized rendering round-trips the injected URL list exactly") {
    // deterministic seeded generator: urls containing escape-worthy chars,
    // rendered with randomized formatting (CDATA vs entity-escaped, tag
    // attributes, interleaved unknown elements, whitespace) must come back
    // exactly, in order
    val rnd = new scala.util.Random(20260817L)
    def randUrl(i: Int): String = {
      val host = s"h${rnd.nextInt(50)}.example"
      val q = rnd.nextInt(4) match {
        case 0 => ""
        case 1 => s"?a=$i&b=${rnd.nextInt(100)}"
        case 2 => s"?q=${"x" * (1 + rnd.nextInt(5))}&amp;literal=${rnd.nextInt(9)}"
        case _ => s"?t='${rnd.nextInt(9)}'"
      }
      s"http://$host/p$i$q"
    }
    (0 until 20).foreach { trial =>
      val urls = (0 until (1 + rnd.nextInt(30))).map(randUrl)
      val sb = new StringBuilder("""<?xml version="1.0" encoding="UTF-8"?>""")
      sb.append("\n<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      urls.foreach { u =>
        val attr = if (rnd.nextBoolean()) " data-x=\"1\"" else ""
        val pad = " " * rnd.nextInt(4)
        val loc =
          if (rnd.nextBoolean()) s"<![CDATA[$u]]>"
          else u.replace("&", "&amp;").replace("'", "&apos;")
        sb.append(s"$pad<url$attr>")
        if (rnd.nextBoolean()) sb.append(s"<lastmod>2024-0${1 + rnd.nextInt(9)}-01</lastmod>")
        sb.append(s"<loc>$pad$loc$pad</loc>")
        if (rnd.nextBoolean()) sb.append("<priority>0.5</priority>")
        sb.append("</url>\n")
      }
      sb.append("</urlset>\n")
      val got = Sitemaps.parse(sb.toString.getBytes(StandardCharsets.UTF_8)).urls
      // note: a non-CDATA url containing the literal text "&amp;" renders as
      // "&amp;amp;" and must decode back to the literal "&amp;" — the escape
      // round-trip is part of what this pins
      assert(got == urls, s"trial $trial:\n got=$got\nwant=$urls")
    }
  }

  test("gz sitemap parses identically; readSeeds reads a directory of both") {
    val xml = (1 to 20).map(i => s"<url><loc>http://s.ex/p$i</loc></url>")
      .mkString("<urlset>", "", "</urlset>")
    val dir = Files.createTempDirectory("graft_sitemaps_").toString
    Files.write(java.nio.file.Paths.get(s"$dir/a.xml"), xml.getBytes(StandardCharsets.UTF_8))
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write((1 to 5).map(i => s"<url><loc>http://t.ex/q$i</loc></url>")
      .mkString("<urlset>", "", "</urlset>").getBytes(StandardCharsets.UTF_8))
    g.close()
    Files.write(java.nio.file.Paths.get(s"$dir/b.xml.gz"), bo.toByteArray)

    val seeds = Sitemaps.readSeeds(spark, dir).collect().sorted
    assert(seeds.length == 25)
    assert(seeds.count(_.startsWith("http://s.ex/")) == 20)
    assert(seeds.count(_.startsWith("http://t.ex/")) == 5)
  }
}

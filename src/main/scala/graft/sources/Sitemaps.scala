package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

/** XML sitemap (sitemaps.org protocol) seed source: `<urlset>` page URLs and
  * `<sitemapindex>` child-sitemap references, parsed with a plain scan for
  * `<loc>` elements — no XML library, total on malformed input (bad docs
  * yield fewer URLs, never throw). `.gz` payloads are detected by magic
  * bytes (sitemap.xml.gz is standard).
  *
  * The protocol caps one sitemap at 50k URLs / 50 MB uncompressed; the
  * parser reads whatever is present and leaves enforcement to the caller —
  * a crawl that honors the cap drops the tail, it does not fail the fetch.
  */
object Sitemaps {

  /** Parsed sitemap: page URLs (`<urlset>`) and child sitemap locations
    * (`<sitemapindex>`) — a doc is usually one or the other, but both are
    * collected so a malformed hybrid still contributes.
    */
  final case class SitemapDoc(urls: Seq[String], sitemaps: Seq[String])

  private def unescape(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")

  /** All `<loc>` values found under the given parent element name
    * (`url` or `sitemap`), in document order.
    */
  private def locsUnder(xml: String, parent: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val open = s"<$parent"
    // next `<parent` occurrence that is a whole tag name (`<url>`/`<url ` —
    // not the `<urlset` prefix)
    def nextOpen(from: Int): Int = {
      var i = xml.indexOf(open, from)
      while (i >= 0) {
        val after = i + open.length
        if (after >= xml.length) return -1
        val c = xml.charAt(after)
        if (c == '>' || c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '/') return i
        i = xml.indexOf(open, i + 1)
      }
      -1
    }
    var i = nextOpen(0)
    while (i >= 0) {
      val close = xml.indexOf(s"</$parent>", i)
      val scope = if (close > i) xml.substring(i, close) else xml.substring(i)
      val l0 = scope.indexOf("<loc>")
      if (l0 >= 0) {
        val l1 = scope.indexOf("</loc>", l0)
        if (l1 > l0) out += unescape(scope.substring(l0 + 5, l1).trim)
      }
      i = nextOpen(if (close > i) close else i + open.length)
    }
    out.result()
  }

  def parse(bytes: Array[Byte]): SitemapDoc = {
    if (bytes == null || bytes.isEmpty) return SitemapDoc(Nil, Nil)
    val raw =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
        try {
          val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
          try in.readAllBytes() finally in.close()
        } catch { case _: java.io.IOException => return SitemapDoc(Nil, Nil) }
      } else bytes
    val xml = new String(raw, StandardCharsets.UTF_8)
    SitemapDoc(locsUnder(xml, "url"), locsUnder(xml, "sitemap"))
  }

  /** Read every `*.xml` / `*.xml.gz` sitemap under `path` and return the
    * page URLs — the seed set for [[graft.plans.SeedInjector]]. Child
    * `<sitemapindex>` references are NOT fetched (this engine does no
    * network IO); callers resolve them by downloading the children next to
    * the parents before reading.
    */
  def readSeeds(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(
      spark.sparkContext.binaryFiles(s"$path/*.xml*")
        .flatMap { case (_, pds) => parse(pds.toArray()).urls })
  }
}

package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

/** XML sitemap (sitemaps.org protocol) seed source: `<urlset>` page URLs and
  * `<sitemapindex>` child-sitemap references, parsed with a STREAMING scan
  * for `<loc>` elements — no XML library, total on malformed input (bad docs
  * yield fewer URLs, never throw). `.gz` payloads are detected by magic
  * bytes (sitemap.xml.gz is standard).
  *
  * The protocol caps one sitemap at 50k URLs / 50 MB uncompressed; the
  * parser reads whatever is present and leaves enforcement to the caller —
  * a crawl that honors the cap drops the tail, it does not fail the fetch.
  *
  * Scale note: the scanner is a single forward pass over an InputStream —
  * at most one `<loc>` value (bounded at [[Sitemaps.maxLocChars]]) is
  * buffered at a time, so a protocol-max 50 MB sitemap parses under a small
  * constant memory bound (the same lazy-stream discipline as the WARC
  * reader, [[Warc.records]]).
  */
object Sitemaps {

  /** Parsed sitemap: page URLs (`<urlset>`) and child sitemap locations
    * (`<sitemapindex>`) — a doc is usually one or the other, but both are
    * collected so a malformed hybrid still contributes.
    */
  final case class SitemapDoc(urls: Seq[String], sitemaps: Seq[String])

  /** Upper bound on one `<loc>` value (protocol URLs cap at 2048 chars;
    * headroom for CDATA wrappers and entity forms). Content past the bound
    * marks the element malformed and it is dropped — total, never thrown.
    */
  val maxLocChars: Int = 65536

  private def unescape(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")

  /** Finalize a captured `<loc>` text: trim, then either strip a CDATA
    * wrapper (whose content is literal per XML — no entity decode) or
    * unescape the five predefined entities.
    */
  private def locValue(raw: String): String = {
    val t = raw.trim
    if (t.startsWith("<![CDATA[") && t.endsWith("]]>"))
      t.substring("<![CDATA[".length, t.length - "]]>".length).trim
    else unescape(t)
  }

  /** Streaming parse of one sitemap document. Gzip is detected by magic
    * bytes and inflated on the fly. One forward pass; constant memory (see
    * class doc). IO errors and malformed bytes end the scan with whatever
    * was collected so far — total on malformed, like the WARC reader's
    * truncated-tail tolerance.
    */
  def parseStream(raw: java.io.InputStream): SitemapDoc = {
    val urls = Seq.newBuilder[String]
    val maps = Seq.newBuilder[String]
    // the parse consumes the stream whole, so this function owns it: close
    // in a finally (closing the gzip wrapper also ends its Inflater). The
    // normal-EOF path leaks a file handle per sitemap otherwise — an
    // executor reading tens of thousands of sitemaps would exhaust ulimit.
    var toClose: java.io.InputStream = raw
    try {
      val buf = new java.io.BufferedInputStream(raw, 64 * 1024)
      toClose = buf
      buf.mark(2)
      val m0 = buf.read(); val m1 = buf.read()
      buf.reset()
      val in: java.io.InputStream =
        if (m0 == 0x1f && m1 == 0x8b) new java.util.zip.GZIPInputStream(buf, 64 * 1024)
        else buf
      toClose = in
      val r = new java.io.InputStreamReader(in, StandardCharsets.UTF_8)

      // mode: 0 = outside any parent, 1 = inside <url>, 2 = inside <sitemap>;
      // only the FIRST <loc> of a parent is captured (captured flag)
      var mode = 0
      var captured = false
      var c = r.read()
      while (c >= 0) {
        if (c != '<') { c = r.read() }
        else {
          // read the tag name up to '>', whitespace, or a sane length bound
          val name = new java.lang.StringBuilder(16)
          c = r.read()
          while (c >= 0 && c != '>' && !Character.isWhitespace(c) && name.length < 24) {
            name.append(c.toChar); c = r.read()
          }
          while (c >= 0 && c != '>') c = r.read() // skip attributes
          if (c == '>') c = r.read()
          name.toString match {
            // a whole tag name only: `<urlset` reads as name "urlset" ≠ "url"
            case "url" => mode = 1; captured = false
            case "sitemap" => mode = 2; captured = false
            case "/url" | "/sitemap" => mode = 0
            case "loc" if mode != 0 && !captured =>
              // capture text until the matching </loc>; inner markup (CDATA
              // sections included — they start with '<') is buffered verbatim
              val sb = new java.lang.StringBuilder(256)
              var state = mode // remember whose loc this is
              var done = false
              var dropped = false
              while (!done && !dropped && c >= 0 && sb.length < maxLocChars) {
                if (c != '<') { sb.append(c.toChar); c = r.read() }
                else {
                  val tok = new java.lang.StringBuilder(16)
                  c = r.read()
                  while (c >= 0 && c != '>' && tok.length < maxLocChars) {
                    tok.append(c.toChar); c = r.read()
                  }
                  if (tok.toString == "/loc") { done = true; if (c == '>') c = r.read() }
                  else if (c < 0) dropped = true // EOF inside markup: no </loc>
                  else { sb.append('<').append(tok).append('>'); c = r.read() }
                }
              }
              if (done) {
                val v = locValue(sb.toString)
                if (state == 1) urls += v else maps += v
                captured = true
              }
              // unterminated loc (EOF or over-bound): dropped — total behavior
            case _ => () // unknown elements (lastmod, priority, …) ignored
          }
        }
      }
    } catch { case _: java.io.IOException => () } // corrupt gz / IO: partial result
    finally { try toClose.close() catch { case _: java.io.IOException => () } }
    SitemapDoc(urls.result(), maps.result())
  }

  /** In-memory convenience overload (tests, robots-discovered payloads). */
  def parse(bytes: Array[Byte]): SitemapDoc =
    if (bytes == null || bytes.isEmpty) SitemapDoc(Nil, Nil)
    else parseStream(new java.io.ByteArrayInputStream(bytes))

  /** Read every `*.xml` / `*.xml.gz` sitemap under `path` and return the
    * page URLs — the seed set for [[graft.plans.SeedInjector]]. Child
    * `<sitemapindex>` references are NOT fetched (this engine does no
    * network IO); callers resolve them by downloading the children next to
    * the parents before reading.
    *
    * Each file is one task streaming through [[parseStream]] — a
    * protocol-max sitemap never materializes whole.
    */
  def readSeeds(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(
      spark.sparkContext.binaryFiles(s"$path/*.xml*")
        .flatMap { case (_, pds) => parseStream(pds.open()).urls })
  }
}

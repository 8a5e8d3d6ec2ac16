package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.{Bloom64, Html}
import graft.model.Page

/** Deterministic synthetic web corpus — `[SPEC-F1]` (FIXTURES.md §1).
  *
  * Every field of every page is a pure function of (seed, pageId) via the
  * splitmix64 finalizer (no java.util.Random, no wall clock), so regenerating
  * at any parallelism yields identical row content. The `pages` table is
  * exactly the BASELINE.json `input_hint` shape:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  *
  * Link-graph shape (FIXTURES.md §1.3): Zipf-skewed hosts (hot-host path),
  * a `.co.uk` multi-label subset (host-reverse/SURT path), 70% same-host
  * relative hrefs with dot-segments, 25% cross-host absolute, 5% deliberately
  * messy (case, default ports, utm params, %-escapes, fragments, duplicates).
  *
  * The `text` column is defined as extract_text(html) of the generated
  * markup, closing the X2∘gen ≡ identity loop by construction; independence
  * of the check comes from the test-scope oracle extractor (SURVEY.md §5.3).
  */
object SyntheticWeb {

  val EpochMs: Long = 1767225600000L // 2026-01-01T00:00:00Z

  private def h(seed: Long, pageId: Long, tag: Long): Long =
    Bloom64.mix(seed * 0x9e3779b97f4a7c15L ^ pageId * 0xc2b2ae3d27d4eb4fL ^ tag)

  /** Uniform double in [0,1) from a hash. */
  private def unit(x: Long): Double = (x >>> 11).toDouble / (1L << 53).toDouble

  /** `density` scales page weight: words per paragraph block multiply by
    * it; outlinks only DOUBLE above density 4 (frozen behavior — the link
    * count is deliberately capped so link volume does not scale 8× with
    * page size) (density 1 ≈ 1.3 KB html; 8 ≈ 10 KB — closer to the
    * Common-Crawl average the contract targets).
    */
  final case class WebConfig(
      seed: Long = 42L, nPages: Long = 1000L, nHosts: Int = 40, density: Int = 1)

  /** Host index per page via a power-skewed pick (Zipf-ish: host 0 is hot). */
  def hostIndex(cfg: WebConfig, pageId: Long): Int = {
    val u = unit(h(cfg.seed, pageId, 1L))
    math.min(cfg.nHosts - 1, (cfg.nHosts * u * u * u).toInt)
  }

  /** Every 7th host is a multi-label .co.uk-style name; rest h<k>.example. */
  def hostName(k: Int): String =
    if (k % 7 == 3) s"h$k.news.co.uk" else s"h$k.example"

  def pagePath(cfg: WebConfig, pageId: Long): String =
    s"/d${(h(cfg.seed, pageId, 2L) & 0x7fffffffL) % 7}/p$pageId.html"

  /** Canonical URL of a page — the `pages.url` join key. */
  def pageUrl(cfg: WebConfig, pageId: Long): String =
    s"http://${hostName(hostIndex(cfg, pageId))}${pagePath(cfg, pageId)}"

  private val vocab: Array[String] =
    "the quick brown fox jumps over lazy dog crawl frontier spark scala parquet snapshot bloom filter token bucket host depth score surt canonical page link anchor text corpus deterministic".split(" ")

  private def words(cfg: WebConfig, pageId: Long, tag: Long, n: Int): String = {
    val sb = new java.lang.StringBuilder(n * 6)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(((h(cfg.seed, pageId, tag + i) & Long.MaxValue) % vocab.length).toInt))
      i += 1
    }
    sb.toString
  }

  /** Raw hrefs of a page, in document order (before canonicalization). */
  def rawLinks(cfg: WebConfig, pageId: Long): Seq[String] = {
    val n = (1 + ((h(cfg.seed, pageId, 3L) & Long.MaxValue) % 19).toInt) *
      (if (cfg.density > 4) 2 else 1)
    val myHost = hostIndex(cfg, pageId)
    (0 until n).map { j =>
      val r = h(cfg.seed, pageId, 100L + j)
      val kind = unit(r)
      val target = (h(cfg.seed, pageId, 200L + j) & Long.MaxValue) % cfg.nPages
      if (kind < 0.70) {
        // same-host relative href with dot segments against this page's path
        val sameHostTarget = findOnHost(cfg, target, myHost)
        val tPath = pagePath(cfg, sameHostTarget)
        val variant = (r >>> 8) % 3
        if (variant == 0) tPath // absolute-path reference
        else if (variant == 1) s"..${tPath}" // needs dot-segment removal
        else s"./..${tPath}#frag${j}"
      } else if (kind < 0.95) {
        pageUrl(cfg, target)
      } else {
        // deliberately messy absolute URL of the same target
        val k = hostIndex(cfg, target)
        val port = if (k % 2 == 0) ":80" else ""
        val p = pagePath(cfg, target)
        s"HTTP://${hostName(k).toUpperCase}$port$p?b=2&utm_source=x&a=%41#top"
      }
    }
  }

  /** Deterministically walk forward from `start` to a page on host `k`.
    * FROZEN behavior note: the walk is capped at 64 steps, and on a miss
    * returns a page on a DIFFERENT host whose path is then rendered as a
    * same-host relative href — i.e. a link to a URL that does not exist in
    * `pages`. Under the Zipf host skew, rare hosts miss almost always, so a
    * slice of the "70% same-host" links are really deterministic 404s. The
    * corpus is frozen with this property (every oracle/bench expectation
    * pins it), and it is load-bearing: real crawls are full of dead links,
    * and these are what exercise the fetch-miss (status 404) path end to
    * end. FIXTURES.md §1.3 documents the emergent split.
    */
  private def findOnHost(cfg: WebConfig, start: Long, k: Int): Long = {
    var p = start
    var tries = 0
    while (hostIndex(cfg, p) != k && tries < 64) { p = (p + 1) % cfg.nPages; tries += 1 }
    p
  }

  /** Render the page markup: title + paragraphs + link list + decoy blocks. */
  def renderHtml(cfg: WebConfig, pageId: Long): String = {
    val title = words(cfg, pageId, 4000L, 4)
    val para1 = words(cfg, pageId, 5000L,
      (12 + ((h(cfg.seed, pageId, 5L) & Long.MaxValue) % 30).toInt) * cfg.density)
    val para2 = words(cfg, pageId, 6000L, 8 * cfg.density)
    val links = rawLinks(cfg, pageId)
    val sb = new java.lang.StringBuilder(1024)
    sb.append("<html><head><title>").append(title).append("</title>")
    sb.append("<style>body { color: #333; }</style>")
    sb.append("<script>var decoy = \"<a href='/never'>x</a>\";</script></head>\n")
    sb.append("<body>\n<p>").append(para1).append("</p>\n")
    sb.append("<p>entities &amp; more &lt;here&gt; &quot;quoted&quot;&nbsp;end</p>\n")
    sb.append("<ul>\n")
    links.zipWithIndex.foreach { case (href, j) =>
      sb.append("  <li><a href=\"").append(href.replace("&", "&amp;"))
        .append("\">").append(words(cfg, pageId, 7000L + j, 2)).append("</a></li>\n")
    }
    sb.append("</ul>\n<p>").append(para2).append("</p>\n</body></html>\n")
    sb.toString
  }

  def makePage(cfg: WebConfig, pageId: Long): Page = {
    val htmlStr = renderHtml(cfg, pageId)
    val html = htmlStr.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val text = Html.extractText(html)
    val langs = Array("en", "de", "fr", "es", "pt")
    Page(
      url = pageUrl(cfg, pageId),
      warc_ts = new Timestamp(EpochMs + (h(cfg.seed, pageId, 8L) & Long.MaxValue) % (86400L * 30 * 1000)),
      html = html,
      text = text,
      lang = langs(((h(cfg.seed, pageId, 9L) & Long.MaxValue) % langs.length).toInt))
  }

  /** Distributed generation — row content independent of parallelism. */
  def pages(spark: SparkSession, cfg: WebConfig): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, cfg.nPages).as[Long].map(id => makePage(cfg, id))
  }

  /** robots.txt sidecar table: 20% of hosts disallow /d3/; delay ∈ {0.5,1,2}. */
  def robotsTable(spark: SparkSession, cfg: WebConfig): DataFrame = {
    import spark.implicits._
    (0 until cfg.nHosts).map { k =>
      val disallow = if (k % 5 == 0) "Disallow: /d3/\n" else ""
      val delay = Array(0.5, 1.0, 2.0)(k % 3)
      (hostName(k), s"User-agent: *\n${disallow}Crawl-delay: $delay\n")
    }.toDF("host", "robots_txt")
  }

  /** Deterministic seed list: the first `n` pages' URLs, some in messy form. */
  def seeds(cfg: WebConfig, n: Int): Seq[String] =
    (0 until n).map { i =>
      val u = pageUrl(cfg, i.toLong)
      if (i % 4 == 3) u.replace("http://", "HTTP://") + "?utm_campaign=seed#frag"
      else u
    }
}

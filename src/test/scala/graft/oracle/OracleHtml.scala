package graft.oracle

import scala.util.matching.Regex

/** Independent reimplementation of [SPEC-X1]/[SPEC-X2] — regex style, zero
  * shared code with graft.functions.Html.
  */
object OracleHtml {

  private val scriptRe: Regex = "(?is)<script(?=[\\s/>])[^>]*>.*?(</script(?=[\\s>])[^>]*>|\\z)".r
  private val styleRe: Regex = "(?is)<style(?=[\\s/>])[^>]*>.*?(</style(?=[\\s>])[^>]*>|\\z)".r
  private val tagRe: Regex = "(?s)<[^>]*(>|\\z)".r

  /** Single-decode of the frozen entity set: &amp; is decoded LAST so its
    * output '&' is never rescanned (layered-replace equivalent of the
    * engine's single pass).
    */
  def entities(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&nbsp;", " ").replace("&amp;", "&")

  def collapse(s: String): String = s.replaceAll("[ \\t\\r\\n]+", " ").trim

  def stripBlocks(html: String): String =
    styleRe.replaceAllIn(scriptRe.replaceAllIn(html, ""), "")

  def text(html: String): String =
    collapse(entities(tagRe.replaceAllIn(stripBlocks(html), "")))

  def text(html: Array[Byte]): String =
    text(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  private val aOpenRe: Regex = "(?is)<a(?=[\\s/>])[^>]*>".r
  private val aCloseRe: Regex = "(?is)</a(?=[\\s>])[^>]*>".r
  private val hrefRe: Regex = "(?is)(?<![\\w\\-])href\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))".r

  final case class L(href: String, anchor: String)

  def links(html: String): Seq[L] = {
    val clean = stripBlocks(html)
    val opens = aOpenRe.findAllMatchIn(clean).toVector
    val closes = aCloseRe.findAllMatchIn(clean).map(m => (m.start, m.end)).toVector
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    opens.foreach { o =>
      val bodyStart = o.end
      val nextOpen = opens.collectFirst { case o2 if o2.start >= bodyStart => o2.start }
      val nextClose = closes.collectFirst { case (s, _) if s >= bodyStart => s }
      val bodyEnd = (nextOpen.toSeq ++ nextClose.toSeq).minOption.getOrElse(clean.length)
      hrefRe.findFirstMatchIn(o.matched).foreach { hm =>
        val rawVal = Option(hm.group(2)).orElse(Option(hm.group(3))).orElse(Option(hm.group(4))).getOrElse("")
        val href = entities(rawVal).trim
        if (rawVal.nonEmpty && href.nonEmpty && !seen.contains(href))
          seen += href -> text(clean.substring(bodyStart, bodyEnd))
      }
    }
    seen.toSeq.map { case (h, a) => L(h, a) }
  }

  def links(html: Array[Byte]): Seq[L] =
    links(new String(html, java.nio.charset.StandardCharsets.UTF_8))
}

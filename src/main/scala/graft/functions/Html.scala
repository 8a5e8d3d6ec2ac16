package graft.functions

import java.nio.charset.StandardCharsets

/** Pure HTML extraction — `[SPEC-X1]` / `[SPEC-X2]` (SURVEY.md §2.3).
  *
  * No external HTML library exists on disk, so both functions are single-pass
  * scanners over the decoded string. They are total: any byte sequence yields
  * a (possibly empty) result, never an exception.
  *
  * extractText (X2) — frozen order of operations (the byte-exactness contract
  * of BASELINE.json `input_hint`): strip <script>/<style> blocks → strip all
  * tags → decode the 5 XML entities + &nbsp; (single left-to-right pass; the
  * '&' produced by &amp; is NOT rescanned) → collapse [ \t\r\n]+ to one space
  * → trim. &nbsp; decodes to a plain space (then collapsed).
  *
  * extractLinks (X1): <a href> attributes in document order, quote-aware
  * attribute parsing, anchor text extracted with X2 semantics applied to the
  * element body, deduplicated within the page by href keeping the first.
  */
object Html {

  final case class Link(href: String, anchor: String)

  private def decodeUtf8(bytes: Array[Byte]): String =
    if (bytes == null) "" else new String(bytes, StandardCharsets.UTF_8)

  /** Single left-to-right entity decode of the frozen entity set. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        if (s.startsWith("&amp;", i)) { sb.append('&'); i += 5 }
        else if (s.startsWith("&lt;", i)) { sb.append('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { sb.append('>'); i += 4 }
        else if (s.startsWith("&quot;", i)) { sb.append('"'); i += 6 }
        else if (s.startsWith("&apos;", i)) { sb.append('\''); i += 6 }
        else if (s.startsWith("&nbsp;", i)) { sb.append(' '); i += 6 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Collapse [ \t\r\n]+ runs to a single space, then trim. */
  def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def isWs(c: Char) = c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** True if `html` at position i opens a tag whose name is `name`
    * (case-insensitive), i.e. `<name` followed by whitespace, '>' or '/'.
    */
  private def tagAt(html: String, i: Int, name: String): Boolean = {
    if (i + 1 + name.length > html.length) return false
    if (html.charAt(i) != '<') return false
    var j = 0
    while (j < name.length) {
      if (Character.toLowerCase(html.charAt(i + 1 + j)) != name.charAt(j)) return false
      j += 1
    }
    val after = i + 1 + name.length
    after >= html.length || isWs(html.charAt(after)) ||
      html.charAt(after) == '>' || html.charAt(after) == '/'
  }

  /** Index just past the matching `</name ...>` close tag, or html.length. */
  private def skipBlock(html: String, openIdx: Int, name: String): Int = {
    var i = html.indexOf('>', openIdx)
    if (i < 0) return html.length
    i += 1
    while (i < html.length) {
      if (html.charAt(i) == '<' && i + 1 < html.length && html.charAt(i + 1) == '/' &&
          tagAtClose(html, i, name)) {
        val gt = html.indexOf('>', i)
        return if (gt < 0) html.length else gt + 1
      }
      i += 1
    }
    html.length
  }

  private def tagAtClose(html: String, i: Int, name: String): Boolean = {
    // expects html(i) == '<', html(i+1) == '/'
    if (i + 2 + name.length > html.length) return false
    var j = 0
    while (j < name.length) {
      if (Character.toLowerCase(html.charAt(i + 2 + j)) != name.charAt(j)) return false
      j += 1
    }
    val after = i + 2 + name.length
    after >= html.length || isWs(html.charAt(after)) || html.charAt(after) == '>'
  }

  /** X2 over raw markup string: strip blocks → strip tags → entities →
    * collapse → trim (collapseWs also trims).
    */
  def extractTextFromString(html: String): String = {
    if (html == null) return ""
    val noTags = new java.lang.StringBuilder(html.length)
    var i = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        if (tagAt(html, i, "script")) i = skipBlock(html, i, "script")
        else if (tagAt(html, i, "style")) i = skipBlock(html, i, "style")
        else {
          val gt = html.indexOf('>', i)
          i = if (gt < 0) html.length else gt + 1
        }
      } else { noTags.append(c); i += 1 }
    }
    collapseWs(decodeEntities(noTags.toString))
  }

  /** X2: html bytes (UTF-8) → byte-identical extracted text. */
  def extractText(html: Array[Byte]): String = extractTextFromString(decodeUtf8(html))

  /** Parse attributes of the tag starting at `lt` (html(lt)=='<').
    * Returns (attrMap, indexPastGt). Quote-aware; unquoted values end at
    * whitespace or '>'. Attribute names lowercased; first occurrence wins.
    */
  private def parseTag(html: String, lt: Int): (Map[String, String], Int) = {
    var i = lt + 1
    // skip tag name
    while (i < html.length && html.charAt(i) != '>' && !isWs(html.charAt(i)) && html.charAt(i) != '/') i += 1
    var attrs = Map.empty[String, String]
    while (i < html.length && html.charAt(i) != '>') {
      while (i < html.length && (isWs(html.charAt(i)) || html.charAt(i) == '/')) i += 1
      if (i >= html.length || html.charAt(i) == '>') return (attrs, if (i < html.length) i + 1 else html.length)
      val nameStart = i
      while (i < html.length && html.charAt(i) != '=' && html.charAt(i) != '>' && !isWs(html.charAt(i))) i += 1
      val name = html.substring(nameStart, i).toLowerCase
      // skip ws before '='
      var j = i
      while (j < html.length && isWs(html.charAt(j))) j += 1
      if (j < html.length && html.charAt(j) == '=') {
        j += 1
        while (j < html.length && isWs(html.charAt(j))) j += 1
        if (j < html.length && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
          val q = html.charAt(j)
          val vStart = j + 1
          var k = vStart
          while (k < html.length && html.charAt(k) != q) k += 1
          if (name.nonEmpty && !attrs.contains(name)) attrs += name -> html.substring(vStart, k)
          i = if (k < html.length) k + 1 else k
        } else {
          val vStart = j
          var k = vStart
          while (k < html.length && !isWs(html.charAt(k)) && html.charAt(k) != '>') k += 1
          if (name.nonEmpty && !attrs.contains(name)) attrs += name -> html.substring(vStart, k)
          i = k
        }
      } else {
        if (name.nonEmpty && !attrs.contains(name)) attrs += name -> ""
        i = j
      }
    }
    (attrs, if (i < html.length) i + 1 else html.length)
  }

  /** X1: ordered (href, anchor) pairs from <a href> tags; in-page dedup by
    * href keeping the first occurrence `[SPEC-X1]`.
    */
  def extractLinksFromString(html: String): Array[Link] = {
    if (html == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Link]
    val seen = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        if (tagAt(html, i, "script")) i = skipBlock(html, i, "script")
        else if (tagAt(html, i, "style")) i = skipBlock(html, i, "style")
        else if (tagAt(html, i, "a")) {
          val (attrs, past) = parseTag(html, i)
          // anchor body = text up to matching </a> (or next <a / end)
          var j = past
          var depthGuard = 0
          var end = html.length
          var bodyEnd = html.length
          var found = false
          while (j < html.length && !found) {
            if (html.charAt(j) == '<') {
              if (j + 1 < html.length && html.charAt(j + 1) == '/' && tagAtClose(html, j, "a")) {
                bodyEnd = j
                val gt = html.indexOf('>', j)
                end = if (gt < 0) html.length else gt + 1
                found = true
              } else if (tagAt(html, j, "a")) { // nested <a> — close implicitly
                bodyEnd = j; end = j; found = true
              }
            }
            if (!found) j += 1
            depthGuard += 1
          }
          if (!found) { bodyEnd = html.length; end = html.length }
          attrs.get("href") match {
            case Some(h) if h.nonEmpty =>
              val href = decodeEntities(h).trim
              if (href.nonEmpty && !seen.contains(href)) {
                seen += href
                out += Link(href, extractTextFromString(html.substring(past, bodyEnd)))
              }
            case _ => ()
          }
          i = end
        } else {
          val gt = html.indexOf('>', i)
          i = if (gt < 0) html.length else gt + 1
        }
      } else i += 1
    }
    out.toArray
  }

  /** X1 over html bytes (UTF-8). */
  def extractLinks(html: Array[Byte]): Array[Link] = extractLinksFromString(decodeUtf8(html))

  /** Fused page scan for the crawl hot path: one UTF-8 decode feeding both
    * extractors (text and links are separate passes over the shared string).
    */
  final case class PageScan(links: Array[Link], text: String)

  def scanPage(html: Array[Byte]): PageScan = {
    val s = decodeUtf8(html)
    PageScan(extractLinksFromString(s), extractTextFromString(s))
  }
}

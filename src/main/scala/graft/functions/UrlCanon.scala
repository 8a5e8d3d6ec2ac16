package graft.functions

/** Pure, deterministic, total URL functions — the byte-exact core.
  *
  * Frozen as `[SPEC-U]` (SURVEY.md §2.2). Semantics:
  *
  * canonicalize (U2) — RFC 3986 §6 normalization:
  *   - scheme and host lowercased; userinfo dropped; trailing host dot dropped
  *   - percent-encoding: %XX of unreserved chars decoded, all other %XX
  *     uppercased; an invalid %-sequence is kept literally
  *   - default ports removed (http:80, https:443)
  *   - dot-segment removal (RFC 3986 §5.2.4); empty path → "/"
  *   - fragment dropped
  *   - query: split on '&', empty params dropped, `utm_*` keys dropped,
  *     remaining params stable-sorted byte-wise, duplicates kept `[SPEC-U2]`
  *   - malformed input (no scheme, empty host, bad port) → null
  *
  * All functions never throw; malformed input yields null (filtered by P1).
  * The reference analogue is spiderosm's canonical street-name normalizer
  * (cannames.py — public knowledge; /root/reference is empty, see SURVEY §0.1).
  */
object UrlCanon {

  private val unreserved: Array[Boolean] = {
    val a = new Array[Boolean](128)
    var c = 'A'.toInt; while (c <= 'Z') { a(c) = true; c += 1 }
    c = 'a'.toInt; while (c <= 'z') { a(c) = true; c += 1 }
    c = '0'.toInt; while (c <= '9') { a(c) = true; c += 1 }
    "-._~".foreach(ch => a(ch.toInt) = true)
    a
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Normalize percent-encodings in one pass: decode unreserved, uppercase
    * the rest, keep invalid sequences literally.
    */
  def normalizePercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h >= 0 && l >= 0) {
          val v = h * 16 + l
          if (v < 128 && unreserved(v)) sb.append(v.toChar)
          else {
            sb.append('%')
            sb.append(Character.toUpperCase(s.charAt(i + 1)))
            sb.append(Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    var in = path
    val out = new java.lang.StringBuilder(path.length)
    def dropLastSegment(): Unit = {
      var j = out.length - 1
      while (j >= 0 && out.charAt(j) != '/') j -= 1
      out.setLength(math.max(j, 0))
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); dropLastSegment() }
      else if (in == "/..") { in = "/"; dropLastSegment() }
      else if (in == "." || in == "..") in = ""
      else {
        // move first segment (incl. leading '/') to output
        var j = if (in.charAt(0) == '/') 1 else 0
        while (j < in.length && in.charAt(j) != '/') j += 1
        out.append(in, 0, j)
        in = in.substring(j)
      }
    }
    out.toString
  }

  /** Parsed components of a hierarchical URL; fragment already separated. */
  final case class Parts(scheme: String, host: String, port: Int, path: String, query: String)

  private def validScheme(s: String): Boolean =
    s.nonEmpty && s.charAt(0).isLetter &&
      s.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')

  /** Split raw URL into parts. Returns null on malformed input. */
  def parse(raw: String): Parts = {
    if (raw == null) return null
    val s = raw.trim
    val ci = s.indexOf(':')
    if (ci <= 0) return null
    val scheme = s.substring(0, ci)
    if (!validScheme(scheme)) return null
    if (s.length < ci + 3 || s.charAt(ci + 1) != '/' || s.charAt(ci + 2) != '/') return null
    val rest = s.substring(ci + 3)
    // authority ends at first '/', '?' or '#'
    var ae = 0
    while (ae < rest.length && rest.charAt(ae) != '/' && rest.charAt(ae) != '?' && rest.charAt(ae) != '#') ae += 1
    var auth = rest.substring(0, ae)
    val tail = rest.substring(ae)
    // drop userinfo
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    var host: String = null
    var portStr: String = null
    if (auth.startsWith("[")) { // IPv6 literal
      val rb = auth.indexOf(']')
      if (rb < 0) return null
      host = auth.substring(0, rb + 1)
      val after = auth.substring(rb + 1)
      if (after.startsWith(":")) portStr = after.substring(1)
      else if (after.nonEmpty) return null
    } else {
      val pc = auth.lastIndexOf(':')
      if (pc >= 0) { host = auth.substring(0, pc); portStr = auth.substring(pc + 1) }
      else host = auth
    }
    if (host.isEmpty) return null
    var port = -1
    if (portStr != null) {
      if (portStr.isEmpty) port = -1 // "http://h:/" → treat as no port
      else if (portStr.forall(_.isDigit) && portStr.length <= 5 &&
        portStr.toInt <= 65535) port = portStr.toInt // 65536–99999 is as bad as "abc"
      else return null
    }
    // split tail into path / query / fragment (fragment discarded)
    var path = tail
    var query: String = null
    val hi = path.indexOf('#')
    if (hi >= 0) path = path.substring(0, hi)
    val qi = path.indexOf('?')
    if (qi >= 0) { query = path.substring(qi + 1); path = path.substring(0, qi) }
    Parts(scheme, host, port, path, query)
  }

  private def canonQuery(q: String): String = {
    if (q == null) return null
    val params = q.split("&", -1).iterator
      .filter(_.nonEmpty)
      .map(normalizePercent)
      .filterNot { p =>
        val eq = p.indexOf('=')
        val key = if (eq >= 0) p.substring(0, eq) else p
        key.toLowerCase.startsWith("utm_")
      }
      .toArray
    if (params.isEmpty) null
    else { scala.util.Sorting.stableSort(params); params.mkString("&") }
  }

  private def defaultPort(scheme: String): Int =
    scheme match { case "http" => 80; case "https" => 443; case _ => -1 }

  /** U2: full canonical form, or null if malformed. */
  /** Host normalization: percent-normalize (decode unreserved, uppercase the
    * hex of remaining escapes) then lowercase OUTSIDE escapes, so the hex
    * digits of a kept %XX stay uppercase per RFC 3986 §6.2.2.1. Without the
    * decode, "ex%61mple.com" and "example.com" canonicalize to two different
    * hosts — two surts and two fetches for one page, and a robots-policy
    * lookup miss for the encoded spelling.
    */
  private def canonHost(h: String): String = {
    val n = normalizePercent(h)
    if (n.indexOf('%') < 0) n.toLowerCase
    else {
      val sb = new java.lang.StringBuilder(n.length)
      var i = 0
      while (i < n.length) {
        val c = n.charAt(i)
        if (c == '%' && i + 2 < n.length) { sb.append(n, i, i + 3); i += 3 }
        else { sb.append(Character.toLowerCase(c)); i += 1 }
      }
      sb.toString
    }
  }

  def canonicalize(raw: String): String = {
    val p = parse(raw)
    if (p == null) return null
    val scheme = p.scheme.toLowerCase
    var host = canonHost(p.host)
    if (host.endsWith(".") && host.length > 1) host = host.substring(0, host.length - 1)
    val port = if (p.port == defaultPort(scheme)) -1 else p.port
    var path = removeDotSegments(normalizePercent(p.path))
    if (path.isEmpty) path = "/"
    val query = canonQuery(p.query)
    val sb = new java.lang.StringBuilder(raw.length)
    sb.append(scheme).append("://").append(host)
    if (port >= 0) sb.append(':').append(port)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    sb.toString
  }

  /** U7: registrable host — lowercase, strip one leading "www.".
    * (Simplified public-suffix handling — documented limitation, SPEC-U7.)
    */
  def regHost(host: String): String = {
    if (host == null) return null
    val h = host.toLowerCase
    if (h.startsWith("www.") && h.length > 4) h.substring(4) else h
  }

  /** U3: reverse host labels: news.example.co.uk → uk.co.example.news. */
  def hostReverse(host: String): String = {
    if (host == null) return null
    val parts = host.split("\\.", -1)
    val sb = new java.lang.StringBuilder(host.length)
    var i = parts.length - 1
    while (i >= 0) { sb.append(parts(i)); if (i > 0) sb.append('.'); i -= 1 }
    sb.toString
  }

  /** U4 `[SPEC-U4]`: SURT form of the canonical URL —
    * `uk.co.example.news)/path?q=v` (host reversed, scheme dropped,
    * non-default port kept as `:port` before the `)` separator).
    * Null if canonicalization fails.
    */
  def surt(raw: String): String = {
    val c = canonicalize(raw)
    if (c == null) return null
    val p = parse(c)
    if (p == null) return null
    val sb = new java.lang.StringBuilder(c.length)
    sb.append(hostReverse(regHost(p.host)))
    if (p.port >= 0) sb.append(':').append(p.port)
    sb.append(')').append(p.path)
    if (p.query != null) sb.append('?').append(p.query)
    sb.toString
  }

  /** Host of the canonical URL (registrable form), or null. */
  def hostOf(raw: String): String = {
    val p = parse(raw)
    if (p == null) null else regHost(p.host)
  }

  /** All candidate-pipeline fields in one pass (hot path: one canonicalize +
    * one parse instead of five — resolve/canon/host/path/surt fused).
    */
  final case class CanonParts(url: String, host: String, path: String, surt: String)

  def canonParts(raw: String): CanonParts = {
    val c = canonicalize(raw)
    if (c == null) return null
    val p = parse(c)
    if (p == null) return null
    val rh = regHost(p.host)
    val sb = new java.lang.StringBuilder(c.length)
    sb.append(hostReverse(rh))
    if (p.port >= 0) sb.append(':').append(p.port)
    sb.append(')').append(p.path)
    if (p.query != null) sb.append('?').append(p.query)
    CanonParts(c, rh, p.path, sb.toString)
  }

  /** U6: RFC 3986 §5 relative-reference resolution of `ref` against absolute
    * `base`. Returns an absolute (not yet canonicalized) URL, or null if the
    * base is unusable. The result feeds canonicalize().
    */
  def resolve(base: String, ref: String): String = {
    if (ref == null) return null
    val r = ref.trim
    // ref with its own scheme → use as-is (RFC strict mode; a non-http(s)
    // scheme like mailto: then fails canonicalize() and is filtered by P1)
    val ci = r.indexOf(':')
    val slash = r.indexOf('/')
    if (ci > 0 && (slash < 0 || ci < slash) && validScheme(r.substring(0, ci))) return r
    val b = parse(base)
    if (b == null) return null
    val bAuth = b.host + (if (b.port >= 0) ":" + b.port else "")
    if (r.startsWith("//")) return b.scheme + ":" + r
    val (path, query) =
      if (r.isEmpty) (b.path, b.query)
      else if (r.startsWith("#")) (b.path, b.query)
      else {
        // split ref into path?query#fragment
        var rp = r
        val hi = rp.indexOf('#')
        if (hi >= 0) rp = rp.substring(0, hi)
        var rq: String = null
        val qi = rp.indexOf('?')
        if (qi >= 0) { rq = rp.substring(qi + 1); rp = rp.substring(0, qi) }
        if (rp.isEmpty) (b.path, if (qi >= 0) rq else b.query)
        else if (rp.startsWith("/")) (removeDotSegments(rp), rq)
        else {
          // merge (RFC 3986 §5.2.3)
          val merged =
            if (b.path.isEmpty) "/" + rp
            else b.path.substring(0, b.path.lastIndexOf('/') + 1) + rp
          (removeDotSegments(merged), rq)
        }
      }
    val sb = new java.lang.StringBuilder(base.length + r.length)
    sb.append(b.scheme).append("://").append(bAuth).append(path)
    if (query != null) sb.append('?').append(query)
    sb.toString
  }
}

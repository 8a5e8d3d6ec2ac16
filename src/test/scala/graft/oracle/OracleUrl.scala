package graft.oracle

import scala.util.matching.Regex

/** Independent reimplementation of [SPEC-U] from the SURVEY.md spec text —
  * regex/functional style, zero shared code with graft.functions.UrlCanon.
  * Agreement between the two is the correctness evidence (SURVEY.md §0.3).
  */
object OracleUrl {

  private val schemeRe: Regex = "^([A-Za-z][A-Za-z0-9+.\\-]*)://(.*)$".r
  private val pctRe: Regex = "%([0-9A-Fa-f]{2})".r

  private def isUnreserved(v: Int): Boolean = {
    val c = v.toChar
    v < 128 && (c.isLetter || c.isDigit || "-._~".indexOf(c) >= 0)
  }

  def pctNorm(s: String): String =
    pctRe.replaceAllIn(s, m => {
      val v = Integer.parseInt(m.group(1), 16)
      if (isUnreserved(v)) Regex.quoteReplacement(v.toChar.toString)
      else "%" + m.group(1).toUpperCase
    })

  /** remove_dot_segments for absolute (or empty) paths, fold style. */
  def removeDots(p: String): String = {
    if (p.isEmpty || p == "/") return p
    val rawSegs = p.split("/", -1).toList.drop(1)
    val stack = rawSegs.foldLeft(Vector.empty[String]) {
      case (acc, ".") => acc
      case (acc, "..") => if (acc.isEmpty) acc else acc.init
      case (acc, s) => acc :+ s
    }
    val base = "/" + stack.mkString("/")
    val needTrail = rawSegs.lastOption.exists(s => s == "." || s == "..") &&
      stack.nonEmpty && !base.endsWith("/")
    base + (if (needTrail) "/" else "")
  }

  final case class P(scheme: String, host: String, port: Int, path: String, query: Option[String])

  def split(raw: String): Option[P] = raw.trim match {
    case schemeRe(scheme, rest) =>
      val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
        case -1 => rest.length
        case i => i
      }
      val authority0 = rest.take(authEnd)
      val tail = rest.drop(authEnd)
      val authority = authority0.split("@", -1).last
      val (hostRaw, portRaw): (String, Option[String]) =
        if (authority.startsWith("[")) {
          val rb = authority.indexOf(']')
          if (rb < 0) return None
          val after = authority.drop(rb + 1)
          if (after.startsWith(":")) (authority.take(rb + 1), Some(after.drop(1)))
          else if (after.isEmpty) (authority.take(rb + 1), None)
          else return None
        } else authority.lastIndexOf(':') match {
          case -1 => (authority, None)
          case i => (authority.take(i), Some(authority.drop(i + 1)))
        }
      if (hostRaw.isEmpty) return None
      val port = portRaw match {
        case None => -1
        case Some("") => -1
        case Some(ps) if ps.forall(_.isDigit) && ps.length <= 5 && ps.toInt <= 65535 =>
          ps.toInt
        case _ => return None
      }
      val noFrag = tail.split("#", 2)(0)
      val pq = noFrag.split("\\?", 2)
      Some(P(scheme, hostRaw, port, pq(0), if (pq.length > 1) Some(pq(1)) else None))
    case _ => None
  }

  private def defPort(s: String) = s match { case "http" => 80; case "https" => 443; case _ => -1 }

  def canon(raw: String): Option[String] = {
    if (raw == null) return None
    split(raw).map { p =>
      val scheme = p.scheme.toLowerCase
      // §6.2.2.1 for the host too: decode unreserved escapes, keep the hex
      // of remaining ones uppercase, lowercase everything outside escapes
      val hostN = pctNorm(p.host)
      val host0 = {
        val out = new StringBuilder(hostN.length)
        var i = 0
        while (i < hostN.length) {
          if (hostN(i) == '%' && i + 2 < hostN.length) {
            out ++= hostN.substring(i, i + 3); i += 3
          } else { out += hostN(i).toLower; i += 1 }
        }
        out.toString
      }
      val host = if (host0.endsWith(".") && host0.length > 1) host0.dropRight(1) else host0
      val port = if (p.port == defPort(scheme)) -1 else p.port
      val path0 = removeDots(pctNorm(p.path))
      val path = if (path0.isEmpty) "/" else path0
      val query = p.query.flatMap { q =>
        val params = q.split("&", -1).toSeq
          .filter(_.nonEmpty)
          .map(pctNorm)
          .filterNot(t => t.split("=", 2)(0).toLowerCase.startsWith("utm_"))
        if (params.isEmpty) None else Some(params.sorted.mkString("&"))
      }
      scheme + "://" + host + (if (port >= 0) s":$port" else "") + path +
        query.map("?" + _).getOrElse("")
    }
  }

  def regHost(h: String): String =
    if (h.toLowerCase.startsWith("www.") && h.length > 4) h.toLowerCase.drop(4) else h.toLowerCase

  def hostOf(raw: String): Option[String] = split(raw).map(p => regHost(p.host))

  def surt(raw: String): Option[String] =
    canon(raw).flatMap(split).map { p =>
      regHost(p.host).split("\\.", -1).reverse.mkString(".") +
        (if (p.port >= 0) s":${p.port}" else "") + ")" + p.path +
        p.query.map("?" + _).getOrElse("")
    }

  private val refSchemeRe: Regex = "^([A-Za-z][A-Za-z0-9+.\\-]*):".r

  def resolve(base: String, ref0: String): Option[String] = {
    if (ref0 == null) return None
    val ref = ref0.trim
    val colonFirst = refSchemeRe.findPrefixOf(ref).isDefined &&
      (ref.indexOf('/') < 0 || ref.indexOf(':') < ref.indexOf('/'))
    if (colonFirst) return Some(ref)
    split(base).map { b =>
      val auth = b.host + (if (b.port >= 0) s":${b.port}" else "")
      if (ref.startsWith("//")) b.scheme + ":" + ref
      else {
        val (path, query) =
          if (ref.isEmpty || ref.startsWith("#")) (b.path, b.query)
          else {
            val noFrag = ref.split("#", 2)(0)
            val pq = noFrag.split("\\?", 2)
            val rp = pq(0)
            val rq = if (pq.length > 1) Some(pq(1)) else None
            if (rp.isEmpty) (b.path, if (noFrag.contains('?')) rq else b.query)
            else if (rp.startsWith("/")) (removeDots(rp), rq)
            else {
              val merged =
                if (b.path.isEmpty) "/" + rp
                else b.path.take(b.path.lastIndexOf('/') + 1) + rp
              (removeDots(merged), rq)
            }
          }
        b.scheme + "://" + auth + path + query.map("?" + _).getOrElse("")
      }
    }
  }
}

package graft.oracle

import scala.collection.mutable

/** Single-threaded loop-and-sort reference crawler (SURVEY.md §5.3).
  *
  * Shares ONLY the frozen SPEC documents with the engine — URL/HTML functions
  * are the independent Oracle* reimplementations; state is plain Scala
  * collections; ordering is explicit sorts. Asserted equal to the Spark
  * engine per round on frontier ordering, URL-seen membership, fetch log and
  * extracted text (BASELINE.json correctness contract).
  */
object OracleCrawler {

  final case class Cfg(
      budget: Int,
      maxDepth: Int = 12,
      burst: Double = 2.0,
      initial: Double = 1.0,
      defaultDelay: Double = 1.0,
      maxLen: Int = 2048)

  final case class FEntry(
      surt: String, url: String, host: String, depth: Int, score: Double,
      discoveredRound: Long, parentSurt: String)

  final case class Fetch(round: Long, surt: String, url: String, host: String,
      status: Int, nLinks: Int, text: String)

  final case class Policy(dis: Seq[String], allow: Seq[String], delay: Double)

  def parseRobots(txt: String, defaultDelay: Double): Policy = {
    var inStar = false
    var sawAgent = false
    var prevAgent = false // RFC 9309 §2.2.1: consecutive UA lines stack
    val dis = Seq.newBuilder[String]; val al = Seq.newBuilder[String]
    var delay = defaultDelay
    txt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      line.split(":", 2) match {
        case Array(k, v) =>
          val key = k.trim.toLowerCase; val value = v.trim
          key match {
            case "user-agent" =>
              inStar = (prevAgent && inStar) || value == "*"; sawAgent = true
            case "disallow" if (inStar || !sawAgent) && value.nonEmpty => dis += value
            case "allow" if (inStar || !sawAgent) && value.nonEmpty => al += value
            case "crawl-delay" if inStar || !sawAgent =>
              value.toDoubleOption
                .filter(d => java.lang.Double.isFinite(d) && d > 0)
                .foreach(d => delay = d)
            case _ => ()
          }
          prevAgent = key == "user-agent"
        case _ => ()
      }
    }
    Policy(dis.result(), al.result(), delay)
  }

  def allowed(p: Policy, path: String): Boolean = {
    val disLen = p.dis.filter(path.startsWith).map(_.length).maxOption.getOrElse(-1)
    val alLen = p.allow.filter(path.startsWith).map(_.length).maxOption.getOrElse(-1)
    disLen == -1 || alLen >= disLen
  }

  private def sk(score: Double): Long = math.rint(score * 1e9).toLong

  /** The O1/W1 ordering: (depth ASC, scoreKey DESC, surt ASC). */
  private val ord: Ordering[FEntry] =
    Ordering.by((e: FEntry) => (e.depth, -sk(e.score), e.surt))

  final class State {
    val frontier: mutable.Map[String, FEntry] = mutable.Map.empty // by surt
    val seen: mutable.Set[String] = mutable.Set.empty
    val tokens: mutable.Map[String, (Double, Long)] = mutable.Map.empty // host → (tokens, lastRound)
    val log: mutable.ArrayBuffer[Fetch] = mutable.ArrayBuffer.empty
    def orderedFrontier: Seq[FEntry] = frontier.values.toSeq.sorted(ord)
  }

  def inject(seeds: Seq[String], robots: Map[String, Policy], cfg: Cfg): State = {
    val st = new State
    val valid = seeds.flatMap { raw =>
      OracleUrl.canon(raw).filter(c =>
        (c.startsWith("http://") || c.startsWith("https://")) && c.length <= cfg.maxLen)
    }.flatMap { c =>
      OracleUrl.hostOf(c).flatMap { h =>
        val path = OracleUrl.split(c).get.path
        if (robots.get(h).forall(allowed(_, path)))
          OracleUrl.surt(c).map(s => (s, c, h))
        else None
      }
    }
    valid.groupBy(_._1).foreach { case (surt, rows) =>
      val (_, u, h) = rows.minBy(r => (r._2, r._3))
      st.frontier(surt) = FEntry(surt, u, h, 0, 1.0, 0L, "")
      st.seen += surt
    }
    st
  }

  def round(
      st: State,
      r: Long,
      pages: Map[String, Array[Byte]],
      robots: Map[String, Policy],
      cfg: Cfg): Unit = {

    def delayOf(host: String): Double =
      robots.get(host).map(_.delay).getOrElse(cfg.defaultDelay)

    // T1 refill + W1 per-host rank + W2 admit + O2 global budget
    val refilled = mutable.Map.empty[String, Double]
    val perHostAdmit = st.frontier.values.groupBy(_.host).toSeq.flatMap { case (host, es) =>
      val (tok, last) = st.tokens.getOrElse(host, (cfg.initial, r - 1))
      val t = math.min(cfg.burst, tok + (r - last) / delayOf(host))
      refilled(host) = t
      es.toSeq.sorted(ord).take(math.floor(t).toInt)
    }
    val admitted = perHostAdmit.sorted(ord).take(cfg.budget)

    // consume tokens only on hosts that actually admitted (lazy refill)
    admitted.groupBy(_.host).foreach { case (host, es) =>
      st.tokens(host) = (refilled(host) - es.size, r)
    }

    // J2 fetch + X1/U6/U2/U4 + P1/P2 + D1 + A3
    final case class Cand(pd: Int, ps: String, u: String, h: String, contrib: Double)
    val cands = mutable.ArrayBuffer.empty[Cand]
    admitted.foreach { e =>
      pages.get(e.url) match {
        case None =>
          st.log += Fetch(r, e.surt, e.url, e.host, 404, 0, "")
        case Some(html) =>
          val ls = OracleHtml.links(html)
          st.log += Fetch(r, e.surt, e.url, e.host, 200, ls.size, OracleHtml.text(html))
          val contrib = e.score / math.max(ls.size, 1)
          ls.foreach { l =>
            for {
              abs <- OracleUrl.resolve(e.url, l.href)
              c <- OracleUrl.canon(abs)
              if c.startsWith("http://") || c.startsWith("https://")
              if c.length <= cfg.maxLen && e.depth < cfg.maxDepth
              h <- OracleUrl.hostOf(c)
              path = OracleUrl.split(c).get.path
              if robots.get(h).forall(allowed(_, path))
            } cands += Cand(e.depth, e.surt, c, h, contrib)
          }
      }
    }
    val bySurt = cands.groupBy(c => OracleUrl.surt(c.u).get)
    val newEntries = bySurt.toSeq.flatMap { case (surt, rows) =>
      if (st.seen.contains(surt)) None
      else {
        val f = rows.minBy(c => (c.pd, c.ps, c.u, c.h))
        Some(FEntry(surt, f.u, f.h, f.pd + 1, rows.map(_.contrib).sum, r, f.ps))
      }
    }

    admitted.foreach(e => st.frontier.remove(e.surt))
    newEntries.foreach { e => st.frontier(e.surt) = e; st.seen += e.surt }
  }

  /** Run a full crawl, returning the state and per-round frontier snapshots. */
  def crawl(
      seeds: Seq[String],
      pages: Map[String, Array[Byte]],
      robots: Map[String, Policy],
      cfg: Cfg,
      rounds: Int): (State, Seq[Seq[FEntry]]) = {
    val st = inject(seeds, robots, cfg)
    val snaps = (1 to rounds).map { r =>
      round(st, r.toLong, pages, robots, cfg)
      st.orderedFrontier
    }
    (st, snaps)
  }
}

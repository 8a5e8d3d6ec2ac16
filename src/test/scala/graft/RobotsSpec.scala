package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{CrawlConfig, RobotsPolicy}
import graft.operators.{Robots, RobotsBroadcast, RobotsJoin}
import graft.sources.SyntheticWeb

/** Robots access arms: the host-count gate, and parse/decide parity between
  * the broadcast map and the distributed policy table.
  */
class RobotsSpec extends AnyFunSuite with SparkTestSession {

  lazy val web = SyntheticWeb.WebConfig(seed = 42L, nPages = 100, nHosts = 12)
  lazy val robotsDf = SyntheticWeb.robotsTable(spark, web)

  test("access gate: broadcast at/below the host gate, policy-table join above") {
    val nHosts = robotsDf.count()
    Robots.access(spark, robotsDf, CrawlConfig(robotsBroadcastMaxHosts = nHosts)) match {
      case RobotsBroadcast(bc) => assert(bc.value.size == nHosts)
      case other => fail(s"expected broadcast arm at the gate, got $other")
    }
    Robots.access(spark, robotsDf, CrawlConfig(robotsBroadcastMaxHosts = nHosts - 1)) match {
      case RobotsJoin(policies) => assert(policies.count() == nHosts)
      case other => fail(s"expected join arm above the gate, got $other")
    }
  }

  test("RFC 9309 group stacking: consecutive UA lines share rules; bad delays rejected") {
    // a common real-world pattern: * stacked with a named agent in one group
    val stacked = "User-agent: *\nUser-agent: AdsBot-Google\nDisallow: /checkout\n"
    val p = Robots.parse("a.ex", stacked, 1.0)
    assert(p.disallow == Seq("/checkout"), "stacked * group must keep its rules")
    // a UA line AFTER rules starts a NEW group — its rules must not leak to *
    val twoGroups = "User-agent: *\nDisallow: /a\nUser-agent: FooBot\nDisallow: /b\n"
    val p2 = Robots.parse("a.ex", twoGroups, 1.0)
    assert(p2.disallow == Seq("/a"), "a post-rule UA line must close the * group")
    // non-finite / non-positive crawl delays fall back to the default (the
    // engine divides by this value: -1 would starve the host forever)
    for (bad <- Seq("-1", "0", "NaN", "Infinity"))
      assert(Robots.parse("a.ex", s"User-agent: *\nCrawl-delay: $bad\n", 1.5).crawlDelayRounds == 1.5,
        s"delay '$bad' must be rejected")
    assert(Robots.parse("a.ex", "User-agent: *\nCrawl-delay: 2.5\n", 1.5).crawlDelayRounds == 2.5)
  }

  test("policy table rows ≡ driver-parsed policies; decide ≡ allows") {
    val cfg = CrawlConfig()
    val viaTable = Robots.policiesTable(robotsDf, cfg).collect().map { r =>
      r.getString(0) -> RobotsPolicy(r.getString(0),
        r.getSeq[String](1), r.getSeq[String](2), r.getDouble(3))
    }.toMap
    val viaMap = Robots.broadcastPolicies(spark, robotsDf, cfg).value
    assert(viaTable == viaMap)
    assert(viaMap.nonEmpty && viaMap.values.exists(_.disallow.nonEmpty),
      "trivially-empty comparison: no host with rules")
    // decision parity on a path soup, incl. the null-lists (no policy) case
    val paths = Seq("/", "/d3/x.html", "/d3/", "/a/d3/", "/allowed/d3/deep", "", "/d10/page")
    for ((host, p) <- viaMap; path <- paths)
      assert(RobotsPolicy.decide(p.disallow, p.allow, path) == p.allows(path), s"$host $path")
    assert(RobotsPolicy.decide(null, null, "/anything"), "missing policy must allow")
  }

  test("Sitemap directives: global (outside UA groups), case-insensitive, comment-safe") {
    val txt =
      """User-agent: *
        |Disallow: /private/
        |Sitemap: http://a.ex/sitemap.xml
        |sitemap: http://a.ex/sitemap2.xml.gz  # trailing comment
        |User-agent: bot
        |SITEMAP: http://a.ex/sitemap3.xml
        |Sitemap:
        |NotASitemap: http://a.ex/no
        |""".stripMargin
    assert(Robots.sitemapUrls(txt) == Seq(
      "http://a.ex/sitemap.xml", "http://a.ex/sitemap2.xml.gz", "http://a.ex/sitemap3.xml"))
    assert(Robots.sitemapUrls(null).isEmpty)
    assert(Robots.sitemapUrls("Disallow: /x").isEmpty)
    // sitemap extraction must not perturb the frozen policy parse
    val p = Robots.parse("a.ex", txt, 1.0)
    assert(p.disallow == Seq("/private/") && p.allows("/ok") && !p.allows("/private/x"))

    import spark.implicits._
    val df = Seq(("a.ex", txt), ("b.ex", "User-agent: *\nDisallow:")).toDF("host", "robots_txt")
    val rows = Robots.sitemapTable(df).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 3 && rows.forall(_._1 == "a.ex"))
  }
}

package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{CrawlConfig, RobotsPolicy}

/** robots.txt parsing + broadcast policy cache — `[SPEC-R1]` (SURVEY.md P2/J1).
  *
  * Only the `User-agent: *` group is honored. Recognized directives:
  * Disallow, Allow, Crawl-delay (interpreted in logical rounds — the engine
  * has no wall clock). Decision rule: longest-prefix match wins; equal-length
  * tie → allow. An empty Disallow value allows everything (per the original
  * robots.txt convention). Unknown directives are ignored.
  *
  * The full policy map is collected and broadcast (BASELINE.json: "robots.txt
  * cache as a broadcast map") — O(hosts) driver memory; at contract scale this
  * is the documented trade for an O(1) map-side probe with no join shuffle.
  */
object Robots {

  def parse(host: String, robotsTxt: String, defaultDelayRounds: Double): RobotsPolicy = {
    var inStar = false
    var sawAnyAgent = false
    val dis = Seq.newBuilder[String]
    val allow = Seq.newBuilder[String]
    var delay = defaultDelayRounds
    if (robotsTxt != null) robotsTxt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            inStar = value == "*"
            sawAnyAgent = true
          case "disallow" if inStar || !sawAnyAgent =>
            if (value.nonEmpty) dis += value
          case "allow" if inStar || !sawAnyAgent =>
            if (value.nonEmpty) allow += value
          case "crawl-delay" if inStar || !sawAnyAgent =>
            try { delay = value.toDouble } catch { case _: NumberFormatException => () }
          case _ => ()
        }
      }
    }
    RobotsPolicy(host, dis.result(), allow.result(), delay)
  }

  /** Collect + broadcast the per-host policy map from the robots table. */
  def broadcastPolicies(
      spark: SparkSession,
      robotsTable: DataFrame,
      cfg: CrawlConfig): Broadcast[Map[String, RobotsPolicy]] = {
    val policies = robotsTable.select("host", "robots_txt").collect().map { r =>
      val host = r.getString(0)
      host -> parse(host, r.getString(1), cfg.defaultCrawlDelayRounds)
    }.toMap
    spark.sparkContext.broadcast(policies)
  }

  val empty: Map[String, RobotsPolicy] = Map.empty
}

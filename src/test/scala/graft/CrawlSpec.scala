package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.CrawlConfig
import graft.plans.{Crawler, CrawlRound, Resume}
import graft.sources.{StateTable, SyntheticWeb}

/** End-to-end crawl on the deterministic synthetic web (SURVEY.md §3, §5). */
class CrawlSpec extends AnyFunSuite with SparkTestSession {

  val web = SyntheticWeb.WebConfig(seed = 42L, nPages = 1000, nHosts = 40)
  val cfg = CrawlConfig(buckets = 16, roundBudget = 100, maxDepth = 10)
  lazy val pages = SyntheticWeb.pages(spark, web).toDF().cache()
  lazy val robots = SyntheticWeb.robotsTable(spark, web)
  lazy val seeds = SyntheticWeb.seeds(web, 10)

  def runCrawl(rounds: Int): (String, Seq[CrawlRound.RoundCounters]) = {
    val dir = tmpDir("crawl")
    val cs = Crawler.crawl(spark, dir, pages, robots, seeds, cfg, rounds)
    (dir, cs)
  }

  test("frontier delta commits ≡ full rewrites at every version (incl. a compaction)") {
    // same crawl, both frontier commit modes; compactEvery=4 AND a tiny
    // dels broadcast budget (60) so BOTH frontier compaction triggers — the
    // geometric policy and the tombstone-budget cap — fire inside the run,
    // interleaved with genuine delta commits
    val cfgDelta = cfg.copy(frontierDeltaCommits = true, compactEvery = 4,
      exactAntiBroadcastMaxRows = 60L)
    val cfgFull = cfg.copy(frontierDeltaCommits = false, compactEvery = 4,
      exactAntiBroadcastMaxRows = 60L)
    val dDelta = tmpDir("crawl-fdelta")
    val dFull = tmpDir("crawl-ffull")
    val c1 = Crawler.crawl(spark, dDelta, pages, robots, seeds, cfgDelta, 6)
    val c2 = Crawler.crawl(spark, dFull, pages, robots, seeds, cfgFull, 6)
    assert(c1 == c2, "per-round counters diverge between frontier commit modes")
    (0 to 6).foreach { v =>
      val a = Crawler.orderedFrontier(spark, dDelta, Some(v.toLong)).collect().map(_.toSeq).toSeq
      val b = Crawler.orderedFrontier(spark, dFull, Some(v.toLong)).collect().map(_.toSeq).toSeq
      assert(a == b, s"frontier@$v diverges between delta and full commit modes")
      assert(a.nonEmpty, s"frontier@$v empty — vacuous comparison")
    }
    // the delta mode actually wrote deltas (tombstone dirs exist) and
    // compacted at least once mid-run
    val fd = CrawlRound.frontierDir(dDelta)
    assert(StateTable.versions(fd).exists(v =>
      StateTable.manifest(fd, v).exists(_.counters.contains(StateTable.DelsCounter))),
      "no delta commit happened — mode not exercised")
    assert(StateTable.versions(fd).exists(v =>
      v > 0 && StateTable.manifest(fd, v).exists(m => m.compactedThrough == v)),
      "no frontier compaction happened — chain never folded")
    // the tombstone-budget trigger holds: accumulated dels at every version
    // stay within the broadcast gate, so merged reads never need the
    // distributed anti-join arm
    StateTable.versions(fd).foreach { v =>
      assert(StateTable.totalDels(fd, v) <= 60L,
        s"dels chain at v=$v exceeds the broadcast budget")
    }
    // resume across the delta chain: two more rounds on the same dir
    val more = Crawler.crawl(spark, dDelta, pages, robots, seeds, cfgDelta, 8)
    assert(more.length == 2, "resume re-ran already-committed rounds")
  }

  test("ten-round crawl expands the frontier and dedups") {
    val (dir, counters) = runCrawl(10)
    assert(counters.length == 10)
    assert(counters.head.admitted > 0, "round 1 admits seeds")
    assert(counters.map(_.fetched200).sum > 0, "some pages fetch")
    assert(counters.map(_.newUrls).sum > 0, "frontier grows")
    assert(counters.exists(_.dedupDropped > 0), "dedup is load-bearing")
    val frontier = Crawler.orderedFrontier(spark, dir).collect()
    assert(frontier.nonEmpty)
    // frontier never contains a previously admitted URL: disjoint from fetch_log
    val fetched = StateTable.readAppended(spark, CrawlRound.fetchLogDir(dir))
    val overlap = CrawlRound.readFrontier(spark, dir)
      .join(fetched, Seq("surt"), "inner").count()
    assert(overlap == 0, "fetched URLs must leave the frontier")
  }

  test("URL-seen membership is exact: seen = seeds ∪ all discovered, no dupes") {
    val (dir, _) = runCrawl(6)
    val seen = StateTable.readAppended(spark, CrawlRound.seenDir(dir))
    assert(seen.count() == seen.select("surt").distinct().count(), "no duplicate seen entries")
    // every frontier entry is seen
    val f = CrawlRound.readFrontier(spark, dir)
    assert(f.join(seen, Seq("surt"), "left_anti").count() == 0)
  }

  test("politeness invariant (P5): per-host admissions within token budget") {
    val (dir, _) = runCrawl(8)
    val log = StateTable.readAppended(spark, CrawlRound.fetchLogDir(dir))
    val perHostRound = log.groupBy("host", "round").count()
    // burst cap: no host exceeds floor(burst)=2 admissions in any round
    val over = perHostRound.where(col("count") > math.floor(cfg.burstTokens).toLong).count()
    assert(over == 0, "token bucket burst cap violated")
    // long-run rate: admissions over 8 rounds ≤ initial + burst + 8/delay_min
    val totals = log.groupBy("host").count()
    val maxAllowed = cfg.burstTokens + 8 / 0.5 + 1
    assert(totals.where(col("count") > maxAllowed).count() == 0)
  }

  test("robots are honored: no /d3/ fetch on a disallowing host") {
    val (dir, _) = runCrawl(8)
    val log = StateTable.readAppended(spark, CrawlRound.fetchLogDir(dir))
    val disallowedHosts = (0 until web.nHosts).filter(_ % 5 == 0).map(SyntheticWeb.hostName)
    val bad = log.where(col("host").isin(disallowedHosts: _*) && col("url").contains("/d3/"))
    assert(bad.count() == 0)
  }

  test("determinism (P7 proxy): identical frontier at different shuffle widths") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    val (d1, c1) = runCrawl(5)
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    val (d2, c2) = runCrawl(5)
    spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(c1 == c2, "per-round counters must match")
    val f1 = Crawler.orderedFrontier(spark, d1).select("surt", "depth", "score").collect().toSeq
    val f2 = Crawler.orderedFrontier(spark, d2).select("surt", "depth", "score").collect().toSeq
    assert(f1 == f2, "O1 total order must be parallelism-independent")
  }

  test("resume (P6): state after kill ≡ uninterrupted run") {
    // uninterrupted 6 rounds
    val (dFull, cFull) = runCrawl(6)
    // interrupted: 3 rounds, then resume to 6
    val dPart = tmpDir("crawl")
    Crawler.crawl(spark, dPart, pages, robots, seeds, cfg, 3)
    assert(Resume.lastCompleteVersion(dPart).contains(3L))
    val cResumed = Crawler.crawl(spark, dPart, pages, robots, seeds, cfg, 6)
    assert(cResumed.map(_.round) == Seq(4L, 5L, 6L))
    val a = Crawler.orderedFrontier(spark, dFull).select("surt", "depth", "score").collect().toSeq
    val b = Crawler.orderedFrontier(spark, dPart).select("surt", "depth", "score").collect().toSeq
    assert(a == b, "resumed crawl must converge to identical frontier")
    val seenA = StateTable.readAppended(spark, CrawlRound.seenDir(dFull)).select("surt")
    val seenB = StateTable.readAppended(spark, CrawlRound.seenDir(dPart)).select("surt")
    assert(seenA.except(seenB).count() == 0 && seenB.except(seenA).count() == 0)
  }

  test("resume across a compaction boundary ≡ uninterrupted; blooms stay complete") {
    val cfgC = cfg.copy(compactEvery = 2)
    val dFull = tmpDir("crawl")
    Crawler.crawl(spark, dFull, pages, robots, seeds, cfgC, 6)
    val dPart = tmpDir("crawl")
    Crawler.crawl(spark, dPart, pages, robots, seeds, cfgC, 3)
    Crawler.crawl(spark, dPart, pages, robots, seeds, cfgC, 6)
    // compaction actually happened in both runs
    val compacted = StateTable.versions(CrawlRound.seenDir(dFull))
      .filter(v => StateTable.manifest(CrawlRound.seenDir(dFull), v).exists(_.compactedThrough == v))
    assert(compacted.exists(_ > 0L), "no seen compaction in 6 rounds at compactEvery=2")
    val a = Crawler.orderedFrontier(spark, dFull).select("surt", "depth", "score").collect().toSeq
    val b = Crawler.orderedFrontier(spark, dPart).select("surt", "depth", "score").collect().toSeq
    assert(a == b, "resume across compaction must converge to identical frontier")
    val seenA = StateTable.readAppended(spark, CrawlRound.seenDir(dFull)).select("surt")
    val seenB = StateTable.readAppended(spark, CrawlRound.seenDir(dPart)).select("surt")
    assert(seenA.except(seenB).count() == 0 && seenB.except(seenA).count() == 0)
    // P4 after a forceFull rebuild: every seen entry still probes true
    val v = StateTable.currentVersion(CrawlRound.seenDir(dFull)).get
    val blooms = graft.operators.SeenStore.readAll(CrawlRound.seenDir(dFull), v)
    StateTable.readAppended(spark, CrawlRound.seenDir(dFull))
      .select("host_bucket", "url_hash").collect().foreach { r =>
        assert(graft.functions.Bloom64.mightContain(blooms(r.getInt(0)), r.getLong(1)))
      }
  }

  test("retention GC bounds history without changing crawl results") {
    val cfgR = cfg.copy(compactEvery = 2, retentionVersions = 3)
    val dGc = tmpDir("crawl")
    Crawler.crawl(spark, dGc, pages, robots, seeds, cfgR, 8)
    val (dRef, _) = runCrawl(8) // default cfg: no retention, compactEvery=8
    // results identical to the unretained run (determinism + GC safety)
    val a = Crawler.orderedFrontier(spark, dGc).select("surt", "depth", "score").collect().toSeq
    val b = Crawler.orderedFrontier(spark, dRef).select("surt", "depth", "score").collect().toSeq
    assert(a == b, "retention GC changed the frontier")
    val seenA = StateTable.readAppended(spark, CrawlRound.seenDir(dGc)).select("surt")
    val seenB = StateTable.readAppended(spark, CrawlRound.seenDir(dRef)).select("surt")
    assert(seenA.except(seenB).count() == 0 && seenB.except(seenA).count() == 0)
    // history is actually bounded: the delta-committed frontier keeps its
    // newest compacted base + the retention window (append-style), strictly
    // less than the full 9-version history
    val fv = StateTable.versions(CrawlRound.frontierDir(dGc))
    assert(fv.size < 9, s"frontier versions not expired: $fv")
    assert(fv.min > 0, s"frontier seed version survived GC: $fv")
    // the seen chain kept = base + window, strictly less than all 9 versions
    val sv = StateTable.versions(CrawlRound.seenDir(dGc))
    assert(sv.size < 9, s"seen versions not expired: $sv")
    // a GC'd state dir still resumes
    val more = Crawler.crawl(spark, dGc, pages, robots, seeds, cfgR, 10)
    assert(more.map(_.round) == Seq(9L, 10L))
  }

  test("bloom fast path never loses URLs (P4 at system level)") {
    // run with bloom disabled semantics: all candidates through exact anti-join
    // equivalence is implied by determinism + exactness tests; here check the
    // sidecars exist and probe true for every seen entry
    val (dir, _) = runCrawl(4)
    val v = StateTable.currentVersion(CrawlRound.seenDir(dir)).get
    val blooms = graft.operators.SeenStore.readAll(CrawlRound.seenDir(dir), v)
    assert(blooms.nonEmpty)
    val seen = StateTable.readAppended(spark, CrawlRound.seenDir(dir))
      .select("host_bucket", "url_hash").collect()
    seen.foreach { r =>
      val bf = blooms(r.getInt(0))
      assert(graft.functions.Bloom64.mightContain(bf, r.getLong(1)))
    }
  }
}

package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{UrlCanon, UrlFunctions}
import graft.model.{CrawlConfig, RobotsPolicy}
import graft.operators.SeenStore
import graft.sources.StateTable

/** The frontier-expansion superstep — SURVEY.md §3.1.
  *
  * One round r (logical clock; no wall time anywhere in engine semantics):
  *
  * {{{
  * read frontier@v, host_state@v, url_seen@v          (S3, time-travel reads)
  * → J4 host_state join → T1 token refill (lazy refill is exact: the burst
  *   cap commutes with linear refill, so per-admission updates suffice)
  * → W1 per-host rank (depth ASC, score DESC, surt ASC) → W2 admit ≤ ⌊tokens⌋
  * → O2 global budget K           (TakeOrderedAndProject — no full sort)
  * → J2 fetch join against pages on url               [shuffle: by url]
  * → X1 links → explode → U6 resolve → U2/U4 canon → P1 valid → P2 robots
  * → D1 in-batch dedup + A3 OPIC sum                  [shuffle: by surt]
  * → D2 bloom prefilter (map-side) → D3 exact anti-join vs url_seen
  * → O3 union carried frontier → commit snapshots v+1 (S4) + counters (M1)
  * }}}
  *
  * Scale notes baked in: `pages` is only touched through (url, html) — column
  * pruning keeps the fat BINARY column out of every other path (P3); the seen
  * set is an append-only snapshot table (no full rewrite per round); the bloom
  * prefilter keeps the exact anti-join's probe side at (new ∪ false
  * positives); candidates are repartitioned by host_bucket so the anti-join
  * aligns with the seen table's bucket partitioning; AQE handles small rounds
  * and is the skew backstop behind explicit hot-host salting.
  */
object CrawlRound {

  final case class RoundCounters(
      round: Long,
      admitted: Long,
      fetched200: Long,
      candidates: Long,
      newUrls: Long,
      dedupDropped: Long)

  val frontierCols: Seq[String] = Seq(
    "surt", "url", "host", "host_bucket", "url_hash",
    "depth", "score", "discovered_round", "parent_surt")

  /** `[SPEC-O1]` ordering key for the score: OPIC cash quantized to 1e-9 via
    * round-half-even, so the total order is immune to ulp-level differences
    * in double summation order across parallelism levels. All ordering
    * (W1 per-host rank, O1 total order, O2 top-K) uses this key; the stored
    * score column keeps full precision.
    */
  def scoreKey(score: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bround(score * lit(1e9), 0).cast("long")

  def scoreKeyOf(score: Double): Long = math.rint(score * 1e9).toLong

  def frontierDir(stateDir: String) = s"$stateDir/frontier"
  def hostStateDir(stateDir: String) = s"$stateDir/host_state"
  def seenDir(stateDir: String) = s"$stateDir/url_seen"
  def fetchLogDir(stateDir: String) = s"$stateDir/fetch_log"

  def run(
      spark: SparkSession,
      stateDir: String,
      pages: DataFrame,
      robotsBc: Broadcast[Map[String, RobotsPolicy]],
      cfg: CrawlConfig,
      round: Long): RoundCounters = {

    val version = round // version v is committed by round v; seeds commit v0
    val prevV = version - 1

    val frontier = StateTable.read(spark, frontierDir(stateDir), Some(prevV), Some(graft.model.Schemas.frontier))
    val hostState = StateTable.read(spark, hostStateDir(stateDir), Some(prevV), Some(graft.model.Schemas.hostState))
    val seen = StateTable.readAppended(spark, seenDir(stateDir), Some(prevV), Some(graft.model.Schemas.urlSeen))

    val delayUdf = udf((host: String) =>
      robotsBc.value.get(host).map(_.crawlDelayRounds).getOrElse(cfg.defaultCrawlDelayRounds))
    // robots decision over the pre-parsed path (no re-parse on the hot path)
    val allowPathUdf = udf((host: String, path: String) =>
      robotsBc.value.get(host).forall(_.allows(path)))

    // ---- T1 token refill + W1/W2 politeness admission + O2 global budget.
    // host_state is per-host (small) → broadcast; the frontier never shuffles
    // for this join ----
    val hostStateSlim = hostState.select(col("host"), col("tokens"), col("last_round"))
    val withTokens = frontier
      .join(
        if (StateTable.manifest(hostStateDir(stateDir), prevV).forall(_.nRows <= 65536))
          broadcast(hostStateSlim)
        else hostStateSlim, // many hosts → shuffle join (both sides parallel)
        Seq("host"), "left")
      .withColumn("delay", delayUdf(col("host")))
      .withColumn("tokens_refilled", least(
        lit(cfg.burstTokens),
        coalesce(col("tokens"), lit(cfg.initialTokens)) +
          (lit(round) - coalesce(col("last_round"), lit(round - 1))) / col("delay")))

    // ordering key as a sortable struct so the admission boundary is a value:
    // (depth ASC, scoreKey DESC, surt ASC) ≡ lexicographic (depth, -sk, surt)
    val wHost = Window.partitionBy("host")
      .orderBy(col("depth").asc, scoreKey(col("score")).desc, col("surt").asc)
    val ranked = withTokens
      .withColumn("rn", row_number().over(wHost))
      .withColumn("ord", struct(col("depth"), (-scoreKey(col("score"))).as("nsk"), col("surt")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val admitCand = ranked.where(col("rn") <= floor(col("tokens_refilled")))
    // In the politeness-bound regime (token admissions ≤ K, the steady state)
    // the global budget never binds — skip the top-K entirely, avoiding its
    // single-task merge of numPartitions × K rows. Only a budget-bound round
    // pays for the exact global order-limit.
    val nAdmitCand = admitCand.count()
    val budgetBound = nAdmitCand > cfg.roundBudget
    val admitted = (if (!budgetBound) admitCand
      else admitCand
        .orderBy(col("depth").asc, scoreKey(col("score")).desc, col("surt").asc)
        .limit(cfg.roundBudget))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- J2 fetch: the simulated web. The admitted side is ≤ K rows →
    // BROADCAST it and stream `pages`, so the fat html column is never
    // shuffled (right_outer preserves admitted rows for 404 detection).
    // Only (url, html) of pages is read (column pruning).
    // ONE fused scan UDF per page (single UTF-8 decode → links + text). ----
    val admittedSlim = admitted.select("surt", "url", "host", "host_bucket", "depth", "score")
    val fetchJoined =
      if (cfg.roundBudget <= cfg.broadcastFetchMaxBudget)
        pages.select(col("url"), col("html")).join(broadcast(admittedSlim), Seq("url"), "right_outer")
      else // merge join: zero shuffle/sort on a url-bucketed+sorted corpus
        pages.select(col("url"), col("html")).join(admittedSlim.hint("merge"), Seq("url"), "right_outer")
    val fetched = fetchJoined
      .withColumn("status", when(col("html").isNull, lit(404)).otherwise(lit(200)))
      .withColumn("scan", when(col("status") === 200, UrlFunctions.pageScanUdf(col("html"))))
      .withColumn("links", coalesce(col("scan.links"),
        array().cast("array<struct<href:string,anchor:string>>")))
      .withColumn("n_links", size(col("links")))
      .withColumn("text_xxh64",
        when(col("status") === 200, xxhash64(col("scan.text"))).otherwise(lit(0L)))
      .drop("html", "scan")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val fetchLog = fetched.select(
      lit(round).as("round"), col("surt"), col("url"), col("host"),
      col("status"), col("n_links").cast("int").as("n_links"),
      col("text_xxh64"), spark_partition_id().as("partition_id"))

    // ---- X1/U6/U2/U4 candidate generation + P1/P2 filters.
    // One fused UDF per link: resolve + canonicalize + host + path + surt ----
    val rawCand = fetched.where(col("status") === 200 && col("n_links") > 0)
      .select(
        col("surt").as("parent_surt"),
        col("url").as("base_url"),
        col("depth").as("parent_depth"),
        (col("score") / greatest(col("n_links"), lit(1))).as("contrib"),
        explode(col("links")).as("link"))
      .withColumn("cp", UrlFunctions.resolveCanonUdf(col("base_url"), col("link").getField("href")))
      .where(col("cp").isNotNull &&
        (col("cp.url").startsWith("http://") || col("cp.url").startsWith("https://")) &&
        length(col("cp.url")) <= cfg.maxPathLength &&
        col("parent_depth") < cfg.maxDepth)
      .where(allowPathUdf(col("cp.host"), col("cp.path")))
      .withColumn("curl", col("cp.url"))
      .withColumn("chost", col("cp.host"))
      .withColumn("csurt", col("cp.surt"))

    // ---- D1 in-batch dedup (deterministic min-struct, NOT dropDuplicates)
    //      + A3 OPIC cash accumulation, folded into the same shuffle ----
    val cands = rawCand
      .groupBy(col("csurt").as("surt"))
      .agg(
        min(struct(
          col("parent_depth").as("pd"), col("parent_surt").as("ps"),
          col("curl").as("u"), col("chost").as("h"))).as("f"),
        sum(col("contrib")).as("score"))
      .select(
        col("surt"),
        col("f.u").as("url"),
        col("f.h").as("host"),
        UrlFunctions.hostBucket(col("f.h"), cfg.buckets).as("host_bucket"),
        xxhash64(col("surt")).as("url_hash"),
        (col("f.pd") + 1).cast("int").as("depth"),
        col("score"),
        lit(round).as("discovered_round"),
        col("f.ps").as("parent_surt"))
      .repartition(cfg.buckets, col("host_bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- D2 bloom fast path (map-side) + D3 exact anti-join ----
    val blooms = SeenStore.readAll(seenDir(stateDir), prevV)
    val maybeSeen = SeenStore.maybeSeenUdf(spark, blooms)
    val definitelyNew = cands.where(!maybeSeen(col("host_bucket"), col("url_hash")))
    val needExact = cands.where(maybeSeen(col("host_bucket"), col("url_hash")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the seen set is the big side: semi-reduce it with the (small,
    // bloom-positive) probe set broadcast BOTH ways, so seen is only ever
    // scanned (narrow surt column), never shuffled
    val seenHits = seen.select("surt")
      .join(broadcast(needExact.select("surt")), Seq("surt"), "left_semi")
    val resolvedNew = needExact.join(broadcast(seenHits), Seq("surt"), "left_anti")
    val newEntries = definitelyNew.unionByName(resolvedNew)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- O3 next frontier = (frontier − admitted) ∪ new. NO anti-join:
    // admission is rank ≤ ⌊tokens⌋ AND ord ≤ the global-K boundary value
    // (the max ordering tuple among admitted — a total order, surt unique),
    // so carried falls out of the already-windowed, already-cached frontier.
    val carried =
      if (!budgetBound) ranked.where(!(col("rn") <= floor(col("tokens_refilled"))))
      else {
        val thRow = admitted.agg(max(col("ord"))).head()
        if (thRow.isNullAt(0)) ranked
        else {
          val th = thRow.getStruct(0)
          val thLit = struct(
            lit(th.getInt(0)).as("depth"),
            lit(th.getLong(1)).as("nsk"),
            lit(th.getString(2)).as("surt"))
          ranked.where(!(col("rn") <= floor(col("tokens_refilled")) && col("ord") <= thLit))
        }
      }
    val nextFrontier = carried.select(frontierCols.map(col): _*)
      .unionByName(newEntries.select(frontierCols.map(col): _*))

    val timing = sys.env.contains("GRAFT_TIMING")
    var tMark = System.nanoTime()
    def mark(label: String): Unit = if (timing) {
      val now = System.nanoTime()
      System.err.println(f"[round $round%3d] $label%-12s ${(now - tMark) / 1e9}%6.2fs")
      tMark = now
    }

    // ---- counters (M1): one agg over the cached fetch (admitted rows are
    // preserved by the fetch join since pages.url is unique), plus counts on
    // the two cached frontiersides ----
    val fs = fetched.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(col("status") === 200, 1L).otherwise(0L)), lit(0L)).as("n200")).head()
    val nAdmitted = fs.getLong(0)
    val nFetched200 = fs.getLong(1)
    mark("fetch+scan")
    val nCands = cands.count()
    mark("candidates")
    val nNew = newEntries.count()
    mark("dedup")
    val counters = Map(
      "admitted" -> nAdmitted, "fetched200" -> nFetched200,
      "candidates" -> nCands, "new_urls" -> nNew,
      "dedup_dropped" -> (nCands - nNew))

    // hosts with admissions: consume tokens, stamp last_round (lazy refill)
    val touched = admitted.groupBy(col("host")).agg(
      count(lit(1)).as("n_admitted"),
      first(col("tokens_refilled")).as("tr"),
      first(col("delay")).as("delay"),
      first(col("host_bucket")).as("host_bucket"))
      .select(
        col("host"), col("host_bucket"),
        (col("tr") - col("n_admitted")).as("tokens"),
        col("delay").as("crawl_delay_rounds"),
        lit(round).as("last_round"))
    val hostCols = Seq("host", "host_bucket", "tokens", "crawl_delay_rounds", "last_round")
    val nextHostState = hostState.join(broadcast(touched.select("host")), Seq("host"), "left_anti")
      .select(hostCols.map(col): _*)
      .unionByName(touched.select(hostCols.map(col): _*))

    val newSeen = newEntries.select(
      col("surt"), col("url_hash"), col("host_bucket"), lit(round).as("first_round"))

    // ---- S4 snapshot commits. The four tables commit CONCURRENTLY (every
    // input is already cached, so no shared recompute); crash-consistency
    // needs no ordering because Resume takes the MIN committed version across
    // tables and reads every table at that explicit version (time travel) —
    // a table whose CURRENT is ahead is simply read one snapshot back. ----
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val commits = Seq(
      Future(StateTable.commit(nextFrontier, frontierDir(stateDir), version, round, counters)),
      Future {
        StateTable.commitAppend(newSeen, seenDir(stateDir), version, round, counters)
        val totalSeen = StateTable.totalRows(seenDir(stateDir), prevV) + nNew
        SeenStore.update(
          spark, seenDir(stateDir), Some(prevV), version, newSeen,
          StateTable.readAppended(spark, seenDir(stateDir), Some(version), Some(graft.model.Schemas.urlSeen)),
          expectedPerBucket = totalSeen * 2 / cfg.buckets + 1024L, cfg)
      },
      Future(StateTable.commit(nextHostState, hostStateDir(stateDir), version, round, counters)),
      Future(StateTable.commitAppend(fetchLog, fetchLogDir(stateDir), version, round, counters)))
    Await.result(Future.sequence(commits), Duration.Inf)
    mark("commits")

    ranked.unpersist()
    admitted.unpersist()
    fetched.unpersist()
    cands.unpersist()
    needExact.unpersist()
    newEntries.unpersist()

    RoundCounters(round, nAdmitted, nFetched200, nCands, nNew, nCands - nNew)
  }
}

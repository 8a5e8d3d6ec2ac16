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
    val allowUdf = udf((host: String, url: String) => {
      val p = UrlCanon.parse(url)
      p != null && robotsBc.value.get(host).forall(_.allows(p.path))
    })

    // ---- T1 token refill + W1/W2 politeness admission + O2 global budget ----
    val withTokens = frontier
      .join(hostState.select(col("host"), col("tokens"), col("last_round")), Seq("host"), "left")
      .withColumn("delay", delayUdf(col("host")))
      .withColumn("tokens_refilled", least(
        lit(cfg.burstTokens),
        coalesce(col("tokens"), lit(cfg.initialTokens)) +
          (lit(round) - coalesce(col("last_round"), lit(round - 1))) / col("delay")))

    val wHost = Window.partitionBy("host")
      .orderBy(col("depth").asc, scoreKey(col("score")).desc, col("surt").asc)
    val admitted = withTokens
      .withColumn("rn", row_number().over(wHost))
      .where(col("rn") <= floor(col("tokens_refilled")))
      .orderBy(col("depth").asc, scoreKey(col("score")).desc, col("surt").asc)
      .limit(cfg.roundBudget)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- J2 fetch: the simulated web; only (url, html) of pages is read ----
    val fetched = admitted
      .select("surt", "url", "host", "host_bucket", "depth", "score")
      .join(pages.select(col("url"), col("html")), Seq("url"), "left")
      .withColumn("status", when(col("html").isNull, lit(404)).otherwise(lit(200)))
      .withColumn("links",
        when(col("status") === 200, UrlFunctions.extractLinksUdf(col("html")))
          .otherwise(array().cast("array<struct<href:string,anchor:string>>")))
      .withColumn("n_links", size(col("links")))
      .withColumn("text_xxh64",
        when(col("status") === 200, xxhash64(UrlFunctions.extractTextUdf(col("html"))))
          .otherwise(lit(0L)))
      .drop("html")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val fetchLog = fetched.select(
      lit(round).as("round"), col("surt"), col("url"), col("host"),
      col("status"), col("n_links").cast("int").as("n_links"),
      col("text_xxh64"), spark_partition_id().as("partition_id"))

    // ---- X1/U6/U2/U4 candidate generation + P1/P2 filters ----
    val rawCand = fetched.where(col("status") === 200 && col("n_links") > 0)
      .select(
        col("surt").as("parent_surt"),
        col("url").as("base_url"),
        col("depth").as("parent_depth"),
        (col("score") / greatest(col("n_links"), lit(1))).as("contrib"),
        explode(col("links")).as("link"))
      .withColumn("curl", UrlFunctions.canonUdf(
        UrlFunctions.resolveUdf(col("base_url"), col("link").getField("href"))))
      .where(col("curl").isNotNull &&
        (col("curl").startsWith("http://") || col("curl").startsWith("https://")) &&
        length(col("curl")) <= cfg.maxPathLength &&
        col("parent_depth") < cfg.maxDepth)
      .withColumn("chost", UrlFunctions.hostOfUdf(col("curl")))
      .where(allowUdf(col("chost"), col("curl")))
      .withColumn("csurt", UrlFunctions.surtUdf(col("curl")))

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
    val resolvedNew = needExact.join(seen.select("surt"), Seq("surt"), "left_anti")
    val newEntries = definitelyNew.unionByName(resolvedNew)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- O3 next frontier = (frontier − admitted) ∪ new ----
    val carried = frontier.join(admitted.select("surt"), Seq("surt"), "left_anti")
    val nextFrontier = carried.select(frontierCols.map(col): _*)
      .unionByName(newEntries.select(frontierCols.map(col): _*))

    // ---- counters (M1) ----
    val nAdmitted = admitted.count()
    val nFetched200 = fetched.where(col("status") === 200).count()
    val nCands = cands.count()
    val nNew = newEntries.count()
    val counters = Map(
      "admitted" -> nAdmitted, "fetched200" -> nFetched200,
      "candidates" -> nCands, "new_urls" -> nNew,
      "dedup_dropped" -> (nCands - nNew))

    // ---- S4 snapshot commits (ordered; resume takes min committed) ----
    StateTable.commit(nextFrontier, frontierDir(stateDir), version, round, counters)

    val newSeen = newEntries.select(
      col("surt"), col("url_hash"), col("host_bucket"), lit(round).as("first_round"))
    StateTable.commitAppend(newSeen, seenDir(stateDir), version, round, counters)
    SeenStore.update(
      spark, seenDir(stateDir), Some(prevV), version, newSeen,
      StateTable.readAppended(spark, seenDir(stateDir), Some(version), Some(graft.model.Schemas.urlSeen)),
      expectedPerBucket = math.max(1024L, (nNew * 8) / cfg.buckets + 1024L), cfg)

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
    val nextHostState = hostState.join(touched.select("host"), Seq("host"), "left_anti")
      .select(hostCols.map(col): _*)
      .unionByName(touched.select(hostCols.map(col): _*))
    StateTable.commit(nextHostState, hostStateDir(stateDir), version, round, counters)

    StateTable.commitAppend(fetchLog, fetchLogDir(stateDir), version, round, counters)

    admitted.unpersist()
    fetched.unpersist()
    cands.unpersist()
    newEntries.unpersist()

    RoundCounters(round, nAdmitted, nFetched200, nCands, nNew, nCands - nNew)
  }
}

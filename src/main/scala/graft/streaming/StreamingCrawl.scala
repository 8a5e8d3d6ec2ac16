package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

import graft.model.Schemas
import graft.sources.StateTable

/** Structured Streaming surface (SURVEY.md §2.11): the engine's primary loop
  * is checkpointed batch rounds; these operators witness the streaming
  * equivalents over the same data model.
  *
  * ST1 — file-stream ingest of `pages` with one crawl-ingest step per
  *       micro-batch via foreachBatch + Trigger.AvailableNow.
  * ST2 — watermarked event-time windows over `warc_ts` (tumbling, sliding,
  *       session) for late-page handling.
  * ST3 — per-host token bucket as keyed state via flatMapGroupsWithState
  *       (the streaming twin of the batch T1 refill arithmetic).
  * ST4 — exactly-once sink: the snapshot commit is idempotent per batchId,
  *       so replayed micro-batches are no-ops.
  */
object StreamingCrawl {

  // ---- ST1: streaming pages ingest, one ingest step per micro-batch ----

  def pagesStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Schemas.pages)
      .option("maxFilesPerTrigger", 4)
      .parquet(dir)

  /** Ingest each micro-batch into an append-mode state table, exactly once:
    * version = batchId, and StateTable.commit is idempotent per version, so a
    * restarted query that replays a batch commits nothing twice (ST4).
    */
  def ingestQuery(spark: SparkSession, pagesDir: String, stateDir: String,
      checkpoint: String): StreamingQuery =
    pagesStream(spark, pagesDir)
      .select(col("url"), col("warc_ts"), xxhash64(col("url")).as("url_hash"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StateTable.commitAppend(batch, s"$stateDir/ingested", batchId, batchId,
          Map("batch" -> batchId))
        ()
      }
      .start()

  // ---- ST2: watermark + event-time windows over warc_ts ----

  def tumblingCounts(pages: DataFrame): DataFrame =
    pages
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "1 hour"), col("lang"))
      .agg(count(lit(1)).as("n_pages"))
      .select(col("window.start").as("win_start"), col("lang"), col("n_pages"))

  def slidingCounts(pages: DataFrame): DataFrame =
    pages
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_pages"))
      .select(col("window.start").as("win_start"), col("n_pages"))

  def sessionCounts(pages: DataFrame): DataFrame =
    pages
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(session_window(col("warc_ts"), "30 minutes"), col("lang"))
      .agg(count(lit(1)).as("n_pages"))
      .select(col("session_window.start").as("sess_start"), col("lang"), col("n_pages"))

  // ---- ST3: stateful per-host token bucket ----

  final case class HostReq(host: String, round: Long)
  final case class BucketState(tokens: Double, lastRound: Long)
  final case class Admission(host: String, round: Long, admitted: Int, tokensLeft: Double)

  /** ONE shared refill/admit fold — the cross-engine politeness arithmetic
    * (T1). All three streaming twins and the batch demo go through here so
    * the burst/refill semantics cannot drift between copies (they are a
    * cross-engine equivalence contract with the batch engine). A host with
    * no prior state starts from `initialTokens` with lastRound =
    * firstRound − 1, exactly the batch engine's coalesce defaults
    * (CrawlRound's admit arithmetic over host_state). Rows need not be
    * pre-sorted; admissions come out in round order.
    */
  private def admitRounds(
      host: String,
      rows: Seq[HostReq],
      prior: Option[BucketState],
      burst: Double,
      delayRounds: Double,
      initialTokens: Double): (Seq[Admission], BucketState) = {
    val s0 = prior.getOrElse(
      BucketState(initialTokens, rows.iterator.map(_.round).min - 1))
    var tokens = s0.tokens
    var last = s0.lastRound
    val out = rows.groupBy(_.round).toSeq.sortBy(_._1).map { case (round, rs) =>
      tokens = math.min(burst, tokens + (round - last) / delayRounds)
      last = round
      val admitted = math.min(rs.size, math.floor(tokens).toInt)
      tokens -= admitted
      Admission(host, round, admitted, tokens)
    }
    (out, BucketState(tokens, last))
  }

  /** The T1 refill arithmetic as keyed streaming state: for each micro-batch
    * of per-host fetch requests, refill lazily from the stored state, admit
    * up to ⌊tokens⌋, carry the remainder in GroupState. Burst/delay/initial
    * tokens match the batch engine so both paths admit identically on
    * identical inputs (pass cfg.initialTokens when it is not the default).
    */
  def tokenBucket(
      reqs: Dataset[HostReq],
      burst: Double,
      delayRounds: Double,
      initialTokens: Double = 1.0): Dataset[Admission] = {
    import reqs.sparkSession.implicits._
    reqs.groupByKey(_.host)
      .flatMapGroupsWithState[BucketState, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (host, rows, state: GroupState[BucketState]) =>
          val (out, next) = admitRounds(
            host, rows.toSeq, state.getOption, burst, delayRounds, initialTokens)
          state.update(next)
          out.iterator
      }
  }

  /** ST3 PRIMARY path: the same token-bucket arithmetic as an arbitrary-
    * stateful `StatefulProcessor` (Spark 4 `transformWithState`, RocksDB
    * state store) — typed ValueState per host, exactly the batch T1 refill.
    * The flatMapGroupsWithState twin above remains as the fallback path.
    */
  class TokenBucketProcessor(burst: Double, delayRounds: Double,
      initialTokens: Double = 1.0)
      extends StatefulProcessor[String, HostReq, Admission] {
    @transient private var state: ValueState[BucketState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BucketState](
        "bucket", Encoders.product[BucketState], TTLConfig.NONE)
    override def handleInputRows(
        host: String, rows: Iterator[HostReq], timerValues: TimerValues): Iterator[Admission] = {
      val (out, next) = admitRounds(
        host, rows.toSeq, Option(state.get()), burst, delayRounds, initialTokens)
      state.update(next)
      out.iterator
    }
  }

  /** ST3 via transformWithState (requires the RocksDB state store provider:
    * set spark.sql.streaming.stateStore.providerClass to
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    * on the streaming query's session).
    */
  def tokenBucketTws(
      reqs: Dataset[HostReq],
      burst: Double,
      delayRounds: Double,
      initialTokens: Double = 1.0): Dataset[Admission] = {
    import reqs.sparkSession.implicits._
    reqs.groupByKey(_.host)
      .transformWithState(
        new TokenBucketProcessor(burst, delayRounds, initialTokens),
        TimeMode.None(), OutputMode.Append())
  }

  /** Drive the ST3 bucket over a memory-stream-free path: batch Dataset in,
    * streaming semantics exercised via the same shared fold applied per
    * (host) group — used by tests and demos.
    */
  def tokenBucketBatch(spark: SparkSession, reqs: Seq[HostReq],
      burst: Double = 2.0, delayRounds: Double = 1.0,
      initialTokens: Double = 1.0): Seq[Admission] =
    reqs.groupBy(_.host).toSeq.flatMap { case (host, rows) =>
      admitRounds(host, rows, None, burst, delayRounds, initialTokens)._1
    }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{StateTable, SyntheticWeb}
import graft.streaming.StreamingCrawl

/** ST1-ST4 streaming surface (SURVEY.md §2.11). */
class StreamingSpec extends AnyFunSuite with SparkTestSession {

  val web = SyntheticWeb.WebConfig(seed = 42L, nPages = 200, nHosts = 10)

  def writePagesDir(): String = {
    val dir = tmpDir("stream-pages")
    SyntheticWeb.pages(spark, web).toDF()
      .repartition(8) // multiple files → multiple micro-batches with maxFilesPerTrigger
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("ST1/ST4: streaming ingest via foreachBatch, AvailableNow, exactly-once commits") {
    val pagesDir = writePagesDir()
    val stateDir = tmpDir("stream-state")
    val ckpt = tmpDir("stream-ckpt")
    val q = StreamingCrawl.ingestQuery(spark, pagesDir, stateDir, ckpt)
    q.awaitTermination()
    val ingested = StateTable.readAppended(spark, s"$stateDir/ingested")
    assert(ingested.count() == web.nPages)
    assert(StateTable.versions(s"$stateDir/ingested").size >= 2, "multiple micro-batches")
    // ST4 exactly-once: re-running the same query over the same checkpoint
    // finds no new files and commits nothing new
    val q2 = StreamingCrawl.ingestQuery(spark, pagesDir, stateDir, ckpt)
    q2.awaitTermination()
    assert(StateTable.readAppended(spark, s"$stateDir/ingested").count() == web.nPages)
    // idempotent per version even if a batch were replayed
    val v0 = StateTable.versions(s"$stateDir/ingested").head
    val before = StateTable.manifest(s"$stateDir/ingested", v0).get.nRows
    import spark.implicits._
    StateTable.commitAppend(Seq(("x", new java.sql.Timestamp(0), 1L))
      .toDF("url", "warc_ts", "url_hash"), s"$stateDir/ingested", v0, v0)
    assert(StateTable.manifest(s"$stateDir/ingested", v0).get.nRows == before)
  }

  test("ST2: watermarked tumbling/sliding/session windows run on a stream") {
    val pagesDir = writePagesDir()
    val stream = StreamingCrawl.pagesStream(spark, pagesDir)
    assert(stream.isStreaming)
    val outDir = tmpDir("stream-win")

    val q = StreamingCrawl.tumblingCounts(stream).writeStream
      .option("checkpointLocation", tmpDir("ckpt-t"))
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", s"$outDir/tumbling")
      .start()
    q.awaitTermination()
    // append mode only emits windows the watermark has passed; verify against
    // the batch computation of the same closed windows
    val batchAll = StreamingCrawl.tumblingCounts(SyntheticWeb.pages(spark, web).toDF())
    val emitted = spark.read.parquet(s"$outDir/tumbling")
    val joined = emitted.alias("e").join(batchAll.alias("b"), Seq("win_start", "lang"))
      .where(col("e.n_pages") =!= col("b.n_pages"))
    assert(joined.count() == 0, "streamed window counts must match batch")

    // sliding + session shapes execute on the stream (plan validity)
    val q2 = StreamingCrawl.slidingCounts(stream).writeStream
      .option("checkpointLocation", tmpDir("ckpt-s"))
      .outputMode("append").trigger(Trigger.AvailableNow())
      .format("memory").queryName("slide_out").start()
    q2.awaitTermination()
    val q3 = StreamingCrawl.sessionCounts(stream).writeStream
      .option("checkpointLocation", tmpDir("ckpt-w"))
      .outputMode("append").trigger(Trigger.AvailableNow())
      .format("memory").queryName("sess_out").start()
    q3.awaitTermination()
    assert(spark.sql("SELECT * FROM slide_out").columns.contains("n_pages"))
    assert(spark.sql("SELECT * FROM sess_out").columns.contains("n_pages"))
  }

  test("ST3: stateful token bucket admits exactly like the batch arithmetic") {
    import spark.implicits._
    val reqs = for {
      host <- Seq("a.example", "b.example")
      round <- 1L to 6L
      _ <- 0 until 3 // 3 requests per host per round
    } yield StreamingCrawl.HostReq(host, round)

    // streaming state function over a memory stream
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingCrawl.HostReq](spark)
    input.addData(reqs)
    val q = StreamingCrawl.tokenBucket(input.toDS(), burst = 2.0, delayRounds = 1.0)
      .writeStream
      .option("checkpointLocation", tmpDir("ckpt-tb"))
      .outputMode("append")
      .format("memory").queryName("tb_out")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT host, round, admitted FROM tb_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

    val batch = StreamingCrawl.tokenBucketBatch(spark, reqs)
      .map(a => (a.host, a.round, a.admitted)).toSet
    assert(streamed == batch, "streaming state ≡ batch token arithmetic")
    // politeness: never more than floor(burst)=2 admitted per host-round
    assert(streamed.forall(_._3 <= 2))
  }

  test("ST3 primary: transformWithState (RocksDB store) ≡ batch arithmetic") {
    import spark.implicits._
    val reqs = for {
      host <- Seq("a.example", "b.example", "c.example")
      round <- 1L to 5L
      _ <- 0 until 3
    } yield StreamingCrawl.HostReq(host, round)

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingCrawl.HostReq](spark)
      input.addData(reqs)
      val q = StreamingCrawl.tokenBucketTws(input.toDS(), burst = 2.0, delayRounds = 1.0)
        .writeStream
        .option("checkpointLocation", tmpDir("ckpt-tws"))
        .outputMode("append")
        .format("memory").queryName("tws_out")
        .start()
      q.processAllAvailable()
      q.stop()
      val streamed = spark.sql("SELECT host, round, admitted FROM tws_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val batch = StreamingCrawl.tokenBucketBatch(spark, reqs)
        .map(a => (a.host, a.round, a.admitted)).toSet
      assert(streamed == batch, "transformWithState ≡ batch token arithmetic")
      assert(streamed.forall(_._3 <= 2))
    } finally {
      before match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}

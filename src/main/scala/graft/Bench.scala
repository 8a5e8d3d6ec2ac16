package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.model.CrawlConfig
import graft.plans.Crawler
import graft.sources.SyntheticWeb

/** Driver bench (one JSON line on stdout) + the BASELINE.md scaling protocol.
  *
  * Part 1 — times every SparkEntry query on SPARK_GRAFT_SF_DIR at
  * local[SPARK_GRAFT_CPUS].
  *
  * Part 2 — the north-rule metric: frontier-expansion URLs/sec on the
  * deterministic synthetic web, measured at local[8] and local[32] over the
  * SAME parquet corpus (the sandbox substitution for N vs 4N executors —
  * SURVEY.md §0.5), with scaling efficiency = (u32/u8)/4. Protocol per
  * BASELINE.md: 2 warm-up rounds excluded, URLs/sec = Σ admitted / wall-sec
  * of the measured rounds. Results also land in BENCH/BASELINE.md.
  *
  * Env knobs: SPARK_GRAFT_BENCH_CRAWL=0 skips part 2;
  * SPARK_GRAFT_BENCH_PAGES / _HOSTS / _SEEDS / _ROUNDS size it.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.locality.wait", "0")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register the bucketed corpus in this session's (in-memory) catalog and
    * return the bucketed scan — SMJ against it needs no shuffle/sort on the
    * pages side (SURVEY.md §4.2 bucketing).
    */
  private def bucketedPages(spark: SparkSession, corpusDir: String) = {
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")
    spark.sql(
      s"""CREATE TABLE pages_bucketed
         |(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
         |USING parquet
         |CLUSTERED BY (url) SORTED BY (url) INTO 64 BUCKETS
         |LOCATION '$corpusDir/pages_bucketed'""".stripMargin)
    spark.table("pages_bucketed")
  }

  private def crawlRun(cores: Int, corpusDir: String, web: SyntheticWeb.WebConfig,
      seeds: Seq[String], cfg: CrawlConfig, warmup: Int, measured: Int): (Double, Double) = {
    val spark = session(cores)
    try {
      val pages = bucketedPages(spark, corpusDir)
      val robots = SyntheticWeb.robotsTable(spark, web)
      val state = Files.createTempDirectory(s"graft-bench-$cores").toString
      // warm-up rounds (JIT + codegen + shuffle service warm paths)
      Crawler.crawl(spark, state, pages, robots, seeds, cfg, warmup)
      val t0 = System.nanoTime()
      val counters = Crawler.crawl(spark, state, pages, robots, seeds, cfg, warmup + measured)
      val secs = (System.nanoTime() - t0) / 1e9
      val admitted = counters.map(_.admitted).sum
      (admitted / secs, secs)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    // ---- part 1: operator query bench (driver contract) ----
    val doQueries = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES", "1") == "1"
    val results = if (!doQueries) Seq.empty[(String, Double)] else {
      val spark1 = session(cpus.toInt)
      val r = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark1, sfDir).count() } catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
      spark1.stop()
      r
    }

    // ---- part 2: crawl scaling (the BASELINE.md protocol) ----
    val doCrawl = sys.env.getOrElse("SPARK_GRAFT_BENCH_CRAWL", "1") == "1"
    val crawlJson = if (!doCrawl) "" else {
      val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "400000").toLong
      val nHosts = sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS", "20000").toInt
      val nSeeds = sys.env.getOrElse("SPARK_GRAFT_BENCH_SEEDS", "20000").toInt
      val measured = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "8").toInt
      val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "40000").toInt
      val web = SyntheticWeb.WebConfig(seed = 42L, nPages = nPages, nHosts = nHosts)
      val cfg = CrawlConfig(roundBudget = budget)
      val corpus = Files.createTempDirectory("graft-bench-corpus").toString
      val sGen = session(32)
      try SyntheticWeb.pages(sGen, web).toDF()
        .write.bucketBy(64, "url").sortBy("url")
        .option("path", s"$corpus/pages_bucketed")
        .mode("overwrite")
        .saveAsTable("pages_bucketed_gen")
      finally sGen.stop()
      val seeds = SyntheticWeb.seeds(web, nSeeds)

      val (u8, s8) = crawlRun(8, corpus, web, seeds, cfg, 2, measured)
      val (u32, s32) = crawlRun(32, corpus, web, seeds, cfg, 2, measured)
      val eff = (u32 / u8) / 4.0

      val md =
        f"""# BENCH — measured baseline (protocol: BASELINE.md / SURVEY.md §6)
           |
           |Corpus: deterministic synthetic web, seed=42, $nPages%d pages,
           |$nHosts%d hosts, $nSeeds%d seeds, budget K=${cfg.roundBudget}%d,
           |2 warm-up rounds + $measured%d measured rounds, URLs/sec = Σ admitted / wall-sec.
           |local[8] vs local[32] on the same parquet corpus is the sandbox
           |substitution for N vs 4N executors (no real cluster available).
           |
           || metric | value |
           || --- | --- |
           || URLs/sec @ local[8] | ${u8}%.1f |
           || URLs/sec @ local[32] | ${u32}%.1f |
           || wall sec @ local[8] | ${s8}%.1f |
           || wall sec @ local[32] | ${s32}%.1f |
           || scaling efficiency (u32/u8)/4 | ${eff}%.3f |
           |""".stripMargin
      Files.createDirectories(Paths.get("BENCH"))
      Files.writeString(Paths.get("BENCH/BASELINE.md"), md)

      f""","urls_per_sec_local8":${u8}%.2f,"urls_per_sec_local32":${u32}%.2f,"scaling_efficiency":${eff}%.4f"""
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""\":${v}%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":${total}%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"$crawlJson}""")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.CrawlConfig
import graft.operators.Match
import graft.plans.{Crawler, CrawlRound}
import graft.sources.{StateTable, SyntheticWeb}

/** Match.matchByKey / Match.diffByKey — the cross-set matching and
  * snapshot-diff operators (SURVEY §0.4 capability 2/4). Hand-data edge
  * classes here; end-to-end value agreement vs DuckDB rides the driver
  * oracle (`q_match_transfer`, `q_snapshot_diff`).
  */
class MatchSpec extends AnyFunSuite with SparkTestSession {

  test("matchByKey: classification, attribute transfer, and loud collisions") {
    import spark.implicits._
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, null.asInstanceOf[String]))
      .toDF("k", "attr_a")
    val b = Seq((2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "attr_b")
    val got = Match.matchByKey(a, b, "k")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getAs[String]("attr_a"),
        if (r.isNullAt(r.fieldIndex("attr_b"))) None else Some(r.getLong(r.fieldIndex("attr_b"))),
        r.getAs[String]("match_status"))).toSeq
    assert(got == Seq(
      (1L, "a1", None, "a_only"),
      (2L, "a2", Some(20L), "both"),
      (3L, null, Some(30L), "both"), // null payload on a matched row stays 'both'
      (4L, null, Some(40L), "b_only")))
    // payload name collision must fail loudly, not join ambiguously
    val clash = Seq((1L, "x")).toDF("k", "attr_a")
    intercept[IllegalArgumentException](Match.matchByKey(a, clash, "k"))
  }

  test("diffByKey: added/removed/changed with null-payload edges; unchanged emits nothing") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("v"), Some(1)),  // unchanged
      (2L, Some("v"), Some(1)),  // value change
      (3L, None, Some(1)),       // null → value = changed
      (4L, Some("v"), None),     // value → null = changed
      (5L, None, None),          // all-null payload, unchanged (≠ absent!)
      (6L, Some("v"), Some(1))   // removed
    ).toDF("k", "p1", "p2")
    val after = Seq(
      (1L, Some("v"), Some(1)),
      (2L, Some("w"), Some(1)),
      (3L, Some("v"), Some(1)),
      (4L, None, None),
      (5L, None, None),
      (7L, None, None)           // added with all-null payload
    ).toDF("k", "p1", "p2")
    val got = Match.diffByKey(before, after, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((2L, "changed"), (3L, "changed"), (4L, "changed"),
      (6L, "removed"), (7L, "added")))
    intercept[IllegalArgumentException](
      Match.diffByKey(before, after.withColumnRenamed("p2", "zz"), Seq("k")))
  }

  test("nearMatchByText ≡ brute-force all-pairs argmax; tie → smallest b_id") {
    import spark.implicits._
    import graft.operators.TextDedup.{shinglesUdf, jaccardUdf}
    // sentences with graded word overlap + an exact tie: b=21 and b=23 carry
    // IDENTICAL text so a=2's best jaccard is tied and must resolve to 21
    val base = "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn"
    val a = Seq(
      (0L, base),
      (2L, "completely different words about spark catalyst optimizer rules and codegen"),
      (4L, "zebra xylophone quartz jigsaw vortex")   // no match anywhere
    ).toDF("doc_id", "text")
    val b = Seq(
      (1L, base + " extra"),                          // near-dup of 0
      (21L, "words about spark catalyst optimizer rules and codegen plus tail"),
      (23L, "words about spark catalyst optimizer rules and codegen plus tail"), // tie twin
      (5L, "unrelated filler content entirely elsewhere")
    ).toDF("doc_id", "text")

    val got = Match.nearMatchByText(a, b, "doc_id", "text", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq

    // brute force with the same kernel, argmax in plain scala
    val pairs = a.select(col("doc_id").as("a_id"), shinglesUdf(col("text"), lit(3)).as("sa"))
      .crossJoin(b.select(col("doc_id").as("b_id"), shinglesUdf(col("text"), lit(3)).as("sb")))
      .withColumn("j", round(jaccardUdf(col("sa"), col("sb")), 6))
      .where(col("j") >= 0.2)
      .select("a_id", "b_id", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = pairs.groupBy(_._1).map { case (aid, ps) =>
      val mj = ps.map(_._3).max
      (aid, ps.filter(_._3 == mj).map(_._2).min, mj)
    }.toSeq.sortBy(_._1)

    assert(got == brute, s"got $got vs brute $brute")
    assert(got.exists(_._1 == 0L), "near-dup pair missed")
    val tieRow = got.find(_._1 == 2L)
    assert(tieRow.exists(_._2 == 21L), s"tie not broken to smallest b_id: $tieRow")
    assert(!got.exists(_._1 == 4L), "matched a document with no candidate above threshold")
  }

  test("nearMatchByText: hot boilerplate bucket is capped, distinct pairs survive") {
    import spark.implicits._
    val boiler = "copyright footer terms privacy contact subscribe newsletter follow us social"
    val a = (0L until 40L).map(i => (i * 2, boiler)).toDF("doc_id", "text")
      .union(Seq((1000L, "a genuinely unique sentence about migrating herons over tidal marshes")).toDF("doc_id", "text"))
    val b = (0L until 40L).map(i => (i * 2 + 1, boiler)).toDF("doc_id", "text")
      .union(Seq((1001L, "a genuinely unique sentence about migrating herons over tidal marshes today")).toDF("doc_id", "text"))
    // cap below the boilerplate cluster's 40×40 pair volume: the degenerate
    // bucket is dropped, the unique near-dup pair is still found
    val got = Match.nearMatchByText(a, b, "doc_id", "text",
        threshold = 0.5, maxBucketPairs = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1000L, 1001L)), s"got $got")
  }

  test("J9 banding recall follows 1-(1-j^r)^b at controlled Jaccard (r4 verdict #8)") {
    import spark.implicits._
    // Controlled-similarity corpus generator, second corpus class (the
    // documents table pins recall only at its own one j-regime): P pairs per
    // Jaccard level, each pair in its OWN disjoint token universe so its
    // only nonzero-jaccard partner is its twin and the measured match rate
    // IS the banding candidate recall. k=1 (unigram shingles) makes the
    // realized Jaccard exact: |A∩B|=s, |A∪B|=2T-s ⇒ j=s/(2T-s).
    val levels = Seq( // (j, tokens-per-side T, shared s) with s/(2T-s) exact
      (0.5, 15, 10), (0.7, 17, 14), (0.9, 19, 18))
    val pairsPerLevel = 150
    def text(universe: String, idxs: Seq[Int]) = idxs.map(i => s"$universe$i").mkString(" ")
    val rows = for {
      ((j, t, s), li) <- levels.zipWithIndex
      p <- 0 until pairsPerLevel
    } yield {
      val u = s"l${li}p${p}t"
      val aId = li * 100000L + p
      // A = tokens 0..T-1; B = tokens 0..s-1 (shared) ++ T..2T-s-1 (private)
      (aId, text(u, 0 until t), aId + 50000L, text(u, (0 until s) ++ (t until (2 * t - s))), j)
    }
    val a = rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
    val b = rows.map(r => (r._3, r._4)).toDF("doc_id", "text")
    // two band geometries trace the curve's shape, not just one point:
    // (m=16,b=2 ⇒ r=8) and (m=16,b=4 ⇒ r=4)
    for ((m, bandsN) <- Seq((16, 2), (16, 4))) {
      val r = m / bandsN
      val matched = Match.nearMatchByText(a, b, "doc_id", "text",
          k = 1, m = m, bands = bandsN, threshold = 0.3)
        .select("a_id").as[Long].collect().toSet
      levels.zipWithIndex.foreach { case ((j, _, _), li) =>
        val hits = (0 until pairsPerLevel).count(p => matched.contains(li * 100000L + p))
        val empirical = hits.toDouble / pairsPerLevel
        val theory = 1.0 - math.pow(1.0 - math.pow(j, r), bandsN)
        // 4σ binomial noise + 2% minhash-row-dependence slack
        val tol = 4 * math.sqrt(theory * (1 - theory) / pairsPerLevel) + 0.02
        assert(math.abs(empirical - theory) <= tol,
          f"banding (m=$m,b=$bandsN,r=$r) at j=$j: empirical $empirical%.3f vs " +
            f"theory $theory%.3f (tol $tol%.3f)")
      }
    }
  }

  test("diffByKey over real versioned state tables: seen is append-exact, frontier balances") {
    val web = SyntheticWeb.WebConfig(seed = 7L, nPages = 600, nHosts = 24)
    val pages = SyntheticWeb.pages(spark, web).toDF()
    val robots = SyntheticWeb.robotsTable(spark, web)
    val cfg = CrawlConfig(buckets = 8, roundBudget = 60, maxDepth = 10)
    val dir = tmpDir("match-crawl")
    Crawler.crawl(spark, dir, pages, robots, SyntheticWeb.seeds(web, 8), cfg, 4)

    // url_seen is append-only: diff v2 → v4 must be exactly the rows first
    // seen in rounds 3..4, all 'added', none removed/changed
    val seenDir = CrawlRound.seenDir(dir)
    def seenAt(v: Long) = StateTable.readAppended(spark, seenDir, Some(v))
    val d = Match.diffByKey(seenAt(2L), seenAt(4L), Seq("surt")).cache()
    val added = seenAt(4L).where(col("first_round") > 2).count()
    assert(d.where(col("change") === "added").count() == added)
    assert(d.where(col("change") =!= "added").count() == 0, "append-only table changed/removed rows")
    assert(added > 0, "vacuous diff")

    // frontier (merge-on-read): keys removed between versions are exactly
    // the admitted rows of the intervening rounds (admission is the only
    // deleter), keys added are the newly discovered ones
    val fDir = CrawlRound.frontierDir(dir)
    def frontAt(v: Long) = StateTable.readMerged(spark, fDir, Some(v))
    val fd = Match.diffByKey(
      frontAt(2L).select("surt", "depth", "discovered_round"),
      frontAt(4L).select("surt", "depth", "discovered_round"), Seq("surt")).cache()
    val removed = fd.where(col("change") === "removed").count()
    val addedF = fd.where(col("change") === "added").count()
    val n2 = frontAt(2L).count(); val n4 = frontAt(4L).count()
    assert(n4 - n2 == addedF - removed, "diff does not balance the version row counts")
    assert(fd.where(col("change") === "changed").count() == 0,
      "a frontier key changed payload — rows are immutable by construction")
    assert(addedF > 0 && removed > 0, "vacuous frontier diff")
  }
}

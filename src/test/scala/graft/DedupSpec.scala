package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** Dedup-family correctness: simhash banding recall is EXACT for the
  * requested hamming distance (the round-1 verdict's recall hole), and the
  * shuffle-dieted minhash pipeline produces the same pairs as a plain
  * band self-join reference.
  */
class DedupSpec extends AnyFunSuite with SparkTestSession {

  test("simhashBands: maxDist+1 disjoint slices covering all 64 bits") {
    for (d <- Seq(0, 1, 3, 7, 10, 31, 63)) {
      val bands = TextDedup.simhashBands(d)
      assert(bands.length == d + 1)
      assert(bands.map(_._2).sum == 64)
      assert(bands.map(_._2).max - bands.map(_._2).min <= 1)
      // contiguous, disjoint coverage
      assert(bands.scanLeft(0)((acc, b) => acc + b._2).init == bands.map(_._1))
    }
  }

  test("simhash pairs: exhaustive recall — every pair within maxDist found") {
    import spark.implicits._
    // clustered values: a few base points plus perturbations at controlled
    // hamming distances, so pairs exist at every distance 0..12
    val rnd = new scala.util.Random(7)
    val bases = Seq.fill(6)(rnd.nextLong())
    val sims = bases.zipWithIndex.flatMap { case (b, bi) =>
      (0 to 12).map { d =>
        var v = b
        val flips = rnd.shuffle((0 until 64).toList).take(d)
        flips.foreach(bit => v ^= (1L << bit))
        (bi * 100L + d, v)
      }
    }
    val df = sims.toDF("id", "sim")
    for (maxDist <- Seq(3, 10)) {
      val got = TextDedup.simhashPairsFromSims(df, maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- sims; (ib, sb) <- sims
        if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb)
        if h <= maxDist
      } yield (ia, ib, h)).toSet
      assert(got == want,
        s"maxDist=$maxDist missed ${(want -- got).size} pairs, extra ${(got -- want).size}")
    }
  }

  test("minhash hot-band cap drops degenerate buckets, keeps real near-dups") {
    import spark.implicits._
    // 60 near-empty docs share one signature → every band is one degenerate
    // bucket of 60 ids (the O(bucket²) single-task blowup the cap prevents);
    // plus two genuine near-duplicates that collide in normal-sized buckets
    val docs = ((0 until 60).map(i => (i.toLong, "x")) ++ Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (101L, "the quick brown fox jumps over the lazy dog again and again and again today")))
      .toDF("doc_id", "text")
    val capped = TextDedup.minhashCandidates(docs, "doc_id", "text", maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((100L, 101L)), "real near-dup pair lost to the cap")
    assert(!capped.exists(p => p._1 < 60 && p._2 < 60),
      "degenerate >cap bucket still generated pairs")
    // the cap is the only thing separating the two runs
    val uncapped = TextDedup.minhashCandidates(docs, "doc_id", "text", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)))
    assert((uncapped -- capped).forall(p => p._1 < 60 && p._2 < 60))
    assert(uncapped.exists(p => p._1 < 60 && p._2 < 60))
  }

  test("count-first cap shape: the bucket filter sits BELOW every id-list collect (r4 verdict #1)") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"token$i shared common words here")).toDF("doc_id", "text")
    // L2: the plan's collect_list aggregate must have the cap's LEFT-SEMI
    // join underneath it — the oversized bucket is gone BEFORE any list
    // aggregation buffer can materialize it
    // the plan builder, pre-checkpoint: minhashCandidates wraps this in
    // evaluatedOnce (persist + eager cut), which would hide the shape
    val banded = docs
      .select(col("doc_id").as("id"), TextDedup.shinglesUdf(col("text"), lit(3)).as("sh"))
      .select(col("id"),
        posexplode(TextDedup.bandsUdf(TextDedup.minhashUdf(col("sh"), lit(64)), lit(16), lit(4)))
          .as(Seq("band_idx", "band_hash")))
    val l2 = TextDedup.minhashCandidatesFromBanded(banded, maxBucket = 10)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val collectAggs = l2.collect {
      case agg: Aggregate if agg.aggregateExpressions.exists(_.toString.contains("collect_list")) => agg
    }
    assert(collectAggs.nonEmpty, "L2 plan lost its collect_list aggregate")
    assert(collectAggs.forall(_.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty),
      "a collect_list aggregate has no cap semi-join below it — the list materializes pre-cap")
    // J9: no list/set aggregation anywhere in the candidate path — the
    // count-first rewrite expands buckets by equi-join, never by collect.
    // Asserted on the lazy candidate plan builder: nearMatchByText cuts the
    // candidate set eagerly (evaluate-banded-once), which would hide it.
    val j9 = graft.operators.Match.fuzzyCandidatePlan(
        graft.operators.Match.bandedSide(docs.limit(20), "a_id", "doc_id", "text", 3, 64, 32),
        graft.operators.Match.bandedSide(docs.limit(20), "b_id", "doc_id", "text", 3, 64, 32),
        maxBucketPairs = 1000000)
      .queryExecution.optimizedPlan
    assert(!j9.toString.contains("collect_set") && !j9.toString.contains("collect_list"),
      "J9 plan still materializes bucket id lists in an aggregation buffer")
  }

  test("capBuckets: no surviving join bucket exceeds the cap or is a singleton") {
    import spark.implicits._
    // skewed key distribution: key 0 holds 500 rows (hot), keys 1..20 hold
    // 1..20 rows — exercising the drop-above-cap and drop-singleton edges
    val rows = (0 until 500).map(i => (i.toLong, 0L)) ++
      (1 to 20).flatMap(k => (0 until k).map(i => (1000L * k + i, k.toLong)))
    val df = rows.toDF("id", "bucket")
    val cap = 10
    val kept = TextDedup.capBuckets(df, Seq("bucket"), cap)
    val sizes = kept.groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(n => n >= 2 && n <= cap),
      s"bucket size out of [2,$cap]: $sizes")
    // kept is EXACTLY the rows of in-range buckets — nothing dropped inside
    // a surviving bucket, nothing retained from a hot or singleton bucket
    val wantKeys = (2 to cap).map(_.toLong).toSet
    assert(sizes.keySet == wantKeys, s"surviving buckets $sizes != $wantKeys")
    assert(kept.count() == wantKeys.map(identity).sum)
  }

  test("simhash hot-band cap drops degenerate buckets, keeps real near-dups") {
    import spark.implicits._
    // 40 identical simhashes → every band is one degenerate 40-id bucket
    // (the O(bucket²) single-join-task blowup the cap prevents); plus a
    // genuine near-dup pair at hamming 1 in its own normal-sized buckets
    val a = 0x0f0f0f0f0f0f0f0fL
    val sims = (0 until 40).map(i => (i.toLong, 0L)) ++ Seq((100L, a), (101L, a ^ 1L))
    val df = sims.toDF("id", "sim")
    val capped = TextDedup.simhashPairsFromSims(df, maxDist = 3, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped == Set((100L, 101L, 1)),
      s"capped run must keep exactly the real near-dup pair: $capped")
    // the cap is the only thing separating the two runs
    val uncapped = TextDedup.simhashPairsFromSims(df, maxDist = 3, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(uncapped.contains((100L, 101L, 1)))
    assert(uncapped.exists(p => p._1 < 40 && p._2 < 40),
      "degenerate cluster pairs absent even uncapped — vacuous test")
    assert((uncapped -- capped).forall(p => p._1 < 40 && p._2 < 40))
  }

  test("embedding hot-bucket cap drops degenerate LSH buckets, keeps near pair") {
    import spark.implicits._
    // 30 identical vectors → one degenerate LSH bucket with cos 1.0 pairs;
    // plus a near-identical pair elsewhere in hyperplane space
    val u = Array.fill(8)(1.0f)
    val v1 = Array.tabulate(8)(i => if (i == 0) -1.0f else -0.9f)
    val v2 = Array.tabulate(8)(i => if (i == 0) -1.0f else -0.91f)
    val emb = ((0 until 30).map(i => (i.toLong, u.toSeq)) ++
      Seq((100L, v1.toSeq), (101L, v2.toSeq))).toDF("vec_id", "embedding")
    val capped = TextDedup.embeddingPairs(emb, "vec_id", "embedding",
        planes = 6, threshold = 0.95, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      s"capped run must keep exactly the real near pair: $capped")
    val uncapped = TextDedup.embeddingPairs(emb, "vec_id", "embedding",
        planes = 6, threshold = 0.95, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)))
    assert(uncapped.exists(p => p._1 < 30 && p._2 < 30),
      "degenerate cluster pairs absent even uncapped — vacuous test")
    assert((uncapped -- capped).forall(p => p._1 < 30 && p._2 < 30))
  }

  test("minhash pairs: shuffle-dieted pipeline equals band self-join reference") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (k, m, bands, threshold) = (3, 64, 16, 0.3)
    val got = TextDedup.minhashPairs(docs, "doc_id", "text", k, m, bands, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // reference: the naive self-join over band keys carrying shingles through
    val rows = m / bands
    val banded = docs.select(
        col("doc_id").as("id"), TextDedup.shinglesUdf(col("text"), lit(k)).as("sh"))
      .withColumn("sig", TextDedup.minhashUdf(col("sh"), lit(m)))
      .select(col("id"), col("sh"),
        posexplode(TextDedup.bandsUdf(col("sig"), lit(bands), lit(rows)))
          .as(Seq("band_idx", "band_hash")))
    val l = banded.select(col("id").as("a"), col("sh").as("sha"), col("band_idx"), col("band_hash"))
    val r = banded.select(col("id").as("b"), col("sh").as("shb"), col("band_idx"), col("band_hash"))
    val want = l.join(r, Seq("band_idx", "band_hash"))
      .where(col("a") < col("b"))
      .select("a", "b", "sha", "shb").distinct()
      .withColumn("jaccard", round(TextDedup.jaccardUdf(col("sha"), col("shb")), 6))
      .where(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got == want, s"diff: missing=${(want -- got).size} extra=${(got -- want).size}")
    assert(got.nonEmpty, "trivially-empty comparison")
  }

  test("evaluatedOnce provenance: shingle kernel runs exactly once per doc (r5 verdict #7)") {
    // the dedup family's dominant CPU is the shingle+minhash UDF subtree; the
    // count-first cap references the banded frame twice (size aggregation +
    // semi-join probe) and the pair expansion twice more. evaluatedOnce's
    // persist + eager cut is what keeps that at ONE kernel run per row —
    // this pins it by counting actual invocations, so removing the persist
    // (which would re-run the subtree per reference) fails loudly. The r5
    // bench cost of the eager cut (~+0.5-1 s/query at sf0.1, VERDICT r5
    // "Wrong" #2) buys exactly this single evaluation.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    TextDedup.shingleInvocations.reset()
    TextDedup.minhashCandidates(docs, "doc_id", "text", k = 3, m = 64, bands = 16).count()
    val calls = TextDedup.shingleInvocations.sum()
    assert(calls == n, s"shingle kernel ran $calls times for $n docs — " +
      "the banded frame is being re-evaluated across the cap's references")
  }

  test("inverted-index jaccard (q_dedup_jaccard) equals direct pairwise formulation") {
    // the engine query computes |A∩B| by exploding shingles and equi-joining
    // on the shingle; this pins it against the direct array_intersect/union
    // NL-join it replaced (which in turn matched the DuckDB oracle)
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_dedup_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= lit(""))
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .where(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), greatest(size(col("toks")) - 3, lit(0))),
        i => array_join(slice(col("toks"), i + lit(1), lit(3)), " "))).as("sh"))
    val l = d.select(col("doc_id").as("a"), col("sh").as("sha"))
    val r = d.select(col("doc_id").as("b"), col("sh").as("shb"))
    val want = l.join(r, col("a") < col("b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          greatest(size(array_union(col("sha"), col("shb"))), lit(1)), 6))
      .where(col("jaccard") >= 0.01)
      .select("a", "b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got == want, s"diff: missing=${(want -- got).size} extra=${(got -- want).size}")
    assert(got.nonEmpty, "trivially-empty comparison")
  }
}

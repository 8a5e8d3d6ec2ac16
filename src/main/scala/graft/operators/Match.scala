package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Cross-set entity matching — the engine's transposition of the reference's
  * core capability (spiderosm `match.py` matches jurisdiction vs OSM street
  * networks on canonical names and transfers attributes across; public
  * knowledge, SURVEY.md §0.4 — /root/reference is empty, §0.1). The web
  * counterparts: reconcile two crawls' URL sets on the canonical SURT key,
  * classify every entity as matched / A-only / B-only, and carry attributes
  * from the matched side over; diff two snapshot versions of a state table.
  *
  * Scale shape: both operators are ONE shuffled full-outer hash join on the
  * match key (full-outer cannot broadcast — Spark has no broadcast arm that
  * preserves the unmatched build side — so the shuffle is inherent; with
  * both sides bucketed by the key in the table layout it becomes a
  * co-located zipper). No window, no sort, no driver-side row data.
  */
object Match {

  /** One scored candidate (and the argmax buffer/result). */
  final case class BestPair(b_id: Long, jaccard: Double)

  /** Hash-aggregable argmax: highest jaccard, ties to the smallest b_id.
    *
    * Why not `max(struct(...))` or `max_by(...)`: both carry struct-typed
    * aggregation buffers, which have no mutable-buffer representation, so
    * Spark plans them as SortAggregate — a per-group SORT of the whole
    * candidate set. A typed Aggregator runs as ObjectHashAggregate (same
    * family as AdmitTopK / the bloom UDAF): one hash probe + compare per
    * row, partial-aggregated map-side before the shuffle. Plan-asserted in
    * PlanSpec.
    *
    * The sentinel jaccard = -1 is strictly below any real score (≥ 0), and
    * the (jaccard DESC, b_id ASC) order is total over distinct b_ids, so
    * the fold is commutative/associative — parallelism-independent.
    */
  private final class BestMatchAgg extends Aggregator[BestPair, BestPair, BestPair] {
    private def better(x: BestPair, y: BestPair): BestPair =
      if (y.jaccard > x.jaccard || (y.jaccard == x.jaccard && y.b_id < x.b_id)) y else x
    override def zero: BestPair = BestPair(Long.MaxValue, -1.0)
    override def reduce(b: BestPair, a: BestPair): BestPair = better(b, a)
    override def merge(x: BestPair, y: BestPair): BestPair = better(x, y)
    override def finish(b: BestPair): BestPair = b
    override def bufferEncoder: Encoder[BestPair] = Encoders.product[BestPair]
    override def outputEncoder: Encoder[BestPair] = Encoders.product[BestPair]
  }

  /** Match two keyed entity sets on `key`, keeping every entity from either
    * side: one output row per key present in A or B, all of A's and B's
    * payload columns (null on the absent side — B's attributes ride the
    * matched rows: the attribute-transfer join), plus a `match_status`
    * column ∈ {'both', 'a_only', 'b_only'}.
    *
    * Payload column names must not collide across sides (rename upstream) —
    * enforced here so a collision fails loudly instead of producing an
    * ambiguous-column surprise downstream.
    *
    * Key multiplicity: rows are matched as-is; if a key repeats on both
    * sides the join fans out (standard join semantics). Callers wanting
    * entity-level 1:1 matching dedup to one row per key upstream.
    */
  def matchByKey(a: DataFrame, b: DataFrame, key: String,
      statusCol: String = "match_status"): DataFrame = {
    val dup = (a.columns.toSet - key).intersect(b.columns.toSet - key)
    require(dup.isEmpty, s"payload column collision across sides: $dup")
    // the internal presence markers must fail as loudly as payload
    // collisions: withColumn would silently REPLACE a same-named input
    // column and then drop it below
    val markers = Set("_present_a", "_present_b")
    val clash = (a.columns ++ b.columns).filter(markers).distinct
    require(clash.isEmpty, s"reserved marker column name in input: ${clash.mkString(",")}")
    // presence markers: payload columns can be legitimately null, so absence
    // must be detected on a column that is non-null by construction
    val am = a.withColumn("_present_a", lit(true))
    val bm = b.withColumn("_present_b", lit(true))
    am.join(bm, Seq(key), "full_outer")
      .withColumn(statusCol,
        when(col("_present_a").isNotNull && col("_present_b").isNotNull, "both")
          .when(col("_present_a").isNotNull, "a_only")
          .otherwise("b_only"))
      .drop("_present_a", "_present_b")
  }

  /** Fuzzy cross-set match (record linkage): for each entity in A, the best
    * near-matching entity in B by word-shingle Jaccard of a text column —
    * the reference's fuzzy-match capability (spiderosm matches street
    * entities whose names/geometries are close but not identical; SURVEY
    * §0.4) transposed to text similarity. Entities with no B match ≥
    * `threshold` emit nothing; compose with [[matchByKey]] on the returned
    * (a_id, b_id) pairs to classify + transfer attributes afterwards.
    *
    * Plan shape — NO all-pairs anywhere:
    *  1. candidates via cross-set MinHash LSH banding: each side shuffles
    *     ONLY (id, band_idx, band_hash); buckets join band-key to band-key,
    *     so a candidate costs one ids-only row, never a shingle array.
    *     Defaults (m=64, bands=32 → r=2) give candidate recall
    *     1-(1-j²)³² ≈ 0.9999 at j = 0.5 — the same banding the END-TO-END
    *     DuckDB-oracled `q_dedup_minhash_verify` pins recall 1.0 with on
    *     this corpus class; the 1-(1-j^r)^b curve itself is property-pinned
    *     on a second, controlled-Jaccard corpus class at j ∈ {0.5,0.7,0.9}
    *     across two band geometries (MatchSpec, round 5).
    *  2. hot buckets are capped by PAIR COUNT before expansion, COUNT-FIRST
    *     (round 5, r4 verdict #1): per-side bucket sizes pre-aggregate as
    *     plain counts (map-side combine) and the `na × nb ≤ maxBucketPairs`
    *     filter runs on the counts alone; surviving buckets expand via a
    *     plain ids-only equi-join. No aggregation buffer ever materializes
    *     a bucket's id list (the former `collect_set` built the whole
    *     degenerate bucket on one row BEFORE its cap could run). Dropped
    *     buckets are the same documented recall trade as TextDedup's
    *     `maxBucket` — a degenerate band value indicates shared
    *     boilerplate, not pairwise similarity (L2's rationale).
    *  3. exact-Jaccard rerank only on candidates: shingle arrays re-attach
    *     BY ID (two joins with the small candidate set on the build side).
    *  4. per-A argmax as ONE hash aggregation — a typed argmax Aggregator
    *     ([[BestMatchAgg]]) picks highest Jaccard, ties to the smallest
    *     b_id; no window, no sort (see the Aggregator's doc for why the
    *     builtin max/max_by forms sort-aggregate). Jaccard is quantized to
    *     6 dp BEFORE the argmax so the tie-break is deterministic across
    *     engines (oracle-hash-stable).
    *
    * `idCol` must fit a Long (the argmax buffer carries it as
    * `BestPair.b_id`); output columns `(a_id, b_id, jaccard)`.
    */
  def nearMatchByText(a: DataFrame, b: DataFrame, idCol: String, textCol: String,
      k: Int = 3, m: Int = 64, bands: Int = 32, threshold: Double = 0.5,
      maxBucketPairs: Int = 1000000): DataFrame = {
    import TextDedup.{shinglesUdf, jaccardUdf}
    require(m % bands == 0, s"bands=$bands must divide m=$m")
    // each side's banded frame is referenced twice (count aggregation +
    // semi-join/expansion) — persist across the references and cut the
    // bounded candidate set eagerly below, so the shingle+minhash UDFs (the
    // dominant CPU) run once per row, not once per reference (the agg-side
    // and join-side exchanges differ, so Catalyst cannot reuse them)
    val ba = bandedSide(a, "a_id", idCol, textCol, k, m, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bb = bandedSide(b, "b_id", idCol, textCol, k, m, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand =
      try fuzzyCandidatePlan(ba, bb, maxBucketPairs)
        .localCheckpoint(true) // ≤ buckets × maxBucketPairs rows by the cap
      finally { ba.unpersist(); bb.unpersist() }
    val sha = a.select(col(idCol).as("a_id"), shinglesUdf(col(textCol), lit(k)).as("sha"))
    val shb = b.select(col(idCol).as("b_id"), shinglesUdf(col(textCol), lit(k)).as("shb"))
    cand.join(sha, Seq("a_id")).join(shb, Seq("b_id"))
      .withColumn("jaccard", round(jaccardUdf(col("sha"), col("shb")), 6))
      .where(col("jaccard") >= threshold)
      .groupBy("a_id")
      .agg(udaf(new BestMatchAgg(), Encoders.product[BestPair])(
        col("b_id"), col("jaccard")).as("best"))
      .select(col("a_id"), col("best.b_id").as("b_id"),
        col("best.jaccard").as("jaccard"))
  }

  /** One side's (id, band_idx, band_hash) frame: shingle → minhash → bands. */
  private[graft] def bandedSide(df: DataFrame, side: String, idCol: String,
      textCol: String, k: Int, m: Int, bands: Int): DataFrame = {
    import TextDedup.{shinglesUdf, minhashUdf, bandsUdf}
    // not floored (round 6): four floored subtrees cost four extra
    // exchanges + AQE stages per query — measured net +0.65 s at sf0.1
    df.select(col(idCol).as(side), shinglesUdf(col(textCol), lit(k)).as("sh"))
      .select(col(side),
        posexplode(bandsUdf(minhashUdf(col("sh"), lit(m)), lit(bands), lit(m / bands)))
          .as(Seq("band_idx", "band_hash")))
  }

  /** The LAZY candidate plan over two banded sides — separated so plan-shape
    * tests and the plan dump can assert the count-first cap + ids-only
    * expansion without [[nearMatchByText]]'s eager checkpoint hiding it.
    *
    * Count-first cap: per-side bucket sizes as plain counts (each id emits
    * each band_idx once, so rows-per-bucket = distinct ids). The per-side
    * `≤ maxBucketPairs` guards BOTH the Long product (counts capped at
    * 2^31-ish ⇒ product < 2^62, no overflow at any table size — the old
    * size()-based filter needed an explicit cast for exactly this) AND the
    * one-sided degenerate bucket whose partner side is tiny. Expansion is a
    * plain ids-only equi-join on the surviving band keys: per-bucket output
    * is na×nb ≤ maxBucketPairs rows by the filter above, and no task ever
    * holds more than a join buffer of one bucket's side.
    */
  private[graft] def fuzzyCandidatePlan(ba: DataFrame, bb: DataFrame,
      maxBucketPairs: Int): DataFrame = {
    val bandKeys = Seq("band_idx", "band_hash")
    val okKeys = ba.groupBy(bandKeys.map(col): _*).agg(count(lit(1)).as("na"))
      .join(bb.groupBy(bandKeys.map(col): _*).agg(count(lit(1)).as("nb")), bandKeys)
      .where(col("na") <= maxBucketPairs.toLong && col("nb") <= maxBucketPairs.toLong &&
        col("na") * col("nb") <= maxBucketPairs.toLong)
      .select(bandKeys.map(col): _*)
    ba.join(okKeys, bandKeys, "left_semi")
      .join(bb.join(okKeys, bandKeys, "left_semi"), bandKeys)
      .select("a_id", "b_id")
      .distinct()
  }

  /** Keyed diff of two versions of the same relation: one row per key whose
    * row was added, removed, or changed between `before` and `after`;
    * unchanged keys produce no output. `change` ∈ {'added', 'removed',
    * 'changed'}. Payload comparison is exact null-safe struct equality over
    * the non-key columns (schemas must match).
    *
    * This is the incremental-export operator over the engine's versioned
    * state tables: `diffByKey(StateTable.read(.., v1), StateTable.read(..,
    * v2), Seq("surt"))` is "what did rounds v1+1..v2 do", computed from the
    * snapshots alone. Wide payloads ride the shuffle once on each side;
    * callers diffing a projection should project first.
    */
  def diffByKey(before: DataFrame, after: DataFrame, keys: Seq[String],
      changeCol: String = "change"): DataFrame = {
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema mismatch: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val nonKey = before.columns.filterNot(keys.contains).sorted.toSeq
    // a present row always yields a NON-NULL struct (even if every payload
    // field is null), so struct-null-ness is exactly join-side absence; zero
    // payload columns degenerate to a boolean marker
    def side(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+
        (if (nonKey.isEmpty) lit(true).as(as) else struct(nonKey.map(col): _*).as(as)): _*)
    side(before, "_b").join(side(after, "_a"), keys, "full_outer")
      .withColumn(changeCol,
        when(col("_b").isNull, "added")
          .when(col("_a").isNull, "removed")
          .when(!(col("_b") <=> col("_a")), "changed"))
      .where(col(changeCol).isNotNull)
      .select(keys.map(col) :+ col(changeCol): _*)
  }
}

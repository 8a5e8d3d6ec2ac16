package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Bloom64, BloomAggregator}
import graft.model.CrawlConfig

/** URL-seen bloom sidecars — SURVEY.md D2/A6, the DRUM-inspired fast path.
  *
  * One Bloom64 per host_bucket, persisted as little-endian longs at
  * `<seenDir>/_bloom/<version>/bucket-<k>.bloom`, built incrementally: each
  * commit ORs the previous version's filter with a filter of only the NEW
  * entries (one aggregation pass over the delta, map-side partials — no
  * full-seen rescan per round). A bucket whose saturation exceeds 0.5 is
  * rebuilt at double size from the full seen set (rare; logged in the name).
  *
  * Probe semantics: mightContain=false ⇒ definitely unseen (admit without
  * touching the exact set); true ⇒ maybe seen ⇒ resolved by the exact
  * anti-join (D3). Membership therefore stays exact while the anti-join's
  * probe side shrinks to (new ∪ false-positives) — the property P4 test pins
  * "no false negatives".
  */
object SeenStore {

  private def bloomDir(seenDir: String, v: Long) = Paths.get(seenDir, "_bloom", v.toString)

  def write(seenDir: String, v: Long, blooms: Map[Int, Array[Long]]): Unit = {
    val dir = bloomDir(seenDir, v)
    Files.createDirectories(dir)
    blooms.foreach { case (bucket, bf) =>
      val bb = java.nio.ByteBuffer.allocate(bf.length * 8)
      bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bf.foreach(bb.putLong)
      Files.write(dir.resolve(s"bucket-$bucket.bloom"), bb.array())
    }
  }

  def readAll(seenDir: String, v: Long): Map[Int, Array[Long]] = {
    val dir = bloomDir(seenDir, v)
    if (!Files.exists(dir)) return Map.empty
    Files.list(dir).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".bloom"))
      .map { p =>
        val bucket = p.getFileName.toString.stripPrefix("bucket-").stripSuffix(".bloom").toInt
        val bytes = Files.readAllBytes(p)
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val arr = new Array[Long](bytes.length / 8)
        var i = 0
        while (i < arr.length) { arr(i) = bb.getLong(); i += 1 }
        bucket -> arr
      }.toMap
  }

  /** Build per-bucket blooms over `url_hash` (shape m bits) in ONE pass. */
  def buildBlooms(df: DataFrame, m: Long): Map[Int, Array[Long]] = {
    val agg = udaf(new BloomAggregator(m))
    df.groupBy(col("host_bucket"))
      .agg(agg(col("url_hash")).as("bloom"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
      .toMap
  }

  /** Incremental update: build delta blooms AT THE PREVIOUS SHAPE and OR them
    * in (one aggregation over the delta only — never a full-seen rescan in
    * the steady state). A saturated or undersized generation triggers one
    * amortized doubling rebuild from `fullSeen` (all buckets, next power of
    * two) — the classic growable-bloom schedule.
    */
  def update(
      spark: SparkSession,
      seenDir: String,
      prevVersion: Option[Long],
      newVersion: Long,
      delta: DataFrame,
      fullSeen: => DataFrame,
      expectedPerBucket: Long,
      cfg: CrawlConfig): Map[Int, Array[Long]] = {
    val prev = prevVersion.map(readAll(seenDir, _)).getOrElse(Map.empty)
    val wantM = Bloom64.optimalBits(math.max(1024L, expectedPerBucket), cfg.bloomFpp)
    val prevM = prev.values.headOption.map(_(0)).getOrElse(0L)

    val result =
      if (prev.isEmpty) {
        buildBlooms(delta, wantM)
      } else if (wantM > prevM) {
        // amortized doubling: rebuild everything at the larger shape
        buildBlooms(fullSeen, math.max(wantM, prevM * 2))
      } else {
        val deltaBlooms = buildBlooms(delta, prevM)
        val merged = (prev.keySet ++ deltaBlooms.keySet).iterator.map { bucket =>
          bucket -> ((prev.get(bucket), deltaBlooms.get(bucket)) match {
            case (Some(a), Some(b)) => Bloom64.merge(a.clone(), b)
            case (Some(a), None) => a
            case (None, Some(b)) => b
            case (None, None) => Bloom64.emptyBits(prevM)
          })
        }.toMap
        if (merged.values.exists(Bloom64.saturation(_) > 0.5))
          buildBlooms(fullSeen, prevM * 2)
        else merged
      }
    write(seenDir, newVersion, result)
    result
  }

  /** Map-side probe column: true ⇒ maybe seen (must hit exact anti-join). */
  def maybeSeenUdf(spark: SparkSession, blooms: Map[Int, Array[Long]]) = {
    val bc = spark.sparkContext.broadcast(blooms)
    udf((bucket: Int, urlHash: Long) =>
      bc.value.get(bucket) match {
        case Some(bf) => Bloom64.mightContain(bf, urlHash)
        case None => false
      })
  }
}

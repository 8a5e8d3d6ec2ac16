package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.functions.{Bloom64, BloomAggregator}
import graft.model.CrawlConfig

/** URL-seen bloom sidecars — SURVEY.md D2/A6, the DRUM-inspired fast path.
  *
  * One Bloom64 per host_bucket, persisted as little-endian longs at
  * `<seenDir>/_bloom/<version>/bucket-<k>.bloom`. Built and written FROM THE
  * EXECUTORS: the per-bucket aggregation's result rows (bucket, bits) are
  * merged with the previous version's file and written directly by the task
  * that holds them — the filter arrays never round-trip through the driver
  * (at 10^10 URLs / fpp 1e-3 that would be ~GBs of driver traffic per round).
  * Only per-bucket saturation scalars are collected, to gate the amortized
  * doubling rebuild.
  *
  * Version resolution is per bucket: a delta commit only rewrites the buckets
  * its delta touched, so the authoritative filter for bucket B at version v
  * is the NEWEST `bucket-B.bloom` at any version ≤ v (each file is the OR of
  * all deltas ≤ its version for that bucket; a bucket untouched since then
  * gained no entries). No copy-forward, no full-directory rewrite.
  *
  * Crash consistency: sidecars are written BETWEEN the seen delta's data
  * write and the snapshot's manifest/CURRENT publish (StateTable.writeSnap /
  * finalizeCommit), so a committed seen version always has complete sidecars.
  * The probe is additionally fail-safe: if no bloom chain exists at all for
  * the probed version (legacy state, deleted sidecars), it returns TRUE —
  * "maybe seen" — routing every candidate to the exact anti-join rather than
  * re-admitting seen URLs.
  *
  * Probe semantics: mightContain=false ⇒ definitely unseen (admit without
  * touching the exact set); true ⇒ maybe seen ⇒ resolved by the exact
  * anti-join (D3). Membership therefore stays exact while the anti-join's
  * probe side shrinks to (new ∪ false-positives) — the property P4 test pins
  * "no false negatives".
  *
  * Paths use java.nio against the shared state directory — the same explicit
  * substitution as StateTable (`[SPEC-S2]`): on a real cluster this is a
  * shared filesystem / object store behind the same thin API.
  */
object SeenStore {

  private def bloomDir(seenDir: String, v: Long): Path = Paths.get(seenDir, "_bloom", v.toString)
  private def bucketFile(seenDir: String, v: Long, bucket: Int): Path =
    bloomDir(seenDir, v).resolve(s"bucket-$bucket.bloom")

  /** Committed bloom versions, ascending (a version dir with a meta file). */
  private[graft] def bloomVersions(seenDir: String): Seq[Long] = {
    val root = Paths.get(seenDir, "_bloom")
    if (!Files.exists(root)) return Seq.empty
    val s = Files.list(root)
    try s.iterator.asScala
      .filter(p => Files.isDirectory(p) && Files.exists(p.resolve("meta")))
      .map(_.getFileName.toString.toLong).toSeq.sorted
    finally s.close()
  }

  /** Bit shape m recorded for the newest bloom version ≤ v (None = no chain). */
  private[graft] def latestBits(seenDir: String, v: Long): Option[Long] =
    bloomVersions(seenDir).filter(_ <= v).lastOption.map { bv =>
      Files.readString(bloomDir(seenDir, bv).resolve("meta")).trim.toLong
    }

  private def writeBucket(seenDir: String, v: Long, bucket: Int, bf: Array[Long]): Unit = {
    val bb = java.nio.ByteBuffer.allocate(bf.length * 8)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bf.foreach(bb.putLong)
    val target = bucketFile(seenDir, v, bucket)
    // tmp name unique PER ATTEMPT: under task retry/speculation two attempts
    // of the same bucket may run concurrently on the shared FS — a fixed tmp
    // name would interleave their writes and the ATOMIC_MOVE could publish a
    // corrupted filter (bloom false negatives ⇒ P4 violation). Each attempt
    // stages to its own file; whichever move lands last wins with complete
    // bytes (both attempts carry identical content for a deterministic agg).
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId.toString)
      .getOrElse(java.util.UUID.randomUUID.toString)
    val tmp = target.resolveSibling(s".${target.getFileName}.tmp-$attempt")
    Files.write(tmp, bb.array())
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Remove staging files a failed/lost task attempt left behind in this
    * version's bloom dir (called at commit time, after all attempts finished).
    */
  private def cleanOrphanTmps(seenDir: String, v: Long): Unit = {
    val d = bloomDir(seenDir, v)
    if (!Files.exists(d)) return
    val s = Files.list(d)
    try s.iterator.asScala
      .filter(_.getFileName.toString.contains(".tmp-"))
      .foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  private def readBucketAt(seenDir: String, v: Long, bucket: Int): Option[Array[Long]] = {
    val p = bucketFile(seenDir, v, bucket)
    if (!Files.exists(p)) None
    else {
      val bytes = Files.readAllBytes(p)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val arr = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < arr.length) { arr(i) = bb.getLong(); i += 1 }
      Some(arr)
    }
  }

  /** Newest filter for `bucket` at any version ≤ v (per-bucket resolution). */
  private[graft] def resolveBucket(seenDir: String, v: Long, bucket: Int): Option[Array[Long]] = {
    val vs = bloomVersions(seenDir).filter(_ <= v).reverse
    vs.iterator.flatMap(readBucketAt(seenDir, _, bucket)).nextOption()
  }

  /** All buckets resolved at version v — DRIVER-side; tests/tools only, never
    * on the round path.
    */
  def readAll(seenDir: String, v: Long): Map[Int, Array[Long]] = {
    val vs = bloomVersions(seenDir).filter(_ <= v)
    if (vs.isEmpty) return Map.empty
    val buckets = vs.flatMap { bv =>
      val s = Files.list(bloomDir(seenDir, bv))
      try s.iterator.asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }.filter(_.endsWith(".bloom"))
      .map(_.stripPrefix("bucket-").stripSuffix(".bloom").toInt).distinct
    buckets.flatMap(b => resolveBucket(seenDir, v, b).map(b -> _)).toMap
  }

  /** Build per-bucket filters of `df` (shape m) and write them from the
    * executors, optionally OR-merging each with its newest predecessor file
    * (≤ mergeUpTo). Returns the max post-merge saturation (tiny collect of
    * one double per bucket — the filters themselves stay on the executors).
    */
  private def buildWrite(
      df: DataFrame,
      m: Long,
      seenDir: String,
      newVersion: Long,
      mergeUpTo: Option[Long]): Double = {
    Files.createDirectories(bloomDir(seenDir, newVersion))
    val agg = udaf(new BloomAggregator(m))
    // explicit repartition after the agg: the result is one row per bucket,
    // so AQE would coalesce the tiny shuffle to ONE partition and a single
    // task would then read-merge-write every bucket file serially (~1s per
    // round measured); an explicit width keeps the file IO parallel
    val perBucket = df.groupBy(col("host_bucket")).agg(agg(col("url_hash")).as("bloom"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("host_bucket"))
    // per-partition imperative sink (the one legitimate RDD drop-down): each
    // task writes the handful of bucket files its partition holds
    val sats = perBucket.rdd.mapPartitions { it =>
      it.map { row =>
        val bucket = row.getInt(0)
        val bits = row.getSeq[Long](1).toArray
        val merged = mergeUpTo.flatMap(resolveBucket(seenDir, _, bucket)) match {
          case Some(prev) => Bloom64.merge(bits, prev)
          case None => bits
        }
        writeBucket(seenDir, newVersion, bucket, merged)
        Bloom64.saturation(merged)
      }
    }.collect()
    if (sats.isEmpty) 0.0 else sats.max
  }

  /** Incremental update: build delta filters AT THE PREVIOUS SHAPE and OR
    * them into the per-bucket chain (one aggregation over the delta only —
    * never a full-seen rescan in the steady state). A missing chain (first
    * commit, or a legacy/crashed sidecar) and an undersized or saturated
    * generation trigger one amortized rebuild from `fullSeen` at the next
    * power-of-two shape. The version's meta marker is written LAST — a
    * version without meta is invisible to resolution and re-built on replay.
    */
  def update(
      spark: SparkSession,
      seenDir: String,
      prevVersion: Option[Long],
      newVersion: Long,
      delta: DataFrame,
      fullSeen: => DataFrame,
      expectedPerBucket: Long,
      cfg: CrawlConfig,
      forceFull: Boolean = false): Unit = {
    val wantM = Bloom64.optimalBits(math.max(1024L, expectedPerBucket), cfg.bloomFpp)
    val prevM = prevVersion.flatMap(latestBits(seenDir, _))
    val m = if (forceFull) {
      // compaction rounds force a full rebuild: every non-empty bucket gets a
      // file AT this version, so bloom dirs below a compacted base are fully
      // shadowed and become GC-able together with their data snapshots
      val mm = math.max(wantM, prevM.getOrElse(wantM))
      buildWrite(fullSeen, mm, seenDir, newVersion, mergeUpTo = None)
      mm
    } else prevM match {
      case None =>
        // no usable chain: rebuild from the FULL seen set (delta alone would
        // under-cover when prior seen versions exist — fail-safe rebuild)
        val mm = wantM
        buildWrite(fullSeen, mm, seenDir, newVersion, mergeUpTo = None)
        mm
      case Some(pm) if wantM > pm =>
        val mm = math.max(wantM, pm * 2)
        buildWrite(fullSeen, mm, seenDir, newVersion, mergeUpTo = None)
        mm
      case Some(pm) =>
        val sat = buildWrite(delta, pm, seenDir, newVersion, mergeUpTo = prevVersion)
        if (sat > 0.5) {
          val mm = pm * 2
          buildWrite(fullSeen, mm, seenDir, newVersion, mergeUpTo = None)
          mm
        } else pm
    }
    cleanOrphanTmps(seenDir, newVersion)
    Files.writeString(bloomDir(seenDir, newVersion).resolve("meta"), m.toString)
  }

  /** GC the bloom sidecar dirs of expired data versions. Only called with
    * versions StateTable.expire already deleted — i.e. versions below a
    * compacted base, whose forceFull rebuild gives every non-empty bucket a
    * file at the base, so no retained probe can resolve to a deleted file.
    */
  def expireBloom(seenDir: String, deadVersions: Seq[Long]): Unit =
    deadVersions.foreach { v =>
      val d = bloomDir(seenDir, v)
      if (Files.exists(d)) {
        val s = Files.walk(d)
        try s.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator.asScala.foreach(Files.deleteIfExists(_))
        finally s.close()
      }
    }

  /** Map-side probe column: true ⇒ maybe seen (must hit exact anti-join).
    * Loads only the probed bucket's filter, lazily, on the executor that
    * needs it (cached per JVM) — nothing is broadcast from the driver.
    */
  def maybeSeenUdf(seenDir: String, version: Long): UserDefinedFunction =
    udf((bucket: Int, urlHash: Long) => BloomProbe.maybeSeen(seenDir, version, bucket, urlHash))
}

/** Executor-local cache of resolved bucket filters. Entries are keyed by
  * (dir, version, bucket); inserting a newer version evicts older versions of
  * the same bucket so steady-state memory is one filter per locally-probed
  * bucket. Thread-safe; loads of the same key may race benignly (same bytes).
  */
private[graft] object BloomProbe {

  private final case class Key(dir: String, version: Long, bucket: Int)
  // value: Array[Long] = filter; FailSafe = no chain (treat as maybe-seen);
  // Empty = chain exists, bucket has no entries (definitely unseen)
  private object FailSafe
  private object Empty
  private val cache = new java.util.concurrent.ConcurrentHashMap[Key, AnyRef]()

  def maybeSeen(seenDir: String, version: Long, bucket: Int, urlHash: Long): Boolean = {
    val key = Key(seenDir, version, bucket)
    var v = cache.get(key)
    if (v == null) {
      v = load(seenDir, version, bucket)
      cache.put(key, v)
      // evict older generations of this bucket
      cache.keySet.removeIf(k =>
        k.dir == seenDir && k.bucket == bucket && k.version < version)
    }
    v match {
      case bits: Array[Long] => graft.functions.Bloom64.mightContain(bits, urlHash)
      case Empty => false
      case _ => true // FailSafe
    }
  }

  private def load(seenDir: String, version: Long, bucket: Int): AnyRef = {
    val vs = SeenStore.bloomVersions(seenDir).filter(_ <= version)
    if (vs.isEmpty) FailSafe
    else SeenStore.resolveBucket(seenDir, version, bucket) match {
      case Some(bits) => bits
      case None => Empty
    }
  }

  private[graft] def clear(): Unit = cache.clear()
}

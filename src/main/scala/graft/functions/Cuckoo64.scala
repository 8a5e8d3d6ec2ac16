package graft.functions

/** Cuckoo filter over 64-bit keys, stored as an Array[Long] — the contract's
  * second URL-seen filter arm ("bloom/cuckoo-filter URL-seen",
  * BASELINE.json north_star). Standard partial-key cuckoo hashing
  * [PAPER: Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter:
  * Practically Better Than Bloom", CoNEXT 2014]: each key stores a 16-bit
  * fingerprint in one of two buckets, i1 = h(key) and i2 = i1 XOR h(fp) —
  * the XOR makes the pair computable from EITHER index plus the
  * fingerprint, which is what enables relocation and deletion without the
  * original key.
  *
  * Why a second arm when bloom already exists: DELETION. A bloom filter can
  * only forget by full rebuild, so after a recrawl expiry every expired URL
  * stays bloom-positive and rides the exact anti-join slow path until the
  * next amortized rebuild. The cuckoo arm deletes the expired fingerprints
  * in place — O(expired) sidecar work — and the fast path stays tight
  * (SURVEY.md §2.5 D5).
  *
  * Layout: slot 0 = number of buckets (power of two), slot 1 = flags
  * (bit 0 = overflow: an insert failed, the filter must fail-safe to
  * "maybe contains" for EVERY probe), slots 2.. = one long per bucket
  * holding 4 × 16-bit fingerprint slots (0 = empty; fingerprints are
  * forced non-zero). 16-bit fingerprints give fpp ≈ 2·4/2^16 ≈ 1.2e-4 at
  * the sized load — below the bloom arm's 1e-3 default.
  *
  * Duplicate keys deliberately store duplicate copies (up to the 8 slots of
  * the two buckets) — required for delete soundness when two live keys
  * share a (bucket, fingerprint) pair: deleting one removes one copy and
  * the other key keeps its own. Deleting a key that was never inserted can
  * evict another key's copy (the classic cuckoo deletion caveat), so the
  * engine only ever deletes keys proven present in the exact seen set.
  */
object Cuckoo64 {

  /** Slots per bucket (b=4 — the paper's sweet spot: ~95% max load). */
  val SlotsPerBucket = 4

  /** Occupancy above which the sidecar schedules an amortized doubling
    * rebuild (margin under the ~95% failure cliff of 4-way cuckoo).
    */
  val SaturationLimit = 0.85

  /** Relocation kicks before declaring overflow (the paper's default). */
  private val MaxKicks = 500

  /** Buckets sized so `expected` keys sit at ≤ ~70% load, rounded up to a
    * power of two (mask-index addressing; shape-stable until a genuine
    * doubling, mirroring Bloom64.optimalBits).
    */
  def optimalBuckets(expected: Long): Long = {
    val want = math.max(4L, math.ceil(expected / (SlotsPerBucket * 0.7)).toLong)
    java.lang.Long.highestOneBit(want * 2 - 1)
  }

  def emptyBuckets(numBuckets: Long): Array[Long] = {
    require(java.lang.Long.bitCount(numBuckets) == 1, s"bucket count must be a power of two: $numBuckets")
    // fail fast, not corrupt state: `.toInt` on ≥ 2^31 silently truncates,
    // allocating a short array whose mask (cf(0)-1) then indexes past it
    require(numBuckets <= (1L << 30),
      s"bucket count $numBuckets overflows Array[Long] addressing (max 2^30); " +
        "shard the filter across buckets instead")
    val arr = new Array[Long](2 + numBuckets.toInt)
    arr(0) = numBuckets
    arr
  }

  def numBuckets(cf: Array[Long]): Long = cf(0)
  def overflowed(cf: Array[Long]): Boolean = (cf(1) & 1L) != 0L

  /** 16-bit non-zero fingerprint of the key (splitmix64 high bits). */
  private def fingerprint(key: Long): Int = {
    val f = (Bloom64.mix(key) >>> 48).toInt & 0xffff
    if (f == 0) 1 else f
  }

  private def index1(cf: Array[Long], key: Long): Int =
    (Bloom64.mix(key ^ 0x632be59bd9b4e019L) & (cf(0) - 1)).toInt

  /** Partner index — XOR with a hash of the fingerprint (an involution, so
    * altIndex(altIndex(i, f), f) == i for any i).
    */
  private def altIndex(cf: Array[Long], i: Int, fp: Int): Int =
    (i ^ (Bloom64.mix(fp.toLong) & (cf(0) - 1))).toInt

  private def slotAt(bucket: Long, s: Int): Int = ((bucket >>> (s * 16)) & 0xffffL).toInt
  private def setSlot(bucket: Long, s: Int, fp: Int): Long =
    (bucket & ~(0xffffL << (s * 16))) | (fp.toLong << (s * 16))

  /** Try to place `fp` in bucket `i`; true on success. */
  private def tryPlace(cf: Array[Long], i: Int, fp: Int): Boolean = {
    val b = cf(2 + i)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotAt(b, s) == 0) { cf(2 + i) = setSlot(b, s, fp); return true }
      s += 1
    }
    false
  }

  /** Insert `key`; mutates `cf`. Returns false (and sets the overflow flag)
    * only when the relocation loop exhausts — from then on every probe
    * fail-safes to true. Deterministic for a fixed insertion sequence; two
    * sequences with the same key SET may place fingerprints differently but
    * agree on membership semantics.
    */
  def insert(cf: Array[Long], key: Long): Boolean = {
    var fp = fingerprint(key)
    val i1 = index1(cf, key)
    if (tryPlace(cf, i1, fp)) return true
    val i2 = altIndex(cf, i1, fp)
    if (tryPlace(cf, i2, fp)) return true
    // relocation: kick a resident fingerprint to its partner bucket.
    // victim slot rotates deterministically with the kick count — no RNG, so
    // executor-side aggregation retries rebuild identical tables for
    // identical input order.
    var i = if ((Bloom64.mix(key) & 1L) == 0L) i1 else i2
    var kicks = 0
    while (kicks < MaxKicks) {
      val s = kicks % SlotsPerBucket
      val b = cf(2 + i)
      val victim = slotAt(b, s)
      cf(2 + i) = setSlot(b, s, fp)
      fp = victim
      i = altIndex(cf, i, fp)
      if (tryPlace(cf, i, fp)) return true
      kicks += 1
    }
    cf(1) |= 1L // overflow: fail-safe, never lose the displaced fingerprint's key
    false
  }

  /** Membership probe; overflowed filters answer true for everything
    * (fail-safe — same direction as a missing sidecar chain).
    */
  def mightContain(cf: Array[Long], key: Long): Boolean = {
    if (overflowed(cf)) return true
    val fp = fingerprint(key)
    val i1 = index1(cf, key)
    if (containsFp(cf, i1, fp)) return true
    containsFp(cf, altIndex(cf, i1, fp), fp)
  }

  private def containsFp(cf: Array[Long], i: Int, fp: Int): Boolean = {
    val b = cf(2 + i)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotAt(b, s) == fp) return true
      s += 1
    }
    false
  }

  /** Remove ONE stored copy of `key`'s fingerprint; true if a copy was
    * removed. Only sound for keys that were actually inserted (see the
    * class doc caveat). Overflowed filters refuse to delete (the lost
    * fingerprint is unidentifiable) and stay fail-safe.
    */
  def delete(cf: Array[Long], key: Long): Boolean = {
    if (overflowed(cf)) return false
    val fp = fingerprint(key)
    val i1 = index1(cf, key)
    if (removeFp(cf, i1, fp)) return true
    removeFp(cf, altIndex(cf, i1, fp), fp)
  }

  private def removeFp(cf: Array[Long], i: Int, fp: Int): Boolean = {
    val b = cf(2 + i)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotAt(b, s) == fp) { cf(2 + i) = setSlot(b, s, 0); return true }
      s += 1
    }
    false
  }

  /** Merge `b` into `a` (same bucket count) by re-inserting every stored
    * fingerprint at its recorded bucket — the (index, fingerprint) pair IS
    * the membership information, so no original keys are needed. Mutates and
    * returns `a`; placement failure or a pre-overflowed side sets `a`'s
    * overflow flag (fail-safe, mirroring Bloom64.merge's shape contract).
    */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a(0) == b(0), s"cuckoo shape mismatch: ${a(0)} vs ${b(0)}")
    if (overflowed(b)) { a(1) |= 1L; return a }
    var i = 0
    val n = b(0).toInt
    while (i < n) {
      val bucket = b(2 + i)
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = slotAt(bucket, s)
        if (fp != 0 && !insertFpAt(a, i, fp)) a(1) |= 1L
        s += 1
      }
      i += 1
    }
    a
  }

  /** Place a bare (index, fingerprint) pair — insert() without the key. */
  private def insertFpAt(cf: Array[Long], i0: Int, fp0: Int): Boolean = {
    if (tryPlace(cf, i0, fp0)) return true
    val alt = altIndex(cf, i0, fp0)
    if (tryPlace(cf, alt, fp0)) return true
    var i = alt
    var fp = fp0
    var kicks = 0
    while (kicks < MaxKicks) {
      val s = kicks % SlotsPerBucket
      val b = cf(2 + i)
      val victim = slotAt(b, s)
      cf(2 + i) = setSlot(b, s, fp)
      fp = victim
      i = altIndex(cf, i, fp)
      if (tryPlace(cf, i, fp)) return true
      kicks += 1
    }
    false
  }

  /** Occupied-slot fraction — the doubling-rebuild trigger (vs bloom's
    * set-bit fraction). An overflowed filter reports 1.0 so the sidecar's
    * saturation gate forces its rebuild.
    */
  def saturation(cf: Array[Long]): Double = {
    if (overflowed(cf)) return 1.0
    var occupied = 0L
    var i = 2
    while (i < cf.length) {
      val b = cf(i)
      var s = 0
      while (s < SlotsPerBucket) {
        if (slotAt(b, s) != 0) occupied += 1
        s += 1
      }
      i += 1
    }
    occupied.toDouble / ((cf.length - 2).toLong * SlotsPerBucket)
  }
}

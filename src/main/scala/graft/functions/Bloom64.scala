package graft.functions

/** Compact bloom filter over 64-bit keys, stored as an Array[Long].
  *
  * Layout: slot 0 = m (bit count), slot 1 = k (probe count), slots 2.. = bits.
  * Probes use double hashing h_i = h1 + i*h2 (Kirsch–Mitzenmacher) over two
  * splitmix64 finalizer streams of the key — deterministic, mergeable
  * (bitwise OR), and encodable as a native Spark Array[Long] (no kryo).
  *
  * This replaces spark-sketch's BloomFilter in the Aggregator path (SURVEY.md
  * A6/D2) so the aggregation buffer stays a primitive array: mergeable
  * map-side, serializable into the snapshot sidecar, probed by a cheap UDF.
  * FPP follows the standard m = -n ln p / (ln 2)^2 sizing.
  */
object Bloom64 {

  /** splitmix64 finalizer — public-domain mixing constants. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fixed probe count: near-optimal for fpp 1e-3 at the sized load factor.
    * Keeping k constant makes differently-aged filters merge-compatible
    * whenever their m matches.
    */
  val K = 7

  /** Bits sized for (expected, fpp), rounded UP to a power of two — so the
    * shape is stable across rounds until a genuine doubling is needed, and
    * incremental delta-merge (OR) stays possible (SURVEY.md D2).
    */
  def optimalBits(expected: Long, fpp: Double): Long = {
    val m = math.ceil(-expected * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    java.lang.Long.highestOneBit(math.max(64L, m) * 2 - 1)
  }

  def empty(expected: Long, fpp: Double): Array[Long] = emptyBits(optimalBits(expected, fpp))

  def emptyBits(m: Long): Array[Long] = {
    val arr = new Array[Long](2 + (m / 64).toInt)
    arr(0) = m
    arr(1) = K.toLong
    arr
  }

  def put(bf: Array[Long], key: Long): Unit = {
    val m = bf(0); val k = bf(1).toInt
    val h1 = mix(key); val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bf(2 + (bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(bf: Array[Long], key: Long): Boolean = {
    val m = bf(0); val k = bf(1).toInt
    val h1 = mix(key); val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bf(2 + (bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR merge; requires identical (m, k). Mutates and returns `a`. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a(0) == b(0) && a(1) == b(1), s"bloom shape mismatch: ${a(0)}/${a(1)} vs ${b(0)}/${b(1)}")
    var i = 2
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  /** Fraction of set bits — used to trigger a doubling rebuild (§ D2). */
  def saturation(bf: Array[Long]): Double = {
    var set = 0L
    var i = 2
    while (i < bf.length) { set += java.lang.Long.bitCount(bf(i)); i += 1 }
    set.toDouble / bf(0).toDouble
  }
}

/** Typed UDAF building a Bloom64 from a column of Long keys (SURVEY.md A6). */
class BloomAggregator(m: Long)
    extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
  import org.apache.spark.sql.Encoder
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def zero: Array[Long] = Bloom64.emptyBits(m)
  override def reduce(b: Array[Long], key: Long): Array[Long] = { Bloom64.put(b, key); b }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = Bloom64.merge(a, b)
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Bloom64

/** Document-deduplication family for training-data pipelines:
  * exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), SimHash (hamming bands), and n-gram Jaccard verification.
  *
  * Scale design: every candidate-pair generator is a BUCKET join (equi-join
  * on a band/bucket key that shuffles once on the key), never an O(n²)
  * cross-join; the quadratic step only runs inside buckets, and exact
  * verification only on candidate pairs. Pair keys are ordered (a < b) so
  * each pair appears once.
  */
object TextDedup {

  // --- exact dedup (D-exact): keep the minimum id per identical text ---

  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  // --- shingling + MinHash ---

  /** Word k-shingles as hashed Longs (dedup'd per doc). */
  val shinglesUdf = udf((text: String, k: Int) => {
    if (text == null) Array.empty[Long]
    else {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < k) Array(Bloom64.mix(toks.mkString(" ").hashCode.toLong))
      else (0 to toks.length - k).map { i =>
        var h = 1125899906842597L
        var j = i
        while (j < i + k) { h = h * 31 + toks(j).hashCode; j += 1 }
        Bloom64.mix(h)
      }.distinct.toArray
    }
  })

  /** MinHash signature: m permutations via splitmix-seeded affine hashing. */
  val minhashUdf = udf((shingles: Seq[Long], m: Int) => {
    val sig = new Array[Long](m)
    var i = 0
    while (i < m) {
      val seed = Bloom64.mix(0x1234567L + i)
      var min = Long.MaxValue
      shingles.foreach { s =>
        val h = Bloom64.mix(s ^ seed)
        if (h < min) min = h
      }
      sig(i) = if (shingles.isEmpty) seed else min
      i += 1
    }
    sig
  })

  /** LSH band keys: signature sliced into b bands of r rows, each hashed. */
  val bandsUdf = udf((sig: Seq[Long], b: Int, r: Int) => {
    (0 until b).map { band =>
      var h = 1125899906842597L ^ band
      var j = band * r
      while (j < (band + 1) * r && j < sig.length) { h = h * 31 + sig(j).##; j += 1 }
      Bloom64.mix(h)
    }.toArray
  })

  /** Exact Jaccard over two shingle sets (verification step). */
  val jaccardUdf = udf((a: Seq[Long], b: Seq[Long]) => {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val sa = a.toSet; val sb = b.toSet
      val inter = sa.intersect(sb).size.toDouble
      inter / (sa.size + sb.size - inter)
    }
  })

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Pipeline (one shuffle per stage, no cross-join):
    * shingle → minhash(m) → explode b band keys → self-join on
    * (band_idx, band_hash) with a<b → distinct pairs → verify jaccard ≥ t.
    */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, m: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val rows = m / bands
    val banded = docs.select(
        col(idCol).as("id"),
        shinglesUdf(col(textCol), lit(k)).as("sh"))
      .withColumn("sig", minhashUdf(col("sh"), lit(m)))
      .select(col("id"), col("sh"),
        posexplode(bandsUdf(col("sig"), lit(bands), lit(rows))).as(Seq("band_idx", "band_hash")))
    val l = banded.select(col("id").as("a"), col("sh").as("sha"), col("band_idx"), col("band_hash"))
    val r = banded.select(col("id").as("b"), col("sh").as("shb"), col("band_idx"), col("band_hash"))
    l.join(r, Seq("band_idx", "band_hash"))
      .where(col("a") < col("b"))
      .select("a", "b", "sha", "shb").distinct()
      .withColumn("jaccard", round(jaccardUdf(col("sha"), col("shb")), 6))
      .where(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  // --- SimHash ---

  /** 64-bit SimHash over word tokens. */
  val simhashUdf = udf((text: String) => {
    val acc = new Array[Int](64)
    if (text != null) text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { t =>
      val h = Bloom64.mix(t.hashCode.toLong)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  })

  val hammingUdf = udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))

  /** SimHash near-dup pairs: 4×16-bit band bucketing (any pair within
    * hamming distance ≤ maxDist shares ≥1 exact band by pigeonhole when
    * maxDist < 4), verified by exact hamming distance.
    */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val withSim = docs.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sim"))
    val banded = withSim.select(
      col("id"), col("sim"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_idx"),
          (shiftrightunsigned(col("sim"), b * 16) bitwiseAND lit(0xFFFFL)).as("band_val"))): _*)).as("bd"))
      .select(col("id"), col("sim"), col("bd.band_idx"), col("bd.band_val"))
    val l = banded.select(col("id").as("a"), col("sim").as("sima"), col("band_idx"), col("band_val"))
    val r = banded.select(col("id").as("b"), col("sim").as("simb"), col("band_idx"), col("band_val"))
    l.join(r, Seq("band_idx", "band_val"))
      .where(col("a") < col("b"))
      .select("a", "b", "sima", "simb").distinct()
      .withColumn("hamming", hammingUdf(col("sima"), col("simb")))
      .where(col("hamming") <= maxDist)
      .select("a", "b", "hamming")
  }

  /** Embedding-cosine near-dup pairs via Similarity's LSH buckets. */
  def embeddingPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      planes: Int = 12, threshold: Double = 0.95): DataFrame = {
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Similarity.lshBucketUdf(col("v"), lit(planes)))
    val l = bucketed.select(col("id").as("a"), col("v").as("va"), col("bucket"))
    val r = bucketed.select(col("id").as("b"), col("v").as("vb"), col("bucket"))
    l.join(r, Seq("bucket"))
      .where(col("a") < col("b"))
      .withColumn("cos", round(Similarity.cosineUdf(col("va"), col("vb")), 6))
      .where(col("cos") >= threshold)
      .select("a", "b", "cos").distinct()
  }
}

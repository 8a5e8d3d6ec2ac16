package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** J5 salted join ≡ unsalted join (SURVEY.md §2.6 equivalence test). */
class SkewJoinSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // Zipf-ish skew: host h0 owns ~75% of rows
  lazy val big = (0 until 4000).map { i =>
    val host = if (i % 4 != 0) "h0.example" else s"h${i % 37}.example"
    (host, s"http://$host/p$i", i)
  }.toDF("host", "url", "row_id")

  lazy val small = (0 until 37).map(k => (s"h$k.example", 0.5 + (k % 3) * 0.5))
    .toDF("host", "delay")

  test("A5 hot-key detection finds the skewed host") {
    val hot = SkewJoin.hotKeys(big, "host", factor = 4.0).as[String].collect()
    assert(hot.toSeq == Seq("h0.example"))
  }

  test("J5 salted join is row-identical to the plain join") {
    val plain = big.join(small, Seq("host"))
      .select("host", "url", "row_id", "delay")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, small, key = "host", rowId = "url", salt = 8)
      .select("host", "url", "row_id", "delay")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 4000, "every big row joins exactly once")
  }

  test("J5 with no hot keys degrades to the plain join") {
    val uniform = (0 until 100).map(i => (s"h${i % 10}.example", s"u$i", i))
      .toDF("host", "url", "row_id")
    val out = SkewJoin.saltedJoin(uniform, small, "host", "url", salt = 4)
    assert(out.count() == 100)
  }

  test("J5 on an EMPTY big side returns empty (no NPE from the null mean)") {
    val empty = big.limit(0)
    assert(SkewJoin.hotKeys(empty, "host").count() == 0)
    assert(SkewJoin.saltedJoin(empty, small, "host", "url", salt = 4).count() == 0)
  }

  test("hot partition sizes are actually split by the salt") {
    val hot = SkewJoin.hotKeys(big, "host").as[String].collect().toSet
    val salted = big.where(col("host").isin(hot.toSeq: _*))
      .withColumn("salt", pmod(xxhash64(col("url")), lit(8L)))
      .groupBy("salt").count().as[(Long, Long)].collect()
    assert(salted.length == 8, "all 8 salt buckets populated")
    val counts = salted.map(_._2)
    assert(counts.max < counts.sum, "no single bucket holds everything")
  }
}

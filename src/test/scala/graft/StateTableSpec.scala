package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StateTable

/** S3/S4 snapshot protocol: atomic commit, time travel, crash injection. */
class StateTableSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("commit + read + CURRENT pointer") {
    val dir = tmpDir("st")
    StateTable.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir, 0L, 0L, Map("n" -> 2L))
    assert(StateTable.currentVersion(dir).contains(0L))
    assert(StateTable.read(spark, dir).count() == 2)
    val m = StateTable.manifest(dir, 0L).get
    assert(m.nRows == 2 && m.counters("n") == 2L)
  }

  test("time travel across versions") {
    val dir = tmpDir("st")
    StateTable.commit(Seq(1).toDF("k"), dir, 0L, 0L)
    StateTable.commit(Seq(1, 2, 3).toDF("k"), dir, 1L, 1L)
    assert(StateTable.read(spark, dir, Some(0L)).count() == 1)
    assert(StateTable.read(spark, dir, Some(1L)).count() == 3)
    assert(StateTable.read(spark, dir).count() == 3) // CURRENT = 1
    assert(StateTable.versions(dir) == Seq(0L, 1L))
  }

  test("append-mode read unions deltas") {
    val dir = tmpDir("st")
    StateTable.commitAppend(Seq(1).toDF("k"), dir, 0L, 0L)
    StateTable.commitAppend(Seq(2, 3).toDF("k"), dir, 1L, 1L)
    assert(StateTable.readAppended(spark, dir, Some(0L)).count() == 1)
    assert(StateTable.readAppended(spark, dir, Some(1L)).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("crash injection: dangling snap without CURRENT move is invisible (resume)") {
    val dir = tmpDir("st")
    StateTable.commit(Seq(1).toDF("k"), dir, 0L, 0L)
    // simulate a crash: data written for v1 but no manifest/CURRENT
    Seq(9, 9, 9).toDF("k").write.parquet(StateTable.snapPath(dir, 1L))
    assert(StateTable.currentVersion(dir).contains(0L))
    assert(StateTable.read(spark, dir).count() == 1)
    // retry of the same commit overwrites the orphan and completes
    StateTable.commit(Seq(4, 5).toDF("k"), dir, 1L, 1L)
    assert(StateTable.read(spark, dir).count() == 2)
  }

  test("commit is idempotent per version (exactly-once sink, ST4)") {
    val dir = tmpDir("st")
    StateTable.commit(Seq(1, 2).toDF("k"), dir, 0L, 0L)
    val m2 = StateTable.commit(Seq(7, 7, 7, 7).toDF("k"), dir, 0L, 0L) // ignored
    assert(m2.nRows == 2)
    assert(StateTable.read(spark, dir).count() == 2)
  }

  test("crash injection: stale CURRENT behind a logged manifest is repaired") {
    val dir = tmpDir("st")
    StateTable.commit(Seq(1).toDF("k"), dir, 0L, 0L)
    StateTable.commit(Seq(1, 2).toDF("k"), dir, 1L, 1L)
    // simulate a crash between manifest write and the CURRENT move for v1
    Files.writeString(Paths.get(dir, "_log", "CURRENT"), "0")
    assert(StateTable.currentVersion(dir).contains(0L))
    // idempotent replay of the same commit must repair the pointer forward
    val m = StateTable.commit(Seq(9, 9, 9).toDF("k"), dir, 1L, 1L) // data ignored
    assert(m.nRows == 2)
    assert(StateTable.currentVersion(dir).contains(1L))
    assert(StateTable.read(spark, dir).count() == 2)
  }

  test("staged commit: writeSnap is invisible until finalizeCommit") {
    val dir = tmpDir("st")
    StateTable.commit(Seq(1).toDF("k"), dir, 0L, 0L)
    val n = StateTable.writeSnap(Seq(2, 3).toDF("k"), dir, 1L)
    assert(n == 2)
    assert(StateTable.currentVersion(dir).contains(0L)) // not yet published
    assert(StateTable.manifest(dir, 1L).isEmpty)
    val m = StateTable.finalizeCommit(dir, 1L, 1L, n, Map("x" -> 7L))
    assert(m.nRows == 2 && StateTable.currentVersion(dir).contains(1L))
    assert(StateTable.manifest(dir, 1L).get.counters("x") == 7L)
  }

  test("host_bucket column triggers partitioned layout (directory pruning)") {
    val dir = tmpDir("st")
    val df = Seq(("a", 0), ("b", 1), ("c", 1)).toDF("surt", "host_bucket")
    StateTable.commit(df, dir, 0L, 0L)
    assert(Files.exists(Paths.get(StateTable.snapPath(dir, 0L), "host_bucket=0")))
    val back = StateTable.read(spark, dir)
    assert(back.columns.toSet == Set("surt", "host_bucket"))
    assert(back.where($"host_bucket" === 1).count() == 2)
  }

  test("empty dataframe round-trips with explicit schema") {
    val dir = tmpDir("st")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], graft.model.Schemas.hostState)
    StateTable.commit(empty, dir, 0L, 0L)
    val back = StateTable.read(spark, dir, None, Some(graft.model.Schemas.hostState))
    assert(back.count() == 0 && back.columns.length == 5)
  }
}

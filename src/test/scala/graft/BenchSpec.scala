package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench harness honesty: a broken query must surface in the error map, not
  * masquerade as a fast timing (round-2 verdict "what's missing" #4).
  */
class BenchSpec extends AnyFunSuite with SparkTestSession {

  test("timeQueries reports a failing query instead of swallowing it") {
    import org.apache.spark.sql.functions._
    val qs = Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "q_ok" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }),
      "q_broken" -> ((s, dir) => s.read.parquet(s"$dir/does_not_exist.parquet")),
      // analysis passes but execution throws (errors must be caught at the
      // action, not only at plan time)
      "q_runtime_fail" -> ((s, _) => {
        import s.implicits._
        val boom = udf((_: String) => { throw new IllegalStateException("boom"); "unreachable" })
        Seq("a").toDF("x").select(boom(col("x")))
      }))
    val (times, errors) = Bench.timeQueries(spark, tmpDir("bench-missing"), qs)
    assert(times.map(_._1) == Seq("q_ok", "q_broken", "q_runtime_fail"))
    assert(!errors.contains("q_ok"))
    assert(errors.contains("q_broken"), s"missing-file query not reported: $errors")
    assert(errors.contains("q_runtime_fail"), s"runtime failure not reported: $errors")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CanonExpressions, UrlFunctions}

/** M12: the native Catalyst expressions must be value-identical to the UDFs
  * they replace (same kernels, different execution surface), and the
  * candidate pipeline must stay inside whole-stage codegen.
  */
class CanonExprSpec extends AnyFunSuite with SparkTestSession {

  lazy val pages = graft.sources.SyntheticWeb.pages(
    spark, graft.sources.SyntheticWeb.WebConfig(seed = 42L, nPages = 300, nHosts = 12)).toDF()

  test("pageScan expression ≡ pageScan UDF on the corpus") {
    val viaExpr = pages.select(col("url"), CanonExpressions.pageScanCol(col("html")).as("s"))
      .select(col("url"), col("s.text"), explode(col("s.links")).as("l"))
      .select(col("url"), col("text"), col("l.href"), col("l.anchor"))
      .collect().map(_.toSeq).toSet
    val viaUdf = pages.select(col("url"), UrlFunctions.pageScanUdf(col("html")).as("s"))
      .select(col("url"), col("s.text"), explode(col("s.links")).as("l"))
      .select(col("url"), col("text"), col("l.href"), col("l.anchor"))
      .collect().map(_.toSeq).toSet
    assert(viaExpr == viaUdf)
    assert(viaExpr.nonEmpty, "trivially-empty comparison")
  }

  test("resolveCanon expression ≡ resolveCanon UDF on corpus link soup") {
    val links = pages.select(col("url").as("base"),
      explode(UrlFunctions.extractLinksUdf(col("html"))).as("l"))
    val viaExpr = links.select(col("base"),
        CanonExpressions.resolveCanonCol(col("base"), col("l.href")).as("cp"))
      .select(col("base"), col("cp.url"), col("cp.host"), col("cp.path"), col("cp.surt"))
      .collect().map(_.toSeq).toSet
    val viaUdf = links.select(col("base"),
        UrlFunctions.resolveCanonUdf(col("base"), col("l.href")).as("cp"))
      .select(col("base"), col("cp.url"), col("cp.host"), col("cp.path"), col("cp.surt"))
      .collect().map(_.toSeq).toSet
    assert(viaExpr == viaUdf)
    assert(viaExpr.nonEmpty, "trivially-empty comparison")
  }

  test("canon/surt expressions match UDFs incl. null for unparseable input") {
    import spark.implicits._
    val raw = Seq(
      "HTTP://Ex.COM:80/a/../b?utm_source=x&b=2&a=%41#f",
      "https://h.example/p/./q//r?",
      "not a url", "", "ftp://x/y", "http://UP.Example.org:8080/Z?z=1&y=2").toDF("raw")
    val e = raw.select(CanonExpressions.canonCol(col("raw")), CanonExpressions.surtCol(col("raw")))
      .collect().map(_.toSeq).toSeq
    val u = raw.select(UrlFunctions.canonUdf(col("raw")), UrlFunctions.surtUdf(col("raw")))
      .collect().map(_.toSeq).toSeq
    assert(e == u)
  }

  test("expression pipeline runs inside whole-stage codegen (no fallback)") {
    val df = pages.select(col("url"),
        CanonExpressions.pageScanCol(col("html")).as("s"))
      .select(col("url"), explode(col("s.links")).as("l"))
      .select(CanonExpressions.resolveCanonCol(col("url"), col("l.href")).as("cp"))
      .where(col("cp").isNotNull)
      .select(col("cp.surt"))
    df.collect() // force execution so codegen actually compiles
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no whole-stage-codegen span:\n$plan")
  }
}

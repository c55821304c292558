package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization rules, one planted pathology per rule. */
class UrlCanonSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u")
      .select(UrlAnalysis.canonicalizeUrl(col("u")).as("c"))
      .collect()(0).getString(0)

  test("scheme and host lowercased, www dropped") {
    assert(canon("HTTP://WWW.Example.COM/Path") ===
      "http://example.com/Path")
  }

  test("default ports stripped, non-default kept") {
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("https://a.com:8080/x") === "https://a.com:8080/x")
    // :443 is NOT default for http
    assert(canon("http://a.com:443/x") === "http://a.com:443/x")
  }

  test("fragment dropped, tracking params removed, others kept in order") {
    assert(canon("https://a.com/p?utm_source=x&id=3&gclid=z&b=4#frag") ===
      "https://a.com/p?id=3&b=4")
    // query left empty after filtering drops its '?'
    assert(canon("https://a.com/p?utm_campaign=only#f") ===
      "https://a.com/p")
  }

  test("single trailing slash dropped") {
    assert(canon("https://a.com/p/") === "https://a.com/p")
    assert(canon("https://a.com/") === "https://a.com")
  }

  test("dedup groups count canonical collisions") {
    val urls = Seq(
      (0L, "HTTP://www.A.com:80/x?utm_source=1"),
      (1L, "http://a.com/x/"),
      (2L, "https://b.com/y")).toDF("doc_id", "u")
    val out = UrlAnalysis.urlDedupTable(urls, col("doc_id"), col("u"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("canon_url"), r.getAs[Long]("group_n"))).toMap
    assert(out(0L) === ("http://a.com/x", 2L))
    assert(out(1L) === ("http://a.com/x", 2L))
    assert(out(2L) === ("https://b.com/y", 1L))
  }
}

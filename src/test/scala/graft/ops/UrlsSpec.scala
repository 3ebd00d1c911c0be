package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Structural URL parsing + per-domain caps ([[Urls]]). The oracle
  * gates (q_url_parse / q_url_domain_cap) cover the synthetic-corpus
  * path; this spec pins the edge cases the synthesis never hits. */
class UrlsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def parse(url: String): Map[String, Any] = {
    val row = Urls.parseUrls(Seq((1L, url)).toDF("id", "url"), "url")
      .head()
    row.schema.fieldNames.zipWithIndex.map { case (n, i) =>
      n -> row.get(i)
    }.toMap
  }

  test("parse: full URL with subdomain, port, query") {
    val p = parse("https://blog.example.co.uk:8443/a/b/c?x=1&y=2")
    assert(p("url_scheme") == "https")
    assert(p("url_host") == "blog.example.co.uk") // port stripped
    assert(p("url_domain") == "example.co.uk") // two-level suffix
    assert(p("url_subdomain") == "blog")
    assert(p("url_tld") == "uk")
    assert(p("url_path") == "/a/b/c")
    assert(p("url_query") == "x=1&y=2")
    assert(p("url_path_depth") == 3)
  }

  test("parse: bare domain, no subdomain/path/query") {
    val p = parse("http://example.com")
    assert(p("url_domain") == "example.com")
    assert(p("url_subdomain") == "")
    assert(p("url_tld") == "com")
    assert(p("url_query") == null)
    assert(p("url_path_depth") == 0)
  }

  test("parse: uppercase host normalized; deep subdomains collapse") {
    val p = parse("https://A.B.Example.COM/x")
    assert(p("url_host") == "a.b.example.com")
    assert(p("url_domain") == "example.com")
    assert(p("url_subdomain") == "a.b")
  }

  test("parse: single-label host and malformed URL degrade to NULLs, " +
      "not errors") {
    assert(parse("https://localhost/x")("url_domain") == "localhost")
    val bad = parse("not a url at all")
    assert(bad("url_host") == null && bad("url_domain") == null)
  }

  test("IP-literal hosts: the host IS the domain (no label-rule garbage)") {
    assert(parse("http://192.168.0.1/a")("url_domain") == "192.168.0.1")
    assert(parse("http://10.20.0.1/b")("url_domain") == "10.20.0.1")
    // without the guard both of the above would collapse into "0.1"
    assert(parse("http://[2001:db8::1]/x")("url_domain") != null)
  }

  test("capPerDomain composes after a parse stage: user url_* columns " +
      "and a user _rk/__graft column survive") {
    val rows = (0L until 10L).map(i =>
      (i, s"https://www.example.com/p$i", s"keep$i")).toDF("id", "url", "_rk")
    val parsed = Urls.parseUrls(rows, "url")
    val capped = Urls.capPerDomain(parsed, "url", "id", cap = 3)
    // the parse stage's outputs (and the user's _rk) pass through
    assert(capped.columns.toSeq == parsed.columns.toSeq)
    assert(capped.count() == 3)
    assert(capped.select("url_domain").distinct().head().getString(0)
      == "example.com")
    assert(capped.select("_rk").collect().map(_.getString(0))
      .forall(_.startsWith("keep")))
  }

  test("capPerDomain: cap binds per registered domain, schema untouched") {
    val rows = (0L until 30L).map { i =>
      val host = if (i % 3 == 0) "a.example.com" else "www.other.org"
      (i, s"https://$host/p$i")
    }.toDF("id", "url")
    val capped = Urls.capPerDomain(rows, "url", "id", cap = 4)
    assert(capped.columns.toSeq == Seq("id", "url"))
    val perDomain = Urls.parseUrls(capped, "url")
      .groupBy("url_domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDomain == Map("example.com" -> 4L, "other.org" -> 4L))
    // deterministic: same input, same survivors
    assert(Urls.capPerDomain(rows, "url", "id", cap = 4)
      .select("id").as[Long].collect().sorted.toSeq ==
      capped.select("id").as[Long].collect().sorted.toSeq)
  }
}

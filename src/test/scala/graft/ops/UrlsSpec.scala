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

  test("PSL algorithm: wildcard, exception, prevailing-longest, default rule") {
    val r = Psl.default
    // exact multi-level beats the shorter match
    assert(r.registeredDomain("blog.example.co.uk") == "example.co.uk")
    // wildcard: *.kawasaki.jp makes <x>.kawasaki.jp a public suffix
    assert(r.registeredDomain("x.y.kawasaki.jp") == "x.y.kawasaki.jp")
    // exception beats the wildcard it carves out of
    assert(r.registeredDomain("www.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(r.registeredDomain("city.kawasaki.jp") == "city.kawasaki.jp")
    // all-wildcard ccTLD + its exception
    assert(r.registeredDomain("foo.shop.ck") == "foo.shop.ck")
    assert(r.registeredDomain("www.ck") == "www.ck")
    assert(r.registeredDomain("shop.www.ck") == "www.ck")
    // private-section hosting suffix
    assert(r.registeredDomain("deep.user.github.io") == "user.github.io")
    // unlisted TLD: the implicit `*` default registers at two labels
    assert(r.registeredDomain("a.b.example.zz") == "example.zz")
    // host IS a public suffix → itself (documented divergence)
    assert(r.registeredDomain("co.uk") == "co.uk")
    assert(r.registeredDomain("kawasaki.jp") == "kawasaki.jp")
    // literal addresses
    assert(r.registeredDomain("93.184.216.34") == "93.184.216.34")
    assert(r.registeredDomain("[2001:db8::1]") == "[2001:db8::1]")
    // null/empty propagate
    assert(r.registeredDomain(null) == null)
    assert(r.registeredDomain("") == null)
  }

  test("PSL parse: comments, blanks, rule types; custom table via file") {
    val rules = Psl.parse(
      """// a comment
        |
        |com
        |example.com
        |*.corp.test
        |!ok.corp.test
        |""".stripMargin.linesIterator)
    assert(rules.exact == Set("com", "example.com"))
    assert(rules.wildcard == Set("corp.test"))
    assert(rules.exception == Set("ok.corp.test"))
    // example.com is itself a suffix here → one more label registers
    assert(rules.registeredDomain("shop.a.example.com") == "a.example.com")
    assert(rules.registeredDomain("x.dept.corp.test") == "x.dept.corp.test")
    assert(rules.registeredDomain("www.ok.corp.test") == "ok.corp.test")

    // file-loaded table drives the plugin (psl_file option)
    val f = java.nio.file.Files.createTempFile("psl", ".dat")
    java.nio.file.Files.writeString(f, "com\nexample.com\n")
    try {
      val plug = new graft.plugins.transform.UrlPlugin(Map(
        "method" -> "parse", "url_column" -> "url",
        "psl_file" -> f.toString), f.getParent, "default")
      val out = plug.execute(
          Seq((1L, "https://shop.a.example.com/p")).toDF("id", "url"))
        .fold(e => throw e, identity)
      assert(out.select("url_domain").head().getString(0)
        == "a.example.com")
    } finally java.nio.file.Files.delete(f)
  }

  test("PSL parse: Unicode (IDN) rules normalize to punycode at parse " +
      "time, so full-list rules match xn-- crawl hosts") {
    val tokyo = java.net.IDN.toASCII("東京") // 東京 → xn--1lqs71d
    val rules = graft.ops.Psl.parse(Seq(
      "jp", s"*.東京.jp", s"!metro.東京.jp").iterator)
    assert(rules.wildcard == Set(s"$tokyo.jp"))
    assert(rules.exception == Set(s"metro.$tokyo.jp"))
    // wildcard: <label>.東京.jp is a public suffix → one more label
    // registers; the exception rule carves metro.東京.jp back out
    assert(rules.registeredDomain(s"www.metro.$tokyo.jp")
      == s"metro.$tokyo.jp")
    assert(rules.registeredDomain(s"a.shinjuku.$tokyo.jp")
      == s"a.shinjuku.$tokyo.jp")
    // pre-normalization these rules never matched an ASCII host:
    // the bare "jp" rule would have claimed ps=1 here
    assert(graft.ops.Psl.parse(Seq("jp").iterator)
      .registeredDomain(s"www.metro.$tokyo.jp") == s"$tokyo.jp")
  }
}

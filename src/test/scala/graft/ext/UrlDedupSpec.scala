package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlDedupSpec extends AnyFunSuite with SparkSpec {

  private def norm(u: String): String = {
    val sp = spark; import sp.implicits._
    Seq(u).toDF("u").select(Dedup.normalizeUrl(col("u"))).head().getString(0)
  }

  private def dom(u: String): String = {
    val sp = spark; import sp.implicits._
    Seq(u).toDF("u").select(Dedup.registrableDomain(col("u"))).head().getString(0)
  }

  test("normalizeUrl: scheme, www, fragment, trailing slash, case") {
    assert(norm("HTTPS://WWW.Example.COM/A/B/") == "example.com/a/b")
    assert(norm("http://example.com/a/b#frag") == "example.com/a/b")
    assert(norm("  ftp://www.example.org  ") == "example.org")
    // query string and port are identity — KEPT
    assert(norm("https://example.com:8080/x?q=1") == "example.com:8080/x?q=1")
    // only ONE leading www. strips; inner www stays
    assert(norm("https://www.www-host.com/p") == "www-host.com/p")
    // scheme-less input unchanged beyond case/slash rules
    assert(norm("Example.com/path///") == "example.com/path")
    // the slash strip targets the PATH only: a slash ending a kept query
    // value is query content and survives (ADVICE r8)
    assert(norm("https://a.com?next=/") == "a.com?next=/")
    assert(norm("a.com///?q=1/") == "a.com?q=1/")
    // path trailing slash strips even when a query follows
    assert(norm("https://a.com/p/?x=1") == "a.com/p?x=1")
  }

  test("registrableDomain: host extraction, port strip, last-two-labels") {
    assert(dom("https://www.sub.news.example.com/a/b") == "example.com")
    assert(dom("http://example.org:8080/x?y=1") == "example.org")
    assert(dom("https://foo.org?q=1") == "foo.org")
    // dotless host returns itself
    assert(dom("http://localhost:9000/admin") == "localhost")
  }

  test("urlDedup: min id survives per normalized url") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "https://www.a.com/x/"),
      (2L, "HTTP://A.com/x"),     // same normalized as 1 → loses to id 1
      (3L, "https://a.com/x#f"),  // same normalized → loses
      (4L, "https://a.com/x?v=2"),// query differs → survives
      (5L, "https://b.org/y")     // unique → survives
    ).toDF("id", "url")
    val kept = Dedup.urlDedup(df, "url", "id").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("domainStats: pages, distinct urls, surviving id per domain") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (10L, "https://www.a.com/x/"),
      (11L, "http://a.com/x"),      // same normalized url, same domain
      (12L, "https://docs.a.com/y"),// same registrable domain, new url
      (13L, "https://b.org/z")
    ).toDF("id", "url")
    val rows = Dedup.domainStats(df, "url", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(("a.com", 3L, 2L, 10L), ("b.org", 1L, 1L, 13L)))
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

class UrlsSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def norm(urls: String*): Seq[Option[String]] =
    urls.toDF("u").select(Urls.normalizeUrl($"u").as("n"))
      .as[Option[String]].collect().toSeq

  test("normalizeUrl: every canonical step, hand-computed") {
    norm(
      // scheme/host lowercase, default port, tracking params dropped,
      // params sorted, fragment dropped
      "HTTP://WWW.Ex.COM:80/a?utm_source=x&b=2&a=1#frag",
      // https default port; trailing slash on non-root path stripped
      "https://api.Example.com:443/v1/x/?gclid=zz&z=9&y=8",
      // userinfo stays case-sensitive; non-default port kept;
      // duplicate slashes preserved (path is case-sensitive territory)
      "https://User.Name@Files.ORG:8443//X/p/#s",
      // empty path -> "/"; root path stays "/"
      "http://ex.com",
      "http://ex.com/",
      // empty query after filtering drops its '?'
      "http://ex.com/p?utm_campaign=only",
      // leading/trailing whitespace trimmed
      "  http://ex.com/p  ") shouldBe Seq(
      Some("http://www.ex.com/a?a=1&b=2"),
      Some("https://api.example.com/v1/x?y=8&z=9"),
      Some("https://User.Name@files.org:8443//X/p"),
      Some("http://ex.com/"),
      Some("http://ex.com/"),
      Some("http://ex.com/p"),
      Some("http://ex.com/p"))
  }

  test("normalizeUrl: non-URLs and non-http schemes canonicalize to " +
      "NULL — a per-row data fact, not a failure") {
    norm("not a url", "ftp://files.ex.com/a", "mailto:a@b.c", "",
      "http://") shouldBe Seq(None, None, None, None, None)
  }

  test("normalizeUrl is idempotent on its own output") {
    val urls = Seq(
      "HTTP://WWW.Ex.COM:80/a?utm_source=x&b=2&a=1#frag",
      "https://User.Name@Files.ORG:8443//X/p/#s",
      "http://ex.com")
    val once = urls.toDF("u")
      .select(Urls.normalizeUrl($"u").as("n")).as[String].collect()
    val twice = once.toSeq.toDF("u")
      .select(Urls.normalizeUrl($"u").as("n")).as[String].collect()
    twice.toSeq shouldBe once.toSeq
  }

  test("urlHost/urlDomain: bare lowercase host; two-label domain with " +
      "the documented ccTLD approximation") {
    val df = Seq(
      "https://User@WWW.Sub.Example.COM:8443/p",
      "http://example.co.uk/x", // the documented mis-group
      "http://localhost/x",     // single label: no two-label domain
      "garbage").toDF("u")
    val out = df.select(Urls.urlHost($"u").as("h"),
        Urls.urlDomain($"u").as("d"))
      .as[(Option[String], Option[String])].collect().toSeq
    out shouldBe Seq(
      (Some("www.sub.example.com"), Some("example.com")),
      (Some("example.co.uk"), Some("co.uk")),
      (Some("localhost"), Some("")),
      (None, None))
  }

  test("urlKeys: canonical dedup-key frame with path depth; dirty rows " +
      "carry NULLs") {
    val df = Seq(
      (1L, "HTTP://A.com:80/x/y/?b=2&a=1"),
      (2L, "junk")).toDF("id", "u")
    val out = Urls.urlKeys(df, "id", "u")
      .as[(Long, Option[String], Option[String], Option[String], Option[Int])]
      .collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (1L, Some("http://a.com/x/y?a=1&b=2"), Some("a.com"),
        Some("a.com"), Some(2)),
      (2L, None, None, None, None))
  }
}

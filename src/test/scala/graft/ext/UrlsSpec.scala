package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Urls.normalize($"u")).as[String].head()

  test("normalize: each canonicalization rule") {
    assert(norm("HTTPS://WWW.Example.ORG/A/b") ==
      "https://example.org/A/b", "scheme+host lowercase, www strip, path case kept")
    assert(norm("https://example.org:443/x") == "https://example.org/x")
    assert(norm("http://example.org:80/x") == "http://example.org/x")
    assert(norm("http://example.org:8080/x") == "http://example.org:8080/x",
      "non-default port kept")
    assert(norm("https://example.org/a/b/") == "https://example.org/a/b")
    assert(norm("https://example.org/a/?id=2") == "https://example.org/a?id=2")
    assert(norm("https://example.org/p#sec-2") == "https://example.org/p")
    assert(norm("https://example.org/p?utm_source=x") ==
      "https://example.org/p")
    assert(norm("https://example.org/p?utm_a=1&utm_b=2&id=3&gclid=z") ==
      "https://example.org/p?id=3")
    assert(norm("https://example.org/p?id=3&fbclid=abc") ==
      "https://example.org/p?id=3")
  }

  test("normalize is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.Ex.Org:443/a/b/?utm_x=1&id=2#f",
      "http://sub.host.io/p?q=1",
      "https://h.co/")
    val once = urls.map(norm)
    assert(once.map(norm) == once, "normalize(normalize(u)) == normalize(u)")
  }

  test("host and registeredDomain") {
    val r = Seq("HTTPS://WWW.Sub.News.Example.CO:8443/p")
      .toDF("u")
      .select(Urls.host($"u"), Urls.registeredDomain($"u"))
      .as[(String, String)].head()
    assert(r == ("sub.news.example.co", "example.co"), r.toString)
  }

  test("dedupByUrl collapses canonical-equal variants") {
    val df = Seq(
      (1L, "https://example.org/p?id=1"),
      (2L, "HTTPS://WWW.example.org/p/?id=1&utm_source=x"),
      (3L, "https://example.org:443/p?id=1#top"),
      (4L, "https://example.org/other")
    ).toDF("id", "url")
    val groups = Urls.dedupByUrl(df, "id", "url")
      .orderBy("url_norm")
      .as[(String, Long, Long)].collect().toSeq
    assert(groups == Seq(
      ("https://example.org/other", 4L, 1L),
      ("https://example.org/p?id=1", 1L, 3L)), groups.toString)
  }
}

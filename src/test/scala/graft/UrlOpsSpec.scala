package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.ops.UrlOps

/** URL canonicalization edge cases beyond the harness' four shapes. */
class UrlOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.normalizeUrl(col("u"))).as[String].collect().toSeq

  test("normalizeUrl: case, default ports, fragments, query sort, empty path") {
    assert(canon(
      "HTTP://WWW.Ex.COM:80/A/b?z=9&a=1#frag", // scheme/host lower, :80 off, PATH case kept
      "https://ex.com:443/x",                  // https default port off
      "http://ex.com:443/x",                   // 443 NOT default for http
      "http://ex.com",                         // empty path -> "/"
      "https://ex.com/p?b=2&a=1&",             // trailing & and unsorted params
      "https://ex.com/p?",                     // empty query dropped
      "http://user:pw@ex.com:8080/q",          // userinfo dropped, real port kept
      "http://ex.com/p#only-fragment"
    ) == Seq(
      "http://www.ex.com/A/b?a=1&z=9",
      "https://ex.com/x",
      "http://ex.com:443/x",
      "http://ex.com/",
      "https://ex.com/p?a=1&b=2",
      "https://ex.com/p",
      "http://ex.com:8080/q",
      "http://ex.com/p"))
  }

  test("normalizeUrl is idempotent on its own output") {
    val messy = Seq("HTTP://A.B:80/x?b=1&a=2#f", "https://U@C.d:443?x=1&")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once)
  }

  test("surtHost reverses labels; single-label host unchanged") {
    val got = Seq("www.example.org", "example.org", "localhost")
      .toDF("h").select(UrlOps.surtHost(col("h"))).as[String].collect().toSeq
    assert(got == Seq("org.example.www", "org.example", "localhost"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.HtmlText
import graft.fixtures.Fixtures

class HtmlTextSpec extends AnyFunSuite {

  test("byte-identical extraction invariant over the fixture corpus (input_hint)") {
    // two independent paths: HtmlText.extract(htmlOf) vs textOf
    (0L until 500L).foreach { i =>
      val r = Fixtures.recOf(i)
      val got = HtmlText.extract(Fixtures.htmlOf(r).getBytes("UTF-8"))
      val want = Fixtures.textOf(r)
      assert(got == want, s"url=${r.url}\n got=$got\nwant=$want")
    }
  }

  test("strips script/style/comments, keeps content") {
    val html = "<html><script>bad()</script><style>.x{}</style>" +
      "<!-- no --><p>keep me</p></html>"
    assert(HtmlText.extract(html) == "keep me")
  }

  test("decodes fixed entity set and numeric refs") {
    assert(HtmlText.extract("a&amp;b &lt;c&gt; &quot;d&quot; &#65; &#x42;") ==
      "a&b <c> \"d\" A B")
  }

  test("unknown entities pass through; unterminated tag tolerated") {
    assert(HtmlText.extract("x &unknown; y") == "x &unknown; y")
    assert(HtmlText.extract("a <p") == "a")
  }

  test("whitespace collapse is total (tabs, newlines, nbsp)") {
    assert(HtmlText.extract("a\t\tb\n\nc&nbsp;&nbsp;d") == "a b c d")
  }

  test("deterministic: same bytes, same output, 1000x") {
    val h = Fixtures.htmlOf(Fixtures.recOf(7)).getBytes("UTF-8")
    val first = HtmlText.extract(h)
    (1 to 1000).foreach(_ => assert(HtmlText.extract(h) == first))
  }
}

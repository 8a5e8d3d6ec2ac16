package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Html

/** Golden vectors for X1/X2 — `[SPEC-X1]`/`[SPEC-X2]`, FIXTURES.md §3. */
class HtmlSpec extends AnyFunSuite {

  private def text(s: String) = Html.extractTextFromString(s)
  private def links(s: String) = Html.extractLinksFromString(s).toSeq

  test("X2 strips tags and collapses whitespace") {
    assert(text("<p>hello   world</p>") == "hello world")
    assert(text("<p>a</p>\n\t<p>b</p>") == "a b")
    assert(text("  <b>x</b>  ") == "x")
    assert(text("") == "")
    assert(text("plain") == "plain")
  }

  test("X2 strips script/style blocks including decoy markup inside") {
    assert(text("<script>var x = \"<a href='/no'>d</a>\";</script>after") == "after")
    assert(text("<style>body { color: red }</style>after") == "after")
    assert(text("a<SCRIPT>x</SCRIPT>b<Style>y</STYLE>c") == "abc")
    assert(text("<script src=\"x.js\"></script>t") == "t")
    assert(text("<script>never closed") == "")
  }

  test("X2 decodes exactly the frozen entity set, single pass") {
    assert(text("a &amp; b") == "a & b")
    assert(text("&lt;tag&gt;") == "<tag>")
    assert(text("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(text("a&nbsp;b") == "a b")
    assert(text("x &amp;lt; y") == "x &lt; y") // no double decode
    assert(text("&unknown; stays") == "&unknown; stays")
  }

  test("X2 full document golden") {
    val html = "<html><head><title>T One</title><style>x{}</style>" +
      "<script>s()</script></head>\n<body><p>para  one</p>\n" +
      "<ul><li><a href=\"/a\">L1</a></li></ul>\n<p>end &amp; out</p></body></html>"
    assert(text(html) == "T One para one L1 end & out")
    // tags themselves contribute no separator ([SPEC-X2]: tags → nothing)
    assert(text("<p>a</p><p>b</p>") == "ab")
  }

  test("X2 byte-identity on UTF-8 multibyte") {
    val s = "<p>héllo wörld — ünïcode</p>"
    assert(Html.extractText(s.getBytes("UTF-8")) == "héllo wörld — ünïcode")
  }

  test("X1 extracts hrefs in document order with anchors") {
    val html = """<a href="/one">First</a> mid <a href='/two'>Second <b>bold</b></a>"""
    assert(links(html) == Seq(Html.Link("/one", "First"), Html.Link("/two", "Second bold")))
  }

  test("X1 dedups within page keeping first occurrence") {
    val html = """<a href="/x">a</a><a href="/y">b</a><a href="/x">c</a>"""
    assert(links(html).map(_.href) == Seq("/x", "/y"))
    assert(links(html).head.anchor == "a")
  }

  test("X1 quote-aware attribute parsing") {
    assert(links("""<a class="k" href="/q?a=1&amp;b=2">t</a>""").map(_.href) == Seq("/q?a=1&b=2"))
    assert(links("""<a href=/unquoted>t</a>""").map(_.href) == Seq("/unquoted"))
    assert(links("""<a href='/sq'>t</a>""").map(_.href) == Seq("/sq"))
    assert(links("""<a HREF="/caps">t</a>""").map(_.href) == Seq("/caps"))
    assert(links("""<a href="">t</a><a>u</a>""") == Seq.empty)
  }

  test("X1 ignores links inside script/style; handles unclosed <a>") {
    assert(links("""<script><a href="/no">x</a></script><a href="/yes">y</a>""").map(_.href) == Seq("/yes"))
    assert(links("""<a href="/open">text to end""").map(_.href) == Seq("/open"))
  }

  test("X1 nested <a> closes implicitly") {
    val l = links("""<a href="/outer">o <a href="/inner">i</a>""")
    assert(l.map(_.href) == Seq("/outer", "/inner"))
    assert(l.head.anchor == "o")
  }

  test("X2∘gen ≡ identity on the synthetic corpus (closes the input_hint loop)") {
    val cfg = graft.sources.SyntheticWeb.WebConfig(seed = 42L, nPages = 50, nHosts = 8)
    (0L until 50L).foreach { id =>
      val p = graft.sources.SyntheticWeb.makePage(cfg, id)
      assert(Html.extractText(p.html) == p.text, s"page $id")
      assert(p.text.nonEmpty)
      assert(Html.extractLinks(p.html).nonEmpty, s"page $id has links")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization + HTML/HTTP extraction edge cases — the
  * adversarial shapes a crawl actually serves (userinfo host spoofs,
  * tracker data-href attributes, unquoted meta attributes, malformed
  * messages). Pure-expression operators, so the spec is a value table.
  */
class UrlOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-urlops-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // the Html chains carry graft_decode_* codec calls that resolve in
  // the analyzing session
  locally { graft.functions.TextFunctions.register(spark); () }

  override def afterAll(): Unit = spark.stop()

  import graft.llm.{Html, UrlOps}

  private def one(c: org.apache.spark.sql.Column, input: String): Any = {
    import spark.implicits._
    Seq(input).toDF("x").select(c.as("y")).head().get(0)
  }

  test("host: authority extraction resists userinfo spoofs") {
    import org.apache.spark.sql.functions.col
    def h(u: String) = one(UrlOps.host(col("x")), u)
    assert(h("https://www.Example.ORG/p?q#f") === "www.example.org")
    assert(h("http://example.org:8080/p") === "example.org")
    // the classic confusion shape: userinfo that LOOKS like a trusted
    // host must not be extracted as the host
    assert(h("http://trusted.com:x@evil.com/p") === "evil.com")
    assert(h("http://alice@evil.com/") === "evil.com")
    // DOUBLE-@ variant: fetchers split at the LAST '@' (WHATWG), so a
    // first-'@' skip would still key victim.com under trusted.com
    assert(h("http://evil.com@trusted.com@victim.com/x") === "victim.com")
    // an '@' in the path is NOT userinfo
    assert(h("https://a.example/path@with@ats") === "a.example")
    assert(h("ftp://files.example/pub") === "files.example")
    assert(h("/relative/x") === null)
    assert(h("mailto:a@b.c") === null)
    def s(u: String) = one(UrlOps.scheme(col("x")), u)
    assert(s("HTTPS://a.b/") === "https")
    assert(s("javascript://c%0aalert(1)") === "javascript")
    assert(s("mailto:a@b.c") === null)
  }

  test("host: bracketed IPv6 literals extract whole; unclosed brackets are NULL") {
    import org.apache.spark.sql.functions.col
    def h(u: String) = one(UrlOps.host(col("x")), u)
    // the WHATWG serialization keeps the brackets — without the
    // alternation arm the ':'-stopping class extracted the garbage
    // frontier/SURT key "[2001"
    assert(h("http://[2001:db8::1]/x") === "[2001:db8::1]")
    assert(h("http://[2001:DB8::1]:8080/x") === "[2001:db8::1]")
    assert(h("https://user@[::1]/p") === "[::1]")
    // a '[' that never closes is not a host
    assert(h("http://[2001:db8/x") === null)
    // bracketed literals are dotless → their own site key, SURT stable
    assert(one(UrlOps.registeredDomain(UrlOps.host(col("x"))),
      "http://[::1]/") === "[::1]")
    assert(one(UrlOps.surtHost(UrlOps.host(col("x"))),
      "http://[2001:db8::1]/") === "[2001:db8::1]")
  }

  test("registeredDomain folds subdomains onto the pinned suffix subset") {
    import org.apache.spark.sql.functions.col
    def d(h: String) = one(UrlOps.registeredDomain(col("x")), h)
    assert(d("www.example.org") === "example.org")
    assert(d("a.b.c.example.org") === "example.org")
    assert(d("cdn.shop.co.uk") === "shop.co.uk")
    assert(d("deep.cdn.shop.co.uk") === "shop.co.uk")
    assert(d("co.uk") === "co.uk") // the bare suffix is its own site
    assert(d("localhost") === "localhost")
    def surt(h: String) = one(UrlOps.surtHost(col("x")), h)
    assert(surt("www.example.org") === "org,example,www")
  }

  test("extractLinks: attribute-boundary harvest, both quote styles") {
    import org.apache.spark.sql.functions.col
    def links(h: String) =
      one(UrlOps.extractLinks(col("x")), h)
        .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(links("""<a href="https://a/1">x</a><a class="m" href='https://a/2'>y</a>""")
      === Seq("https://a/1", "https://a/2"))
    // data-href / ng-href are NOT links — a bare [^>]*href match
    // harvests tracker URLs
    assert(links("""<a data-href='https://tracker/x' href="https://real/y">z</a>""")
      === Seq("https://real/y"))
    assert(links("""<a data-href='https://tracker/only'>z</a>""") === Seq.empty)
    // multi-line tags ((?s) + \s)
    assert(links("<a\nhref=\"https://a/3\">x</a>") === Seq("https://a/3"))
  }

  test("metaRobots/noindex: either order, quoted or UNQUOTED attributes") {
    import org.apache.spark.sql.functions.col
    def robots(h: String) = one(Html.metaRobots(col("x")), h)
    def ni(h: String) = one(Html.noindex(col("x")), h)
    assert(robots("""<html><meta name="robots" content="NOINDEX, nofollow"></html>""")
      === "noindex, nofollow")
    assert(robots("""<meta content='noindex' name='robots'>""") === "noindex")
    // unquoted attributes are valid HTML5 and common — a quoted-only
    // pattern waves these pages through the compliance gate
    assert(robots("<meta name=robots content=noindex>") === "noindex")
    assert(ni("<meta name=robots content=noindex>") === true)
    assert(ni("""<meta name="robots" content="index, follow">""") === false)
    assert(ni("<p>no meta at all</p>") === false)
    // name=robotsx is NOT the robots directive
    assert(robots("""<meta name=robotsx content=noindex>""") === null)
    // the name terminator must not leak the match into the NEXT tag: a
    // robots meta with content BEFORE name, followed by an unrelated
    // content-bearing tag, must return the robots value — not the
    // description tag's
    assert(robots("""<meta content="noarchive" name="robots"><meta name="description" content="buy cheap noindex guide">""")
      === "noarchive")
    // a content-less robots meta followed by another tag declares
    // NOTHING — it must not fabricate a directive from the next tag
    assert(robots("""<meta name="robots"><meta name="description" content="noindex appears here">""")
      === null)
  }

  test("mainBlockText picks the longest cleaned block segment") {
    import org.apache.spark.sql.functions.col
    def main(h: String) = one(Html.mainBlockText(col("x")), h)
    val page = "<html><body><nav><a href=\"/h\">Home</a> About</nav>" +
      "<p>the actual article prose which is clearly the longest block here</p>" +
      "<footer>copyright</footer></body></html>"
    assert(main(page) ===
      "the actual article prose which is clearly the longest block here")
    // inline tags inside the winning block strip; entities decode
    assert(main("<p>a <b>bold</b> &amp; long enough winner</p><div>x</div>")
      === "a bold & long enough winner")
    // script/style content can never win — it drops before the split
    assert(main("<script>var xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx = 1;</script><p>win</p>")
      === "win")
    // <party> is not a <p…> block boundary
    assert(main("<party>aaaa bbbb cccc</party><p>x</p>") === "aaaa bbbb cccc")
    // an all-empty page yields the empty string, not NULL
    assert(main("<p></p><div></div>") === "")
  }

  test("responseTextCharset: CJK and cp1252 pages decode under their declared charset") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def page(jvmCharset: String, label: String, marker: String): Array[Byte] = {
      val msg = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=" +
        label + "\r\n\r\n<p>marker " + marker + "</p>"
      msg.getBytes(java.nio.charset.Charset.forName(jvmCharset))
    }
    def txt(b: Array[Byte]): String =
      Seq(Tuple1(b)).toDF("payload")
        .select(Html.responseTextCharset(col("payload")).as("t"))
        .head().getString(0)
    // every marker contains bytes that DIFFER between the charset and
    // both latin1 and utf-8 — a wrong decode cannot pass
    assert(txt(page("Shift_JIS", "Shift_JIS", "日本語テスト")) === "marker 日本語テスト")
    assert(txt(page("Shift_JIS", "sjis", "日本語")) === "marker 日本語")
    assert(txt(page("EUC-JP", "euc-jp", "テスト終了")) === "marker テスト終了")
    assert(txt(page("GBK", "gb2312", "中文测试")) === "marker 中文测试")
    assert(txt(page("GBK", "GBK", "中文测试")) === "marker 中文测试")
    assert(txt(page("GB18030", "gb18030", "中文测试")) === "marker 中文测试")
    assert(txt(page("Big5", "big5", "中文測試")) === "marker 中文測試")
    assert(txt(page("EUC-KR", "EUC-KR", "한국어시험")) === "marker 한국어시험")
    // REAL cp1252: the 0x80–0x9F block is curly punctuation and €,
    // not C1 controls (the pre-round-14 latin1 approximation)
    assert(txt(page("windows-1252", "windows-1252", "“quoted” — €9"))
      === "marker “quoted” — €9")
    // latin1 labels still decode as latin1; undeclared falls to UTF-8
    assert(txt(page("ISO-8859-1", "iso-8859-1", "café")) === "marker café")
    assert(txt(("HTTP/1.1 200 OK\r\n\r\n<p>marker ütf</p>")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)) === "marker ütf")
  }

  test("htmlToText decodes numeric character references under HTML5 rules") {
    import org.apache.spark.sql.functions.col
    def t(h: String) = one(Html.htmlToText(col("x")), h)
    assert(t("<p>&#65;&#x42;c</p>") === "ABc")
    assert(t("<p>caf&#233;, caf&#xE9;</p>") === "café, café")
    assert(t("<p>&#x20AC;5</p>") === "€5")
    // the HTML5 C1 remap: &#147;/&#148; render as cp1252 curly quotes
    // in every browser, not as C1 controls
    assert(t("<p>&#147;q&#148; &#151; yes</p>") === "“q” — yes")
    // &amp;#65; is the LITERAL text &#65;, not A (decode ordering)
    assert(t("<p>&amp;#65;</p>") === "&#65;")
    // NUL, surrogates, and out-of-range values → U+FFFD
    assert(t("<p>&#0;&#xD800;&#1114112;&#99999999999999999;</p>")
      === "����")
    // unterminated or digit-less refs pass through verbatim
    assert(t("<p>&#65 x</p>") === "&#65 x")
    assert(t("<p>AT&#T</p>") === "AT&#T")
    assert(t("<p>&#x;</p>") === "&#x;")
    // astral-plane refs decode to the surrogate PAIR
    assert(t("<p>&#x1F600;</p>") === new String(Character.toChars(0x1F600)))
    // the single-pass rule in BOTH directions (HTML5 decodes exactly
    // once): a numeric ref that SYNTHESIZES '&amp;' is literal text,
    // and so is a named ref that synthesizes '&lt;'
    assert(t("<p>&#38;amp;</p>") === "&amp;")
    assert(t("<p>&amp;lt;</p>") === "&lt;")
    assert(t("<p>&#38;#65;</p>") === "&#65;")
  }

  test("robots: query-only URLs match under a '/'-prefixed target (no under-block)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val robots = Seq(("h.example", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "robots_txt")
    val urls = Seq("http://h.example?page=2", "http://h.example",
      "http://h.example/x").toDF("url")
    val got = graft.llm.Robots.disallowed(urls, "url", robots,
        "host", "robots_txt")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    // an empty-path query URL matches Disallow: / as target '/?page=2'
    assert(got === Map("http://h.example?page=2" -> true,
      "http://h.example" -> true, "http://h.example/x" -> true))
    // duplicate robots rows for one host resolve to ONE body, not an
    // interleaved group table
    val dup = Seq(("h.example", "User-agent: *\nDisallow: /a\n"),
      ("h.example", "User-agent: *\nDisallow: /b\n")).toDF("host", "robots_txt")
    val v2 = graft.llm.Robots.disallowed(
        Seq("http://h.example/a", "http://h.example/b").toDF("url"),
        "url", dup, "host", "robots_txt")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    // lexicographically-largest body wins: only /b is disallowed
    assert(v2 === Map("http://h.example/a" -> false,
      "http://h.example/b" -> true))
  }

  test("declaredCharset + responseTextCharset recover latin-1 bytes losslessly") {
    import org.apache.spark.sql.functions.col
    def cs(m: String) = one(Html.declaredCharset(col("x")), m)
    val hdr = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n<p>x</p>"
    assert(cs(hdr) === "iso-8859-1")
    val meta = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><head><meta charset=\"utf-8\"></head><body>x</body></html>"
    assert(cs(meta) === "utf-8")
    assert(cs("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>") === null)
    // latin-1 payload bytes with the header declaring it: the é (0xE9)
    // must survive; a UTF-8 decode would mangle it to U+FFFD
    import spark.implicits._
    val msg = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n" +
      "<html><body><p>café né</p></body></html>"
    val bytes = msg.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val got = Seq(Tuple1(bytes)).toDF("payload")
      .select(Html.responseTextCharset(org.apache.spark.sql.functions.col("payload")))
      .head().getString(0)
    assert(got === "café né")
    // and utf-8 bytes under a utf-8 declaration also round-trip
    val msg8 = msg.replace("ISO-8859-1", "UTF-8")
    val got8 = Seq(Tuple1(msg8.getBytes("UTF-8"))).toDF("payload")
      .select(Html.responseTextCharset(org.apache.spark.sql.functions.col("payload")))
      .head().getString(0)
    assert(got8 === "café né")
  }

  test("httpBody/httpStatus/httpHeader on well-formed and malformed messages") {
    import org.apache.spark.sql.functions.col
    val msg = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      "X-Other: v\r\n\r\n<html>body</html>"
    assert(one(Html.httpBody(col("x")), msg) === "<html>body</html>")
    assert(one(Html.httpStatus(col("x")), msg) === 200)
    assert(one(Html.httpHeader(col("x"), "content-type"), msg)
      === "text/html; charset=UTF-8")
    assert(one(Html.httpHeader(col("x"), "Absent"), msg) === null)
    // no header terminator: body is NULL (malformed capture), not ""
    assert(one(Html.httpBody(col("x")), "HTTP/1.1 200 OK\r\nX: y") === null)
    assert(one(Html.httpStatus(col("x")), "<html>") === null)
  }

  test("crawlDelays: group selection, invalid values, max-wins, case-fold") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val robots = Seq(
      // specific groups shadow *; bot's two groups → max(2, 3) = 3
      ("A.example", "User-agent: bot\nCrawl-delay: 2\nDisallow: /a\n" +
        "User-agent: *\nCrawl-delay: 7\nDisallow: /b\n" +
        "User-agent: bot\nCrawl-delay: 3\n"),
      // only * applies; bogus value ignored
      ("b.example", "User-agent: *\nCrawl-delay: bogus\nCrawl-delay: 1.5\n"),
      // no valid directive at all → absent
      ("c.example", "User-agent: *\nDisallow: /x\n"),
      // unselected group's delay never applies
      ("d.example", "User-agent: other\nCrawl-delay: 9\n"))
      .toDF("host", "robots_txt")
    val got = graft.llm.Robots.crawlDelays(robots, "host", "robots_txt", "bot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a.example" -> 3.0, "b.example" -> 1.5))

    val urls = Seq("http://a.example/1", "http://a.example/2",
      "http://a.example/3", "http://c.example/1").toDF("url")
    val sched = graft.llm.Robots.scheduleManifest(urls, "url",
        robots, "host", "robots_txt", agent = "bot", defaultDelaySec = 9.0)
      .select(col("url"), col("crawl_delay_sec"), col("fetch_slot"),
        col("fetch_after_sec"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(sched === Set(
      ("http://a.example/1", 3.0, 0L, 0.0),
      ("http://a.example/2", 3.0, 1L, 3.0),
      ("http://a.example/3", 3.0, 2L, 6.0),
      ("http://c.example/1", 9.0, 0L, 0.0)))
  }

  test("CRLF robots bodies parse clean: no value carries a trailing \\r") {
    import spark.implicits._
    val robots = Seq(("w.example",
      "User-agent: *\r\nDisallow: /x\r\nCrawl-delay: 5\r\n" +
        "Sitemap: https://w.example/sm.xml\r\n"))
      .toDF("host", "robots_txt")
    // a \r-bearing Disallow path '/x\r' would match no URL (silent
    // under-block); a \r-bearing sitemap value would mint a junk key
    val dis = graft.llm.Robots.disallowed(
        Seq("http://w.example/x/1").toDF("url"), "url",
        robots, "host", "robots_txt")
      .collect().map(_.getAs[Boolean]("disallowed")).toSeq
    assert(dis === Seq(true))
    assert(graft.llm.Robots.crawlDelays(robots, "host", "robots_txt")
      .collect().map(_.getDouble(1)).toSeq === Seq(5.0))
    assert(graft.llm.Robots.sitemapUrls(robots, "host", "robots_txt")
      .collect().map(_.getString(1)).toSeq ===
      Seq("https://w.example/sm.xml"))
  }

  test("crawl-delay between user-agent lines neither splits the run nor flips verdicts") {
    import spark.implicits._
    // pre-crawl-delay parse: ua-a and ua-b were one consecutive run
    // sharing the disallow; the directive's addition must keep that
    // grouping (the over-block-never-under-block contract) AND attach
    // the delay to both agents
    val robots = Seq(("e.example",
      "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x\n"))
      .toDF("host", "robots_txt")
    val urls = Seq("http://e.example/x/1").toDF("url")
    for (agent <- Seq("a", "b")) {
      val dis = graft.llm.Robots.disallowed(urls, "url",
          robots, "host", "robots_txt", agent)
        .collect().map(_.getAs[Boolean]("disallowed")).toSeq
      assert(dis === Seq(true), s"agent $agent must stay disallowed on /x")
      val d = graft.llm.Robots.crawlDelays(robots, "host", "robots_txt", agent)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(d === Map("e.example" -> 5.0), s"agent $agent must see the delay")
    }
  }

  test("sitemapUrls: group-independent harvest, relative values resolve") {
    import spark.implicits._
    val robots = Seq(
      ("A.example", "User-agent: *\nDisallow: /x\n" +
        "Sitemap: https://a.example/sm.xml\nSitemap: /relative/sm.xml\n" +
        "sitemap: https://a.example/sm.xml\n"), // dup + lowercase name fold
      ("b.example", "# none\nUser-agent: *\n"))
      .toDF("host", "robots_txt")
    val got = graft.llm.Robots.sitemapUrls(robots, "host", "robots_txt")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("A.example", "https://a.example/sm.xml"),
      ("A.example", "https://a.example/relative/sm.xml")))
  }

  test("sitemapLocs: padded values trim, entities decode once, index locs harvest") {
    import org.apache.spark.sql.functions.col
    def locs(xml: String): Seq[String] =
      one(Html.sitemapLocs(col("x")), xml)
        .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(locs("<?xml version=\"1.0\"?><urlset>" +
      "<url><loc> https://a.example/p </loc></url>" +
      "<url><loc>https://a.example/s?x=1&amp;y=2</loc></url></urlset>") ===
      Seq("https://a.example/p", "https://a.example/s?x=1&y=2"))
    // a sitemapindex's nested-sitemap locs harvest identically
    assert(locs("<sitemapindex><sitemap><loc>https://a.example/sm1.xml" +
      "</loc></sitemap></sitemapindex>") === Seq("https://a.example/sm1.xml"))
    // no <loc> → empty array, and &amp;#65; double-decode stays banned
    assert(locs("<urlset></urlset>") === Seq.empty)
    assert(locs("<loc>https://a.example/?q=&amp;#65;</loc>") ===
      Seq("https://a.example/?q=&#65;"))
    // CDATA-wrapped locs (several CMS generators) unwrap instead of
    // harvesting the wrapper as garbage
    assert(locs("<urlset><url><loc><![CDATA[https://a.example/cd?x=1]]>" +
      "</loc></url></urlset>") === Seq("https://a.example/cd?x=1"))
  }

  test("redirectTarget: 3xx-redirect statuses only, relative values pass through") {
    import org.apache.spark.sql.functions.col
    def t(msg: String): Any = one(Html.redirectTarget(col("x")), msg)
    assert(t("HTTP/1.1 301 Moved Permanently\r\nLocation: /new\r\n\r\nx")
      === "/new")
    assert(t("HTTP/1.1 308 Permanent Redirect\r\n" +
      "location: https://a.example/p\r\n\r\n") === "https://a.example/p")
    // 200 and 304 carry no redirect even with a Location-shaped header
    assert(t("HTTP/1.1 200 OK\r\nLocation: /x\r\n\r\nbody") === null)
    assert(t("HTTP/1.1 304 Not Modified\r\nLocation: /x\r\n\r\n") === null)
    // redirect status without a Location header → NULL
    assert(t("HTTP/1.1 302 Found\r\nContent-Type: text/html\r\n\r\n") === null)
    // trailing whitespace sheds (a space-bearing value would mint a
    // frontier key that never joins the real record); all-whitespace
    // folds to NULL like an absent header
    assert(t("HTTP/1.1 301 Moved\r\nLocation: /new \r\n\r\n") === "/new")
    assert(t("HTTP/1.1 301 Moved\r\nLocation: \t \r\n\r\n") === null)
    // validators shed trailing whitespace the same way
    import org.apache.spark.sql.functions.col
    val v = one(Html.validators(col("x")),
      "HTTP/1.1 200 OK\r\nETag: \"abc\" \r\nLast-Modified: x \r\n\r\n")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(v.getString(0) === "\"abc\"" && v.getString(1) === "x")
  }

  test("urlNormalize: dedup-key canonicalization arms") {
    import org.apache.spark.sql.functions.col
    def n(u: String): Any = one(UrlOps.urlNormalize(col("x")), u)
    // case-fold + default port + fragment + tracking params
    assert(n("HTTP://WWW.Ex.EXAMPLE:80/Path/P?utm_source=x&a=1&fbclid=z#f")
      === "http://www.ex.example/Path/P?a=1")
    // empty path → '/'; https default port
    assert(n("https://Site.example:443") === "https://site.example/")
    // non-default ports survive; :8443 must not backtrack-strip as :443
    assert(n("https://h.example:8443/p?utm_campaign=c")
      === "https://h.example:8443/p")
    assert(n("http://h.example:8080/") === "http://h.example:8080/")
    // all params stripped → the '?' drops too; bare tracking names strip
    assert(n("http://h.example/p?gclid=1&utm_x") === "http://h.example/p")
    // percent-encoding and dot-segments stay (pinned: never re-key a
    // resource the server might serve differently)
    assert(n("http://h.example/a%2Fb/../c") === "http://h.example/a%2Fb/../c")
    // no authority → NULL
    assert(n("not a url") === null)
    assert(n("mailto:x@y.example") === null)
    // EMPTY authority is not a key either ('http:///' must not mint)
    assert(n("http://") === null)
    assert(n("http://#f") === null)
    // a trailing newline kills the query on BOTH engines (\z anchors:
    // Java's $ would strip the param here while RE2 kept it — the
    // engine-drift class this pin guards)
    assert(n("http://h.example/p?utm_source=x\n") === "http://h.example/p")
  }

  test("anchorTexts: (href, text) pairs, tags stripped, trackers skipped") {
    import org.apache.spark.sql.functions.col
    def a(html: String): Seq[(String, String)] =
      one(Html.anchorTexts(col("x")), html)
        .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
        .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(a("""<a href="https://a.example/p">Read <b>More</b> &amp; x</a>""" +
      """<a data-href="https://t.example/t">skip</a>""" +
      """<a href='/rel'>  go
 here </a>""") === Seq(
      ("https://a.example/p", "Read More & x"),
      ("/rel", "go here")))
    // empty text (image link) survives as ''; no anchors → empty
    assert(a("""<a href="/x"><img src="i.png"/></a>""") === Seq(("/x", "")))
    assert(a("<p>nothing</p>") === Seq.empty)
    // an UNCLOSED anchor yields no pair instead of swallowing its
    // neighbor (the neighbor's text must not misattribute)
    assert(a("""<a href="/1">one <a href="/2">two</a>""") ===
      Seq(("/2", "two")))
    // the valid spaced end tag closes
    assert(a("""<a href="/s">spaced</a >""") === Seq(("/s", "spaced")))
  }

  test("resolveUrl: every pinned arm, incl. IPv6/userinfo bases and NULL shapes") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    def r(base: String, ref: String): Any =
      Seq((base, ref)).toDF("b", "r")
        .select(UrlOps.resolveUrl(col("b"), col("r")).as("y")).head().get(0)
    val base = "https://www.ex.example/a/b/c.html?q=1#top"
    // absolute ref (any scheme) returns verbatim
    assert(r(base, "http://other.example/z") === "http://other.example/z")
    assert(r(base, "mailto:a@b.example") === "mailto:a@b.example")
    // protocol-relative takes the base scheme
    assert(r(base, "//cdn.example/lib.js") === "https://cdn.example/lib.js")
    // root-relative takes the origin
    assert(r(base, "/root/p") === "https://www.ex.example/root/p")
    // query-only replaces the query, keeps the path
    assert(r(base, "?page=2") === "https://www.ex.example/a/b/c.html?page=2")
    // fragment-only appends to the defragmented base
    assert(r(base, "#sec") === "https://www.ex.example/a/b/c.html?q=1#sec")
    // empty ref is the defragmented base
    assert(r(base, "") === "https://www.ex.example/a/b/c.html?q=1")
    // relative path joins the base DIRECTORY (no dot normalization)
    assert(r(base, "img/x.png") === "https://www.ex.example/a/b/img/x.png")
    assert(r(base, "../up") === "https://www.ex.example/a/b/../up")
    // pathless base: directory is "/"
    assert(r("http://h.example", "img/x.png") === "http://h.example/img/x.png")
    assert(r("http://h.example", "?q=2") === "http://h.example?q=2")
    // userinfo + port and IPv6 authorities survive in the origin
    assert(r("https://u:p@h.example:8443/d/", "x") ===
      "https://u:p@h.example:8443/d/x")
    assert(r("http://[2001:db8::1]:8080/d/e", "/z") ===
      "http://[2001:db8::1]:8080/z")
    // invalid base: only absolute refs resolve
    assert(r("not a url", "/x") === null)
    assert(r("not a url", "http://ok.example/") === "http://ok.example/")
    // NULL ref → NULL; NULL base → absolute refs still verbatim
    val nulls = Seq(("x", "y")).toDF("b", "r")
      .select(
        UrlOps.resolveUrl(col("b"), lit(null).cast("string")).as("n1"),
        UrlOps.resolveUrl(lit(null).cast("string"), lit("rel/p")).as("n2"),
        UrlOps.resolveUrl(lit(null).cast("string"),
          lit("https://a.example/")).as("n3"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    assert(nulls.getString(2) === "https://a.example/")
  }
}

package graft

import graft.functions.UrlKernels
import graft.operators.WebIngest

/** Unit surface for the round-9 web-ingestion stage: the RFC 3986 kernel,
  * the strict HTML parser's rejection contract, and the WARC walk. The
  * oracle-checked queries pin the happy path cross-engine; these pin the
  * general-purpose kernel behavior and every documented rejection class. */
class WebIngestSpec extends SparkSuite {

  // ------------------------------------------------------------ UrlKernels

  private def canon(u: String) = UrlKernels.canonicalize(u)

  test("url: percent-normalization decodes unreserved, uppercases kept escapes, keeps invalid") {
    assert(UrlKernels.pctNormalize("p%61ge") == "page")     // %61='a' unreserved
    assert(UrlKernels.pctNormalize("a%2fb") == "a%2Fb")     // '/' reserved: keep, upper
    assert(UrlKernels.pctNormalize("a%2Fb") == "a%2Fb")
    assert(UrlKernels.pctNormalize("x%7ey") == "x~y")       // '~' unreserved
    assert(UrlKernels.pctNormalize("bad%zzkeep") == "bad%zzkeep") // invalid: literal
    assert(UrlKernels.pctNormalize("tail%4") == "tail%4")   // short: literal
    assert(UrlKernels.pctNormalize("%%41") == "%A")         // '%%' → literal %, then %41='A'
    assert(UrlKernels.pctNormalize("no-escapes") == "no-escapes")
  }

  test("url: remove_dot_segments follows RFC 3986 §5.2.4") {
    assert(UrlKernels.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(UrlKernels.removeDotSegments("/docs/../docs/5/./page-7") == "/docs/5/page-7")
    assert(UrlKernels.removeDotSegments("mid/content=5/../6") == "mid/6")
    assert(UrlKernels.removeDotSegments("/..") == "/")
    assert(UrlKernels.removeDotSegments("/a/../../b") == "/b")
    assert(UrlKernels.removeDotSegments("/a/b/..") == "/a/")
  }

  test("url: canonicalize lowercases scheme+host ASCII-only, strips default port/credentials/fragment") {
    assert(canon("HTTP://WWW.EXAMPLE.COM/Path?a=1") == "http://www.example.com/Path?a=1")
    assert(canon("http://host:80/x") == "http://host/x")
    assert(canon("https://host:443/x") == "https://host/x")
    assert(canon("https://host:80/x") == "https://host:80/x") // not https default
    assert(canon("http://host:/x") == "http://host/x")        // bare colon
    assert(canon("http://user:pw@host:80/x?b=2&a=1#frag") == "http://host/x?a=1&b=2")
    assert(canon("http://h/") == "http://h/")
    assert(canon("http://h") == "http://h/")                  // empty path → "/"
    // ASCII-only fold: Turkish İ (U+0130) must NOT fold
    assert(canon("http://İhost/x") == "http://İhost/x")
  }

  test("url: IPv6 literal colons are not ports") {
    assert(canon("http://[2001:db8::1]/x") == "http://[2001:db8::1]/x")
    assert(canon("http://[2001:db8::1]:80/x") == "http://[2001:db8::1]/x")
  }

  test("url: query params drop empties and utm_*, sort by codepoint (UTF-8 byte order)") {
    assert(canon("http://h/p?b=2&&a=1&utm_source=x&utm_medium=y") == "http://h/p?a=1&b=2")
    assert(canon("http://h/p?utm_only=1") == "http://h/p")
    // U+FFFD (BMP, high) vs U+10000 (astral): codepoint order puts FFFD first;
    // Java UTF-16 compareTo would put the surrogate pair first — the bug this pins
    assert(canon("http://h/p?𐀀=1&�=2") == "http://h/p?�=2&𐀀=1")
  }

  test("url: canonicalize is idempotent and null-safe; opaque (no ://) passes through stages 1-2 only") {
    val messy = Seq(
      "HTTP://U:P@WWW.A.COM:80/docs/../d/./x?b=2&utm_x=9&a=1#f",
      "http://h/p%61th?q=%2f", "mailto:x@y.z?subject=hi#frag", "not a url at all")
    messy.foreach { u => assert(canon(canon(u)) == canon(u), s"not idempotent: $u") }
    assert(canon(null) == null)
    assert(canon("mailto:X@Y.z#f") == "mailto:X@Y.z") // opaque: only fragment strip
  }

  test("url: every messy fixture variant canonicalizes to the same formula target") {
    for (label <- Seq("src7", "MiXeD-9", ""); id <- 0L until 16L) {
      val expect = s"http://www.${UrlKernels.asciiLower(label)}.example.com" +
        s"/docs/${id % 50}/page-${id % 200}?a=1&b=2"
      val got = canon(WebIngest.messyUrlString(id, label))
      assert(got == expect, s"id=$id label=$label: $got != $expect")
    }
  }

  // ------------------------------------------------------------ HTML parse

  private def page(body: String) =
    s"<!DOCTYPE html><html><head><title>T</title></head><body>$body</body></html>"

  test("html: rendered page round-trips to the exact block inventory") {
    val text = "one two three four five six seven eight nine ten"
    val blocks = WebIngest.parseHtmlBlocks(WebIngest.renderHtml(3L, "src3", text))
    assert(blocks.length == 5) // nav, h1, 1 para (10 tokens), rel, footer
    assert(blocks(0).text == "Home About src3" && blocks(0).linkChars == 13)
    assert(blocks(1).text == "Document 3" && blocks(1).tokens == 2)
    assert(blocks(2).text == text && blocks(2).linkChars == 0 && blocks(2).tokens == 10)
    assert(blocks(3).text.startsWith("Related: doc ") && blocks(3).text.endsWith(" see also"))
    assert(blocks(4).text == "Terms Privacy Copyright 2024 src3" && blocks(4).linkChars == 12)
    assert(blocks.count(WebIngest.isContent) == 1) // only the paragraph
  }

  test("html: entity decode and codepoint counting survive escapes and astral chars") {
    val text = "a & b < c > d 😀 café six seven eight"
    val blocks = WebIngest.parseHtmlBlocks(WebIngest.renderHtml(1L, "s", text))
    val para = blocks(2)
    assert(para.text == text)
    // codepoints, not UTF-16 units: the emoji counts once
    assert(para.chars == text.codePointCount(0, text.length))
  }

  test("html: rejection battery — every unsupported markup class fails loudly") {
    val bad = Seq(
      "unterminated tag" -> page("<p>x"),
      "unterminated comment" -> page("<!-- never closed <p>x</p>"),
      "unterminated raw container" -> page("<p>a</p><script>var x=1;"),
      "bare '<'" -> page("<p>a < b</p>"),
      "'<' inside tag" -> page("<p <div>>x</p>"),
      "unknown tag" -> page("<marquee>x</marquee>"),
      "uppercase tag" -> page("<P>x</P>"),
      "unknown entity" -> page("<p>&nope;</p>"),
      "unterminated entity" -> page("<p>&amp no semi</p>"),
      "bad numeric entity" -> page("<p>&#xzz;</p>"),
      // round 11: Integer.parseInt accepted signed digit strings, and
      // appendCodePoint happily emits lone surrogates — both now reject
      "signed numeric entity" -> page("<p>&#x+41;</p>"),
      "signed decimal entity" -> page("<p>&#-65;</p>"),
      "surrogate numeric entity" -> page("<p>&#xD800;</p>"),
      "out-of-range numeric entity" -> page("<p>&#x110000;</p>"),
      "nested block" -> page("<div><p>x</p></div>"),
      "mismatched closer" -> page("<div>x</p>"),
      "stray closer" -> page("</div>"),
      "nested <a>" -> page("<p><a href=\"x\"><a href=\"y\">z</a></a></p>"),
      "</a> without <a>" -> page("<p>x</a></p>"),
      "<a> outside block" -> page("<a href=\"x\">y</a>"),
      "text outside block" -> page("stray words"),
      "entity outside block" -> page("&amp;"),
      "unclosed block at EOF" -> "<!DOCTYPE html><html><body><p>x",
      "missing </html>" -> "<!DOCTYPE html><html><body><p>x</p></body>",
      "content after </html>" -> (page("<p>x</p>") + "trailing"))
    bad.foreach { case (what, html) =>
      val e = intercept[IllegalArgumentException](WebIngest.parseHtmlBlocks(html))
      assert(e.getMessage.startsWith("html reject:"), s"$what: ${e.getMessage}")
    }
  }

  test("html: supported-but-unused classes parse (comments, inline tags, void tags, numeric entities)") {
    val blocks = WebIngest.parseHtmlBlocks(page(
      "<!-- c --><p>a <b>bold</b> &#65;&#x42; x<br> y z w</p>"))
    assert(blocks.length == 1)
    assert(blocks.head.text == "a bold AB x y z w")
  }

  // ------------------------------------------------------------------ WARC

  private def docs = Seq(
    WebIngest.WarcDoc(1L, "src1", "alpha beta gamma delta epsilon zeta"),
    WebIngest.WarcDoc(2L, "src2", "line1\r\nline2\r\n\r\nline3 five six seven eight nine"))

  test("warc: write → read round-trip recovers every record, byte-exact payloads") {
    val recs = WebIngest.readWarc(WebIngest.warcFile(docs))
    assert(recs.length == 3)
    assert(recs.head.warcType == "warcinfo")
    val responses = recs.filter(_.warcType == "response")
    assert(responses.map(_.recordId) == Vector("<urn:graft:1>", "<urn:graft:2>"))
    responses.zip(docs).foreach { case (r, d) =>
      val html = new String(WebIngest.httpBody(r.payload), "UTF-8")
      assert(html == WebIngest.renderHtml(d.doc_id, d.label, d.text))
      assert(r.targetUri == UrlKernels.canonicalize(
        WebIngest.messyUrlString(d.doc_id, d.label)))
    }
  }

  test("warc: payloads containing CRLF CRLF survive (length-delimited, never scanned)") {
    // doc 2's text embeds \r\n\r\n — the html (and so the record payload)
    // contains the record-terminator byte sequence mid-payload
    val recs = WebIngest.readWarc(WebIngest.warcFile(docs))
    val html2 = new String(WebIngest.httpBody(
      recs.filter(_.warcType == "response")(1).payload), "UTF-8")
    assert(html2.contains("line2\r\n\r\nline3"))
  }

  test("warc: rejection battery — malformed containers fail loudly") {
    val good = WebIngest.warcFile(docs.take(1))
    def gz(s: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(s); g.close()
      bo.toByteArray
    }
    val cases = Seq[(String, Array[Byte])](
      "not gzip" -> "WARC/1.0\r\n".getBytes("US-ASCII"),
      "truncated gzip member" -> good.dropRight(8),
      "bad version" -> gz("WARC/0.9\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes("US-ASCII")),
      "malformed header line" -> gz("WARC/1.0\r\nNoColonHere\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes("US-ASCII")),
      "missing WARC-Type" -> gz("WARC/1.0\r\nWARC-Record-ID: <urn:x>\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes("US-ASCII")),
      "missing Content-Length" -> gz("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x>\r\n\r\n\r\n\r\n".getBytes("US-ASCII")),
      "bad Content-Length" -> gz("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x>\r\nContent-Length: zz\r\n\r\n\r\n\r\n".getBytes("US-ASCII")),
      "truncated payload" -> gz("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x>\r\nContent-Length: 99\r\n\r\nshort".getBytes("US-ASCII")),
      "missing terminator" -> gz("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x>\r\nContent-Length: 2\r\n\r\nabXXXX".getBytes("US-ASCII")))
    cases.foreach { case (what, bytes) =>
      val e = intercept[IllegalArgumentException](WebIngest.readWarc(bytes))
      assert(e.getMessage.contains("reject"), s"$what: ${e.getMessage}")
    }
  }

  test("warc: bucket key bounds GROUP SIZE and grows GROUP COUNT with the corpus") {
    // The round-10 audit found the gate that matters: the old PlanSpec gate
    // asserted the exchange was keyed on `bucket` — true for both doc_id%16
    // (16 giant groups, parallelism capped forever) and doc_id DIV 16
    // (bounded ~16-doc groups, count linear in n). This pins the property
    // on DATA: max rows per group ≤ WarcBucket, and the group count at
    // sf0.01 is ~10× the count at sf0.001 (group COUNT, not size, absorbs
    // corpus growth).
    import org.apache.spark.sql.functions.{count, max}
    def stats(dir: String): (Long, Long) = {
      val g = Tables.documents(spark, dir)
        .groupBy(WebIngest.warcBucketKey)
        .agg(count("*").as("n"))
      val row = g.agg(max("n"), count("*")).head()
      (row.getLong(0), row.getLong(1))
    }
    val (maxSmall, groupsSmall) = stats(sf)
    // sf0.01 carries the same 500 documents as sf0.001 — sf0.1 (5000) is
    // the 10x documents step
    val (maxBig, groupsBig) = stats("/root/testdata/sf0.1")
    assert(maxSmall <= WebIngest.WarcBucket,
      s"sf0.001 group of $maxSmall docs exceeds the WarcBucket bound")
    assert(maxBig <= WebIngest.WarcBucket,
      s"sf0.1 group of $maxBig docs exceeds the WarcBucket bound")
    assert(groupsBig >= 5 * groupsSmall,
      s"group count must grow with the corpus (got $groupsSmall → $groupsBig); " +
        "a MOD key would hold it constant at 16")
  }

  test("warc: bucket key bounds GROUP SIZE on a NEGATIVE-id corpus too") {
    // Round-12 advice: `doc_id DIV 16` truncates toward zero, so ids
    // -15..15 all land in bucket 0 — a 31-doc group that breaks the
    // ≤ WarcBucket bound exactly on the hostile corpora that use negative
    // ids. shiftright IS floor division for the power-of-two bucket; this
    // pins the bound ON DATA across zero, including Long.MinValue.
    import org.apache.spark.sql.functions.{count, max}
    import spark.implicits._
    val hostile = ((-40L to 40L) ++ Seq(Long.MinValue, Long.MinValue + 1,
      Long.MaxValue, Long.MaxValue - 1)).toDF("doc_id")
    val row = hostile.groupBy(WebIngest.warcBucketKey)
      .agg(count("*").as("n"))
      .agg(max("n")).head()
    assert(row.getLong(0) <= WebIngest.WarcBucket,
      s"negative-id group of ${row.getLong(0)} docs exceeds the WarcBucket " +
        "bound — truncating division is back")
  }

  test("warc: http split rejects non-200 and headerless payloads") {
    intercept[IllegalArgumentException](
      WebIngest.httpBody("HTTP/1.1 404 Not Found\r\n\r\nx".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      WebIngest.httpBody("no terminator here".getBytes("US-ASCII")))
  }

  // -------------------------------------------------------------- charsets

  test("charset: BOM sniff + strict decode round-trips all three fixture encodings") {
    val texts = Seq("plain ascii", "café 😀 naïve", "", "﻿BOM-leading text")
    for (t <- texts; v <- 0L to 2L) {
      val payload = WebIngest.charsetPayload(v, t)
      val (enc, cps) = WebIngest.sniffCharset(payload)
      val expEnc =
        if (v == 0) "utf-16le"
        else if (v == 1) "utf-8-bom"
        else if (t.startsWith("﻿")) "utf-8-bom"
        else "utf-8"
      val expCps = t.codePointCount(0, t.length) -
        (if (v == 2 && t.startsWith("﻿")) 1 else 0)
      assert((enc, cps) == (expEnc, expCps.toLong), s"v=$v t='$t'")
    }
  }

  test("charset: rejection battery — malformed UTF-8/UTF-16 fails loudly") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val utf8Bad = Seq(
      "bare continuation" -> b(0x80),
      "overlong 2-byte (C0 80)" -> b(0xC0, 0x80),
      "overlong 2-byte (C1 BF)" -> b(0xC1, 0xBF),
      "overlong 3-byte (E0 80 80)" -> b(0xE0, 0x80, 0x80),
      "encoded surrogate (ED A0 80)" -> b(0xED, 0xA0, 0x80),
      "overlong 4-byte (F0 80 80 80)" -> b(0xF0, 0x80, 0x80, 0x80),
      "past U+10FFFF (F4 90 80 80)" -> b(0xF4, 0x90, 0x80, 0x80),
      "lead past U+10FFFF (F5)" -> b(0xF5, 0x80, 0x80, 0x80),
      "truncated 3-byte" -> b(0xE2, 0x82),
      "non-continuation tail" -> b(0xC3, 0x41))
    utf8Bad.foreach { case (what, bytes) =>
      val e = intercept[IllegalArgumentException](WebIngest.utf8Codepoints(bytes, 0))
      assert(e.getMessage.startsWith("charset reject:"), s"$what: ${e.getMessage}")
    }
    val utf16Bad = Seq(
      "odd byte length" -> b(0x41),
      "lone high surrogate" -> b(0x00, 0xD8),
      "high + non-low" -> b(0x00, 0xD8, 0x41, 0x00),
      "lone low surrogate" -> b(0x00, 0xDC))
    utf16Bad.foreach { case (what, bytes) =>
      val e = intercept[IllegalArgumentException](WebIngest.utf16leCodepoints(bytes, 0))
      assert(e.getMessage.startsWith("charset reject:"), s"$what: ${e.getMessage}")
    }
    // valid astral pair counts once in both encodings
    assert(WebIngest.utf8Codepoints("😀".getBytes("UTF-8"), 0) == 1L)
    assert(WebIngest.utf16leCodepoints("😀".getBytes("UTF-16LE"), 0) == 1L)
  }

  // ---------------------------------------------------------------- robots

  test("robots: parser picks the right group, evaluator applies RFC 9309 precedence") {
    val txt = WebIngest.robotsTxtOf("src3")
    // exact-agent group beats *; graftbot falls through to *
    assert(WebIngest.parseRobots(txt, "research-bot") == Seq((false, "/")))
    val rules = WebIngest.parseRobots(txt, "graftbot")
    assert(rules == WebIngest.RobotsRules)
    // unknown agent with no * group → no rules → everything allowed
    assert(WebIngest.parseRobots("User-agent: other\nDisallow: /\n", "graftbot").isEmpty)
    // longest match wins
    assert(WebIngest.robotsDecision(rules, "/docs/10/page-60")._1 == false)
    assert(WebIngest.robotsDecision(rules, "/docs/1/page-101") ==
      (true, Some("Allow: /docs/1/page-1")))
    // allow-beats-disallow on the longer pattern
    assert(WebIngest.robotsDecision(rules, "/docs/3/page-53")._1 == true)
    // '$' anchors: exact path re-opened, siblings stay blocked
    assert(WebIngest.robotsDecision(rules, "/docs/40/page-140") ==
      (true, Some("Allow: /docs/40/page-140$")))
    assert(WebIngest.robotsDecision(rules, "/docs/40/page-1400")._1 == false)
    assert(WebIngest.robotsDecision(rules, "/docs/40/page-90")._1 == false)
    // no match → allowed with no rule
    assert(WebIngest.robotsDecision(rules, "/docs/25/page-25") == (true, None))
    // consecutive User-agent lines share one group
    val multi = WebIngest.parseRobots(
      "User-agent: a\nUser-agent: graftbot\nDisallow: /x\n", "graftbot")
    assert(multi == Seq((false, "/x")))
    // empty Disallow value = no rule (allow everything), per the RFC
    assert(WebIngest.parseRobots("User-agent: *\nDisallow:\n", "graftbot").isEmpty)
  }

  test("robots: rejection battery — malformed or unsupported robots.txt fails loudly") {
    val bad = Seq(
      "rule before group" -> "Disallow: /x\nUser-agent: *\n",
      "unknown directive" -> "User-agent: *\nNoIndex: /x\n",
      "wildcard pattern" -> "User-agent: *\nDisallow: /docs/*/page\n",
      "no colon" -> "User-agent: *\njust words\n")
    bad.foreach { case (what, txt) =>
      val e = intercept[IllegalArgumentException](
        WebIngest.parseRobots(txt, "graftbot"))
      assert(e.getMessage.startsWith("robots reject:"), s"$what: ${e.getMessage}")
    }
  }

  // ----------------------------------------------------------------- xml

  test("xml: sitemap round-trip — entities in locs survive, order and dates exact") {
    val ids = Seq(3L, 17L, 203L)
    val entries = WebIngest.readSitemap(WebIngest.sitemapXmlOf("src3", ids))
    assert(entries.length == 3)
    entries.zip(ids).foreach { case ((loc, mod), id) =>
      // the canonical URL's query '&' must round-trip through &amp;
      assert(loc == graft.functions.UrlKernels.canonicalize(
        WebIngest.messyUrlString(id, "src3")), s"id=$id loc=$loc")
      assert(loc.contains("?a=1&b=2"))
      assert(mod == WebIngest.lastmodOf(id))
    }
    assert(WebIngest.lastmodOf(203L) == "2024-07-22")
    assert(WebIngest.lastmodOf(-7L) == "2023-12-25") // hostile negative ids
  }

  test("xml: rejection battery — malformed sitemaps fail loudly") {
    def sm(body: String) = s"""<?xml version="1.0" encoding="UTF-8"?>$body"""
    val bad = Seq(
      "mismatched close" -> sm("<urlset><url></urlset></url>"),
      "unclosed root" -> sm("<urlset><url></url>"),
      "bare '<'" -> sm("<urlset>< url/></urlset>"),
      "unknown entity" -> sm("<urlset><url><loc>&nope;</loc></url></urlset>"),
      "surrogate numeric entity" -> sm("<urlset><url><loc>&#xDFFF;</loc></url></urlset>"),
      "signed numeric entity" -> sm("<urlset><url><loc>&#x+41;</loc></url></urlset>"),
      "bad attr" -> sm("<urlset xmlns=nounquoted><url/></urlset>"),
      "trailing junk" -> (sm("<urlset></urlset>") + "extra"),
      "unterminated prolog" -> "<?xml version=\"1.0\"",
      "wrong root" -> sm("<sitemapindex></sitemapindex>"),
      "non-url child" -> sm("<urlset><loc>x</loc></urlset>"),
      "url without loc" -> sm("<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>"))
    bad.foreach { case (what, xml) =>
      val e = intercept[IllegalArgumentException](WebIngest.readSitemap(xml))
      assert(e.getMessage.contains("reject"), s"$what: ${e.getMessage}")
    }
    // self-closing elements parse (the grammar allows them)
    assert(WebIngest.parseXml("<urlset><url/></urlset>").children.head.name == "url")
  }

  // --------------------------------------------------- classifier boundary

  test("html: footer classification flips exactly at the documented label-length boundary") {
    // content iff 3·12 < 29 + len(label) → len ≥ 8
    val short = WebIngest.parseHtmlBlocks(WebIngest.renderHtml(1L, "len7-ab", "w1 w2"))
    val long = WebIngest.parseHtmlBlocks(WebIngest.renderHtml(1L, "len8-abc", "w1 w2"))
    assert(!WebIngest.isContent(short.last))
    assert(WebIngest.isContent(long.last))
  }

  // ------------------------------------------------------- head metadata

  test("head: renderHtmlMeta round-trips title, lang, description, canonical") {
    val text = "alpha <b>bold</b> \"quoted\" & amp > gt tokens nine ten eleven twelve thirteen"
    val html = WebIngest.renderHtmlMeta(7L, "src7", "fr", text)
    val m = WebIngest.parseHead(html)
    assert(m.title == "Doc 7 (src7)")
    assert(m.htmlLang == "fr")
    // description decodes back to the EXACT first-12-token prefix, hostile
    // markup chars and all (the escape round-trip under test)
    assert(m.metas("description") == text.split(" ", -1).take(12).mkString(" "))
    assert(m.links("canonical") == UrlKernels.canonicalize(
      WebIngest.messyUrlString(7L, "src7")))
    assert(m.links("canonical").contains("?a=1&b=2")) // raw & survived &amp;
    // the metadata-bearing page is ALSO a valid block-parser page with the
    // identical body inventory (head never leaks into block stats)
    val metaBlocks = WebIngest.parseHtmlBlocks(html)
    val plainBlocks = WebIngest.parseHtmlBlocks(WebIngest.renderHtml(7L, "src7", text))
    assert(metaBlocks == plainBlocks)
  }

  test("head: declared-lang fixture rotates every tenth doc, sanitizes the rest") {
    assert(WebIngest.declaredLangOf(7L, "en") == "en")
    assert(WebIngest.declaredLangOf(10L, "en") == "fr")
    assert(WebIngest.declaredLangOf(20L, "zh") == "en")
    assert(WebIngest.declaredLangOf(30L, "") == "en")   // unknown → en
    assert(WebIngest.declaredLangOf(-20L, "es") == "de") // hostile negative ids
    assert(WebIngest.sanitizeLang("Zh!") == "zh")
    assert(WebIngest.sanitizeLang(null) == "")
  }

  test("head: rejection battery — malformed heads fail loudly") {
    def doc(head: String) =
      s"""<!DOCTYPE html><html lang="en"><head>$head</head><body></body></html>"""
    val bad = Seq(
      "missing title" -> doc("<meta charset=\"utf-8\">"),
      "duplicate title" -> doc("<title>a</title><title>b</title>"),
      "unterminated title" -> doc("<title>never closed"),
      "unterminated raw container" -> doc("<title>t</title><script>var x;"),
      "text in head" -> doc("<title>t</title>stray words"),
      "unknown head tag" -> doc("<title>t</title><base href=\"/\">"),
      "block tag in head" -> doc("<title>t</title><div>x</div>"),
      "meta without name+content" -> doc("<title>t</title><meta name=\"d\">"),
      "link without rel+href" -> doc("<title>t</title><link rel=\"canonical\">"),
      "unquoted attr" -> doc("<title>t</title><meta charset=utf-8>"),
      "unknown entity in attr" -> doc(
        "<title>t</title><meta name=\"d\" content=\"&nope;\">"),
      "unclosed head at EOF" -> "<!DOCTYPE html><html><head><title>t</title>",
      "missing html element" -> "<!DOCTYPE html><head><title>t</title></head>")
    bad.foreach { case (what, html) =>
      val e = intercept[IllegalArgumentException](WebIngest.parseHead(html))
      assert(e.getMessage.startsWith("html reject:"), s"$what: ${e.getMessage}")
    }
    // the plain renderHtml head (no lang, no metas) parses too — title only
    val m = WebIngest.parseHead(WebIngest.renderHtml(3L, "src3", "w1 w2"))
    assert(m.title == "Doc 3" && m.htmlLang == "" && m.metas.isEmpty)
  }

  test("head: escapeAttr/decodeEntities round-trip hostile values") {
    for (s <- Seq("a&b", "q\"uote", "lt<gt>", "&amp; literal", "plain",
      "astral " + new String(Character.toChars(0x1F600)))) {
      assert(WebIngest.decodeEntities(WebIngest.escapeAttr(s)) == s, s)
    }
  }

  // -------------------------------------------------------------- JSON-LD

  test("jsonld: head walk carries the raw container; '\\/' defense survives </script> in strings") {
    import graft.operators.ChatData.{parseJson, JObj, JStr, JNum}
    // a token that would terminate the raw container if '/' were emitted
    // literally — the \/ escape is exactly what keeps it inside
    val text = "before </script> after"
    val ld = WebIngest.ldJsonOf(5L, "src5", text)
    assert(!ld.contains("</script>"), "ld body leaks an unescaped terminator")
    val meta = WebIngest.parseHead(
      WebIngest.renderHtmlMeta(5L, "src5", "en", text, Some(ld)))
    assert(meta.ldJson == Vector(ld))
    parseJson(ld) match {
      case JObj(Vector(("@type", JStr("Article")), ("headline", JStr(h)),
          ("url", JStr(u)), ("wordCount", JNum(3)))) =>
        assert(h == meta.title)
        assert(u == graft.functions.UrlKernels.canonicalize(
          WebIngest.messyUrlString(5L, "src5")))
      case other => fail(s"unexpected ld shape: $other")
    }
    // a page without the container reports none; the plain script stays opaque
    assert(WebIngest.parseHead(
      WebIngest.renderHtmlMeta(5L, "src5", "en", text)).ldJson.isEmpty)
    // malformed JSON inside the container is the CODEC's loud rejection
    val badPage = WebIngest.renderHtmlMeta(5L, "src5", "en", text,
      Some("""{"@type": """))
    val raw = WebIngest.parseHead(badPage).ldJson.head
    val e = intercept[IllegalArgumentException](parseJson(raw))
    assert(e.getMessage.startsWith("json reject:"))
  }

  // ----------------------------------------------------------- HTML tables

  test("table: render → strict parse round-trips hostile cells and marked pads") {
    val text = "a&b c<d e>f \"q\" plain  last" // doubled space → empty token cell
    val (header, rows, pads) = WebIngest.parseHtmlTable(
      WebIngest.renderHtmlTable(9L, text))
    assert(header == Vector("c0", "c1", "c2", "c3"))
    assert(rows.flatten == text.split(" ", -1).toVector)
    // 7 tokens → 2 rows of 4 with ONE pad; the empty token survives as a
    // real cell, never eaten as padding
    assert(rows.map(_.length) == Vector(4, 3) && pads == 1)
    assert(rows(1).take(3) == Vector("plain", "", "last"))
  }

  test("table: rejection battery — malformed tables fail loudly") {
    val bad = Seq(
      "wrong root" -> "<urlset></urlset>",
      "non-tr child" -> "<table><td>x</td></table>",
      "empty table" -> "<table></table>",
      "empty header" -> "<table><tr></tr></table>",
      "td in header" -> "<table><tr><td>c0</td></tr></table>",
      "th in data row" -> "<table><tr><th>c0</th></tr><tr><th>x</th></tr></table>",
      "ragged row" ->
        "<table><tr><th>c0</th><th>c1</th></tr><tr><td>x</td></tr></table>",
      "pad with content" ->
        "<table><tr><th>c0</th></tr><tr><td class=\"pad\">x</td></tr></table>",
      "data cell after a pad" ->
        ("<table><tr><th>c0</th><th>c1</th></tr>" +
          "<tr><td class=\"pad\"/><td>x</td></tr></table>"))
    bad.foreach { case (what, markup) =>
      val e = intercept[IllegalArgumentException](
        WebIngest.parseHtmlTable(markup))
      assert(e.getMessage.contains("reject"), s"$what: ${e.getMessage}")
    }
  }

  // ------------------------------------------------------ sitemap indexes

  test("sitemap index: robots Sitemap directive → index → chunks walks every URL in order") {
    val ids = (1L to 100L).toVector
    val sitemaps = WebIngest.parseRobotsSitemaps(WebIngest.robotsTxtOf("src5"))
    assert(sitemaps == Seq("http://www.src5.example.com/sitemap-index.xml"))
    val (entries, fetched) = WebIngest.readSitemapTree(sitemaps.head,
      WebIngest.sitemapFixtureResolver("src5", ids))
    assert(fetched == 4) // index + ceil(100/40) = 3 chunk files
    // the recursive walk sees EXACTLY what the flat single-file walk sees
    assert(entries == WebIngest.readSitemap(WebIngest.sitemapXmlOf("src5", ids)))
    assert(entries.length == 100)
  }

  test("sitemap discovery: the chunked two-leg walk equals a monolithic per-host walk") {
    // Round 11 replaced the per-host collect_list walk (unbounded buffer)
    // with the chunked spine: per-chunk strict parses + a host-level
    // recursion over chunk summaries. This pins the refactor's semantics:
    // for every host in the corpus, the registered query's row must equal
    // what the ORIGINAL monolithic readSitemapTree walk (full resolver,
    // all ids on one host) reports — counts, mod range, and the two-level
    // chunk-order digest recomputed from the monolithic walk's entries.
    import org.apache.spark.sql.functions.{coalesce, col, lit, regexp_replace, translate}
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    val hosts = Tables.documents(spark, sf)
      .select(col("doc_id"), translate(
        regexp_replace(coalesce(col("source"), lit("")), "[^A-Za-z0-9-]", ""),
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz").as("label"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (l, rows) => l -> rows.map(_._2).sorted.toVector }
    val got = SparkEntry.queries("sitemap_discovery")(spark, sf).collect()
      .map(r => r.getAs[String]("host") ->
        (r.getAs[Long]("n_sitemaps"), r.getAs[Long]("n_urls"),
          r.getAs[String]("first_mod"), r.getAs[String]("last_mod"),
          r.getAs[String]("locs_digest"))).toMap
    assert(got.size == hosts.size)
    hosts.foreach { case (label, ids) =>
      val (entries, fetched) = WebIngest.readSitemapTree(
        WebIngest.parseRobotsSitemaps(WebIngest.robotsTxtOf(label)).head,
        WebIngest.sitemapFixtureResolver(label, ids))
      val twoLevel = md5hex(entries.grouped(WebIngest.SitemapChunk)
        .map(ch => md5hex(ch.map(_._1).mkString("\n"))).mkString("\n"))
      val exp = ((fetched - 1).toLong, entries.length.toLong,
        entries.map(_._2).min, entries.map(_._2).max, twoLevel)
      assert(got(s"www.$label.example.com") == exp, s"host $label diverged")
    }
  }

  test("robots: crawl-delay rides the same group selection, rejects bad values") {
    assert(WebIngest.parseCrawlDelay(WebIngest.robotsTxtOf("src1"), "graftbot")
      == Some(2)) // the * group's delay (graftbot matches no named group)
    val txt = "User-agent: graftbot\nCrawl-delay: 7\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 2\n"
    assert(WebIngest.parseCrawlDelay(txt, "graftbot") == Some(7)) // exact group wins
    assert(WebIngest.parseCrawlDelay(txt, "otherbot") == Some(2)) // falls to *
    assert(WebIngest.parseCrawlDelay("User-agent: *\nDisallow: /\n", "x").isEmpty)
    for (bad <- Seq("User-agent: *\nCrawl-delay: fast\n",
      "User-agent: *\nCrawl-delay: -1\n",
      "Crawl-delay: 2\n")) {
      val e = intercept[IllegalArgumentException](
        WebIngest.parseCrawlDelay(bad, "x"))
      assert(e.getMessage.startsWith("robots reject:"), e.getMessage)
    }
  }

  test("sitemap index: the robots gate still parses the Sitemap-bearing robots.txt") {
    // the directive must be TOLERATED by the rule parser (same file, two
    // readers) — and must not change the effective rule set
    assert(WebIngest.parseRobots(WebIngest.robotsTxtOf("src1"), "graftbot")
      == WebIngest.RobotsRules)
  }

  test("sitemap index: rejection battery — cycles, depth, foreign locs, bad grammar") {
    def index(locs: String*) =
      "<sitemapindex>" + locs.map(l => s"<sitemap><loc>$l</loc></sitemap>").mkString +
        "</sitemapindex>"
    val self = "http://h/sitemap-index.xml"
    // cycle: the index lists itself
    val e1 = intercept[IllegalArgumentException](
      WebIngest.readSitemapTree(self, _ => index(self)))
    assert(e1.getMessage.contains("cycle"))
    // depth: index → index → index exceeds the 2-level bound
    val deep = Map(
      "http://h/a.xml" -> index("http://h/b.xml"),
      "http://h/b.xml" -> index("http://h/c.xml"),
      "http://h/c.xml" -> "<urlset></urlset>")
    val e2 = intercept[IllegalArgumentException](
      WebIngest.readSitemapTree("http://h/a.xml", deep))
    assert(e2.getMessage.contains("depth"))
    // foreign loc: the fixture resolver refuses off-host fetches
    val e3 = intercept[IllegalArgumentException](
      WebIngest.readSitemapTree("http://www.src1.example.com/sitemap-index.xml",
        url => if (url.endsWith("index.xml"))
          index("http://evil.example.org/sitemap-0.xml")
        else WebIngest.sitemapFixtureResolver("src1", Seq(1L))(url)))
    assert(e3.getMessage.contains("namespace") || e3.getMessage.contains("reject"))
    // grammar: a non-<sitemap> child under the index
    val e4 = intercept[IllegalArgumentException](
      WebIngest.readSitemapTree("http://h/x.xml",
        _ => "<sitemapindex><url><loc>y</loc></url></sitemapindex>"))
    assert(e4.getMessage.contains("reject"))
    // robots: a Sitemap directive without a URL
    val e5 = intercept[IllegalArgumentException](
      WebIngest.parseRobotsSitemaps("Sitemap:\nUser-agent: *\n"))
    assert(e5.getMessage.contains("reject"))
  }

  // ------------------------------------------- planted eval-leak fixture

  test("decontaminate_spans family + web_pipeline leak count on a planted corpus") {
    // a corpus where exactly ONE train doc leaks exactly ONE eval span:
    // doc 27's tokens 0..15 reproduce eval doc 5's tokens 10..25 verbatim
    // (9 marked gram starts -> one merged 16-token span). Every other
    // token in the corpus is globally unique, so any extra span anywhere
    // is a regression. Pins the whole family end to end with
    // hand-computable numbers: the span report, the excised corpus, the
    // per-source rollup, and web_pipeline's seventh count.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = "/tmp/graft_leak_fixture"
    val docs = (0L until 30L).map { id =>
      val base = (0 until 40).map(j => f"d${id}%02dt$j%02d")
      val toks =
        if (id == 27L) (0 until 16).map(j => f"d05t${10 + j}%02d") ++
          base.drop(16)
        else base
      (id, toks.mkString(" "), "en", f"src${id % 3}%d", toks.mkString(" ").length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run(name: String) = SparkEntry.queries(name)(spark, dir)

    val spans = run("decontaminate_spans").collect()
    assert(spans.length == 1, s"expected exactly one leaked span, got ${spans.length}")
    val sp = spans.head
    assert(sp.getAs[Long]("doc_id") == 27L && sp.getAs[Int]("span_start") == 0 &&
      sp.getAs[Int]("span_end") == 15 && sp.getAs[Int]("span_tokens") == 16 &&
      sp.getAs[Long]("n_grams") == 9,
      s"span mismatch: $sp")

    val stripped = run("strip_eval_spans").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_removed"), r.getAs[String]("clean_text"))).toMap
    assert(stripped(27L)._1 == 16, "doc 27 must lose exactly the leaked span")
    assert(stripped(27L)._2 == (16 until 40).map(j => f"d27t$j%02d").mkString(" "),
      "doc 27's clean text must be its own tail tokens")
    assert(stripped.filter(_._1 != 27L).values.forall(_._1 == 0),
      "no other train doc may lose tokens")

    val mass = run("leak_mass_by_source").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("docs_affected"), r.getAs[Long]("leaked_tokens"))).toMap
    assert(mass("src0") == ((1L, 16L)), s"src0 (doc 27) rollup wrong: $mass")
    assert(mass.filter(_._1 != "src0").values.forall(_ == ((0L, 0L))))

    // the funnel's seventh count: doc 27's page survives URL dedup (all 30
    // uris distinct), its ct's paragraph 0 carries the leaked run intact,
    // and the eval site's own pages contribute ZERO (train-only count)
    val wp = run("web_pipeline").head()
    assert(wp.getAs[Long]("leaked_tokens") == 16L,
      s"web_pipeline leaked_tokens = ${wp.getAs[Long]("leaked_tokens")} != 16")
  }
}

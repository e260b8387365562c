package graft.operators

/** Minimal-but-REAL PDF 1.4 engine for the document-ingestion family —
  * the third major text-corpus container after HTML and WARC. Writer and
  * strict reader for the uncompressed subset a text-extraction pipeline
  * actually exercises: header, numbered indirect objects, catalog → page
  * tree → per-page content streams with `/Length`-declared byte-exact
  * bodies, BT/Tf/Td/Tj/ET text operators, literal strings with the full
  * escape grammar (`\(`, `\)`, `\\`, 1-3-digit octal for every byte
  * outside printable ASCII — how non-ASCII UTF-8 rides a PDF literal),
  * a byte-offset xref table, and a trailer with `/Root`/`/Size` +
  * `startxref`. No compression filters (a real lake would add
  * `/FlateDecode`; the deflate machinery already exists in the PNG codec
  * — this subset keeps every byte oracle-addressable).
  *
  * Reader strictness contract (the charset/WARC/HTML discipline): every
  * structural promise the file makes is CHECKED — the xref offset of each
  * object must land exactly on its `N 0 obj` header, declared `/Length`
  * must match the actual stream body, `/Count` must match the kid list,
  * every content operator must be from the declared set with the right
  * operand shape, escapes must be well-formed, the extracted bytes must
  * be valid UTF-8 — and any violation throws `pdf reject: …` rather than
  * salvaging (the quarantine decision belongs to the caller).
  *
  * Layout is deterministic arithmetic a SQL oracle replays: tokens group
  * into [[LineTokens]]-token lines, lines into [[PageLines]]-line pages
  * (min one page), and rejoining the extracted lines with single spaces
  * reproduces the source text byte-for-byte (split/group/join with the
  * same separator is the identity), so the whole extraction is
  * hash-checkable end to end.
  */
object Pdf {

  /** Tokens per rendered text line (one Tj per line). */
  val LineTokens = 10

  /** Lines per page (one content stream per page). */
  val PageLines = 40

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"pdf reject: $msg")

  // ---------------------------------------------------------------- writer

  /** Escape one UTF-8 byte into a PDF literal-string body: `(`/`)`/`\`
    * get a backslash, printable ASCII rides verbatim, everything else
    * (including the UTF-8 continuation bytes of non-ASCII text) as a
    * 3-digit octal escape — unambiguous even when a digit follows. */
  private def escapeByte(b: Int, sb: StringBuilder): Unit = b match {
    case '(' => sb.append("\\(")
    case ')' => sb.append("\\)")
    case '\\' => sb.append("\\\\")
    case p if p >= 32 && p <= 126 => sb.append(p.toChar)
    case o => sb.append('\\').append(f"${o}%03o")
  }

  private def literal(line: String): String = {
    val sb = new StringBuilder(line.length + 8)
    sb.append('(')
    line.getBytes("UTF-8").foreach(b => escapeByte(b & 0xff, sb))
    sb.append(')')
    sb.toString
  }

  /** Deterministic line layout: [[LineTokens]]-token groups rejoined on
    * single spaces. `split("", -1)` of an empty text is one empty token ⇒
    * one empty line ⇒ one page — every document renders. */
  def layoutLines(text: String): Seq[String] =
    text.split(" ", -1).grouped(LineTokens).map(_.mkString(" ")).toSeq

  /** Render `text` as a complete PDF 1.4 document: one content stream
    * per [[PageLines]]-line page, Helvetica 12pt, 72/720 origin with
    * 14pt leading — the minimal layout a real generator emits. With
    * `flate = true` every content stream is zlib-deflated behind
    * `/Filter /FlateDecode` (how real PDFs ship; the reader inflates
    * through the same java.util.zip machinery the PNG codec trusts).
    * Object order: catalog, pages, then per page (page obj, content
    * obj), then the font; xref offsets are the REAL byte offsets of
    * each object in the emitted stream. */
  def renderPdf(text: String, flate: Boolean = false): Array[Byte] = {
    val pages = layoutLines(text).grouped(PageLines).toSeq
    val nPages = pages.length
    // object numbering: 1 catalog, 2 pages, then (3 + 2i) page / (4 + 2i)
    // content for page i, last = font
    val fontObj = 3 + 2 * nPages
    val out = new java.io.ByteArrayOutputStream(text.length * 2 + 1024)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = new Array[Int](fontObj + 1)
    def obj(n: Int)(body: => Unit): Unit = {
      offsets(n) = out.size()
      w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2) {
      val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\n")
    }
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageObj = 3 + 2 * i
      val contObj = 4 + 2 * i
      obj(pageObj)(w(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents $contObj 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>\n"))
      val body = new StringBuilder
      body.append("BT\n/F1 12 Tf\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, j) =>
        if (j > 0) body.append("0 -14 Td\n")
        body.append(literal(line)).append(" Tj\n")
      }
      body.append("ET\n")
      val plain = body.toString.getBytes("ISO-8859-1")
      val bytes = if (flate) deflate(plain) else plain
      val filter = if (flate) " /Filter /FlateDecode" else ""
      obj(contObj) {
        w(s"<< /Length ${bytes.length}$filter >>\nstream\n")
        out.write(bytes)
        // spec 7.3.8.1: an EOL before `endstream` that is NOT part of
        // the declared data — the reader checks for exactly this shape
        w("\nendstream\n")
      }
    }
    obj(fontObj)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
    val xrefOff = out.size()
    w(s"xref\n0 ${fontObj + 1}\n")
    w("0000000000 65535 f \n")
    (1 to fontObj).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${fontObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ---------------------------------------------------------------- reader

  final case class PdfDoc(nPages: Int, pageLines: Seq[Seq[String]]) {
    def lines: Seq[String] = pageLines.flatten
    /** Rejoining the extracted lines with single spaces inverts
      * [[layoutLines]] exactly. */
    def text: String = lines.mkString(" ")
  }

  /** Strict parse of the subset [[renderPdf]] emits (and any conforming
    * uncompressed single-font PDF of the same object topology). Walks the
    * trailer → xref → catalog → page tree → per-page content streams, and
    * validates every structural promise on the way. */
  def parsePdf(payload: Array[Byte]): PdfDoc =
    try parsePdfUnguarded(payload)
    catch {
      // the contract is that EVERY structural violation surfaces as a
      // 'pdf reject:' — a malformed shape the checks below didn't
      // anticipate must not escape as a raw NumberFormat/IndexOutOfBounds
      // (advice r12: three such shapes did)
      case e: IllegalArgumentException
        if e.getMessage != null && e.getMessage.startsWith("pdf reject:") =>
        throw e
      case scala.util.control.NonFatal(e) =>
        fail(s"malformed structure (${e.getClass.getSimpleName})")
    }

  /** Digit-string → Int with the overflow rejected as a structural
    * violation: a >9-digit offset/count cannot address anything inside a
    * JVM string (length is an Int), so it is malformed, not big. */
  private def pdfInt(digits: String, what: String): Int = {
    if (digits.isEmpty || digits.length > 18 || !digits.forall(_.isDigit))
      fail(s"$what '$digits' is not a number")
    val v = digits.toLong // ≤ 18 digits: cannot overflow Long
    if (v > Int.MaxValue) fail(s"$what '$digits' overflows any valid offset")
    v.toInt
  }

  private def parsePdfUnguarded(payload: Array[Byte]): PdfDoc = {
    val raw = new String(payload, "ISO-8859-1")
    if (!raw.startsWith("%PDF-1.")) fail("missing %PDF header")
    // trailer: startxref offset, /Root, /Size
    val sx = raw.lastIndexOf("startxref")
    if (sx < 0) fail("missing startxref")
    val xrefOff = raw.substring(sx + 9).trim.takeWhile(_.isDigit) match {
      case "" => fail("startxref carries no offset")
      case d => pdfInt(d, "startxref offset")
    }
    if (xrefOff >= raw.length || !raw.startsWith("xref", xrefOff))
      fail(s"startxref $xrefOff does not point at an xref table")
    val trailerIdx = raw.indexOf("trailer", xrefOff)
    if (trailerIdx < 0) fail("xref table without trailer")
    val trailerDict = dictAt(raw, raw.indexOf("<<", trailerIdx))
    val size = intEntry(trailerDict, "/Size")
    val root = refEntry(trailerDict, "/Root")
    // xref: one subsection starting at 0, `size` entries of 20 bytes
    val hdr = raw.indexOf('\n', xrefOff) + 1
    val subEnd = raw.indexOf('\n', hdr)
    if (hdr <= 0 || subEnd < 0) fail("xref table truncated before its subsection")
    val sub = raw.substring(hdr, subEnd).trim.split(" ")
    if (sub.length != 2 || sub(0) != "0" ||
        pdfInt(sub(1), "xref subsection count") != size)
      fail(s"xref subsection '${sub.mkString(" ")}' != '0 $size'")
    val entries0 = subEnd + 1
    if (entries0 + 20L * size > raw.length)
      fail(s"xref table truncated: $size entries need ${20L * size} bytes, " +
        s"${raw.length - entries0} remain")
    val offsets = (0 until size).map { i =>
      val e = raw.substring(entries0 + 20 * i, entries0 + 20 * i + 20)
      if (e(17) != 'n' && e(17) != 'f')
        fail(s"malformed xref entry $i: '$e'")
      (pdfInt(e.substring(0, 10), s"xref entry $i offset"), e(17))
    }
    if (offsets.head._2 != 'f') fail("xref object 0 must be free")
    // every in-use offset must land exactly on its object header
    def objAt(n: Int): Int = {
      if (n <= 0 || n >= size) fail(s"reference to object $n outside xref")
      val (off, kind) = offsets(n)
      if (kind != 'n') fail(s"reference to free object $n")
      if (!raw.startsWith(s"$n 0 obj", off))
        fail(s"xref offset $off of object $n does not address '$n 0 obj'")
      off
    }
    val catalog = dictAt(raw, raw.indexOf("<<", objAt(root)))
    if (!catalog.contains("/Type /Catalog")) fail("root is not a /Catalog")
    val pagesDict = dictAt(raw, raw.indexOf("<<", objAt(refEntry(catalog, "/Pages"))))
    if (!pagesDict.contains("/Type /Pages")) fail("/Pages is not a page tree")
    val kids = kidRefs(pagesDict)
    val count = intEntry(pagesDict, "/Count")
    if (kids.length != count)
      fail(s"/Count $count != ${kids.length} kids")
    if (kids.isEmpty) fail("page tree with no pages")
    val pageLines = kids.map { k =>
      val pd = dictAt(raw, raw.indexOf("<<", objAt(k)))
      if (!pd.contains("/Type /Page")) fail(s"kid $k is not a /Page")
      val contents = refEntry(pd, "/Contents")
      val cOff = objAt(contents)
      val cDict = dictAt(raw, raw.indexOf("<<", cOff))
      val len = intEntry(cDict, "/Length")
      val sTag = raw.indexOf("stream", cOff)
      if (sTag < 0) fail(s"content object $contents has no stream")
      val body0 = raw.indexOf('\n', sTag) + 1
      if (body0 + len > raw.length) fail("stream body exceeds the file")
      val body = payload.slice(body0, body0 + len)
      if (!raw.startsWith("\nendstream", body0 + len))
        fail(s"declared /Length $len does not reach endstream")
      val data =
        if (cDict.contains("/Filter")) {
          if (!cDict.contains("/Filter /FlateDecode"))
            fail("unsupported stream filter (only /FlateDecode)")
          inflate(body)
        } else body
      contentLines(data)
    }
    PdfDoc(kids.length, pageLines)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    // BEST_SPEED: every consumer reads the INFLATED stream (parsePdf
    // checks /Length against the actual bytes it wrote, so the container
    // stays self-consistent at any level); level 1 cuts the per-row
    // encode CPU of the flate-routed half of pdf_extract ~3×
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Strict zlib inflate: a malformed or truncated stream fails loudly
    * (a salvaged prefix would silently drop text). */
  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](4096)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) fail("truncated FlateDecode stream")
        out.write(buf, 0, n)
      }
    } catch {
      case _: java.util.zip.DataFormatException =>
        fail("malformed FlateDecode stream")
    } finally inf.end()
    out.toByteArray
  }

  /** Balanced `<< … >>` dictionary text starting at `start`. */
  private def dictAt(raw: String, start: Int): String = {
    if (start < 0 || !raw.startsWith("<<", start)) fail("expected a dictionary")
    var depth = 0
    var i = start
    while (i < raw.length - 1) {
      if (raw.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (raw.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return raw.substring(start, i)
      }
      else i += 1
    }
    fail("unterminated dictionary")
  }

  private val IntEntry = """(-?\d+)""".r
  private def intEntry(dict: String, key: String): Int = {
    val i = dict.indexOf(key + " ")
    if (i < 0) fail(s"dictionary missing $key")
    IntEntry.findPrefixOf(dict.substring(i + key.length + 1).trim)
      .getOrElse(fail(s"$key is not an integer")).toInt
  }

  private def refEntry(dict: String, key: String): Int = {
    val i = dict.indexOf(key + " ")
    if (i < 0) fail(s"dictionary missing $key")
    val rest = dict.substring(i + key.length + 1).trim
    """^(\d+) 0 R""".r.findFirstMatchIn(rest)
      .getOrElse(fail(s"$key is not an indirect reference")).group(1).toInt
  }

  private def kidRefs(pagesDict: String): Seq[Int] = {
    val a = pagesDict.indexOf("/Kids")
    if (a < 0) fail("page tree missing /Kids")
    val open = pagesDict.indexOf('[', a)
    val close = pagesDict.indexOf(']', open)
    if (open < 0 || close < 0) fail("/Kids is not an array")
    val body = pagesDict.substring(open + 1, close).trim
    if (body.isEmpty) return Seq.empty
    body.split("\\s+").grouped(3).map {
      case Array(n, "0", "R") => n.toInt
      case other => fail(s"malformed kid reference '${other.mkString(" ")}'")
    }.toSeq
  }

  /** Tokenize one content stream: BT / ET bracket, `/F1 12 Tf`,
    * `x y Td`, `(…) Tj` — the operator set [[renderPdf]] emits. Returns
    * the Tj strings (decoded through the escape grammar + strict UTF-8)
    * in order. */
  private def contentLines(body: Array[Byte]): Seq[String] = {
    val s = new String(body, "ISO-8859-1")
    var i = 0
    var inText = false
    var sawBT = false
    val out = Seq.newBuilder[String]
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def token(): String = {
      skipWs()
      val st = i
      while (i < s.length && !s(i).isWhitespace && s(i) != '(') i += 1
      if (i == st) fail("empty content token")
      s.substring(st, i)
    }
    while ({ skipWs(); i < s.length }) {
      if (s(i) == '(') {
        // literal string, then its operator
        val bytes = new java.io.ByteArrayOutputStream()
        i += 1
        var closed = false
        while (!closed) {
          if (i >= s.length) fail("unterminated string literal")
          s(i) match {
            case ')' => closed = true; i += 1
            case '(' => fail("unescaped '(' inside string literal")
            case '\\' =>
              if (i + 1 >= s.length) fail("dangling escape")
              s(i + 1) match {
                case '(' => bytes.write('('); i += 2
                case ')' => bytes.write(')'); i += 2
                case '\\' => bytes.write('\\'); i += 2
                case d if d >= '0' && d <= '7' =>
                  var j = i + 1
                  var v = 0
                  while (j < s.length && j < i + 4 && s(j) >= '0' && s(j) <= '7') {
                    v = v * 8 + (s(j) - '0'); j += 1
                  }
                  if (v > 255) fail(s"octal escape $v out of byte range")
                  bytes.write(v); i = j
                case other => fail(s"unsupported escape '\\$other'")
              }
            case c => bytes.write(c.toInt & 0xff); i += 1
          }
        }
        val op = token()
        if (op != "Tj") fail(s"string literal followed by '$op', not Tj")
        if (!inText) fail("Tj outside BT/ET")
        val utf = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        val decoded =
          try utf.decode(java.nio.ByteBuffer.wrap(bytes.toByteArray)).toString
          catch { case _: java.nio.charset.CharacterCodingException =>
            fail("Tj string is not valid UTF-8") }
        out += decoded
      } else token() match {
        case "BT" =>
          if (inText) fail("nested BT")
          inText = true; sawBT = true
        case "ET" =>
          if (!inText) fail("ET without BT")
          inText = false
        case "Tf" => fail("Tf without operands")
        case "Td" => fail("Td without operands")
        case t if t.startsWith("/") =>
          val sz = token()
          if (!sz.forall(_.isDigit)) fail(s"font size '$sz' is not numeric")
          val op = token()
          if (op != "Tf") fail(s"font name followed by '$op', not Tf")
          if (!inText) fail("Tf outside BT/ET")
        case t if t.matches("-?\\d+") =>
          val y = token()
          if (!y.matches("-?\\d+")) fail(s"Td operand '$y' is not numeric")
          val op = token()
          if (op != "Td") fail(s"number pair followed by '$op', not Td")
          if (!inText) fail("Td outside BT/ET")
        case other => fail(s"unknown content operator '$other'")
      }
    }
    if (inText) fail("unterminated BT block")
    if (!sawBT) fail("content stream has no text block")
    out.result()
  }
}

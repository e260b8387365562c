package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 URL canonicalization kernel (static, codegen-callable).
  *
  * The dedup brief behind this: production URL-keyed dedup canonicalizes
  * before hashing, otherwise trivially-different spellings of the same
  * resource survive as distinct keys. The normalization applied here is the
  * RFC 3986 §6.2.2 syntax-based set plus the two scheme-based rules every
  * crawler applies (§6.2.3 default ports, empty path → "/"), plus two
  * deliberate dedup-oriented extensions documented per method below
  * (credential stripping, tracking-param drop + query-param sort).
  *
  * Cross-engine exactness rules (the DuckDB oracles replay pieces of this):
  *  - case folding is ASCII-only (`translate`-equivalent), never locale
  *    `toLowerCase` — RFC 3986 case-insensitivity is ASCII-scoped, and
  *    unicode lowercasing differs between engines (Turkish dotless-ı class);
  *  - percent-normalization uses the split-on-'%' rule (see [[pctNormalize]])
  *    so an oracle can replay it with `string_split(u, '%')` + one
  *    `list_transform`, no stateful scan;
  *  - query-param sort compares CODEPOINTS (== UTF-8 byte order), not Java
  *    UTF-16 char order, which diverges above the BMP.
  */
object UrlKernels {

  private final val HexU = "0123456789ABCDEF"

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  /** RFC 3986 §2.3 unreserved set — the only octets safe to percent-DECODE
    * without changing which component delimiters the URL parses into. */
  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** ASCII-only lowercase ('A'-'Z' → 'a'-'z', everything else untouched). */
  def asciiLower(s: String): String = {
    var i = 0
    var dirty = false
    while (i < s.length && !dirty) { val c = s.charAt(i); dirty = c >= 'A' && c <= 'Z'; i += 1 }
    if (!dirty) return s
    val a = s.toCharArray
    i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** ASCII-only uppercase (the messy-URL fixture generator's case variant). */
  def asciiUpper(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'a' && c <= 'z') a(i) = (c - 32).toChar
      i += 1
    }
    new String(a)
  }

  /** Percent-encoding normalization (§6.2.2.1-2): decode escapes of
    * unreserved octets, uppercase the hex of every escape that must stay.
    *
    * Split-on-'%' semantics (equivalent to the left-to-right scan because
    * hex digits are never '%'): the piece after each '%' is examined — two
    * leading hex digits form an escape (decode if unreserved, else keep as
    * `%XX` uppercased); anything else keeps the '%' literally. Decoding
    * only unreserved octets can never materialize a component delimiter,
    * so this pass is safe to run on the WHOLE url before parsing. */
  def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val parts = s.split("%", -1)
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(parts(0))
    var i = 1
    while (i < parts.length) {
      val p = parts(i)
      val h = if (p.length >= 2) hexVal(p.charAt(0)) else -1
      val l = if (p.length >= 2) hexVal(p.charAt(1)) else -1
      if (h >= 0 && l >= 0) {
        val v = h * 16 + l
        if (isUnreserved(v)) sb.append(v.toChar)
        else { sb.append('%'); sb.append(HexU.charAt(h)); sb.append(HexU.charAt(l)) }
        sb.append(p, 2, p.length)
      } else {
        sb.append('%'); sb.append(p)
      }
      i += 1
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, verbatim. */
  def removeDotSegments(path: String): String = {
    if (path.indexOf('.') < 0) return path
    var in = path
    val out = new java.lang.StringBuilder(path.length)
    def pop(): Unit = {
      val idx = out.lastIndexOf("/")
      out.setLength(if (idx >= 0) idx else 0)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { pop(); in = "/" + in.substring(4) }
      else if (in == "/..") { pop(); in = "/" }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val next = in.indexOf('/', start)
        if (next >= 0) { out.append(in, 0, next); in = in.substring(next) }
        else { out.append(in); in = "" }
      }
    }
    out.toString
  }

  /** Codepoint-order comparison — identical to UTF-8 byte order, which both
    * Spark's UTF8String ordering and DuckDB's default VARCHAR collation use.
    * Java's String.compareTo orders by UTF-16 units and disagrees above the
    * BMP (surrogates sort below U+E000), so it is NOT safe here. */
  def cpCompare(a: String, b: String): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(a.length, b.length)
  }

  /** Full canonicalization. Stages, in order:
    *  1. strip the fragment (never part of the resource key);
    *  2. [[pctNormalize]] the remainder (safe pre-parse, see there);
    *  3. no "://" → opaque identifier: return as-is after 1-2;
    *  4. ASCII-lowercase scheme and host; strip userinfo (credentials in a
    *     dedup key would split identical resources fetched with/without
    *     auth — deliberate extension, not RFC normalization); strip the
    *     scheme default port (http:80 / https:443) and a bare trailing ':';
    *  5. remove_dot_segments on the path; empty path → "/";
    *  6. query: split on '&', drop empty params and `utm_*` tracking params
    *     (extension), sort remaining params in codepoint order, rejoin;
    *     an emptied query drops its '?'.
    */
  def canonicalize(u: String): String = {
    if (u == null) return null
    val hash = u.indexOf('#')
    val s = pctNormalize(if (hash >= 0) u.substring(0, hash) else u)
    val ss = s.indexOf("://")
    if (ss < 0) return s
    val scheme = asciiLower(s.substring(0, ss))
    val rest = s.substring(ss + 3)
    var pathStart = 0
    while (pathStart < rest.length &&
      rest.charAt(pathStart) != '/' && rest.charAt(pathStart) != '?') pathStart += 1
    var auth = rest.substring(0, pathStart)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    auth = asciiLower(auth)
    val ci = auth.lastIndexOf(':')
    // bracketed IPv6 literals put ':' inside '[..]' — only a colon AFTER the
    // closing bracket (or with no brackets at all) delimits a port
    if (ci >= 0 && ci > auth.lastIndexOf(']')) {
      val port = auth.substring(ci + 1)
      if (port.isEmpty ||
        (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
        auth = auth.substring(0, ci)
    }
    val after = rest.substring(pathStart)
    val qi = after.indexOf('?')
    val rawPath = if (qi >= 0) after.substring(0, qi) else after
    val rawQuery = if (qi >= 0) after.substring(qi + 1) else ""
    val path0 = removeDotSegments(rawPath)
    val path = if (path0.isEmpty) "/" else path0
    val params = rawQuery.split("&", -1)
      .filter(p => p.nonEmpty && !p.startsWith("utm_"))
      .sortWith(cpCompare(_, _) < 0)
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(auth).append(path)
    if (params.nonEmpty) sb.append('?').append(params.mkString("&"))
    sb.toString
  }

  /** UTF8String face for codegen callers ([[UrlExpressions.UrlCanonicalize]]). */
  def canonicalizeUtf8(u: UTF8String): UTF8String =
    if (u == null) null else UTF8String.fromString(canonicalize(u.toString))
}

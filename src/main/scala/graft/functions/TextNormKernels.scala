package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Post-extraction text-normalization kernels: Unicode NFC and closed-rule
  * mojibake (double-encoding) repair — the stage a production pipeline runs
  * between charset validation ([[graft.operators.WebIngest.sniffCharset]])
  * and the quality gates ([[graft.operators.TextAnalysis]]). Static JVM
  * methods on UTF8String so the expressions in [[TextNormExpressions]] stay
  * inside WholeStageCodegen (the [[UrlKernels]] discipline).
  *
  * Cross-engine exactness notes:
  *  - NFC is delegated to java.text.Normalizer (the JDK's ICU-derived
  *    implementation of UAX #15); the DuckDB oracle runs utf8proc's
  *    `nfc_normalize()` on the same input, so the two independent Unicode
  *    implementations cross-check each other per row. NFC, not NFKC — the
  *    compatibility foldings (ﬁ → fi, ² → 2) are lossy and belong to a
  *    tokenizer's own policy, not the corpus normalizer.
  *  - Mojibake repair implements exactly ONE closed rule — the dominant
  *    real-world corruption, UTF-8 bytes decoded as Latin-1 ("cafÃ©").
  *    A string is repaired iff (a) every char is ≤ U+00FF (it could have
  *    come from a Latin-1 decode at all), (b) re-encoding those chars as
  *    bytes yields STRICTLY valid UTF-8 (the [[graft.operators.WebIngest
  *    .utf8Codepoints]] rules: no overlongs, no surrogates, nothing past
  *    U+10FFFF), and (c) the decode actually changes the string (pure
  *    ASCII round-trips identically — never "repaired"). Anything else is
  *    returned untouched. One application inverts exactly ONE encoding
  *    level (TextNormalizeSpec pins "one decode level per pass":
  *    repair(garble(garble(s))) == garble(s), so a doubly-garbled string
  *    needs a second pass) and repair must never guess.
  */
object TextNormKernels {

  private val Nfc = java.text.Normalizer.Form.NFC

  /** Unicode NFC over the UTF8String (allocation-free when already NFC —
    * Normalizer.isNormalized is a cheap scan that short-circuits the
    * common case, and we return the input buffer untouched). */
  def nfcUtf8(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, Nfc)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, Nfc))
  }

  def nfc(s: String): String = java.text.Normalizer.normalize(s, Nfc)

  /** Latin-1 GARBLE (the fixture side, not the repair side): reinterpret
    * the string's UTF-8 bytes as ISO-8859-1 chars — what a reader that
    * trusted a wrong charset header actually produces. Total: any valid
    * string garbles. */
  def garbleUtf8(u: UTF8String): UTF8String = {
    val bytes = u.getBytes
    UTF8String.fromString(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  def garble(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Closed-rule double-encoding repair; returns the input object itself
    * when no repair applies (the hot path — clean corpora allocate
    * nothing). Strictness of step (b) is load-bearing: a lenient decoder
    * would "repair" genuine Latin-1 prose into replacement-char soup. */
  def repairUtf8(u: UTF8String): UTF8String = {
    val s = u.toString
    val r = repair(s)
    if (r eq s) u else UTF8String.fromString(r)
  }

  def repair(s: String): String = {
    val n = s.length
    var i = 0
    var nonAscii = false
    while (i < n) {
      val c = s.charAt(i)
      if (c > 0xFF) return s // can't be a Latin-1 decode: not mojibake
      if (c > 0x7F) nonAscii = true
      i += 1
    }
    if (!nonAscii) return s // pure ASCII round-trips identically
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) { bytes(i) = s.charAt(i).toByte; i += 1 }
    if (!strictUtf8(bytes)) s
    else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Strict RFC 3629 validation — the same rejection classes
    * [[graft.operators.WebIngest.utf8Codepoints]] enforces, as a boolean
    * (this is a detector, so invalid input means "not mojibake", not an
    * error). */
  private def strictUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    def cont(j: Int): Int =
      if (j >= n) -1
      else { val c = b(j) & 0xff; if (c < 0x80 || c > 0xBF) -1 else c }
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // bare continuation / overlong lead
      else if (c < 0xE0) { if (cont(i + 1) < 0) return false; i += 2 }
      else if (c < 0xF0) {
        val c1 = cont(i + 1)
        if (c1 < 0) return false
        if (c == 0xE0 && c1 < 0xA0) return false // overlong
        if (c == 0xED && c1 >= 0xA0) return false // encoded surrogate
        if (cont(i + 2) < 0) return false
        i += 3
      } else if (c < 0xF5) {
        val c1 = cont(i + 1)
        if (c1 < 0) return false
        if (c == 0xF0 && c1 < 0x90) return false // overlong
        if (c == 0xF4 && c1 >= 0x90) return false // past U+10FFFF
        if (cont(i + 2) < 0 || cont(i + 3) < 0) return false
        i += 4
      } else return false // F5+ lead: past U+10FFFF
    }
    true
  }
}

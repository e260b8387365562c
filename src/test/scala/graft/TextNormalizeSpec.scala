package graft

import graft.functions.TextNormKernels
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit surface for the round-10 normalization kernels: NFC behavior
  * (composition, NFKC non-folding, stability) and the closed-rule
  * mojibake repair (round-trip inversion, every refusal class). The
  * oracle-checked queries (text_normalize / mojibake_repair /
  * mojibake_rate) pin the happy path cross-engine against DuckDB's
  * utf8proc; these pin the general-purpose kernel contract. */
class TextNormalizeSpec extends AnyFunSuite {

  import TextNormKernels.{nfc, garble, repair, nfcUtf8, repairUtf8}

  // ------------------------------------------------------------------- NFC

  test("nfc: combining sequences compose, composed input is stable") {
    assert(nfc("Café") == "Café")
    assert(nfc("mañana") == "mañana")
    assert(nfc("Café") == "Café")
    assert(nfc(nfc("ä́x")) == nfc("ä́x")) // idempotent
    assert(nfc("") == "")
  }

  test("nfc: compatibility characters do NOT fold (NFC, not NFKC)") {
    assert(nfc("ﬁne") == "ﬁne")   // fi ligature survives
    assert(nfc("²") == "²")       // superscript two survives
    assert(nfc("Ａ") == "Ａ")       // fullwidth A survives
  }

  test("nfc: astral codepoints pass through; already-NFC input returns the same buffer") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(nfc(s"a${emoji}b") == s"a${emoji}b")
    val u = UTF8String.fromString("plain ascii")
    assert(nfcUtf8(u) eq u) // allocation-free fast path
  }

  // --------------------------------------------------------------- mojibake

  test("mojibake: repair inverts the garble for BMP and astral text") {
    for (s <- Seq("café résumé", "naïve — dash",
      "snow ☃", "emoji " + new String(Character.toChars(0x1F600)),
      "mixed ascii café tail")) {
      val g = garble(s)
      assert(g != s, s"garble must change non-ASCII input: $s")
      assert(repair(g) == s, s"repair(garble) != id for: $s")
    }
  }

  test("mojibake: pure ASCII garbles to itself and never repairs") {
    val s = "plain ascii text 123"
    assert(garble(s) == s)
    assert(repair(s) eq s)
    val u = UTF8String.fromString(s)
    assert(repairUtf8(u) eq u) // allocation-free fast path
  }

  test("mojibake: refusal battery — anything not a strict one-level garble is untouched") {
    val keep = Seq(
      "char above U+00FF" -> "\u65e5\u672c text",   // could not be a Latin-1 decode
      "lone Latin-1 letter" -> "caf\u00e9",          // 0xE9 lead without continuations
      "truncated sequence" -> "x\u00c3",             // lead at end of string
      "bare continuation" -> "x\u00a9y",             // 0xA9 without a lead
      "overlong 2-byte" -> "\u00c0\u00af",          // C0 AF: overlong '/'
      "overlong 3-byte" -> "\u00e0\u0080\u0080",   // E0 80 80
      "encoded surrogate" -> "\u00ed\u00a0\u0080", // ED A0 80: U+D800
      "past U+10FFFF lead" -> "\u00f5\u0080\u0080\u0080",
      "F4 past U+10FFFF" -> "\u00f4\u0090\u0080\u0080")
    keep.foreach { case (what, s) =>
      assert(repair(s) == s, s"$what must not repair: $s")
    }
  }

  test("mojibake: repair inverts exactly one decode level per pass") {
    val s = "café"
    val g2 = garble(garble(s))
    assert(repair(g2) == garble(s)) // one level back
    assert(repair(repair(g2)) == s) // second pass finishes the inversion
  }
}

package graft

import graft.operators.ChatData
import graft.operators.ChatData._
import org.scalatest.funsuite.AnyFunSuite

/** Unit surface for the chat-data stage: the strict JSON subset codec's
  * rejection contract and the transcript validator's lint rules. The
  * oracle-checked queries (chat_stats / chat_lint) pin the happy path
  * cross-engine; these pin the general-purpose parser behavior. */
class ChatDataSpec extends AnyFunSuite {

  // ------------------------------------------------------------------ JSON

  test("json: values round-trip through escape + strict parse") {
    val hostile = "quote\" slash\\ tab\there nl\nthere ctrl\u0001done " +
      new String(Character.toChars(0x1F600))
    assert(parseJson("\"" + escapeJson(hostile) + "\"") == JStr(hostile))
    assert(parseJson("""{"a":[1,-2,0],"b":true,"c":null,"d":{}}""") ==
      JObj(Vector(
        "a" -> JArr(Vector(JNum(1), JNum(-2), JNum(0))),
        "b" -> JBool(true), "c" -> JNull, "d" -> JObj(Vector.empty))))
    assert(parseJson(" [ ] ") == JArr(Vector.empty))
  }

  test("json: rejection battery — every malformed class fails loudly") {
    val bad = Seq(
      "trailing content" -> """{"a":1} extra""",
      "unterminated string" -> "\"never closed",
      "unterminated object" -> """{"a":1""",
      "unterminated array" -> "[1,2",
      "raw control char" -> "\"bad\u0001char\"",
      "bad escape" -> "\"\\x\"",
      "truncated \\u escape" -> "\"\\u12\"",
      "bad \\u hex" -> "\"\\uzzzz\"",
      "duplicate key" -> """{"a":1,"a":2}""",
      "missing colon" -> """{"a" 1}""",
      "bare minus" -> "[-]",
      "leading zero" -> "[01]",
      "bad literal" -> "[tru]",
      "empty input" -> "",
      "unquoted key" -> "{a:1}",
      // round 11: Integer.parseInt(hex, 16) accepted signed forms and the
      // old branch appended any 4-hex value — lone surrogates included
      "signed \\u escape" -> "\"\\u+12A0\"",
      "negative \\u escape" -> "\"\\u-001x\"",
      "bare high surrogate escape" -> "\"\\uD800\"",
      "bare low surrogate escape" -> "\"\\uDC00 tail\"",
      "high surrogate before non-escape" -> "\"\\uD83Dx\"",
      "high surrogate paired with non-low" -> "\"\\uD83D\\u0041\"",
      "integer literal out of long range" -> "[99999999999999999999]")
    bad.foreach { case (what, s) =>
      val e = intercept[IllegalArgumentException](parseJson(s))
      assert(e.getMessage.startsWith("json reject:"), s"$what: ${e.getMessage}")
    }
  }

  test("json: a valid escaped surrogate PAIR decodes to the astral codepoint") {
    assert(parseJson("\"\\uD83D\\uDE00\"") ==
      JStr(new String(Character.toChars(0x1F600))))
  }

  // ------------------------------------------------------------ DPO pairs

  test("dpo: render round-trips; chunk slices, fallback, plants all line up") {
    val text = (1 to 65).map(i => s"w$i").mkString(" ") // 3 chunks: 30/30/5
    val ck = validatePair(renderPair(1L, text))
    assert(ck == PairCheck("b", 30, 30, 5,
      degenerate = false, emptyResponse = false))
    // every seventh doc: planted degenerate (rejected == chosen)
    val ck7 = validatePair(renderPair(7L, text))
    assert(ck7.degenerate && ck7.rejectedTokens == 30)
    // a 2-chunk doc falls back to the token-REVERSED chosen
    val short = (1 to 40).map(i => s"w$i").mkString(" ")
    val json = renderPair(2L, short)
    assert(json.contains("\"rejected\":\"w40 w39"), json)
    val ck2 = validatePair(json)
    assert(ck2.position == "a" && !ck2.degenerate && ck2.rejectedTokens == 10)
    // a single-chunk doc has empty responses (and reversal degenerates)
    val ck1 = validatePair(renderPair(1L, "just five tokens in here"))
    assert(ck1.emptyResponse && ck1.degenerate)
  }

  test("dpo: rejection battery — every malformed pair class fails loudly") {
    val good = """{"prompt":"p","chosen":"c","rejected":"r","chosen_position":"a"}"""
    assert(validatePair(good) == PairCheck("a", 1, 1, 1,
      degenerate = false, emptyResponse = false))
    val bad = Seq(
      "non-object root" -> """["p"]""",
      "missing field" -> """{"prompt":"p","chosen":"c","rejected":"r"}""",
      "extra field" -> (good.dropRight(1) + ""","note":"x"}"""),
      "wrong field order" ->
        """{"chosen":"c","prompt":"p","rejected":"r","chosen_position":"a"}""",
      "non-string value" ->
        """{"prompt":1,"chosen":"c","rejected":"r","chosen_position":"a"}""",
      "bad position" ->
        """{"prompt":"p","chosen":"c","rejected":"r","chosen_position":"c"}""")
    bad.foreach { case (what, s) =>
      val e = intercept[IllegalArgumentException](validatePair(s))
      assert(e.getMessage.startsWith("dpo reject:"), s"$what: ${e.getMessage}")
    }
    // malformed JSON stays the CODEC's rejection, not the validator's
    val e = intercept[IllegalArgumentException](validatePair("{"))
    assert(e.getMessage.startsWith("json reject:"))
  }

  // ----------------------------------------------------------------- chats

  test("chat: render round-trips; turn/token accounting matches the chunk math") {
    val text = (1 to 65).map(i => s"w$i").mkString(" ") // 65 tokens -> 3 chunks
    val ck = validateChat(renderChat(1L, text))
    assert(ck == ChatCheck(nTurns = 3, hasSystem = false,
      userTokens = 30 + 5, assistantTokens = 30,
      roleViolation = false, emptyTurn = false))
    // every fifth doc gets a system turn (not counted in either token sum)
    val ck5 = validateChat(renderChat(5L, text))
    assert(ck5.nTurns == 4 && ck5.hasSystem)
    assert(ck5.userTokens == 35 && ck5.assistantTokens == 30)
  }

  test("chat: the planted violation and natural empty turns are detected") {
    val ck7 = validateChat(renderChat(7L, "one two three"))
    assert(ck7.roleViolation, "every seventh doc's first turn claims assistant")
    assert(validateChat(renderChat(14L, "a b")).roleViolation)
    assert(validateChat(renderChat(1L, "")).emptyTurn) // '' -> one empty turn
    assert(!validateChat(renderChat(1L, "a b ")).emptyTurn) // trailing space: 1 chunk, nonempty
  }

  test("chat: lint rules fire on hand-built bad transcripts") {
    def chat(turns: (String, String)*): String =
      "{\"messages\":[" + turns.map { case (r, c) =>
        s"""{"role":"$r","content":"$c"}""" }.mkString(",") + "]}"
    assert(validateChat(chat("user" -> "hi", "assistant" -> "yo")) ==
      ChatCheck(2, hasSystem = false, 1, 1, roleViolation = false, emptyTurn = false))
    assert(validateChat(chat("user" -> "a", "user" -> "b")).roleViolation)
    assert(validateChat(chat("assistant" -> "a")).roleViolation)
    assert(validateChat(chat("user" -> "a", "system" -> "late")).roleViolation)
    assert(validateChat(chat("tool" -> "x")).roleViolation)
    assert(validateChat(chat("user" -> "")).emptyTurn)
    // shape violations REJECT (malformed container, not lintable data)
    for (bad <- Seq("{\"messages\":[]}", "{\"other\":[]}",
      "{\"messages\":[{\"role\":\"user\"}]}",
      "{\"messages\":[{\"content\":\"x\",\"role\":\"user\"}]}")) {
      val e = intercept[IllegalArgumentException](validateChat(bad))
      assert(e.getMessage.contains("reject"), s"$bad: ${e.getMessage}")
    }
  }
}

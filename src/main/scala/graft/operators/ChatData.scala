package graft.operators

import graft.{GraftQuery, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SFT / chat training-data validation: the stage a post-training pipeline
  * runs over conversation transcripts before they reach a loss mask —
  * strict JSON parsing, role-alternation lint, and assistant-token
  * accounting (the fraction of tokens that actually train).
  *
  * Fixture discipline (the WebIngest pattern): the corpus carries no chat
  * JSON, so each query RENDERS a deterministic transcript from the
  * document row — [[WebIngest.paraChunks]]' 30-token chunks as alternating
  * user/assistant turns, a system turn on every fifth doc, and a PLANTED
  * role violation on every seventh (the first turn claims "assistant") —
  * then decodes it back as untrusted foreign input through a strict JSON
  * subset parser and the real validator. The DuckDB oracle replays turn
  * math and plant formulas from the row, so a parser that mangles an
  * escape, a validator that misses a violation, or a token accountant
  * that drops a turn hash-mismatches.
  *
  * Scale notes: both queries are one corpus scan + per-row mapPartitions
  * (render → parse → validate never leaves the task); the lint rolls up
  * on the bounded source key. No shuffle ever carries text.
  */
object ChatData {

  // -------------------------------------------------------------- JSON

  /** JSON string escape (RFC 8259 §7): the two mandatory escapes plus
    * short forms for the common controls, \ u00XX for the rest. */
  def escapeJson(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\t' => sb.append("\\t")
        case '\r' => sb.append("\\r")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  sealed trait Json
  final case class JStr(v: String) extends Json
  final case class JNum(v: Long) extends Json
  final case class JBool(v: Boolean) extends Json
  case object JNull extends Json
  final case class JArr(v: Vector[Json]) extends Json
  final case class JObj(v: Vector[(String, Json)]) extends Json

  /** Strict JSON subset parser, codec-style: RFC 8259 grammar minus
    * floats (integers only — transcripts carry no numbers today, the
    * production is kept for generality). Rejected loudly (battery in
    * OperatorSpec): trailing content, unterminated strings/containers,
    * raw control chars inside strings, bad or truncated escapes
    * (4-hex-digit \u only — signed forms rejected), unpaired
    * surrogate-escape halves (a high half must be immediately followed by
    * an escaped low half), duplicate object keys, missing colons and
    * commas, leading zeros, integer literals outside long range. */
  def parseJson(s: String): Json = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"json reject: $msg")
    var i = 0
    val n = s.length
    def ws(): Unit = while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\n' ||
      s.charAt(i) == '\t' || s.charAt(i) == '\r')) i += 1
    def expect(c: Char): Unit = {
      if (i >= n || s.charAt(i) != c) fail(s"expected '$c' at offset $i")
      i += 1
    }
    def string(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (i < n && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c < 0x20) fail(s"raw control char in string at offset $i")
        if (c == '\\') {
          if (i + 1 >= n) fail("truncated escape")
          s.charAt(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' =>
              // exactly 4 hex digits, validated char-by-char —
              // Integer.parseInt(hex, 16) would also accept signed forms
              // like "+12F" (and "-001" wrapping to U+FFFF)
              def hex4(at: Int): Int = {
                if (at + 4 > n) fail("truncated \\u escape")
                var v = 0
                var j = at
                while (j < at + 4) {
                  val h = s.charAt(j)
                  val d =
                    if (h >= '0' && h <= '9') h - '0'
                    else if (h >= 'a' && h <= 'f') h - 'a' + 10
                    else if (h >= 'A' && h <= 'F') h - 'A' + 10
                    else fail(s"bad \\u escape '${s.substring(at, at + 4)}'")
                  v = (v << 4) | d
                  j += 1
                }
                v
              }
              val cp = hex4(i + 2)
              if (cp >= 0xDC00 && cp <= 0xDFFF)
                fail(s"unpaired low surrogate \\u escape at offset $i")
              if (cp >= 0xD800 && cp <= 0xDBFF) {
                // a high half is only valid immediately followed by an
                // escaped low half — anything else is a lone surrogate
                if (i + 12 > n || s.charAt(i + 6) != '\\' || s.charAt(i + 7) != 'u')
                  fail(s"unpaired high surrogate \\u escape at offset $i")
                val lo = hex4(i + 8)
                if (lo < 0xDC00 || lo > 0xDFFF)
                  fail(s"invalid surrogate pair \\u escape at offset $i")
                sb.append(cp.toChar).append(lo.toChar)
                i += 12
              } else { sb.append(cp.toChar); i += 6 }
            case e => fail(s"bad escape '\\$e'")
          }
        } else { sb.append(c); i += 1 }
      }
      if (i >= n) fail("unterminated string")
      i += 1
      sb.toString
    }
    def value(): Json = {
      ws()
      if (i >= n) fail("empty value")
      s.charAt(i) match {
        case '"' => JStr(string())
        case '{' =>
          i += 1; ws()
          val kv = Vector.newBuilder[(String, Json)]
          val seen = scala.collection.mutable.Set.empty[String]
          if (i < n && s.charAt(i) == '}') { i += 1; return JObj(Vector.empty) }
          var more = true
          while (more) {
            ws()
            val k = string()
            if (!seen.add(k)) fail(s"duplicate key '$k'")
            ws(); expect(':')
            kv += k -> value()
            ws()
            if (i < n && s.charAt(i) == ',') i += 1
            else { expect('}'); more = false }
          }
          JObj(kv.result())
        case '[' =>
          i += 1; ws()
          val vs = Vector.newBuilder[Json]
          if (i < n && s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
          var more = true
          while (more) {
            vs += value()
            ws()
            if (i < n && s.charAt(i) == ',') i += 1
            else { expect(']'); more = false }
          }
          JArr(vs.result())
        case 't' =>
          if (!s.startsWith("true", i)) fail(s"bad literal at offset $i")
          i += 4; JBool(true)
        case 'f' =>
          if (!s.startsWith("false", i)) fail(s"bad literal at offset $i")
          i += 5; JBool(false)
        case 'n' =>
          if (!s.startsWith("null", i)) fail(s"bad literal at offset $i")
          i += 4; JNull
        case c if c == '-' || (c >= '0' && c <= '9') =>
          val ns = i
          if (c == '-') i += 1
          val ds = i
          while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
          if (i == ds) fail(s"bare '-' at offset $ns")
          if (s.charAt(ds) == '0' && i - ds > 1) fail(s"leading zero at offset $ns")
          val lit = s.substring(ns, i)
          JNum(try lit.toLong catch { case _: NumberFormatException =>
            fail(s"integer literal '$lit' out of long range") })
        case c => fail(s"unexpected '$c' at offset $i")
      }
    }
    val root = value()
    ws()
    if (i != n) fail(s"trailing content at offset $i")
    root
  }

  // -------------------------------------------------------------- chats

  /** Deterministic transcript: optional system turn (every fifth doc),
    * then the 30-token chunks as alternating user/assistant turns — with
    * the PLANTED violation on every seventh doc (first turn claims
    * "assistant", which also breaks alternation with the next turn). */
  def renderChat(docId: Long, text: String): String = {
    val sb = new java.lang.StringBuilder(text.length * 2 + 128)
    sb.append("{\"messages\":[")
    var first = true
    def msg(role: String, content: String): Unit = {
      if (!first) sb.append(',')
      first = false
      sb.append("{\"role\":\"").append(role).append("\",\"content\":\"")
        .append(escapeJson(content)).append("\"}")
    }
    if (docId % 5 == 0) msg("system", s"You are assistant $docId.")
    WebIngest.paraChunks(text).zipWithIndex.foreach { case (c, i) =>
      val role =
        if (i == 0 && docId % 7 == 0) "assistant"
        else if (i % 2 == 0) "user" else "assistant"
      msg(role, c)
    }
    sb.append("]}")
    sb.toString
  }

  final case class ChatCheck(nTurns: Int, hasSystem: Boolean,
      userTokens: Long, assistantTokens: Long,
      roleViolation: Boolean, emptyTurn: Boolean)

  private val Roles = Set("system", "user", "assistant")

  /** Parse + validate one transcript: the strict [[parseJson]] walk, the
    * root/messages shape (exactly role+content string fields per turn),
    * then the lint rules a loss-masking pipeline needs true — known
    * roles, system only first, strict user/assistant alternation starting
    * at user, no empty contents. Shape violations REJECT (malformed
    * container); lint violations are REPORTED (bad-but-parseable data is
    * the thing the readout counts). */
  def validateChat(json: String): ChatCheck = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"chat reject: $msg")
    val root = parseJson(json) match {
      case JObj(Vector(("messages", JArr(ms)))) => ms
      case _ => fail("root must be {\"messages\": [...]}")
    }
    var nTurns = 0
    var hasSystem = false
    var userTokens = 0L
    var assistantTokens = 0L
    var violation = false
    var emptyTurn = false
    var expectUser = true
    root.zipWithIndex.foreach { case (m, idx) =>
      val (role, content) = m match {
        case JObj(Vector(("role", JStr(r)), ("content", JStr(c)))) => (r, c)
        case _ => fail(s"turn $idx must be {role, content} with string values")
      }
      nTurns += 1
      if (!Roles(role)) violation = true
      else if (role == "system") {
        if (idx != 0) violation = true else hasSystem = true
      } else {
        if (role == "user" != expectUser) violation = true
        expectUser = role != "user" // next expected alternates off THIS role
        val toks = content.split(" ", -1).length.toLong
        if (role == "user") userTokens += toks else assistantTokens += toks
      }
      if (content.isEmpty) emptyTurn = true
    }
    if (nTurns == 0) fail("empty messages array")
    ChatCheck(nTurns, hasSystem, userTokens, assistantTokens, violation, emptyTurn)
  }

  final case class ChatIn(doc_id: Long, source: String, text: String)

  // ------------------------------------------------------------ DPO pairs
  // The preference-pair (DPO/RLHF) data stage: chosen/rejected records on
  // the same strict-codec machinery as the SFT transcripts. Fixture: one
  // pair per doc — prompt = chunk 1, chosen = chunk 2, rejected = chunk 3
  // (falling back to the token-REVERSED chosen when the doc is short),
  // with a PLANTED degenerate pair (rejected == chosen) on every seventh
  // doc and a deterministic annotation position (doc parity). Every value
  // is earned back through render → [[parseJson]] → [[validatePair]].

  final case class PairCheck(position: String, promptTokens: Long,
      chosenTokens: Long, rejectedTokens: Long, degenerate: Boolean,
      emptyResponse: Boolean)

  /** Deterministic preference-pair record for a document. */
  def renderPair(docId: Long, text: String): String = {
    val chunks = WebIngest.paraChunks(text)
    val prompt = chunks(0)
    val chosen = if (chunks.length >= 2) chunks(1) else ""
    val rejected =
      if (docId % 7 == 0) chosen // PLANTED degenerate pair
      else if (chunks.length >= 3) chunks(2)
      else chosen.split(" ", -1).reverse.mkString(" ")
    val pos = if (docId % 2 == 0) "a" else "b"
    s"""{"prompt":"${escapeJson(prompt)}","chosen":"${escapeJson(chosen)}"""" +
      s""","rejected":"${escapeJson(rejected)}","chosen_position":"$pos"}"""
  }

  /** Strict pair validation: exactly the four canonical fields in order,
    * string values, position ∈ {a, b} — anything else rejects loudly
    * (battery in ChatDataSpec). The lint verdicts a DPO trainer needs
    * true: degenerate (chosen == rejected — zero preference signal) and
    * emptyResponse (either side empty). */
  def validatePair(json: String): PairCheck = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"dpo reject: $msg")
    parseJson(json) match {
      case JObj(Vector(("prompt", JStr(p)), ("chosen", JStr(c)),
          ("rejected", JStr(r)), ("chosen_position", JStr(pos)))) =>
        if (pos != "a" && pos != "b") fail(s"chosen_position '$pos'")
        PairCheck(pos,
          p.split(" ", -1).length.toLong,
          c.split(" ", -1).length.toLong,
          r.split(" ", -1).length.toLong,
          degenerate = c == r,
          emptyResponse = c.isEmpty || r.isEmpty)
      case _ => fail(
        "root must be {prompt, chosen, rejected, chosen_position} strings")
    }
  }

  // ------------------------------------------------------------- queries

  /** Oracle twin of [[renderPair]]: CTE chain ending in
    * `pr(doc_id, source, position, prompt, chosen, rejected)`. */
  private val pairCte = """
        t AS (
          SELECT doc_id, source,
                 string_split(coalesce(text, ''), ' ') AS toks,
                 len(string_split(coalesce(text, ''), ' ')) AS n,
                 (len(string_split(coalesce(text, ''), ' ')) + 29) // 30 AS c
          FROM documents),
        p1 AS (
          SELECT doc_id, source, toks, n, c,
                 array_to_string(list_slice(toks, 1, least(30, n)), ' ') AS prompt,
                 CASE WHEN c >= 2
                      THEN array_to_string(list_slice(toks, 31, least(60, n)), ' ')
                      ELSE '' END AS chosen
          FROM t),
        pr AS (
          SELECT doc_id, source, prompt, chosen,
                 CASE WHEN doc_id % 7 = 0 THEN chosen
                      WHEN c >= 3
                      THEN array_to_string(list_slice(toks, 61, least(90, n)), ' ')
                      ELSE array_to_string(list_reverse(string_split(chosen, ' ')), ' ')
                 END AS rejected,
                 CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS position
          FROM p1)"""

  /** Oracle chunk arithmetic over `toks`: c = chunk count, lastlen =
    * token count of the final chunk (all others carry exactly 30). */
  private val chunkCte = """
    SELECT doc_id, source,
           len(string_split(coalesce(text, ''), ' ')) AS n,
           (len(string_split(coalesce(text, ''), ' ')) + 29) // 30 AS c,
           list_extract(string_split(coalesce(text, ''), ' '),
             len(string_split(coalesce(text, ''), ' '))) AS lasttok
    FROM documents"""

  def queries: Seq[GraftQuery] = Seq(

    // ---- per-chat turn/token accounting ------------------------------------
    // The loss-mask numbers: turns, system presence, user vs assistant
    // token mass, assistant share (the fraction that trains). Planted
    // role-violation docs are excluded — stats run AFTER lint, over chats
    // whose roles are trustworthy. The Spark side must earn every number
    // through render → strict JSON parse → validate; the oracle replays
    // the chunk arithmetic (even chunks are user, odd assistant, the last
    // chunk carries n - 30(c-1) tokens) straight from the row.
    GraftQuery(
      "chat_stats",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text"))
          .as[ChatIn]
          .map { d =>
            val ck = validateChat(renderChat(d.doc_id, d.text))
            (d.doc_id, ck.nTurns, ck.hasSystem, ck.userTokens,
              ck.assistantTokens)
          }
          .toDF("doc_id", "n_turns", "has_system", "user_tokens",
            "assistant_tokens")
          // round() as a COLUMN so both engines share HALF_UP semantics
          // (a driver-side math.rint would round half-even)
          .withColumn("assistant_share",
            round(col("assistant_tokens").cast("double")
              / (col("user_tokens") + col("assistant_tokens")), 4))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS ($chunkCte),
        e AS (
          SELECT doc_id, n, c,
                 (c + 1) // 2 AS nuser,
                 c // 2 AS nassist,
                 n - 30 * (c - 1) AS lastlen
          FROM d WHERE doc_id % 7 != 0)
        SELECT doc_id,
               CAST(c + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INT) AS n_turns,
               doc_id % 5 = 0 AS has_system,
               CAST(CASE WHEN (c - 1) % 2 = 0
                         THEN 30 * (nuser - 1) + lastlen
                         ELSE 30 * nuser END AS BIGINT) AS user_tokens,
               CAST(CASE WHEN (c - 1) % 2 = 1
                         THEN 30 * (nassist - 1) + lastlen
                         ELSE 30 * nassist END AS BIGINT) AS assistant_tokens,
               round(CAST(CASE WHEN (c - 1) % 2 = 1
                               THEN 30 * (nassist - 1) + lastlen
                               ELSE 30 * nassist END AS DOUBLE) / n, 4)
                 AS assistant_share
        FROM e ORDER BY doc_id""")),

    // ---- per-source chat lint ----------------------------------------------
    // The SFT-data quality dial: which sources ship transcripts whose
    // roles can't be trusted. Every seventh doc is planted broken (first
    // turn claims assistant) and empty turns arise naturally from
    // empty/trailing-space texts — the validator must find exactly those,
    // via the real parse, while the oracle counts them by formula.
    GraftQuery(
      "chat_lint",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text"))
          .as[ChatIn]
          .map { d =>
            val ck = validateChat(renderChat(d.doc_id, d.text))
            (d.source, if (ck.roleViolation) 1L else 0L,
              if (ck.emptyTurn) 1L else 0L,
              if (!ck.roleViolation && !ck.emptyTurn) 1L else 0L)
          }
          .toDF("source", "viol", "empty", "valid")
          .groupBy("source")
          .agg(count(lit(1)).as("n_chats"),
            sum("viol").as("n_role_violations"),
            sum("empty").as("n_empty_turns"),
            sum("valid").as("n_valid"))
          .withColumn("valid_rate",
            round(col("n_valid").cast("double") / col("n_chats"), 4))
          .orderBy("source")
      },
      Some(s"""
        WITH d AS ($chunkCte),
        f AS (
          SELECT source,
                 CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS viol,
                 CASE WHEN n - 30 * (c - 1) = 1 AND lasttok = ''
                      THEN 1 ELSE 0 END AS empty
          FROM d)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_chats,
               CAST(coalesce(sum(viol), 0) AS BIGINT) AS n_role_violations,
               CAST(coalesce(sum(empty), 0) AS BIGINT) AS n_empty_turns,
               CAST(coalesce(sum(CASE WHEN viol = 0 AND empty = 0 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_valid,
               round(CAST(coalesce(sum(CASE WHEN viol = 0 AND empty = 0 THEN 1 ELSE 0 END), 0)
                          AS DOUBLE) / count(*), 4) AS valid_rate
        FROM f GROUP BY source ORDER BY source NULLS FIRST""")),

    // ---- prompt-level dedup -------------------------------------------------
    // The SFT counterpart of url_dedup: near-identical PROMPTS (first user
    // turn) across a corpus leak across train/eval splits and overweight
    // common requests — the standard fix is exact dedup on the first user
    // turn. Spark must EARN the prompt through render → strict parse →
    // validate (first user-role content), then the dedup_exact digest-join
    // shape: groupBy the bounded digest, min-doc_id survivor. Planted
    // role-violation docs are excluded (their first user turn is not
    // where the formula says — stats after lint, as in chat_stats).
    GraftQuery(
      "prompt_dedup",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text"))
          .as[ChatIn]
          .map { d =>
            val root = parseJson(renderChat(d.doc_id, d.text)) match {
              case JObj(Vector(("messages", JArr(ms)))) => ms
              case _ => throw new IllegalArgumentException("chat reject: bad root")
            }
            val prompt = root.collectFirst {
              case JObj(Vector(("role", JStr("user")), ("content", JStr(c)))) => c
            }.getOrElse("")
            (d.doc_id, md5Hex(prompt.getBytes("UTF-8")))
          }
          .toDF("doc_id", "digest")
          .groupBy("digest")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .select("keep_id", "n_copies", "digest")
          .orderBy("keep_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(
                   string_split(coalesce(text, ''), ' '), 1,
                   least(30, len(string_split(coalesce(text, ''), ' ')))), ' '))
                   AS digest
          FROM documents WHERE doc_id % 7 != 0)
        SELECT min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_copies,
               digest
        FROM d GROUP BY digest ORDER BY keep_id""")),

    // ---- fuzzy prompt dedup: MinHash-LSH over the first user turn ----------
    // The leakage prompt_dedup's exact digest MISSES: a paraphrased or
    // token-perturbed prompt hashes differently but still overweights the
    // same request across train/eval. Prompts are EARNED through render →
    // strict parse → first-user-turn extraction, then ride the shared
    // MinHash-LSH machinery (Dedup.minhashPairsOf: scan-side signatures,
    // banded candidates, exact-Jaccard ≥ 0.5 verification) — the scale
    // shape minhash_pairs proved, applied to the prompt column. Planted
    // role-violation docs are excluded as in prompt_dedup.
    GraftQuery(
      "prompt_minhash",
      (s, dir) => {
        import s.implicits._
        val prompts = Tables.documents(s, dir)
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text"))
          .as[ChatIn]
          .map { d =>
            val root = parseJson(renderChat(d.doc_id, d.text)) match {
              case JObj(Vector(("messages", JArr(ms)))) => ms
              case _ => throw new IllegalArgumentException("chat reject: bad root")
            }
            val prompt = root.collectFirst {
              case JObj(Vector(("role", JStr("user")), ("content", JStr(c)))) => c
            }.getOrElse("")
            (d.doc_id, prompt)
          }
          .toDF("doc_id", "text")
        Dedup.minhashPairsOf(prompts)
          .select("doc_a", "doc_b", "jaccard")
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""
        WITH ${Dedup.minhashCtes(
          """(SELECT doc_id,
                array_to_string(list_slice(
                  string_split(coalesce(text, ''), ' '), 1,
                  least(30, len(string_split(coalesce(text, ''), ' ')))), ' ')
                  AS text
              FROM documents WHERE doc_id % 7 != 0)""")}
        SELECT doc_a, doc_b, jaccard
        FROM mh_pairs
        ORDER BY doc_a, doc_b""")),

    // ---- chat decontamination: eval n-grams inside ASSISTANT turns ---------
    // Benchmark contamination in SFT data hides inside the assistant
    // responses (a model trained on them memorizes eval answers), so the
    // decontaminate pass must look there — composed through the chat
    // codec: render → strict parse → assistant-turn extraction →
    // per-turn trigram sets (no cross-turn grams — turn boundaries are
    // real) → the decontaminate broadcast-overlap shape against the RAW
    // eval slice's trigrams. Same threshold, same flag semantics, so the
    // raw-corpus and chat-stage decontamination passes cannot drift.
    GraftQuery(
      "chat_decontaminate",
      (s, dir) => {
        import s.implicits._
        val evalGrams = Dedup.shingled(Tables.documents(s, dir)
            .filter(col("doc_id") < Curation.EvalMaxDocId))
          .select(explode(col("grams")).as("gram")).distinct()
        val grams = Tables.documents(s, dir)
          .filter(col("doc_id") % 7 =!= 0 &&
            col("doc_id") >= Curation.EvalMaxDocId)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text"))
          .as[ChatIn]
          .map { d =>
            val root = parseJson(renderChat(d.doc_id, d.text)) match {
              case JObj(Vector(("messages", JArr(ms)))) => ms
              case _ => throw new IllegalArgumentException("chat reject: bad root")
            }
            val asst = root.collect {
              case JObj(Vector(("role", JStr("assistant")), ("content", JStr(c)))) => c
            }
            val gs = asst.iterator.flatMap { t =>
              val toks = t.split(" ", -1)
              if (toks.length >= 3)
                (0 to toks.length - 3).iterator
                  .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
              else Iterator.empty
            }.toVector.distinct
            (d.doc_id, gs)
          }
          .toDF("doc_id", "grams")
        grams
          .select(col("doc_id"), size(col("grams")).cast("long").as("n"),
            explode_outer(col("grams")).as("gram"))
          .join(broadcast(evalGrams.withColumn("_hit", lit(1))), Seq("gram"), "left")
          .groupBy("doc_id")
          .agg(max(col("n")).as("n_grams"),
            count(col("_hit")).as("contaminated_grams"))
          .withColumn("contamination", when(col("n_grams") > 0,
            round(col("contaminated_grams").cast("double") / col("n_grams"), 4))
            .otherwise(0.0))
          .withColumn("flagged",
            col("contamination") >= Curation.ContaminationThreshold)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
        sh AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 3 THEN
                   list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END grams
               FROM t),
        ev AS (SELECT DISTINCT unnest(grams) gram FROM sh
               WHERE doc_id < ${Curation.EvalMaxDocId}),
        ch AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks,
                      (len(string_split(coalesce(text, ''), ' ')) + 29) // 30 AS c
               FROM documents
               WHERE doc_id % 7 != 0 AND doc_id >= ${Curation.EvalMaxDocId}),
        ag AS (SELECT doc_id,
                 list_distinct(flatten(list_transform(range(2, c + 1, 2), k ->
                   CASE WHEN least(k * 30, len(toks)) - ((k-1) * 30 + 1) >= 2
                        THEN list_transform(
                               range((k-1) * 30 + 1, least(k * 30, len(toks)) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                        ELSE [] END))) AS grams
               FROM ch),
        tg AS (SELECT doc_id, unnest(grams) gram FROM ag),
        hits AS (SELECT tg.doc_id, count(*) hc FROM tg JOIN ev USING (gram) GROUP BY 1)
        SELECT a.doc_id,
               CAST(len(a.grams) AS BIGINT) AS n_grams,
               CAST(coalesce(h.hc, 0) AS BIGINT) AS contaminated_grams,
               CASE WHEN len(a.grams) > 0
                    THEN round(CAST(coalesce(h.hc, 0) AS DOUBLE) / len(a.grams), 4)
                    ELSE 0.0 END AS contamination,
               CASE WHEN len(a.grams) > 0
                    THEN round(CAST(coalesce(h.hc, 0) AS DOUBLE) / len(a.grams), 4)
                         >= ${Curation.ContaminationThreshold}
                    ELSE false END AS flagged
        FROM ag a LEFT JOIN hits h USING (doc_id)
        ORDER BY a.doc_id""")),

    // ---- prompt leakage ACROSS train/val/test splits -----------------------
    // The eval-hygiene readout split_leakage gives for near-dup text,
    // lifted to the chat stage: a prompt whose digest appears in BOTH an
    // earlier and a later split (train < val < test) inflates eval scores
    // for free. Prompts are earned through the codec (render → strict
    // parse → first user turn), split assignment rides the SAME
    // md5-nibble 80/10/10 rule hash_split/split_leakage pin
    // (Dedup.docSplits — one definition, so the chat readout can never
    // disagree with the raw-corpus one). Per ordered split pair: distinct
    // shared prompt digests and the later-split docs carrying them. Only
    // (digest, split, doc_id) rows ever shuffle.
    GraftQuery(
      "prompt_split_leakage",
      (s, dir) => {
        import s.implicits._
        val prompts = Tables.documents(s, dir)
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text"))
          .as[ChatIn]
          .map { d =>
            val root = parseJson(renderChat(d.doc_id, d.text)) match {
              case JObj(Vector(("messages", JArr(ms)))) => ms
              case _ => throw new IllegalArgumentException("chat reject: bad root")
            }
            val prompt = root.collectFirst {
              case JObj(Vector(("role", JStr("user")), ("content", JStr(c)))) => c
            }.getOrElse("")
            (d.doc_id, md5Hex(prompt.getBytes("UTF-8")))
          }
          .toDF("doc_id", "digest")
        // split as a projection of the row's own key (Dedup.splitOf is a
        // pure function of doc_id) — the former docSplits join shuffled
        // the parsed-prompt frame to look up a value computable in place
        val j = prompts.withColumn("split", Dedup.splitOf(col("doc_id")))
        // the earlier-splits side as a collect_set WINDOW over the digest
        // (≤ 3 splits per digest, bounded at any scale) instead of a
        // distinct+self-join: the join's two branches each re-ran the
        // whole chat render→parse map over the corpus (pure plans have no
        // cache — guide §7.2), and the digest self-join shuffled the
        // frame twice where the window shuffles it once (guide §2.4).
        // Each row then explodes one (split_a) per DISTINCT
        // earlier-ranked split of its digest — exactly the pairs the
        // distinct-join emitted.
        val rk = "CASE %s WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END"
        j.withColumn("splits", collect_set("split").over(
            org.apache.spark.sql.expressions.Window.partitionBy("digest")))
          .withColumn("split_a", explode(expr(
            s"filter(splits, x -> (${rk.format("x")}) < (${rk.format("split")}))")))
          .withColumn("split_b", col("split"))
          .groupBy("split_a", "split_b")
          .agg(countDistinct("digest").as("n_shared_prompts"),
            countDistinct("doc_id").as("n_leaked_docs"))
          .orderBy("split_a", "split_b")
      },
      Some(s"""
        WITH ${Dedup.sqlDocSplits.trim},
        d AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(
                   string_split(coalesce(text, ''), ' '), 1,
                   least(30, len(string_split(coalesce(text, ''), ' ')))), ' '))
                   AS digest
          FROM documents WHERE doc_id % 7 != 0),
        j AS (SELECT d.doc_id, d.digest, sp.split
              FROM d JOIN sp ON d.doc_id = sp.doc_id),
        x AS (SELECT DISTINCT split AS split_a, digest FROM j),
        p AS (SELECT x.split_a, j.split AS split_b, j.digest, j.doc_id
              FROM x JOIN j ON x.digest = j.digest
              WHERE CASE x.split_a WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END
                  < CASE j.split WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END)
        SELECT split_a, split_b,
               CAST(count(DISTINCT digest) AS BIGINT) AS n_shared_prompts,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_leaked_docs
        FROM p GROUP BY split_a, split_b ORDER BY split_a, split_b""")),

    // ---- preference-pair accounting ----------------------------------------
    // The per-pair numbers a DPO run filters and weights by, each earned
    // through render → strict parse → validatePair: token masses of all
    // three fields, the length margin (chosen − rejected — the length-bias
    // confound a trainer monitors), the annotation position, and the two
    // lint verdicts. The oracle rebuilds the chunk slices, the reversed
    // fallback, and the planted degenerates from the row formulas.
    GraftQuery(
      "dpo_stats",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text"))
          .as[ChatIn]
          .map { d =>
            val ck = validatePair(renderPair(d.doc_id, d.text))
            (d.doc_id, ck.position, ck.promptTokens, ck.chosenTokens,
              ck.rejectedTokens, ck.chosenTokens - ck.rejectedTokens,
              ck.degenerate, ck.emptyResponse)
          }
          .toDF("doc_id", "position", "prompt_tokens", "chosen_tokens",
            "rejected_tokens", "margin", "degenerate", "empty_response")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH $pairCte
        SELECT doc_id, position,
               CAST(len(string_split(prompt, ' ')) AS BIGINT) AS prompt_tokens,
               CAST(len(string_split(chosen, ' ')) AS BIGINT) AS chosen_tokens,
               CAST(len(string_split(rejected, ' ')) AS BIGINT) AS rejected_tokens,
               CAST(len(string_split(chosen, ' '))
                    - len(string_split(rejected, ' ')) AS BIGINT) AS margin,
               chosen = rejected AS degenerate,
               chosen = '' OR rejected = '' AS empty_response
        FROM pr ORDER BY doc_id""")),

    // ---- preference-pair lint + position-bias rollup ------------------------
    // The dataset-level health readout: per source, pair counts, the
    // degenerate/empty shares a curation run gates on, the chosen-longer
    // count and mean margin (length bias), and the position-a share (the
    // annotation position-bias statistic — a healthy pairwise-labeling
    // pipeline sits near 0.5; drift means annotators anchor on position).
    GraftQuery(
      "dpo_lint",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text"))
          .as[ChatIn]
          .map { d =>
            val ck = validatePair(renderPair(d.doc_id, d.text))
            (d.source, if (ck.degenerate) 1L else 0L,
              if (ck.emptyResponse) 1L else 0L,
              if (ck.chosenTokens > ck.rejectedTokens) 1L else 0L,
              ck.chosenTokens - ck.rejectedTokens,
              if (ck.position == "a") 1L else 0L)
          }
          .toDF("source", "degen", "empty", "longer", "margin", "posa")
          .groupBy("source")
          .agg(count(lit(1)).as("n_pairs"),
            sum("degen").as("n_degenerate"),
            sum("empty").as("n_empty"),
            sum("longer").as("n_chosen_longer"),
            round(sum("margin").cast("double") / count(lit(1)), 4)
              .as("mean_margin"),
            round(sum("posa").cast("double") / count(lit(1)), 4)
              .as("position_a_share"))
          .orderBy("source")
      },
      Some(s"""
        WITH $pairCte,
        f AS (
          SELECT source,
                 CASE WHEN chosen = rejected THEN 1 ELSE 0 END AS degen,
                 CASE WHEN chosen = '' OR rejected = '' THEN 1 ELSE 0 END AS empty,
                 CASE WHEN len(string_split(chosen, ' '))
                           > len(string_split(rejected, ' ')) THEN 1 ELSE 0 END AS longer,
                 len(string_split(chosen, ' '))
                   - len(string_split(rejected, ' ')) AS margin,
                 CASE WHEN position = 'a' THEN 1 ELSE 0 END AS posa
          FROM pr)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(coalesce(sum(degen), 0) AS BIGINT) AS n_degenerate,
               CAST(coalesce(sum(empty), 0) AS BIGINT) AS n_empty,
               CAST(coalesce(sum(longer), 0) AS BIGINT) AS n_chosen_longer,
               round(CAST(coalesce(sum(margin), 0) AS DOUBLE) / count(*), 4)
                 AS mean_margin,
               round(CAST(coalesce(sum(posa), 0) AS DOUBLE) / count(*), 4)
                 AS position_a_share
        FROM f GROUP BY source ORDER BY source NULLS FIRST""")),

    // ---- loss-mask-aware sequence packing ----------------------------------
    // The last SFT stage: pack lint-clean chats into fixed-token-budget
    // training shards (the pack_sequences machinery — Curation's bucketed
    // per-language cumsum, shared so the scale-safe shape exists once)
    // and report each shard's LOSS-MASK mass: total vs assistant tokens
    // and the mask share (the fraction of the shard that actually
    // trains). The per-chat token/eligibility numbers ride the scan as
    // COLUMN formulas rather than re-running the JSON parse: chat_stats /
    // chat_lint pin the strict parser to exactly these formulas per row
    // on every corpus, and the cumsum machinery reads its base once per
    // plan branch — re-parsing the corpus four times would quadruple the
    // scan cost for numbers the parser queries already guarantee.
    GraftQuery(
      "chat_pack",
      (s, dir) => packedChats(s, dir)
          .groupBy("lang", "shard_id")
          .agg(count(lit(1)).as("n_chats"),
            sum("n_tokens").as("total_tokens"),
            sum("a_tokens").as("assistant_tokens"))
          .withColumn("mask_share",
            round(col("assistant_tokens").cast("double") / col("total_tokens"), 4))
          .orderBy("lang", "shard_id"),
      Some(s"""
        WITH d AS (
          SELECT doc_id, lang,
                 len(string_split(coalesce(text, ''), ' ')) AS n,
                 (len(string_split(coalesce(text, ''), ' ')) + 29) // 30 AS c,
                 list_extract(string_split(coalesce(text, ''), ' '),
                   len(string_split(coalesce(text, ''), ' '))) AS lasttok
          FROM documents),
        e AS (
          SELECT doc_id, lang, n, c,
                 CASE WHEN (c - 1) % 2 = 1
                      THEN 30 * (c // 2 - 1) + n - 30 * (c - 1)
                      ELSE 30 * (c // 2) END AS a_tokens
          FROM d
          WHERE doc_id % 7 != 0
            AND NOT (n - 30 * (c - 1) = 1 AND lasttok = '')),
        w AS (
          SELECT doc_id, lang, n, a_tokens,
                 CAST(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum
          FROM e)
        SELECT lang,
               (cum - n) // $ChatShardBudget AS shard_id,
               CAST(count(*) AS BIGINT) AS n_chats,
               CAST(sum(n) AS BIGINT) AS total_tokens,
               CAST(sum(a_tokens) AS BIGINT) AS assistant_tokens,
               round(CAST(sum(a_tokens) AS DOUBLE) / sum(n), 4) AS mask_share
        FROM w GROUP BY lang, (cum - n) // $ChatShardBudget
        ORDER BY lang NULLS FIRST, shard_id"""))
,

    // ---- export manifest: the pipeline's last mile ------------------------
    // chat_pack computes shard assignments; Sinks.packedShards writes them
    // one file per shard. This is the manifest a CONSUMER trusts instead
    // of re-scanning the lake: one row per shard carrying the counts
    // (chats, tokens, assistant tokens, mask share), the source mix
    // (`src:count` pairs in source order — the provenance audit), and an
    // order-sensitive md5 over the shard's chat ids (the content receipt:
    // a dropped, duplicated, or re-sharded chat changes it). Every number
    // is an exact integer/string function of the packed frame, so the
    // whole manifest is hash-checked by the oracle, and LayoutSpec pins
    // that the WRITTEN layout matches it file for file, token for token.
    //
    // Scale: two shard-keyed partial aggs + one shard-keyed join; the only
    // per-group state is the shard's own id list, bounded by construction
    // (a shard holds ≤ ChatShardBudget tokens ⇒ ≤ budget chats). NULL and
    // ''-lang shards stay distinct via the lkey group key (never joined on
    // a nullable column — Spark and DuckDB both drop NULL join keys).
    GraftQuery(
      "export_manifest",
      (s, dir) => {
        val pc = packedChats(s, dir)
        val scalars = pc.groupBy("lkey", "shard_id")
          .agg(max("lang").as("lang"),
            count(lit(1)).as("n_chats"),
            sum("n_tokens").as("total_tokens"),
            sum("a_tokens").as("assistant_tokens"),
            md5(to_binary(concat_ws(",", expr(
              "transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING))")),
              lit("utf-8"))).as("digest"))
        val mix = pc
          .groupBy(col("lkey"), col("shard_id"),
            coalesce(col("source"), lit("")).as("src"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy("lkey", "shard_id")
          .agg(concat_ws(",", expr(
            """transform(array_sort(collect_list(struct(src, cnt))),
                 p -> concat(p.src, ':', CAST(p.cnt AS STRING)))"""))
            .as("source_mix"))
        scalars.join(mix, Seq("lkey", "shard_id"))
          .withColumn("mask_share", round(
            col("assistant_tokens").cast("double") / col("total_tokens"), 4))
          .orderBy(col("lkey"), col("shard_id"))
          .select("lang", "shard_id", "n_chats", "total_tokens",
            "assistant_tokens", "mask_share", "source_mix", "digest")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, lang, coalesce(source, '') AS src,
                 len(string_split(coalesce(text, ''), ' ')) AS n,
                 (len(string_split(coalesce(text, ''), ' ')) + 29) // 30 AS c,
                 list_extract(string_split(coalesce(text, ''), ' '),
                   len(string_split(coalesce(text, ''), ' '))) AS lasttok
          FROM documents),
        e AS (
          SELECT doc_id, lang, src, n, c,
                 CASE WHEN (c - 1) % 2 = 1
                      THEN 30 * (c // 2 - 1) + n - 30 * (c - 1)
                      ELSE 30 * (c // 2) END AS a_tokens
          FROM d
          WHERE doc_id % 7 != 0
            AND NOT (n - 30 * (c - 1) = 1 AND lasttok = '')),
        w AS (
          SELECT doc_id, lang, src, n, a_tokens,
                 CASE WHEN lang IS NULL THEN chr(1) ELSE 'L' || lang END AS lk,
                 CAST(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum
          FROM e),
        p AS (SELECT *, (cum - n) // $ChatShardBudget AS shard_id FROM w),
        sc AS (
          SELECT lk, shard_id, max(lang) AS lang,
                 CAST(count(*) AS BIGINT) AS n_chats,
                 CAST(sum(n) AS BIGINT) AS total_tokens,
                 CAST(sum(a_tokens) AS BIGINT) AS assistant_tokens,
                 round(CAST(sum(a_tokens) AS DOUBLE) / sum(n), 4) AS mask_share,
                 md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
                   AS digest
          FROM p GROUP BY 1, 2),
        mx AS (
          SELECT lk, shard_id,
                 string_agg(src || ':' || CAST(cnt AS VARCHAR), ',' ORDER BY src)
                   AS source_mix
          FROM (SELECT lk, shard_id, src, count(*) AS cnt
                FROM p GROUP BY 1, 2, 3)
          GROUP BY 1, 2)
        SELECT sc.lang, sc.shard_id, sc.n_chats, sc.total_tokens,
               sc.assistant_tokens, sc.mask_share, mx.source_mix, sc.digest
        FROM sc JOIN mx USING (lk, shard_id)
        ORDER BY lk, shard_id"""))
  )

  /** Tokens per packed training shard (the pack_sequences budget scaled
    * to typical SFT sequence lengths). */
  val ChatShardBudget = 2048

  /** The packed per-chat frame chat_pack aggregates and export_manifest /
    * the shard writer consume: every lint-clean chat with its token
    * numbers and its [[ChatShardBudget]]-packed shard assignment —
    * `(doc_id, lang, lkey, source, n_tokens, a_tokens, cum, shard_id)`.
    * The per-chat token/eligibility numbers ride the scan as COLUMN
    * formulas (chat_stats/chat_lint pin the strict parser to exactly
    * these formulas per row on every corpus); the cumsum rides
    * Curation.cumsumByLang's bucketed two-phase build. One definition so
    * the report, the manifest, and the written shards can never disagree
    * about what landed where. */
  private[graft] def packedChats(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), Curation.langKey.as("lkey"),
        col("source"),
        split(coalesce(col("text"), lit("")), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("c", expr("(n + 29) DIV 30"))
      .withColumn("lastlen", expr("n - 30 * (c - 1)"))
      .filter(col("doc_id") % 7 =!= 0 &&
        !(col("lastlen") === 1 &&
          expr("element_at(toks, CAST(n AS INT))") === lit("")))
      .withColumn("a_tokens", expr(
        "CASE WHEN (c - 1) % 2 = 1 THEN 30 * (c DIV 2 - 1) + lastlen" +
          " ELSE 30 * (c DIV 2) END"))
      .select(col("doc_id"), col("lang"), col("lkey"), col("source"),
        col("n").as("n_tokens"), col("a_tokens"))
    Curation.cumsumByLang(base)
      .withColumn("shard_id", expr(s"(cum - n_tokens) DIV $ChatShardBudget"))
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}

package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextNormExpressions

import org.apache.spark.sql.functions._

/** Post-extraction text normalization — the stage between the byte-level
  * front ([[WebIngest.sniffCharset]] / html_text) and the quality gates
  * ([[TextAnalysis]] / [[Curation]]): Unicode NFC normalization and
  * closed-rule mojibake (double-encoding) repair. The reference pipeline
  * (ashrafkvt/KafkaSparkStream processor.py) never touches text encoding —
  * this family extends the engine to the normalize-before-curate shape
  * every production LLM-data pipeline runs; rare_token_rate (TextAnalysis)
  * DETECTS encoding damage, these REPAIR it.
  *
  * Fixture discipline (the WebIngest pattern): the driver corpus is
  * ASCII-only, so each query PLANTS a deterministic denormalization —
  * combining-mark sequences for NFC, a Latin-1 garble for mojibake — from
  * the document row, then recovers the clean form through the real
  * general-purpose kernel ([[graft.functions.TextNormKernels]]). The
  * DuckDB oracle rebuilds the planted input by formula and, for NFC, runs
  * its OWN independent Unicode implementation (utf8proc `nfc_normalize`)
  * against the JDK's — two implementations of UAX #15 cross-checking each
  * other per row, on hostile corpora too (adv_corpus doc 63 carries real
  * NFD combining marks; adv_html carries astral pairs).
  *
  * Scale notes: all three queries are scan-side codegen (native
  * expressions, no UDF serialization) — zero data exchange for the
  * per-doc forms; the rate rolls up on the bounded source key with
  * map-side partial aggregation. At 100 TB this family costs exactly one
  * corpus scan.
  */
object TextNormalize {

  /** Planted denormalizations, keyed on doc_id % 4 (negative hostile ids
    * fall to the no-prefix branch in BOTH engines — % is sign-of-dividend
    * remainder in Spark and DuckDB alike):
    *  0: "Cafe" + U+0301 combining acute  → NFC composes to "Café"
    *  1: "man" + U+0303 + "ana"           → NFC composes to "mañana"
    *  2: U+FB01 ligature "ﬁne"            → NFC-STABLE (proves the kernel
    *     is NFC, not NFKC — a compatibility fold here would hash-mismatch)
    *  3: no prefix — the raw-text path (clean ASCII must come back
    *     unchanged; hostile NFD text must still normalize). */
  private def nfcPrefixCol = {
    val v = col("doc_id") % 4
    when(v === 0, lit("Cafe\u0301 "))
      .when(v === 1, lit("man\u0303ana "))
      .when(v === 2, lit("\uFB01ne "))
      .otherwise(lit(""))
  }

  private val nfcPrefixSql = """
    CASE doc_id % 4
      WHEN 0 THEN 'Cafe' || chr(769) || ' '
      WHEN 1 THEN 'man' || chr(771) || 'ana '
      WHEN 2 THEN chr(64257) || 'ne '
      ELSE ''
    END"""

  /** The mojibake plant: a non-ASCII suffix on doc_id%4 = 0 rows (the
    * driver corpus is pure ASCII — without it the garble would be the
    * identity everywhere and the repair path would never execute). */
  private def mojibakeSuffixCol =
    when(col("doc_id") % 4 === 0, lit(" caf\u00e9 r\u00e9sum\u00e9"))
      .otherwise(lit(""))

  private val mojibakeSuffixSql =
    "CASE WHEN doc_id % 4 = 0 THEN ' caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233) ELSE '' END"

  def queries: Seq[GraftQuery] = Seq(

    // ---- Unicode NFC normalization ----------------------------------------
    // input = planted-decomposed prefix + raw text; the Spark side runs the
    // JDK Normalizer through the codegen'd NfcNormalize expression, the
    // oracle runs DuckDB's utf8proc nfc_normalize on the SAME constructed
    // input — so composition tables, stability under already-NFC input,
    // and codepoint accounting are pinned by two independent Unicode
    // implementations. `changed` fires on the planted rows AND on any
    // genuinely-NFD corpus text (hostile doc 63).
    GraftQuery(
      "text_normalize",
      (s, dir) => {
        val input = concat(nfcPrefixCol, coalesce(col("text"), lit("")))
        Tables.documents(s, dir)
          .select(col("doc_id"), input.as("raw"))
          .select(col("doc_id"), col("raw"),
            TextNormExpressions.nfcNormalize(col("raw")).as("norm"))
          .select(col("doc_id"),
            (col("raw") =!= col("norm")).as("changed"),
            length(col("raw")).cast("long").as("n_in"),
            length(col("norm")).cast("long").as("n_out"),
            md5(col("norm").cast("binary")).as("norm_digest"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 $nfcPrefixSql || coalesce(text, '') AS raw
          FROM documents),
        n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM d)
        SELECT doc_id,
               raw != norm AS changed,
               CAST(length(raw) AS BIGINT) AS n_in,
               CAST(length(norm) AS BIGINT) AS n_out,
               md5(norm) AS norm_digest
        FROM n ORDER BY doc_id""")),

    // ---- closed-rule double-encoding repair --------------------------------
    // payload = the text garbled UTF-8→Latin-1 (what a wrong charset
    // header produces); the Spark side must detect and invert it through
    // the real repair kernel — repair iff all chars ≤ U+00FF AND the
    // re-encoded bytes are STRICTLY valid UTF-8 AND the decode changes the
    // string. The oracle derives every output from the clean text alone:
    // repaired text IS the original, payload length is its UTF-8 byte
    // count (each byte became one Latin-1 char), and was_mojibake is
    // exactly "the text has a non-ASCII char" (byte count ≠ codepoint
    // count) — so a repairer that over- or under-fires hash-mismatches.
    GraftQuery(
      "mojibake_repair",
      (s, dir) => {
        val base = concat(coalesce(col("text"), lit("")), mojibakeSuffixCol)
        Tables.documents(s, dir)
          .select(col("doc_id"), base.as("base"))
          .select(col("doc_id"),
            TextNormExpressions.mojibakeGarble(col("base")).as("payload"))
          .select(col("doc_id"), col("payload"),
            TextNormExpressions.mojibakeRepair(col("payload")).as("repaired"))
          .select(col("doc_id"),
            (col("repaired") =!= col("payload")).as("was_mojibake"),
            length(col("payload")).cast("long").as("payload_chars"),
            length(col("repaired")).cast("long").as("repaired_chars"),
            md5(col("repaired").cast("binary")).as("repaired_digest"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 coalesce(text, '') || $mojibakeSuffixSql AS b
          FROM documents)
        SELECT doc_id,
               octet_length(encode(b)) != length(b) AS was_mojibake,
               CAST(octet_length(encode(b)) AS BIGINT) AS payload_chars,
               CAST(length(b) AS BIGINT) AS repaired_chars,
               md5(b) AS repaired_digest
        FROM d ORDER BY doc_id""")),

    // ---- per-source mojibake-rate readout ----------------------------------
    // The curation dashboard dial: which ingestion sources ship damaged
    // encodings, and how badly. Same planted payload, rolled up on the
    // bounded source key (map-side partial aggregation — broadcast-sized
    // at any corpus scale).
    GraftQuery(
      "mojibake_rate",
      (s, dir) => {
        val base = concat(coalesce(col("text"), lit("")), mojibakeSuffixCol)
        Tables.documents(s, dir)
          .select(col("source"), base.as("base"))
          .select(col("source"),
            TextNormExpressions.mojibakeGarble(col("base")).as("payload"))
          .select(col("source"), col("payload"),
            TextNormExpressions.mojibakeRepair(col("payload")).as("repaired"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("repaired") =!= col("payload"), 1L).otherwise(0L))
              .as("n_mojibake"))
          .withColumn("mojibake_rate",
            round(col("n_mojibake").cast("double") / col("n_docs"), 4))
          .orderBy("source")
      },
      Some(s"""
        WITH d AS (
          SELECT source,
                 coalesce(text, '') || $mojibakeSuffixSql AS b
          FROM documents)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(coalesce(sum(CASE WHEN octet_length(encode(b)) != length(b)
                                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_mojibake,
               round(CAST(coalesce(sum(CASE WHEN octet_length(encode(b)) != length(b)
                                            THEN 1 ELSE 0 END), 0) AS DOUBLE)
                     / count(*), 4) AS mojibake_rate
        FROM d GROUP BY source ORDER BY source NULLS FIRST"""))
  )
}

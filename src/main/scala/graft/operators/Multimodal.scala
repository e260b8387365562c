package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, Tables}

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * Pattern for image/audio/video at 100 TB: the payload is a `binary`
  * column that is NEVER shuffled wholesale — metadata extraction and
  * feature stubs run scan-side, joins/groupBys operate on the extracted
  * (narrow) columns, and partition counts are sized so one partition's
  * payloads fit executor memory.
  *
  * The decode step is STUBBED: this container has no image/audio codecs, so
  * [[decodeStub]] derives a deterministic fake feature vector from the
  * payload bytes. The Spark-side plumbing around it — binary schema, typed
  * Dataset, per-partition batch processing via `mapPartitions` (the Scala
  * analog of `mapInPandas` batching), feature schema — is real and tested
  * (OperatorSpec). A real decoder replaces ONLY the body of
  * [[decodeStub]].
  */
object Multimodal {

  /** A media payload row: documents.text re-encoded as UTF-8 bytes stands
    * in for an image/audio blob in the offline harness. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features: fixed 8-dim vector + declared dimensions. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, features: Array[Float])

  /** documents → media-shaped Dataset (payload = utf-8 bytes). */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        lit("text/plain").as("media_type"),
        to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake standing in for e.g. JPEG decode +
    * resize + embed. Real implementation would decode `payload` with a
    * codec library; everything around this function is production-shaped.
    * Runs per-partition so a real decoder can amortize model/codec init
    * across the partition (the reason mapPartitions, not map). */
  def decodeStub(rows: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    rows.map { r =>
      val n = r.payload.length
      // fake dims/features derived from content so tests can assert
      // determinism; a real decoder reads them from the container format
      val width = 64 + (r.payload.headOption.getOrElse(0: Byte) & 0x3f)
      val height = 64 + (r.payload.lastOption.getOrElse(0: Byte) & 0x3f)
      val feats = Array.tabulate(8) { i =>
        val slice = r.payload.slice(i * n / 8, math.max(i * n / 8 + 1, (i + 1) * n / 8))
        if (slice.isEmpty) 0f
        // double-precision mean-brightness, truncated to float at the end:
        // bit-reproducible in any engine (float-division chains are not,
        // which is what keeps this stub oracle-checkable)
        else (slice.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble
          / slice.length / 255.0).toFloat
      }
      MediaFeatures(r.doc_id, r.media_type, n, width, height, feats)
    }

  /** Full decode pipeline as a DataFrame op. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    asMedia(spark, dir).mapPartitions(decodeStub).toDF()
  }

  /** Bytes per pseudo-frame and the keep-1-in-k sampling stride. */
  val FrameStride = 64
  val SampleEvery = 4

  /** One sampled frame of a media payload. */
  final case class FrameSample(doc_id: Long, frame_idx: Int, byte_off: Int,
      frame_len: Int, checksum: Long)

  /** Frame sampling — the video shape: treat the payload as fixed-stride
    * frames, keep every `SampleEvery`-th, emit per-frame provenance
    * (offset/length) plus a byte-sum checksum standing in for the decoded
    * frame. Like [[decodeStub]], the "decode" is deterministic byte
    * arithmetic (a real build swaps the checksum for a codec call); the
    * batch shape — per-partition iterator over whole payloads, flatMap to
    * frame rows — is exactly how a real frame sampler runs, and the
    * payload never leaves the scan-side task. */
  def frameSample(rows: Iterator[MediaRecord]): Iterator[FrameSample] =
    rows.flatMap { r =>
      val n = r.payload.length
      val nFrames = (n + FrameStride - 1) / FrameStride
      Iterator.range(0, nFrames, SampleEvery).map { i =>
        val off = i * FrameStride
        val len = math.min(FrameStride, n - off)
        var s = 0L
        var j = off
        while (j < off + len) { s += (r.payload(j) & 0xff); j += 1 }
        FrameSample(r.doc_id, i, off, len, s)
      }
    }

  def queries: Seq[GraftQuery] = Seq(

    // ---- metadata extraction (oracle-checkable: md5 + byte length) -------
    GraftQuery(
      "multimodal_meta",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          octet_length(to_binary(col("text"), lit("utf-8"))).cast(LongType).as("byte_len"),
          md5(to_binary(col("text"), lit("utf-8"))).as("content_md5"))
        .withColumn("fake_width",
          lit(64) + pmod(ascii(substring(col("content_md5"), 1, 1)), lit(64)))
        .withColumn("fake_height",
          lit(64) + pmod(ascii(substring(col("content_md5"), 2, 1)), lit(64)))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               md5(text) AS content_md5,
               64 + ascii(substring(md5(text), 1, 1)) % 64 AS fake_width,
               64 + ascii(substring(md5(text), 2, 1)) % 64 AS fake_height
        FROM documents
        ORDER BY doc_id""")),

    // ---- stubbed decode + feature extraction (oracle-checked) ------------
    // The stub decode is deterministic byte arithmetic (first/last byte →
    // fake dims, slice mean-brightness → f0), so DuckDB can reproduce it
    // exactly: bytes are recovered from hex(encode(text)) pairs, and the
    // double→float→double truncation chain matches the Scala stub's.
    GraftQuery(
      "media_features",
      (s, dir) => features(s, dir)
        .select(col("doc_id"), col("byte_len").cast(LongType).as("byte_len"),
          col("width"), col("height"),
          round(element_at(col("features"), 1).cast(DoubleType), 4).as("f0"))
        .orderBy("doc_id"),
      Some("""
        WITH hx AS (
          SELECT doc_id, hex(encode(text)) h,
                 octet_length(encode(text)) n
          FROM documents),
        b AS (
          SELECT doc_id, n,
            list_transform(range(1, n + 1),
              k -> (strpos('0123456789ABCDEF', substring(h, 2*k - 1, 1)) - 1) * 16
                   + strpos('0123456789ABCDEF', substring(h, 2*k, 1)) - 1) AS bytes
          FROM hx),
        f AS (
          -- n = 0 guards mirror the stub's headOption/lastOption/empty-slice
          -- fallbacks (64/64/0.0); unguarded, DuckDB's out-of-range list
          -- index yields NULL here while Spark emits the defaults
          SELECT doc_id, n,
                 CAST(64 + CASE WHEN n = 0 THEN 0 ELSE bytes[1] % 64 END AS INT) AS width,
                 CAST(64 + CASE WHEN n = 0 THEN 0 ELSE bytes[n] % 64 END AS INT) AS height,
                 greatest(n // 8, 1) AS cnt,
                 CASE WHEN n = 0 THEN 0 ELSE
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, greatest(n // 8, 1) + 1),
                       k -> CAST(bytes[k] AS BIGINT))), (a, x) -> a + x)
                 END AS s0
          FROM b)
        SELECT doc_id, CAST(n AS BIGINT) AS byte_len, width, height,
               round(CAST(CAST(CAST(s0 AS DOUBLE) / cnt / 255.0 AS FLOAT) AS DOUBLE), 4) AS f0
        FROM f
        ORDER BY doc_id""")),

    // ---- frame sampling over binary payloads (oracle-checked) ------------
    // The oracle recovers payload bytes from hex pairs (as media_features
    // does) and recomputes each sampled frame's offset/length/byte-sum.
    GraftQuery(
      "frame_sample",
      (s, dir) => {
        import s.implicits._
        asMedia(s, dir).mapPartitions(frameSample).toDF()
          .orderBy("doc_id", "frame_idx")
      },
      Some(s"""
        WITH hx AS (
          SELECT doc_id, hex(encode(text)) h, octet_length(encode(text)) n
          FROM documents),
        fr AS (
          SELECT doc_id, h, n,
                 unnest(range(0, (n + ${FrameStride - 1}) // $FrameStride,
                              $SampleEvery)) AS fi
          FROM hx)
        SELECT doc_id,
               CAST(fi AS INT) AS frame_idx,
               CAST(fi * $FrameStride AS INT) AS byte_off,
               CAST(least($FrameStride, n - fi * $FrameStride) AS INT) AS frame_len,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   range(fi * $FrameStride + 1,
                         fi * $FrameStride + least($FrameStride, n - fi * $FrameStride) + 1),
                   k -> CAST((strpos('0123456789ABCDEF', substring(h, 2*k - 1, 1)) - 1) * 16
                             + strpos('0123456789ABCDEF', substring(h, 2*k, 1)) - 1 AS BIGINT))),
                 (a, x) -> a + x) AS checksum
        FROM fr
        ORDER BY doc_id, frame_idx"""))
  )
}

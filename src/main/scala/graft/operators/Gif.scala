package graft.operators

/** GIF (GIF89a), pure JVM — the fourth real raster container after BMP,
  * PNG and JPEG, and the remaining common web-image format the near-dup
  * image surface lacked. No library: the logical-screen walk, color
  * tables, extension sub-block skipping, and the variable-width LZW
  * entropy layer (clear/EOI codes, code-width growth to 12 bits, the
  * KwKwK self-referential case) are all implemented here, both
  * directions.
  *
  * Encoder: one full-frame image over a 256-entry grayscale global
  * palette (entry i = (i, i, i)), pixel stream = the source bytes as
  * palette indices zero-padded to the square-ish [[gifGrid]] (width
  * ⌈√n⌉, min 1×1) — GIF is LOSSLESS, so the decoded indices ARE the source
  * bytes, which is what makes gif_decode/gif_phash oracle-replayable
  * from hex. The BT.601 luma of a gray palette entry i is exactly i
  * ((299 + 587 + 114) / 1000 = 1), so the luma stream equals the padded
  * byte stream — no constant for an oracle to drift on.
  *
  * Decoder: strict general subset — GIF87a/89a, global color table
  * required, one image, interlace honored (the spec's four-pass row
  * order — ImageIO's writer emits it), local color table honored if
  * present, extensions skipped by their declared sub-block structure.
  * Every structural promise is CHECKED: declared dimensions vs decoded
  * pixel count, sub-block bounds, LZW codes beyond the dictionary, the
  * mandatory terminator. Pinned in tests against ImageIO's own GIF
  * writer (a foreign encoder with its own sub-block and code-growth
  * choices — the PNG/JPEG discipline).
  */
object Gif {

  /** Square-ish frame geometry, the [[Jpeg.flatGrid]] discipline: width
    * ⌈√n⌉, height ⌈n/width⌉ (min 1×1) — BOTH dimensions stay under the
    * u16 ceiling at any payload size a document lake holds (a fixed
    * narrow width overflows height past ~458 kB, and the LE dimension
    * fields would truncate SILENTLY). Bytes are 1:1 with pixels (palette
    * indices — no triple packing as in BMP/PNG). */
  def gifGrid(n: Int): (Int, Int) = {
    val nv = math.max(1, n)
    val w = math.ceil(math.sqrt(nv.toDouble)).toInt
    (w, (nv + w - 1) / w)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"gif reject: $msg")

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  // ------------------------------------------------------------- encoder

  /** Encode `bytes` as a GIF89a: grayscale global palette, one
    * full-frame non-interlaced image, real variable-width LZW. */
  def encodeGif(bytes: Array[Byte]): Array[Byte] = {
    val n = bytes.length
    val (width, height) = gifGrid(n)
    val indices = new Array[Byte](width * height)
    System.arraycopy(bytes, 0, indices, 0, n)
    val out = new java.io.ByteArrayOutputStream(n + 1024)
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(u16le(width)); out.write(u16le(height))
    out.write(0xf7) // global table, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    out.write(u16le(0)); out.write(u16le(0))
    out.write(u16le(width)); out.write(u16le(height))
    out.write(0)    // no local table, no interlace
    out.write(8)    // LZW minimum code size
    val lzw = lzwEncode(indices, 8)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-flavor LZW compress: clear = 2^min, EOI = clear + 1, codes
    * start at min+1 bits and grow just before the first code of each
    * wider range would be emitted; at 4096 entries the dictionary resets
    * via a clear code. Bit packing is LSB-first. */
  private def lzwEncode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(data.length)
    var cur = 0L
    var bits = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      cur |= code.toLong << bits
      bits += width
      while (bits >= 8) {
        out.write((cur & 0xff).toInt)
        cur >>>= 8
        bits -= 8
      }
    }
    // dictionary: (prefix code << 8 | next byte) -> code, roots implicit.
    // LongMap, NOT java.util.HashMap[Int, Int]: Scala unboxes a missing
    // java-map lookup's null to 0, turning every miss into "code 0"
    var dict = scala.collection.mutable.LongMap.empty[Int]
    var next = eoi + 1
    emit(clear)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (prefix.toLong << 8) | k
        dict.get(key) match {
          case Some(hit) => prefix = hit
          case None =>
            emit(prefix)
            if (next < 4096) {
              dict.update(key, next)
              next += 1
              // grow ONE REGISTRATION LATER than the decoder's
              // next==(1<<width) check: the decoder's dictionary trails
              // the encoder's by exactly one entry, so this is the
              // pairing under which both sides flip width before the
              // same code
              if (next == (1 << width) + 1 && width < 12) width += 1
            } else {
              // dictionary full: reset both sides via a clear code
              emit(clear)
              dict = scala.collection.mutable.LongMap.empty[Int]
              next = eoi + 1
              width = minCodeSize + 1
            }
            prefix = k
        }
        i += 1
      }
      emit(prefix)
    }
    emit(eoi)
    if (bits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  /** One decoded GIF frame: dimensions and the per-pixel RGB triples
    * resolved through the active palette. */
  final case class GifImage(width: Int, height: Int, rgb: Array[Int])

  /** Strict GIF decode (see object header for the subset and the
    * strictness contract). Every violation throws `gif reject: …`. */
  def decodeGif(payload: Array[Byte]): GifImage =
    try decodeUnguarded(payload)
    catch {
      case e: IllegalArgumentException
        if e.getMessage != null && e.getMessage.startsWith("gif reject:") =>
        throw e
      case scala.util.control.NonFatal(e) =>
        fail(s"malformed structure (${e.getClass.getSimpleName})")
    }

  private def decodeUnguarded(payload: Array[Byte]): GifImage = {
    if (payload.length < 14) fail("shorter than any GIF header")
    val magic = new String(payload, 0, 6, "US-ASCII")
    if (magic != "GIF89a" && magic != "GIF87a") fail(s"bad magic '$magic'")
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    val sw = u16(6)
    val sh = u16(8)
    val packed = payload(10) & 0xff
    var o = 13
    val global: Array[Int] =
      if ((packed & 0x80) != 0) {
        val size = 2 << (packed & 7)
        if (o + 3 * size > payload.length) fail("global color table truncated")
        val t = Array.tabulate(size) { i =>
          ((payload(o + 3 * i) & 0xff) << 16) |
            ((payload(o + 3 * i + 1) & 0xff) << 8) |
            (payload(o + 3 * i + 2) & 0xff)
        }
        o += 3 * size
        t
      } else fail("no global color table (required by this lake's subset)")
    // walk blocks to the first image descriptor, skipping extensions by
    // their declared sub-block lengths
    while (o < payload.length && (payload(o) & 0xff) == 0x21) {
      o += 2 // extension introducer + label
      var len = if (o < payload.length) payload(o) & 0xff else fail("extension truncated")
      while (len != 0) {
        o += 1 + len
        if (o >= payload.length) fail("extension sub-blocks run past the file")
        len = payload(o) & 0xff
      }
      o += 1
    }
    if (o >= payload.length || (payload(o) & 0xff) != 0x2c)
      fail("no image descriptor")
    val iw = u16(o + 5)
    val ih = u16(o + 7)
    val ipacked = payload(o + 9) & 0xff
    val interlaced = (ipacked & 0x40) != 0
    if (iw <= 0 || ih <= 0 || iw > sw || ih > sh)
      fail(s"image ${iw}x$ih exceeds the ${sw}x$sh screen")
    o += 10
    val palette: Array[Int] =
      if ((ipacked & 0x80) != 0) {
        val size = 2 << (ipacked & 7)
        if (o + 3 * size > payload.length) fail("local color table truncated")
        val t = Array.tabulate(size) { i =>
          ((payload(o + 3 * i) & 0xff) << 16) |
            ((payload(o + 3 * i + 1) & 0xff) << 8) |
            (payload(o + 3 * i + 2) & 0xff)
        }
        o += 3 * size
        t
      } else global
    if (o >= payload.length) fail("missing LZW minimum code size")
    val minCode = payload(o) & 0xff
    if (minCode < 2 || minCode > 8) fail(s"LZW min code size $minCode")
    o += 1
    // concatenate the data sub-blocks
    val data = new java.io.ByteArrayOutputStream(payload.length - o)
    var len = if (o < payload.length) payload(o) & 0xff else fail("image data truncated")
    while (len != 0) {
      if (o + 1 + len > payload.length) fail("image sub-block runs past the file")
      data.write(payload, o + 1, len)
      o += 1 + len
      if (o >= payload.length) fail("image data missing its terminator")
      len = payload(o) & 0xff
    }
    o += 1
    if (o >= payload.length || (payload(o) & 0xff) != 0x3b)
      fail("missing GIF trailer")
    val raw = lzwDecode(data.toByteArray, minCode, iw * ih)
    // interlaced streams carry the rows in the spec's four passes
    // (0,8,16…; 4,12…; 2,6,10…; 1,3,5…) — remap to natural order
    val indices =
      if (!interlaced) raw
      else {
        val out = new Array[Byte](raw.length)
        val starts = Array(0, 4, 2, 1)
        val steps = Array(8, 8, 4, 2)
        var src = 0
        var p = 0
        while (p < 4) {
          var y = starts(p)
          while (y < ih) {
            System.arraycopy(raw, src * iw, out, y * iw, iw)
            src += 1
            y += steps(p)
          }
          p += 1
        }
        out
      }
    val rgb = new Array[Int](iw * ih)
    var i = 0
    while (i < indices.length) {
      val idx = indices(i) & 0xff
      if (idx >= palette.length) fail(s"pixel index $idx outside the palette")
      rgb(i) = palette(idx)
      i += 1
    }
    GifImage(iw, ih, rgb)
  }

  /** GIF-flavor LZW decompress into exactly `expected` indices: variable
    * code width with growth at dictionary boundaries, clear resets, the
    * KwKwK case, and strict bounds (a code beyond the next free slot, or
    * a stream that over/under-fills the raster, rejects). */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var produced = 0
    // dictionary as (prefix pointer, tail byte) parallel arrays
    val prefix = new Array[Int](4096)
    val tail = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var next = 0
    var width = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) { prefix(i) = -1; tail(i) = i.toByte; length(i) = 1; i += 1 }
      next = eoi + 1
      width = minCodeSize + 1
    }
    reset()
    var cur = 0L
    var bits = 0
    var pos = 0
    var prev = -1
    def read(): Int = {
      while (bits < width) {
        if (pos >= data.length) return -1
        cur |= (data(pos) & 0xffL) << bits
        pos += 1
        bits += 8
      }
      val code = (cur & ((1L << width) - 1)).toInt
      cur >>>= width
      bits -= width
      code
    }
    def write(code: Int): Unit = {
      // expand back-to-front via the prefix chain
      val l = length(code)
      if (produced + l > expected) fail("LZW stream overfills the raster")
      var c = code
      var i = produced + l - 1
      while (c >= 0) { out(i) = tail(c); c = prefix(c); i -= 1 }
      produced += l
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      tail(c)
    }
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) fail("LZW stream truncated before EOI")
      if (code == clear) { reset(); prev = -1 }
      else if (code == eoi) done = true
      else if (prev < 0) {
        // first code after a clear must be a root (spec)
        if (code >= clear) fail(s"first LZW code $code is not a root")
        write(code)
        prev = code
      } else if (code < next) {
        // known string: register (prev-string + its first byte) FIRST —
        // that is the entry the encoder registered before emitting this
        // code — then expand. A full dictionary just stops registering
        // (the deferred-clear convention real encoders use).
        if (next < 4096) {
          prefix(next) = prev
          tail(next) = firstByte(code)
          length(next) = length(prev) + 1
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        write(code)
        prev = code
      } else if (code == next && next < 4096) {
        // KwKwK: the code references the entry being defined — its
        // string is prev-string + prev's first byte
        prefix(next) = prev
        tail(next) = firstByte(prev)
        length(next) = length(prev) + 1
        next += 1
        if (next == (1 << width) && width < 12) width += 1
        write(code)
        prev = code
      } else fail(s"LZW code $code beyond the dictionary ($next)")
    }
    if (produced != expected)
      fail(s"LZW produced $produced of $expected pixels")
    out
  }
}

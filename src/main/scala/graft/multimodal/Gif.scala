package graft.multimodal

/** From-spec GIF89a codec with a hand-rolled variable-width LZW
  * coder — the second REAL compressed-image format next to [[Jpeg]]
  * and [[Png]], and the one whose entropy coder is implemented from
  * the spec with no JDK delegation at all (PNG rides the JDK's
  * DEFLATE; the LZW here is all ours, both directions).
  *
  * GIF is lossless over palette indices, so ANY index field
  * round-trips exactly and every decoded feature replays
  * arithmetically in the oracle. The classic traps are exercised on
  * purpose:
  *
  *  - codes pack LSB-FIRST into the byte stream at a width that GROWS
  *    (9→10→11→12 bits) exactly when the decoder's table fills to the
  *    current width's capacity — an off-by-one in the bump point
  *    desynchronizes every later code;
  *  - the encoder references entries the decoder has not built yet
  *    (the KwKwK case — `code == next` in the decoder) whenever a
  *    run repeats, so a decoder missing that special case corrupts
  *    runs;
  *  - on table overflow (4096 codes) the encoder emits a CLEAR and
  *    resets — the largest payload variant is sized to cross it;
  *  - compressed bytes split into <=255-byte SUB-BLOCKS that must be
  *    reassembled, and a Graphic Control Extension precedes the image
  *    descriptor so parsers must skip extension blocks they don't
  *    understand.
  *
  * Reference behavior: same intake position as [[Png]] — the decode
  * step before visual features; see the multimodal plumbing notes in
  * [[Multimodal]].
  */
object Gif {

  private val MinCodeSize = 8
  private val ClearCode = 256
  private val EoiCode = 257

  /** LSB-first bit packer. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code << nbits
      nbits += width
      while (nbits >= 8) {
        out.write(acc & 0xff); acc >>>= 8; nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) out.write(acc & 0xff)
      out.toByteArray
    }
  }

  /** GIF-variant LZW encode of 8-bit palette indices. */
  private def lzwEncode(indices: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    var width = MinCodeSize + 1
    var next = EoiCode + 1
    // (prefix code << 8 | suffix byte) -> code
    var dict = new java.util.HashMap[Integer, Integer](8192)
    bw.write(ClearCode, width)
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        bw.write(cur, width)
        if (next == 4096) {
          // table full: clear and restart (decoder resets in lockstep)
          bw.write(ClearCode, width)
          dict = new java.util.HashMap[Integer, Integer](8192)
          width = MinCodeSize + 1
          next = EoiCode + 1
        } else {
          dict.put(key, Integer.valueOf(next))
          next += 1
          // the decoder bumps after building entry (next-1), i.e.
          // before READING the first code that needs the wider field;
          // the encoder is one entry ahead, hence the +1 threshold
          if (next > (1 << width) && width < 12) width += 1
        }
        cur = k
      }
      i += 1
    }
    bw.write(cur, width)
    bw.write(EoiCode, width)
    bw.finish()
  }

  /** GIF-variant LZW decode to `expected` 8-bit indices; None on any
    * malformation (bad code, truncation, missing special case data). */
  private def lzwDecode(data: Array[Byte], expected: Int)
      : Option[Array[Byte]] = {
    val out = new Array[Byte](expected)
    var got = 0
    var bitPos = 0L
    def read(width: Int): Int = {
      if (bitPos + width > data.length.toLong * 8) return -1
      var v = 0; var i = 0
      while (i < width) {
        val bp = bitPos + i
        val byte = data((bp >> 3).toInt) & 0xff
        v |= ((byte >> (bp & 7).toInt) & 1) << i
        i += 1
      }
      bitPos += width
      v
    }
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var width = MinCodeSize + 1
    var next = EoiCode + 1
    var prev = -1
    var done = false
    def emit(code: Int): Byte = {
      // unwind the chain onto the stack, emit in reverse
      var c = code; var sp = 0
      while (c >= ClearCode + 2) {
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      val first = c.toByte
      if (got + sp + 1 > expected) { got = expected + 1; return first }
      out(got) = first; got += 1
      while (sp > 0) { sp -= 1; out(got) = stack(sp); got += 1 }
      first
    }
    while (!done && got <= expected) {
      val code = read(width)
      if (code < 0) return None
      if (code == ClearCode) {
        width = MinCodeSize + 1; next = EoiCode + 1; prev = -1
      } else if (code == EoiCode) {
        done = true
      } else if (prev < 0) {
        if (code > 255) return None
        emit(code)
        prev = code
      } else {
        var firstOfEntry: Byte = 0
        if (code < next && (code < ClearCode || code >= EoiCode + 1)) {
          firstOfEntry = emit(code)
        } else if (code == next) {
          // KwKwK: entry = str(prev) + first(str(prev))
          firstOfEntry = emit(prev)
          if (got <= expected) {
            if (got == expected) return None // entry overruns the image
            out(got) = firstOfEntry; got += 1
          }
        } else return None
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = firstOfEntry
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (got == expected) Some(out) else None
  }

  /** Serialize 8-bit palette indices (row-major top-down) plus the
    * deterministic 256-entry palette as a GIF89a stream. */
  def build(w: Int, h: Int, indices: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h)
    val b = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
    b.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    b.write(0xf7) // global color table, 8-bit color resolution, 256 entries
    b.write(0); b.write(0)
    var i = 0
    while (i < 256) { // deterministic palette the oracle replays
      b.write((i * 7) % 256); b.write((i * 5) % 256); b.write((i * 3) % 256)
      i += 1
    }
    // Graphic Control Extension: parsers must skip unknown extensions
    b.write(0x21); b.write(0xf9); b.write(4)
    b.write(0); le16(0); b.write(0); b.write(0)
    b.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    b.write(0) // no local table, not interlaced
    b.write(MinCodeSize)
    val z = lzwEncode(indices)
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      b.write(n); b.write(z, off, n)
      off += n
    }
    b.write(0)    // block terminator
    b.write(0x3b) // trailer
    b.toByteArray
  }

  /** Parse a GIF: (w, h, indices, palette as 0xRRGGBB) or None. Only
    * the first image of a non-interlaced 256-color stream. */
  def parse(payload: Array[Byte])
      : Option[(Int, Int, Array[Byte], Array[Int])] = {
    if (payload == null || payload.length < 13) return None
    val magic = new String(payload, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    def u16(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    val sw = u16(6); val sh = u16(8)
    val flags = payload(10) & 0xff
    var off = 13
    var palette: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (off + 3 * n > payload.length) return None
      palette = Array.tabulate(n) { j =>
        ((payload(off + 3 * j) & 0xff) << 16) |
          ((payload(off + 3 * j + 1) & 0xff) << 8) |
          (payload(off + 3 * j + 2) & 0xff)
      }
      off += 3 * n
    }
    while (off < payload.length) {
      (payload(off) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks, skip
          off += 2
          while (off < payload.length && payload(off) != 0)
            off += 1 + (payload(off) & 0xff)
          off += 1
        case 0x2c => // image descriptor
          if (off + 10 > payload.length) return None
          val iw = u16(off + 5); val ih = u16(off + 7)
          if (iw > sw || ih > sh) return None // image exceeds logical screen
          val iflags = payload(off + 9) & 0xff
          if ((iflags & 0x40) != 0) return None // interlaced: out of profile
          off += 10
          if ((iflags & 0x80) != 0) { // local palette wins
            val n = 2 << (iflags & 7)
            if (off + 3 * n > payload.length) return None
            palette = Array.tabulate(n) { j =>
              ((payload(off + 3 * j) & 0xff) << 16) |
                ((payload(off + 3 * j + 1) & 0xff) << 8) |
                (payload(off + 3 * j + 2) & 0xff)
            }
            off += 3 * n
          }
          if (palette == null || off >= payload.length) return None
          if (payload(off) != MinCodeSize) return None // 256-color profile
          off += 1
          val z = new java.io.ByteArrayOutputStream()
          while (off < payload.length && payload(off) != 0) {
            val n = payload(off) & 0xff
            if (off + 1 + n > payload.length) return None
            z.write(payload, off + 1, n)
            off += 1 + n
          }
          if (off >= payload.length) return None
          if (iw <= 0 || ih <= 0 || iw > 16384 || ih > 16384) return None
          if (iw.toLong * ih > (1 << 26)) return None
          return lzwDecode(z.toByteArray, iw * ih)
            .map(idx => (iw, ih, idx, palette))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }
}

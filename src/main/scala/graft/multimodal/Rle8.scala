package graft.multimodal

/** From-spec Microsoft RLE8 (BI_RLE8) video frame codec — REAL
  * TEMPORAL compression: the format's escape codes let a DELTA frame
  * skip over unchanged pixels (the decoder keeps the previous frame's
  * content there), so a static background costs nothing after the
  * keyframe. This is the inter-frame tier a zero-dependency JVM can
  * implement honestly from the public BMP/AVI RLE8 documentation;
  * motion-compensated DCT codecs (H.264 class) remain out of reach.
  *
  * Wire format (2-byte units, per the Windows bitmap spec):
  *  - `(n > 0, v)`  — run: repeat palette index v, n times;
  *  - `(0, 0)`      — end of line (position moves to start of next
  *                    storage row);
  *  - `(0, 1)`      — end of bitmap;
  *  - `(0, 2) (dx, dy)` — DELTA: skip dx pixels right and dy rows
  *                    forward, leaving whatever the buffer holds
  *                    (previous frame content — the temporal skip);
  *  - `(0, n >= 3)` — absolute: n literal indices follow, padded to
  *                    an even byte boundary.
  *
  * Rows are in storage order (bottom-up like [[Multimodal.Bmp]]).
  * The decoder bounds-checks every write and returns None on any
  * overrun, bad escape, or missing end-of-bitmap.
  */
object Rle8 {

  /** RLE8-encode one row span [x0, x1) of `cur` as run pairs. */
  private def encodeRuns(out: java.io.ByteArrayOutputStream,
      cur: Array[Byte], rowOff: Int, x0: Int, x1: Int): Unit = {
    var x = x0
    while (x < x1) {
      val v = cur(rowOff + x)
      var n = 1
      while (x + n < x1 && cur(rowOff + x + n) == v && n < 255) n += 1
      out.write(n); out.write(v & 0xff)
      x += n
    }
  }

  /** Encode a KEYFRAME: every pixel, row by row. */
  def encodeKey(w: Int, h: Int, frame: Array[Byte]): Array[Byte] = {
    require(frame.length == w * h)
    val out = new java.io.ByteArrayOutputStream()
    var row = 0
    while (row < h) {
      encodeRuns(out, frame, row * w, 0, w)
      if (row < h - 1) { out.write(0); out.write(0) } // end of line
      row += 1
    }
    out.write(0); out.write(1) // end of bitmap
    out.toByteArray
  }

  /** Encode a DELTA frame against `prev`: unchanged pixels are skipped
    * with delta escapes (bounded at 255 per hop), only changed spans
    * emit runs. */
  def encodeDelta(w: Int, h: Int, prev: Array[Byte],
      cur: Array[Byte]): Array[Byte] = {
    require(prev.length == w * h && cur.length == w * h)
    val out = new java.io.ByteArrayOutputStream()
    var posX = 0; var posRow = 0
    def skipTo(x: Int, row: Int): Unit = {
      // delta escapes only move RIGHT and FORWARD; a target left of
      // the cursor on a later row needs one end-of-line first (EOL
      // advances a row and resets x to 0 — same as in the decoder)
      if (row > posRow && x < posX) {
        out.write(0); out.write(0); posRow += 1; posX = 0
      }
      while (posRow < row || posX < x) {
        val dy = math.min(row - posRow, 255)
        val dx = if (posRow + dy == row) math.min(x - posX, 255) else 0
        out.write(0); out.write(2); out.write(dx); out.write(dy)
        posX += dx; posRow += dy
      }
    }
    var row = 0
    while (row < h) {
      val off = row * w
      var x = 0
      while (x < w) {
        if (cur(off + x) != prev(off + x)) {
          var end = x
          while (end < w && cur(off + end) != prev(off + end)) end += 1
          skipTo(x, row)
          encodeRuns(out, cur, off, x, end)
          posX = end
          x = end
        } else x += 1
      }
      row += 1
    }
    out.write(0); out.write(1)
    out.toByteArray
  }

  /** Decode one frame: `prev` is None for a keyframe (buffer starts
    * zeroed) or the previous frame for a delta. Returns None on any
    * malformation. */
  def decode(w: Int, h: Int, data: Array[Byte],
      prev: Option[Array[Byte]]): Option[Array[Byte]] = {
    if (data == null || w <= 0 || h <= 0) return None
    val buf = prev match {
      case Some(p) => if (p.length != w * h) return None else p.clone()
      case None => new Array[Byte](w * h)
    }
    var i = 0
    var x = 0; var row = 0
    while (i + 2 <= data.length) {
      val a = data(i) & 0xff; val b = data(i + 1) & 0xff
      i += 2
      if (a > 0) { // run
        if (row >= h || x + a > w) return None
        java.util.Arrays.fill(buf, row * w + x, row * w + x + a, b.toByte)
        x += a
      } else b match {
        case 0 => // end of line
          x = 0; row += 1
          if (row > h) return None
        case 1 => return Some(buf) // end of bitmap
        case 2 => // delta skip
          if (i + 2 > data.length) return None
          x += data(i) & 0xff; row += data(i + 1) & 0xff
          i += 2
          if (row > h || x > w) return None
        case n => // absolute run of n literals, word-aligned
          if (row >= h || x + n > w || i + n > data.length) return None
          var k = 0
          while (k < n) { buf(row * w + x + k) = data(i + k); k += 1 }
          x += n
          i += n + (n & 1)
      }
    }
    None // ran out of data without end-of-bitmap
  }

  /** Encode a frame sequence: keyframe + deltas. Returns the per-frame
    * encoded chunks (the AVI 00dc payloads). */
  def encodeVideo(w: Int, h: Int,
      frames: Seq[Array[Byte]]): Seq[Array[Byte]] = {
    require(frames.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    out += encodeKey(w, h, frames.head)
    var prev = frames.head
    frames.tail.foreach { f =>
      out += encodeDelta(w, h, prev, f)
      prev = f
    }
    out.toSeq
  }

  /** Decode a frame sequence (first chunk keyframe, rest deltas). */
  def decodeVideo(w: Int, h: Int,
      chunks: Seq[Array[Byte]]): Option[Seq[Array[Byte]]] = {
    if (chunks == null || chunks.isEmpty) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var prev: Option[Array[Byte]] = None
    chunks.foreach { c =>
      decode(w, h, c, prev) match {
        case Some(f) => out += f; prev = Some(f)
        case None => return None
      }
    }
    Some(out.toSeq)
  }
}

package graft.multimodal

/** From-spec INTRA-DCT video codec with CONDITIONAL-REPLENISHMENT
  * P-frames — the motion-vector-free tier of MPEG-class video, built
  * entirely from machinery already proven here: every replenished
  * block rides the real baseline-JPEG pipeline ([[Jpeg]] — forward
  * DCT, quantize, zigzag, Huffman, byte stuffing), and unchanged
  * blocks are SKIPPED per frame exactly like [[Rle8]]'s delta
  * escapes, so a static background costs one keyframe. Conditional
  * replenishment is the textbook pre-motion-compensation design
  * (H.261's ancestor: transmit only the blocks that changed); the
  * motion-compensated tier above it — block displacement search,
  * vectors + DCT residuals on the wire — is [[Mcv]]; bidirectional
  * frames are [[Gop]]; both carry half-pel vectors since round 13.
  *
  * Wire format (little-endian):
  *  - magic `DCTV`, u16 width, u16 height, u16 n_frames;
  *  - I-frame: u32 length + a full 4:2:0 baseline JPEG (flat chroma);
  *  - each P-frame: a 1-bit-per-8x8-block replenishment BITMAP
  *    (row-major, LSB-first within each byte), then u32 length + a
  *    JPEG "strip" holding ONLY the replenished blocks, packed four
  *    per 16x16 MCU, at most 64 MCUs per row, wrapping into further
  *    16-pixel rows (length 0 ⇔ nothing changed).
  *
  * The encoder is CLOSED-LOOP: change detection and the reference
  * frame use the DECODED previous frame, not the original, so
  * encoder and decoder references can never diverge (the standard
  * codec-design rule). With [[Jpeg]]'s all-ones quantization, flat
  * 8x8 blocks round-trip bit-exactly, which is what lets a catalog
  * oracle replay decoded masses arithmetically.
  *
  * The parser fails closed on everything hostile (the CodecFuzzSpec
  * contract): Long cursor, dimension caps, bitmap/strip length
  * bounds, per-strip JPEG validation, and a replenished-count ↔
  * strip-capacity cross-check.
  */
object Dctv {

  private val MaxDim = 4096
  private val MaxFrames = 64
  // total decoded output cap (bytes across all frames): an all-zero
  // bitmap P-frame legitimately costs only bmLen+4 payload bytes (the
  // codec's whole point for static video), so a payload-proportional
  // bound would defeat the format — instead the decoder bounds the
  // ABSOLUTE allocation a hostile header can demand (the Y4M
  // dimension-overflow posture, adapted for temporal skip)
  private val MaxDecodedBytes = 1L << 26

  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  /** Strip geometry for n blocks: four per 16x16 MCU, at most 64 MCUs
    * per row (strip width ≤ 1024), wrapping into further 16-pixel MCU
    * rows — a near-full-frame replenishment of a MaxDim video packs
    * into a tall strip instead of blowing the JPEG width cap. */
  private[multimodal] def stripDims(n: Int): (Int, Int, Int) = {
    val m = (n + 3) / 4
    val cols = math.min(m, 64)
    val rows = (m + cols - 1) / cols
    (16 * cols, 16 * rows, cols)
  }

  private[multimodal] def blockPos(i: Int, cols: Int, w: Int): Int = {
    val mcu = i / 4
    val ox = (mcu % cols) * 16 + (i % 2) * 8
    val oy = (mcu / cols) * 16 + ((i % 4) / 2) * 8
    oy * w + ox
  }

  /** Pack n 8x8 luma blocks into a 4:2:0 JPEG strip (unused slots and
    * chroma flat at 128). */
  private[multimodal] def encodeStrip(blocks: Array[Array[Byte]]): Array[Byte] = {
    val (w, h, cols) = stripDims(blocks.length)
    val y = Array.fill[Byte](w * h)(128.toByte)
    var i = 0
    while (i < blocks.length) {
      val base = blockPos(i, cols, w)
      var r = 0
      while (r < 8) {
        System.arraycopy(blocks(i), r * 8, y, base + r * w, 8)
        r += 1
      }
      i += 1
    }
    val c = Array.fill[Byte]((w / 2) * (h / 2))(128.toByte)
    Jpeg.build(w, h, y, c, c)
  }

  /** Unpack the first n blocks of a strip; None if the strip is not a
    * valid JPEG of exactly the geometry the encoder emits for n. */
  private[multimodal] def decodeStrip(strip: Array[Byte],
      n: Int): Option[Array[Array[Byte]]] = {
    val (ew, eh, cols) = stripDims(n)
    Jpeg.parse(strip) match {
      case Some((w, h, planes))
          if w == ew && h == eh && planes.nonEmpty =>
        val y = planes(0)
        Some(Array.tabulate(n) { i =>
          val base = blockPos(i, cols, w)
          val blk = new Array[Byte](64)
          var r = 0
          while (r < 8) {
            System.arraycopy(y, base + r * w, blk, r * 8, 8)
            r += 1
          }
          blk
        })
      case _ => None
    }
  }

  private[multimodal] def grabBlock(plane: Array[Byte], w: Int, bx: Int,
      by: Int): Array[Byte] = {
    val blk = new Array[Byte](64)
    var r = 0
    while (r < 8) {
      System.arraycopy(plane, (by * 8 + r) * w + bx * 8, blk, r * 8, 8)
      r += 1
    }
    blk
  }

  private[multimodal] def putBlock(plane: Array[Byte], w: Int, bx: Int, by: Int,
      blk: Array[Byte]): Unit = {
    var r = 0
    while (r < 8) {
      System.arraycopy(blk, r * 8, plane, (by * 8 + r) * w + bx * 8, 8)
      r += 1
    }
  }

  /** Encode luma frames (w·h bytes each, dims multiples of 16). */
  def build(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0 && w > 0 && h > 0 &&
      w <= MaxDim && h <= MaxDim)
    require(frames.nonEmpty && frames.length <= MaxFrames &&
      frames.forall(_.length == w * h))
    require(w.toLong * h * frames.length <= MaxDecodedBytes,
      "stream exceeds the decoder's total-output cap")
    val out = new java.io.ByteArrayOutputStream()
    out.write("DCTV".getBytes("US-ASCII"))
    le16(out, w); le16(out, h); le16(out, frames.length)
    val flatC = Array.fill[Byte]((w / 2) * (h / 2))(128.toByte)
    val iFrame = Jpeg.build(w, h, frames.head, flatC, flatC)
    le32(out, iFrame.length); out.write(iFrame)
    // closed loop: the reference is the DECODED I-frame
    val ref = Jpeg.parse(iFrame)
      .getOrElse(throw new IllegalStateException("i-frame self-decode"))
      ._3(0)
    val wb = w / 8; val hb = h / 8
    frames.tail.foreach { cur =>
      val bitmap = new Array[Byte]((wb * hb + 7) / 8)
      val blocks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var by = 0
      while (by < hb) {
        var bx = 0
        while (bx < wb) {
          var changed = false
          var r = 0
          while (r < 8 && !changed) {
            var c2 = 0
            val off = (by * 8 + r) * w + bx * 8
            while (c2 < 8 && !changed) {
              if (cur(off + c2) != ref(off + c2)) changed = true
              c2 += 1
            }
            r += 1
          }
          if (changed) {
            val idx = by * wb + bx
            bitmap(idx / 8) = (bitmap(idx / 8) | (1 << (idx % 8))).toByte
            blocks += ((bx, by))
          }
          bx += 1
        }
        by += 1
      }
      out.write(bitmap)
      if (blocks.isEmpty) le32(out, 0)
      else {
        val strip = encodeStrip(
          blocks.map { case (bx, by) => grabBlock(cur, w, bx, by) }.toArray)
        le32(out, strip.length); out.write(strip)
        // closed loop: scatter the DECODED strip into the reference
        val dec = decodeStrip(strip, blocks.length)
          .getOrElse(throw new IllegalStateException("strip self-decode"))
        blocks.zipWithIndex.foreach { case ((bx, by), i) =>
          putBlock(ref, w, bx, by, dec(i))
        }
      }
    }
    out.toByteArray
  }

  /** Parse + decode: (w, h, decoded luma frames) or None. */
  def parse(payload: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (payload == null || payload.length < 14) return None
    if (payload(0) != 'D' || payload(1) != 'C' || payload(2) != 'T' ||
      payload(3) != 'V') return None
    def u16(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      ((payload(o) & 0xffL)) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    val w = u16(4); val h = u16(6); val nf = u16(8)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
      w % 16 != 0 || h % 16 != 0) return None
    if (nf < 1 || nf > MaxFrames) return None
    if (w.toLong * h * nf > MaxDecodedBytes) return None
    val wb = w / 8; val hb = h / 8
    var off = 10L
    val iLen = u32(off.toInt)
    if (iLen <= 0 || off + 4 + iLen > payload.length) return None
    val iBytes = java.util.Arrays.copyOfRange(payload,
      (off + 4).toInt, (off + 4 + iLen).toInt)
    off += 4 + iLen
    val first = Jpeg.parse(iBytes) match {
      case Some((pw, ph, planes))
          if pw == w && ph == h && planes.nonEmpty => planes(0)
      case _ => return None
    }
    val frames = scala.collection.mutable.ArrayBuffer(first)
    var ref = first
    var f = 1
    while (f < nf) {
      val bmLen = (wb * hb + 7) / 8
      if (off + bmLen + 4 > payload.length) return None
      val bitmap = java.util.Arrays.copyOfRange(payload, off.toInt,
        (off + bmLen).toInt)
      off += bmLen
      // canonical-encoding strictness: the encoder can never set a
      // padding bit at index >= wb*hb in the final bitmap byte, so a
      // stream carrying one is non-canonical — reject it like trailing
      // garbage and zero-length mismatches
      var pad = wb * hb
      while (pad < bmLen * 8) {
        if ((bitmap(pad / 8) & (1 << (pad % 8))) != 0) return None
        pad += 1
      }
      var n = 0
      var i = 0
      while (i < wb * hb) {
        if ((bitmap(i / 8) & (1 << (i % 8))) != 0) n += 1
        i += 1
      }
      val sLen = u32(off.toInt)
      if (sLen < 0 || off + 4 + sLen > payload.length) return None
      val cur = ref.clone()
      if (n == 0) {
        if (sLen != 0) return None
        off += 4
      } else {
        if (sLen == 0) return None
        val strip = java.util.Arrays.copyOfRange(payload,
          (off + 4).toInt, (off + 4 + sLen).toInt)
        off += 4 + sLen
        val dec = decodeStrip(strip, n) match {
          case Some(d) => d
          case None    => return None
        }
        var k = 0
        i = 0
        while (i < wb * hb) {
          if ((bitmap(i / 8) & (1 << (i % 8))) != 0) {
            putBlock(cur, w, i % wb, i / wb, dec(k))
            k += 1
          }
          i += 1
        }
      }
      frames += cur
      ref = cur
      f += 1
    }
    if (off != payload.length) return None // trailing garbage
    Some((w, h, frames.toSeq))
  }
}

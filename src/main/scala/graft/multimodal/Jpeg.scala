package graft.multimodal

/** A REAL compressed-image codec, pure JVM, from the public JPEG
  * specification (ITU-T T.81 — sequential baseline DCT): encoder and
  * decoder for 8-bit 3-component YCbCr 4:2:0 JFIF-style streams.
  * This closes the one remaining "stubbed" capability of the
  * multimodal layer: [[Wav]]/[[Bmp]]/[[Y4m]] made the UNCOMPRESSED
  * containers real in round 9; this makes genuinely ENTROPY-CODED
  * bytes decodable with zero external libraries.
  *
  * The decoder does the honest full pipeline — marker walk with
  * length-checked segment skips (COM/APPn), multi-table DQT/DHT
  * segments, canonical Huffman table construction from (bits, vals),
  * MSB-first bit reading with 0xFF00 byte-unstuffing, RSTn restart
  * handling with DC-predictor resets, run-length AC decode
  * (EOB/ZRL/extend), dezigzag, dequantization, separable double IDCT,
  * level shift + clamp, and interleaved-MCU plane assembly for
  * arbitrary 1-2 sampling factors (4:2:0 / 4:2:2 / 4:4:4). The
  * encoder is the exact inverse (forward DCT, quantize, zigzag,
  * run-length Huffman, byte stuffing, restart markers) so the round
  * trip is provable end-to-end, the [[Wav]]/[[Bmp]] discipline.
  *
  * Deliberate traps the encoder plants for naive parsers (the T248-250
  * tradition): a COM segment between SOI and DQT (fixed-offset readers
  * break), BOTH quant tables in one DQT segment and all FOUR Huffman
  * tables in one DHT segment (single-table-per-segment readers lose
  * sync), a restart interval of 2 MCUs (decoders that ignore DRI
  * desynchronize at the first RST and mis-predict every later DC),
  * and natural 0xFF bytes in the entropy stream (un-unstuffed readers
  * shear the bit stream).
  *
  * Huffman tables are the T.81 Annex-K-shaped standard tables; their
  * structural invariants (162 distinct AC symbols covering every
  * (run, size) pair, canonical code-length feasibility) are
  * `require`d at class-load so a transcription slip fails fast — and
  * because the tables ride in the DHT segments, encoder and decoder
  * agree by construction. Quantization uses all-ones tables: the
  * machinery (divide-round-multiply) runs unmodified, while flat
  * 8x8 blocks round-trip bit-exactly (DC = 8·(a−128) is exact in
  * double; every AC quantizes to 0), which is what lets the catalog
  * oracle replay decoded-pixel features arithmetically.
  *
  * Reference behavior: codefordemocracy/data stores media as opaque
  * payloads and defers decode to service-side libraries; this engine
  * makes the decode itself a first-class distributed operator.
  */
object Jpeg {

  /** Natural-order index of the k-th zigzag coefficient (T.81 fig 5). */
  private[multimodal] val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Huffman tables (T.81 Annex K shape) --------------------------

  /** bits(i) = #codes of length i+1 (16 entries); vals in code order. */
  private[multimodal] final case class HuffSpec(
      bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 16 && bits.sum == vals.length &&
      vals.distinct.length == vals.length,
      "huffman spec: bits/vals inconsistent")
    // canonical feasibility (Kraft): strictly under 1 so no all-ones
    // code of length 16 is forced
    require(bits.zipWithIndex.map { case (n, i) =>
      n.toLong << (16 - (i + 1)) }.sum < (1L << 16),
      "huffman spec: over-subscribed code space")
  }

  private val dcLumaSpec = HuffSpec(
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val dcChromaSpec = HuffSpec(
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    (0 to 11).toArray)

  /** Every (run, size) symbol for size 1..10 plus EOB (0x00) and ZRL
    * (0xF0) must appear exactly once — `require`d below so the AC
    * encoder can never meet a symbol its table cannot code. */
  private def checkAcComplete(spec: HuffSpec): HuffSpec = {
    val want = (Seq(0x00, 0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toSet
    require(spec.vals.toSet == want, "AC table: symbol set incomplete")
    spec
  }

  private val acLumaSpec = checkAcComplete(HuffSpec(
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
      0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
      0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52,
      0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
      0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2a,
      0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57,
      0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
      0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83,
      0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93, 0x94,
      0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8,
      0xd9, 0xda, 0xe1, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8,
      0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa)))

  private val acChromaSpec = checkAcComplete(HuffSpec(
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
      0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
      0x08, 0x14, 0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33,
      0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
      0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
      0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56,
      0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
      0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a,
      0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92,
      0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
      0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6,
      0xd7, 0xd8, 0xd9, 0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7,
      0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa)))

  /** Canonical encode table: symbol -> (code, length). */
  private def encodeTable(spec: HuffSpec): Array[(Int, Int)] = {
    val t = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    for (len <- 1 to 16) {
      for (_ <- 0 until spec.bits(len - 1)) {
        t(spec.vals(k)) = (code, len); code += 1; k += 1
      }
      code <<= 1
    }
    t
  }

  private val dcLumaEnc = encodeTable(dcLumaSpec)
  private val acLumaEnc = encodeTable(acLumaSpec)
  private val dcChromaEnc = encodeTable(dcChromaSpec)
  private val acChromaEnc = encodeTable(acChromaSpec)

  /** Canonical decode table: per code length, the first code value,
    * the index of its first symbol, and the symbol count. */
  private[multimodal] final class HuffDecoder(spec: HuffSpec) {
    val firstCode = new Array[Int](17)
    val firstIdx = new Array[Int](17)
    val count = new Array[Int](17)
    val vals: Array[Int] = spec.vals
    private var code = 0; private var k = 0
    for (len <- 1 to 16) {
      firstCode(len) = code; firstIdx(len) = k; count(len) = spec.bits(len - 1)
      code = (code + spec.bits(len - 1)) << 1; k += spec.bits(len - 1)
    }
  }

  // ---- DCT -----------------------------------------------------------

  /** cosT(x)(u) = cos((2x+1)·u·π/16). */
  private val cosT: Array[Array[Double]] = Array.tabulate(8, 8) {
    (x, u) => math.cos((2 * x + 1) * u * math.Pi / 16)
  }
  private def cc(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 8x8 DCT of level-shifted samples (row-major). */
  private def fdct(f: Array[Double]): Array[Double] = {
    // separable: rows then columns
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += f(y * 8 + x) * cosT(x)(u); x += 1 }
        tmp(y * 8 + u) = s; u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * cosT(yy)(v); yy += 1 }
        out(v * 8 + u) = 0.25 * cc(u) * cc(v) * s; v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 8x8 DCT -> level-shifted samples (row-major). */
  private def idct(coef: Array[Int]): Array[Double] = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += cc(u) * coef(v * 8 + u) * cosT(x)(u); u += 1 }
        tmp(v * 8 + x) = s; x += 1
      }
      v += 1
    }
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += cc(vv) * tmp(vv * 8 + x) * cosT(y)(vv); vv += 1 }
        out(y * 8 + x) = 0.25 * s; x += 1
      }
      y += 1
    }
    out
  }

  // ---- bit IO --------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad to byte boundary with 1-bits (T.81 B.2.1.1). */
    def align(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private final class ParseFail extends RuntimeException

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    private def fail(): Nothing = throw new ParseFail
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) fail()
        val v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) fail()
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed data byte
          else fail() // a marker mid-entropy-run is malformed here
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: HuffDecoder): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        code = (code << 1) | bit(); len += 1
        if (h.count(len) > 0 && code - h.firstCode(len) < h.count(len) &&
          code >= h.firstCode(len))
          return h.vals(h.firstIdx(len) + code - h.firstCode(len))
      }
      fail()
    }
    /** Byte-align and consume the expected RSTm marker. */
    def restart(m: Int): Unit = {
      n = 0
      if (pos + 2 > b.length) fail()
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + m)) fail()
      pos += 2
    }
  }

  // ---- encoder -------------------------------------------------------

  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a > 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one 8x8 block; returns the new DC predictor. Samples are
    * unshifted 0..255 row-major. */
  private def encodeBlock(w: BitWriter, samples: Array[Int],
      qt: Array[Int], dcPred: Int,
      dcT: Array[(Int, Int)], acT: Array[(Int, Int)]): Int = {
    val shifted = new Array[Double](64)
    var i = 0
    while (i < 64) { shifted(i) = samples(i) - 128.0; i += 1 }
    val coef = fdct(shifted)
    val q = new Array[Int](64)
    i = 0
    while (i < 64) {
      q(i) = math.round(coef(zigzag(i)) / qt(zigzag(i))).toInt
      i += 1
    }
    def putSym(t: Array[(Int, Int)], sym: Int): Unit = {
      val (c, l) = t(sym); w.put(c, l)
    }
    def putExtend(v: Int, s: Int): Unit =
      if (s > 0) w.put(if (v >= 0) v else v + (1 << s) - 1, s)
    val diff = q(0) - dcPred
    val s0 = category(diff)
    putSym(dcT, s0); putExtend(diff, s0)
    var run = 0; var k = 1
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run > 15) { putSym(acT, 0xf0); run -= 16 }
        val s = category(q(k))
        putSym(acT, (run << 4) | s); putExtend(q(k), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) putSym(acT, 0x00) // EOB
    q(0)
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    body.foreach(out.write)
  }

  private def huffBody(cls: Int, id: Int, spec: HuffSpec): Array[Int] =
    Array((cls << 4) | id) ++ spec.bits ++ spec.vals

  /** All-ones quant tables: real divide-round-multiply machinery with
    * the identity step, so flat blocks round-trip bit-exactly. */
  private val qLuma: Array[Int] = Array.fill(64)(1)
  private val qChroma: Array[Int] = Array.fill(64)(1)

  /** Serialize 4:2:0 YCbCr planes (w,h multiples of 16; cb/cr at
    * (w/2)x(h/2)) to a sequential-baseline JPEG stream with the traps
    * described in the object doc. */
  def build(w: Int, h: Int, y: Array[Byte], cb: Array[Byte],
      cr: Array[Byte], restartInterval: Int = 2): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0 && w > 0 && h > 0)
    require(y.length == w * h && cb.length == (w / 2) * (h / 2) &&
      cr.length == (w / 2) * (h / 2))
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // trap: a COM segment before everything else
    seg(out, 0xfe, "graft baseline codec".getBytes("US-ASCII")
      .map(_ & 0xff))
    // trap: BOTH quant tables in ONE DQT segment
    seg(out, 0xdb,
      (Array(0x00) ++ zigzag.map(qLuma)) ++
        (Array(0x01) ++ zigzag.map(qChroma)))
    // SOF0: Y 2x2 q0, Cb 1x1 q1, Cr 1x1 q1
    seg(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    // trap: all FOUR huffman tables in ONE DHT segment
    seg(out, 0xc4,
      huffBody(0, 0, dcLumaSpec) ++ huffBody(1, 0, acLumaSpec) ++
        huffBody(0, 1, dcChromaSpec) ++ huffBody(1, 1, acChromaSpec))
    // DRI: restart every `restartInterval` MCUs
    seg(out, 0xdd, Array((restartInterval >> 8) & 0xff,
      restartInterval & 0xff))
    // SOS
    seg(out, 0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val bw = new BitWriter(out)
    val (mx, my) = (w / 16, h / 16)
    val cw = w / 2
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var mcu = 0; var rst = 0
    val blk = new Array[Int](64)
    def grab(plane: Array[Byte], pw: Int, ox: Int, oy: Int): Unit = {
      var j = 0
      while (j < 8) {
        var i2 = 0
        while (i2 < 8) {
          blk(j * 8 + i2) = plane((oy + j) * pw + ox + i2) & 0xff
          i2 += 1
        }
        j += 1
      }
    }
    var myi = 0
    while (myi < my) {
      var mxi = 0
      while (mxi < mx) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.align()
          out.write(0xff); out.write(0xd0 + rst)
          rst = (rst + 1) % 8
          dcY = 0; dcCb = 0; dcCr = 0
        }
        // 4 Y blocks, left-to-right top-to-bottom, then Cb, then Cr
        var bv = 0
        while (bv < 2) {
          var bh = 0
          while (bh < 2) {
            grab(y, w, mxi * 16 + bh * 8, myi * 16 + bv * 8)
            dcY = encodeBlock(bw, blk, qLuma, dcY, dcLumaEnc, acLumaEnc)
            bh += 1
          }
          bv += 1
        }
        grab(cb, cw, mxi * 8, myi * 8)
        dcCb = encodeBlock(bw, blk, qChroma, dcCb, dcChromaEnc, acChromaEnc)
        grab(cr, cw, mxi * 8, myi * 8)
        dcCr = encodeBlock(bw, blk, qChroma, dcCr, dcChromaEnc, acChromaEnc)
        mcu += 1
        mxi += 1
      }
      myi += 1
    }
    bw.align()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------

  private final case class Component(id: Int, hS: Int, vS: Int, tq: Int)

  /** Parse a sequential-baseline JPEG: returns (w, h, planes) where
    * planes(i) is component i's pixel plane at its NATIVE (subsampled)
    * resolution, cropped to ceil(w·hi/hmax) x ceil(h·vi/vmax), in SOF
    * component order. None for anything malformed, truncated,
    * progressive, 12-bit, or arithmetic-coded. */
  def parse(payload: Array[Byte])
      : Option[(Int, Int, Array[Array[Byte]])] =
    try parseOrThrow(payload) catch {
      case _: ParseFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      // hostile DHT bytes reach HuffSpec's structural require()s
      // (duplicate symbols, over-subscribed code space) — those are
      // malformed-stream rejections, not crashes
      case _: IllegalArgumentException => None
    }

  private def parseOrThrow(b: Array[Byte])
      : Option[(Int, Int, Array[Array[Byte]])] = {
    def fail(): Nothing = throw new ParseFail
    if (b == null || b.length < 4) return None
    def u8(o: Int): Int = b(o) & 0xff
    def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    if (u16(0) != 0xffd8) return None // SOI
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcDec = new Array[HuffDecoder](4)
    val acDec = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var sosAt = -1
    var compSel: Array[(Int, Int, Int)] = null // (compIdx, dcId, acId)
    while (sosAt < 0) {
      if (pos + 4 > b.length) fail()
      if (u8(pos) != 0xff) fail()
      val marker = u8(pos + 1)
      val len = u16(pos + 2)
      if (len < 2 || pos + 2 + len > b.length) fail()
      val body = pos + 4
      val end = pos + 2 + len
      marker match {
        case 0xdb => // DQT: one or more tables
          var o = body
          while (o < end) {
            val pq = u8(o) >> 4; val tq = u8(o) & 0x0f
            if (pq != 0 || tq > 3 || o + 65 > end) fail() // 8-bit only
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(zigzag(k)) = u8(o + 1 + k); k += 1 }
            quant(tq) = t
            o += 65
          }
        case 0xc0 => // SOF0 baseline
          if (u8(body) != 8) fail() // 8-bit precision only
          h = u16(body + 1); w = u16(body + 3)
          val nc = u8(body + 5)
          if (w <= 0 || h <= 0 || w > 16384 || h > 16384 ||
            nc < 1 || nc > 4 || body + 6 + nc * 3 > end) fail()
          comps = Array.tabulate(nc) { i =>
            val o = body + 6 + i * 3
            val c = Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0x0f,
              u8(o + 2))
            if (c.hS < 1 || c.hS > 2 || c.vS < 1 || c.vS > 2 || c.tq > 3)
              fail()
            c
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          fail() // extended/progressive/lossless/arithmetic: not baseline
        case 0xc4 => // DHT: one or more tables
          var o = body
          while (o < end) {
            if (o + 17 > end) fail()
            val cls = u8(o) >> 4; val id = u8(o) & 0x0f
            if (cls > 1 || id > 3) fail()
            val bits = Array.tabulate(16)(i => u8(o + 1 + i))
            val n = bits.sum
            if (o + 17 + n > end || n > 256) fail()
            val vals = Array.tabulate(n)(i => u8(o + 17 + i))
            val dec = new HuffDecoder(HuffSpec(bits, vals))
            if (cls == 0) dcDec(id) = dec else acDec(id) = dec
            o += 17 + n
          }
        case 0xdd => // DRI
          if (len != 4) fail()
          restartInterval = u16(body)
        case 0xda => // SOS
          if (comps == null) fail()
          val ns = u8(body)
          if (ns != comps.length || body + 1 + ns * 2 + 3 > end) fail()
          compSel = Array.tabulate(ns) { i =>
            val cid = u8(body + 1 + i * 2)
            val idx = comps.indexWhere(_.id == cid)
            if (idx < 0) fail()
            (idx, u8(body + 2 + i * 2) >> 4, u8(body + 2 + i * 2) & 0x0f)
          }
          // baseline full scan: Ss=0 Se=63 AhAl=0
          if (u8(end - 3) != 0 || u8(end - 2) != 63 || u8(end - 1) != 0)
            fail()
          sosAt = end
        case m if m >= 0xe0 && m <= 0xef => // APPn: skip
        case 0xfe => // COM: skip
        case _ => fail()
      }
      pos = end
    }
    val hmax = comps.map(_.hS).max
    val vmax = comps.map(_.vS).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // Plausibility gate BEFORE any plane allocation (the Bmp lesson —
    // a ~150-byte payload declaring 16384x16384x4 components must not
    // OOM the executor): every 8x8 block costs at least 2 entropy
    // bits (a DC category code + an EOB, each >= 1 bit under ANY
    // legal Huffman table), i.e. at most 4 blocks per entropy byte —
    // a header whose declared block count exceeds what the remaining
    // bytes could possibly encode is hostile or truncated.
    val totalBlocks = mcusX.toLong * mcusY.toLong *
      comps.map(c => c.hS * c.vS).sum
    val entropyBytes = (b.length - sosAt).toLong
    if (totalBlocks > entropyBytes * 4 + 64) fail()
    // padded per-component planes (MCU-aligned); cropped on return.
    // Long-checked sizes: the 16384 dim cap bounds each plane at 2^28
    // elements, but the multiply is checked in Long regardless
    val padW = comps.map(c => mcusX * 8 * c.hS)
    val padH = comps.map(c => mcusY * 8 * c.vS)
    comps.indices.foreach { i =>
      if (padW(i).toLong * padH(i) > (1L << 30)) fail()
    }
    val planes = Array.tabulate(comps.length)(i =>
      new Array[Byte](padW(i) * padH(i)))
    comps.foreach { c => if (quant(c.tq) == null) fail() }
    compSel.foreach { case (_, d, a) =>
      if (dcDec(d) == null || acDec(a) == null) fail()
    }
    val br = new BitReader(b, sosAt)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    var mcu = 0; var rst = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rst)
        rst = (rst + 1) % 8
        java.util.Arrays.fill(dcPred, 0)
      }
      val mxi = mcu % mcusX; val myi = mcu / mcusX
      var ci = 0
      while (ci < compSel.length) {
        val (idx, dId, aId) = compSel(ci)
        val c = comps(idx)
        val qt = quant(c.tq)
        var bv = 0
        while (bv < c.vS) {
          var bhh = 0
          while (bhh < c.hS) {
            // decode one block
            java.util.Arrays.fill(coef, 0)
            val s0 = br.decode(dcDec(dId))
            if (s0 > 11) fail()
            val diff =
              if (s0 == 0) 0
              else {
                val v = br.bits(s0)
                if (v < (1 << (s0 - 1))) v - (1 << s0) + 1 else v
              }
            dcPred(idx) += diff
            coef(0) = dcPred(idx) * qt(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decode(acDec(aId))
              if (rs == 0x00) eob = true
              else if (rs == 0xf0) k += 16
              else {
                val run = rs >> 4; val size = rs & 0x0f
                k += run
                if (k > 63 || size == 0 || size > 10) fail()
                val v = br.bits(size)
                val av =
                  if (v < (1 << (size - 1))) v - (1 << size) + 1 else v
                coef(zigzag(k)) = av * qt(zigzag(k))
                k += 1
              }
            }
            val px = idct(coef)
            val ox = (mxi * c.hS + bhh) * 8
            val oy = (myi * c.vS + bv) * 8
            var j = 0
            while (j < 8) {
              var i2 = 0
              while (i2 < 8) {
                val v = math.round(px(j * 8 + i2) + 128.0).toInt
                planes(idx)((oy + j) * padW(idx) + ox + i2) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                i2 += 1
              }
              j += 1
            }
            bhh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // crop padded planes to native component dims
    val out = Array.tabulate(comps.length) { i =>
      val c = comps(i)
      val nw = (w * c.hS + hmax - 1) / hmax
      val nh = (h * c.vS + vmax - 1) / vmax
      if (nw == padW(i) && nh == padH(i)) planes(i)
      else {
        val o = new Array[Byte](nw * nh)
        var j = 0
        while (j < nh) {
          System.arraycopy(planes(i), j * padW(i), o, j * nw, nw)
          j += 1
        }
        o
      }
    }
    Some((w, h, out))
  }
}

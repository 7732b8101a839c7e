package graft.ops

import graft.SparkFunSuite
import graft.multimodal.{Avi, Gif, Jpeg, Mulaw, Png}

/** Round-10 codec pins: the four new from-spec codecs — PNG
  * (DEFLATE + all five scanline filters + verified CRC-32), GIF
  * (hand-rolled variable-width LZW with the KwKwK case and the
  * 4096-entry CLEAR), G.711 μ-law (real compressed audio whose
  * decode replays closed-form), and MJPEG-in-AVI (compressed video:
  * RIFF list walking + per-frame baseline-JPEG decode). Each codec
  * gets a round-trip pin, a deliberate-trap pin, and a
  * malformation-quarantine pin (None, never a crash or garbage). */
class Round10CodecSpec extends SparkFunSuite {

  // ---- PNG -----------------------------------------------------------

  private def pngPixels(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      val r = (seed * 7 + x * 3 + y * 5) % 256
      val g = (seed * 11 + x * 2 + y * 3) % 256
      val b = (seed * 13 + x + y * 7) % 256
      (r << 16) | (g << 8) | b
    }

  test("Png: arbitrary pixels round-trip exactly through DEFLATE and " +
    "all five scanline filters") {
    val w = 23; val h = 17 // h >= 5: every filter type appears
    val px = pngPixels(w, h, 3)
    val bytes = Png.build(w, h, px)
    val (pw, ph, dec) = Png.parse(bytes).get
    assert(pw == w && ph == h)
    assert(dec.sameElements(px))
  }

  test("Png: 1x1 and single-row edge shapes round-trip") {
    for ((w, h) <- Seq((1, 1), (7, 1), (1, 9))) {
      val px = pngPixels(w, h, 11)
      val (pw, ph, dec) = Png.parse(Png.build(w, h, px)).get
      assert(pw == w && ph == h && dec.sameElements(px), s"${w}x$h")
    }
  }

  test("Png.parse: a flipped bit quarantines via CRC, truncation and " +
    "garbage reject") {
    val good = Png.build(9, 7, pngPixels(9, 7, 5))
    assert(Png.parse(good).isDefined)
    // flip one bit inside the first IDAT payload: CRC must catch it
    val idx = good.length / 2
    val bad = good.clone(); bad(idx) = (bad(idx) ^ 0x40).toByte
    assert(Png.parse(bad).isEmpty, "bit flip survived the CRC check")
    assert(Png.parse(good.take(good.length - 20)).isEmpty, "truncated")
    assert(Png.parse(Array.fill[Byte](64)(0x41)).isEmpty, "garbage")
    assert(Png.parse(Array[Byte]()).isEmpty, "empty")
  }

  test("Png.parse: hostile chunk lengths reject before allocation") {
    val good = Png.build(9, 7, pngPixels(9, 7, 5))
    // declare a 2^31-ish length on the first chunk after the signature
    val bad = good.clone()
    bad(8) = 0x7f.toByte; bad(9) = 0xff.toByte
    bad(10) = 0xff.toByte; bad(11) = 0xff.toByte
    assert(Png.parse(bad).isEmpty)
  }

  // ---- GIF -----------------------------------------------------------

  test("Gif: arbitrary indices round-trip through the hand-rolled LZW " +
    "(KwKwK runs included)") {
    val w = 31; val h = 19
    // repeated runs force the encoder to reference just-created
    // entries: the decoder's code == next special case
    val idx = Array.tabulate(w * h)(p => ((p / 3) % 256).toByte)
    val bytes = Gif.build(w, h, idx)
    val (pw, ph, dec, pal) = Gif.parse(bytes).get
    assert(pw == w && ph == h)
    assert(dec.sameElements(idx))
    assert(pal.length == 256)
    assert(pal(1) == ((7 << 16) | (5 << 8) | 3), "deterministic palette")
  }

  test("Gif: a payload large enough to overflow the 4096-entry table " +
    "crosses the CLEAR reset and every width bump intact") {
    val w = 128; val h = 72 // 9216 varied symbols: dict fills past 4096
    val idx = Array.tabulate(w * h)(p => ((p * 31 + p / 7) % 256).toByte)
    val bytes = Gif.build(w, h, idx)
    val (_, _, dec, _) = Gif.parse(bytes).get
    assert(dec.sameElements(idx))
  }

  test("Gif.parse: truncation and garbage reject, never crash") {
    val good = Gif.build(12, 9, Array.tabulate(108)(i => (i % 256).toByte))
    assert(Gif.parse(good).isDefined)
    assert(Gif.parse(good.take(good.length / 2)).isEmpty, "truncated")
    assert(Gif.parse(good.take(20)).isEmpty, "header only")
    assert(Gif.parse("GIF89a".getBytes("US-ASCII")).isEmpty, "magic only")
    assert(Gif.parse(Array.fill[Byte](40)(0x2c)).isEmpty, "garbage")
    // corrupt a byte mid-LZW-stream: decode must fail CLOSED (None) or
    // produce a full-size index field — never crash, never a short read
    val bad = good.clone()
    bad(good.length - 12) = (bad(good.length - 12) ^ 0x55).toByte
    Gif.parse(bad).foreach { case (pw, ph, dec, _) =>
      assert(dec.length == pw * ph, "partial decode leaked out")
    }
  }

  // ---- μ-law ---------------------------------------------------------

  test("Mulaw: G.711 spot values match the standard tables") {
    // silence: +0 encodes to 0xFF and decodes back to 0
    assert(Mulaw.encodeSample(0) == 0xff)
    assert(Mulaw.decodeSample(0xff) == 0)
    // clip ceiling: max positive decodes to 32124 (G.711 table max)
    assert(Mulaw.decodeSample(Mulaw.encodeSample(32767)) == 32124)
    assert(Mulaw.decodeSample(Mulaw.encodeSample(-32768)) == -32124)
    // sign symmetry everywhere
    for (s <- Seq(1, 100, 5000, 20000))
      assert(Mulaw.decodeSample(Mulaw.encodeSample(-s)) ==
        -Mulaw.decodeSample(Mulaw.encodeSample(s)))
  }

  test("Mulaw: companding is a projection — decode∘encode is " +
    "idempotent on its own image") {
    var s = -32768
    while (s <= 32767) {
      val once = Mulaw.decodeSample(Mulaw.encodeSample(s))
      val twice = Mulaw.decodeSample(Mulaw.encodeSample(once))
      assert(once == twice, s"not a fixpoint at $s")
      s += 257 // dense sweep without 64k iterations
    }
  }

  test("Mulaw: container round-trip through the 18-byte fmt and the " +
    "LIST trap returns the expanded samples") {
    val raw = Array.tabulate(301)(i => ((i * 113 % 3000) - 1500).toShort)
    val bytes = Mulaw.build(8000, raw)
    val (rate, dec) = Mulaw.parse(bytes).get
    assert(rate == 8000)
    assert(dec.length == raw.length) // odd data chunk: pad byte honored
    dec.indices.foreach { i =>
      assert(dec(i) ==
        Mulaw.decodeSample(Mulaw.encodeSample(raw(i).toInt)).toShort)
    }
  }

  test("Mulaw.parse: PCM-format and malformed containers reject") {
    val good = Mulaw.build(8000, Array[Short](1, -2, 3))
    assert(Mulaw.parse(good).isDefined)
    // a plain PCM WAV is NOT μ-law: format tag 1 must reject
    val pcm = graft.multimodal.Multimodal.Wav.build(8000,
      Array[Short](1, 2, 3))
    assert(Mulaw.parse(pcm).isEmpty, "accepted PCM as mu-law")
    assert(Mulaw.parse(good.take(30)).isEmpty, "truncated")
    assert(Mulaw.parse(Array.fill[Byte](50)(0x52)).isEmpty, "garbage")
  }

  // ---- MJPEG-in-AVI --------------------------------------------------

  private def flatJpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    val y = Array.tabulate(w * h) { p =>
      val bx = (p % w) / 8; val by = (p / w) / 8
      ((seed * 7 + bx * 13 + by * 31) % 256).toByte
    }
    val cw = w / 2; val ch = h / 2
    val cb = Array.tabulate(cw * ch) { p =>
      (((p % cw) / 8 * 5 + (p / cw) / 8 * 3 + seed) % 256).toByte
    }
    val cr = Array.tabulate(cw * ch) { p =>
      (((p % cw) / 8 * 17 + (p / cw) / 8 * 29 + seed * 3) % 256).toByte
    }
    Jpeg.build(w, h, y, cb, cr)
  }

  test("Avi: MJPG frames demux and decode exactly (flat tiles are " +
    "bit-exact through the lossy pipeline)") {
    val w = 16; val h = 16
    val frames = (0 until 3).map(f => flatJpeg(w, h, f * 19 + 2))
    val bytes = Avi.build(w, h, frames)
    val (pw, ph, decoded) = Avi.parse(bytes).get
    assert(pw == w && ph == h && decoded.length == 3)
    decoded.zipWithIndex.foreach { case (planes, f) =>
      val (jw, jh, ref) = Jpeg.parse(frames(f)).get
      assert(jw == w && jh == h)
      assert(planes(0).sameElements(ref(0)), s"frame $f luma")
      assert(planes(1).sameElements(ref(1)), s"frame $f cb")
      assert(planes(2).sameElements(ref(2)), s"frame $f cr")
    }
  }

  test("Avi: odd-length frames exercise RIFF even padding") {
    val w = 16; val h = 16
    // find a seed whose JPEG stream is odd-sized, then follow it with
    // another frame: a parser that forgets the pad byte desyncs
    val odd = (0 until 64).map(s => flatJpeg(w, h, s))
      .find(_.length % 2 == 1)
    assume(odd.isDefined, "no odd-length JPEG in the sweep")
    val frames = Seq(odd.get, flatJpeg(w, h, 7), odd.get)
    val (_, _, decoded) = Avi.parse(Avi.build(w, h, frames)).get
    assert(decoded.length == 3)
  }

  test("Png.parse: a preset-dictionary (FDICT) zlib stream quarantines " +
    "instead of spinning the inflate loop forever") {
    // craft a PNG whose IDAT carries an FDICT zlib header; chunk CRCs
    // are valid (CRC covers plaintext chunk bytes), so only the
    // inflater can object — needsDictionary must break the loop
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
      .map(_.toByte))
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def be32(v: Int): Unit = { out.write((v >>> 24) & 0xff)
        out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff)
        out.write(v & 0xff) }
      be32(data.length)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      be32(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    for (v <- Seq(0, 0, 0, 2, 0, 0, 0, 2)) ihdr.write(v) // 2x2
    for (v <- Seq(8, 2, 0, 0, 0)) ihdr.write(v)
    chunk("IHDR", ihdr.toByteArray)
    // zlib header 0x78 0xBB: CM=8, FDICT bit set, FCHECK valid
    // (0x78BB % 31 == 0), followed by a fake 4-byte DICTID
    chunk("IDAT", Array(0x78, 0xbb, 0x01, 0x02, 0x03, 0x04, 0x00)
      .map(_.toByte))
    chunk("IEND", Array.emptyByteArray)
    assert(Png.parse(out.toByteArray).isEmpty, "FDICT stream accepted")
  }

  test("Avi.parse: a deeply nested LIST chain quarantines instead of " +
    "overflowing the stack") {
    // hdrl LIST nested 64 deep (well past the depth cap)
    val depth = 64
    val innermost = Array.emptyByteArray
    val nested = (1 to depth).foldLeft(innermost) { (body, _) =>
      val b = new java.io.ByteArrayOutputStream()
      b.write("LIST".getBytes("US-ASCII"))
      val len = 4 + body.length
      b.write(len & 0xff); b.write((len >> 8) & 0xff)
      b.write((len >> 16) & 0xff); b.write((len >> 24) & 0xff)
      b.write("hdrl".getBytes("US-ASCII"))
      b.write(body)
      b.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val total = 4 + nested.length
    out.write(total & 0xff); out.write((total >> 8) & 0xff)
    out.write((total >> 16) & 0xff); out.write((total >> 24) & 0xff)
    out.write("AVI ".getBytes("US-ASCII"))
    out.write(nested)
    assert(Avi.parse(out.toByteArray).isEmpty, "deep nesting accepted")
  }

  // ---- property sweeps -------------------------------------------------

  test("Png: property sweep — every small dimension and content class " +
    "round-trips (filters, odd strides, extreme values)") {
    for (w <- 1 to 12; h <- Seq(1, 2, 5, 6, 11)) {
      for ((seed, kind) <- Seq((0, "flat-black"), (255, "flat-ish"),
          (w * h + 3, "varied"))) {
        val px =
          if (kind.startsWith("flat")) Array.fill(w * h)(seed * 0x010101)
          else pngPixels(w, h, seed)
        val parsed = Png.parse(Png.build(w, h, px))
        assert(parsed.isDefined, s"${w}x$h $kind failed to parse")
        val (pw, ph, dec) = parsed.get
        assert(pw == w && ph == h && dec.sameElements(px),
          s"${w}x$h $kind mismatched")
      }
    }
  }

  test("Gif: property sweep — run lengths 1..9 and every width bump " +
    "region round-trip") {
    for (run <- 1 to 9; n <- Seq(40, 300, 700, 1300, 2100)) {
      val w = 20; val h = (n + w - 1) / w
      val idx = Array.tabulate(w * h)(p => ((p / run) % 256).toByte)
      val parsed = Gif.parse(Gif.build(w, h, idx))
      assert(parsed.isDefined, s"run=$run n=$n failed")
      assert(parsed.get._3.sameElements(idx), s"run=$run n=$n mismatched")
    }
  }

  test("Mulaw: the full 16-bit domain is a decode∘encode fixpoint " +
    "after one companding pass") {
    var bad = 0
    var s = -32768
    while (s <= 32767) {
      val once = Mulaw.decodeSample(Mulaw.encodeSample(s))
      if (Mulaw.decodeSample(Mulaw.encodeSample(once)) != once) bad += 1
      if (math.abs(once) > 32124) bad += 1 // expansion table ceiling
      s += 1
    }
    assert(bad == 0)
  }

  test("Tar: property sweep — entry sizes straddling every block " +
    "boundary round-trip in any count") {
    import graft.multimodal.Tar
    for (count <- Seq(1, 3, 7)) {
      val entries = (0 until count).flatMap { k =>
        Seq(510, 511, 512, 513, 1023, 1024, 1025).map { sz =>
          (s"e_${k}_$sz" -> Array.tabulate(sz)(i => ((i * 31 + k) % 251).toByte))
        }
      }
      val out = Tar.parse(Tar.build(entries)).get
      assert(out.map(_._1) == entries.map(_._1), s"count=$count names")
      out.zip(entries).foreach { case ((n, got), (_, want)) =>
        assert(got.sameElements(want), s"count=$count $n bytes")
      }
    }
  }

  test("Y4m.parse: crafted giant-dimension headers quarantine instead " +
    "of overflowing Int and allocating gigabytes") {
    import graft.multimodal.Multimodal.Y4m
    for (dims <- Seq("W65536 H65536", "W999999998 H2", "W2 H999999998")) {
      val payload = s"YUV4MPEG2 $dims C420\nFRAME\n".getBytes("US-ASCII") ++
        Array.fill[Byte](64)(1)
      assert(Y4m.parse(payload).isEmpty, s"accepted $dims")
    }
  }

  // ---- Rice/Golomb -----------------------------------------------------

  test("Rice: lossless round trip at several k, including negative " +
    "samples and big residual jumps") {
    import graft.multimodal.Rice
    val raw = Array.tabulate(500)(i =>
      (((i * 997 % 7000) - 3500) + (if (i % 90 == 0) 20000 else 0)).toShort)
    for (k <- Seq(0, 3, 6, 10)) {
      val enc = Rice.encode(raw, k)
      val dec = Rice.decode(enc, raw.length, k).get
      assert(dec.sameElements(raw), s"k=$k mismatched")
    }
  }

  test("Rice: the measured stream length equals the closed-form size") {
    import graft.multimodal.Rice
    val raw = Array.tabulate(333)(i => ((i * 431 % 3000) - 1500).toShort)
    val k = 6
    val bits = 16L + raw.sliding(2).map { p =>
      Rice.residualBits(p(1) - p(0), k)
    }.sum
    assert(Rice.encode(raw, k).length == ((bits + 7) / 8).toInt)
  }

  test("Rice.decode: truncation and hostile unary runs fail closed") {
    import graft.multimodal.Rice
    val raw = Array.tabulate(100)(i => (i * 50).toShort)
    val enc = Rice.encode(raw, 6)
    assert(Rice.decode(enc, 100, 6).isDefined)
    assert(Rice.decode(enc.take(enc.length / 2), 100, 6).isEmpty, "truncated")
    assert(Rice.decode(Array[Byte](), 1, 6).isEmpty, "empty")
    // all-ones stream = one endless unary run: must bound, not spin
    assert(Rice.decode(Array.fill[Byte](4096)(0xff.toByte), 10, 6).isEmpty)
    assert(Rice.decode(enc, 100, 31).isEmpty, "k out of range")
    assert(Rice.decode(null, 100, 6).isEmpty, "null")
  }

  // ---- IMA ADPCM -------------------------------------------------------

  test("Adpcm: container round-trip decodes through the real adaptive " +
    "loop; slow ramps track tightly") {
    import graft.multimodal.Adpcm
    // a slow ramp: the adaptive step shrinks to the floor and the
    // error stays within a few quantization steps
    val raw = Array.tabulate(400)(i => (i * 4).toShort)
    val (rate, dec) = Adpcm.parse(Adpcm.build(8000, raw)).get
    assert(rate == 8000 && dec.length == 400)
    assert(dec(0) == raw(0), "block-header predictor is sample 0")
    val maxErr = raw.zip(dec).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 16, s"slow ramp tracked with error $maxErr")
  }

  test("Adpcm: encoder and decoder share one state trajectory (the " +
    "reconstruction is identical on both sides)") {
    import graft.multimodal.Adpcm
    val raw = Array.tabulate(257)(i => ((i * 997 % 8000) - 4000).toShort)
    var st = Adpcm.State(raw(0).toInt, 0)
    val viaEncode = raw.tail.map { s =>
      val (nib, stN) = Adpcm.encodeNibble(s.toInt, st)
      st = stN
      (nib, stN.pred, stN.idx)
    }
    var st2 = Adpcm.State(raw(0).toInt, 0)
    viaEncode.foreach { case (nib, pred, idx) =>
      val (v, stN) = Adpcm.decodeNibble(nib, st2)
      assert(v == pred && stN.idx == idx, "decode diverged from encode")
      st2 = stN
    }
  }

  test("Adpcm.parse: malformed containers reject") {
    import graft.multimodal.Adpcm
    val good = Adpcm.build(8000, Array.tabulate(100)(i => (i * 7).toShort))
    assert(Adpcm.parse(good).isDefined)
    assert(Adpcm.parse(good.take(40)).isEmpty, "truncated header")
    assert(Adpcm.parse(good.take(good.length - 10)).isEmpty, "truncated data")
    // a PCM WAV is not ADPCM: format tag 1 must reject
    val pcm = graft.multimodal.Multimodal.Wav.build(8000, Array[Short](1, 2))
    assert(Adpcm.parse(pcm).isEmpty, "accepted PCM as ADPCM")
    // hostile step index in the block header: layout is RIFF(12) +
    // fmt hdr(8)+fmt(20) + data hdr(8) + predictor(2) + INDEX byte
    val bad = good.clone()
    bad(12 + 28 + 8 + 2) = 120.toByte
    assert(Adpcm.parse(bad).isEmpty, "step index > 88 accepted")
    assert(Adpcm.parse(Array.fill[Byte](60)(0x52)).isEmpty, "garbage")
  }

  // ---- MS-RLE8 temporal video ------------------------------------------

  test("Rle8: keyframe round-trips arbitrary 8-bit frames") {
    import graft.multimodal.Rle8
    val w = 37; val h = 23
    val f = Array.tabulate(w * h)(p => ((p * 31 + p / 5) % 256).toByte)
    val dec = Rle8.decode(w, h, Rle8.encodeKey(w, h, f), None).get
    assert(dec.sameElements(f))
  }

  test("Rle8: delta frames skip unchanged pixels and reconstruct " +
    "exactly — including a change LEFT of the cursor on a later row") {
    import graft.multimodal.Rle8
    val w = 64; val h = 16
    val f0 = Array.tabulate(w * h)(p => ((p / 8) % 128).toByte)
    val f1 = f0.clone()
    // change late in row 2, then EARLY in row 3 (forces the EOL reset)
    for (x <- 50 until 60) f1(2 * w + x) = (200 + x % 8).toByte
    for (x <- 5 until 10) f1(3 * w + x) = 190.toByte
    val f2 = f1.clone()
    for (x <- 0 until 8) f2(15 * w + x) = 250.toByte // last row edge
    val chunks = Rle8.encodeVideo(w, h, Seq(f0, f1, f2))
    val dec = Rle8.decodeVideo(w, h, chunks).get
    assert(dec(0).sameElements(f0) && dec(1).sameElements(f1) &&
      dec(2).sameElements(f2))
    // the temporal win is real: each delta is far below its keyframe
    assert(chunks(1).length < chunks(0).length &&
      chunks(2).length < chunks(0).length,
      s"deltas ${chunks(1).length}/${chunks(2).length} vs key ${chunks(0).length}")
  }

  test("Rle8.decode: malformed streams reject, never crash or " +
    "write out of bounds") {
    import graft.multimodal.Rle8
    val w = 16; val h = 8
    val f = Array.tabulate(w * h)(p => (p % 250).toByte)
    val key = Rle8.encodeKey(w, h, f)
    assert(Rle8.decode(w, h, key.dropRight(2), None).isEmpty, "no EOB")
    assert(Rle8.decode(w, h, Array[Byte](), None).isEmpty, "empty")
    // run overruns the row width
    assert(Rle8.decode(w, h, Array[Byte](255.toByte, 1, 0, 1), None).isEmpty)
    // delta skip beyond the frame
    assert(Rle8.decode(w, h,
      Array[Byte](0, 2, 255.toByte, 255.toByte, 0, 1), None).isEmpty)
    // absolute run longer than the remaining data
    assert(Rle8.decode(w, h, Array[Byte](0, 5, 1, 2), None).isEmpty)
    // delta against a wrong-sized previous frame
    assert(Rle8.decode(w, h, key, Some(new Array[Byte](7))).isEmpty)
  }

  // ---- USTAR -----------------------------------------------------------

  test("Tar: entries of odd sizes round-trip through 512-block " +
    "padding, names and bytes intact in order") {
    import graft.multimodal.Tar
    val entries = Seq(
      "a.bin" -> Array.tabulate(1)(i => (i + 1).toByte),
      "b/c.bin" -> Array.tabulate(511)(i => (i * 7).toByte),
      "d.bin" -> Array.tabulate(512)(i => (i * 3).toByte),
      "e.bin" -> Array.tabulate(1037)(i => (i * 11).toByte),
      "empty.bin" -> Array.emptyByteArray)
    val tar = Tar.build(entries)
    assert(tar.length % 512 == 0, "archive not block-aligned")
    val out = Tar.parse(tar).get
    assert(out.map(_._1) == entries.map(_._1))
    out.zip(entries).foreach { case ((_, got), (n, want)) =>
      assert(got.sameElements(want), s"bytes differ for $n")
    }
  }

  test("Tar.parse: checksum flip, truncation, and garbage reject; " +
    "non-file typeflags skip") {
    import graft.multimodal.Tar
    val tar = Tar.build(Seq("x.bin" -> Array.tabulate(100)(_.toByte)))
    // flip a bit in the header's name field: checksum must catch it
    val bad = tar.clone(); bad(3) = (bad(3) ^ 0x20).toByte
    assert(Tar.parse(bad).isEmpty, "checksum miss")
    // drop the end-of-archive marker: must fail closed
    assert(Tar.parse(tar.take(tar.length - 1024)).isEmpty, "no end marker")
    assert(Tar.parse(tar.take(700)).isEmpty, "truncated data")
    assert(Tar.parse(Array.fill[Byte](2048)(0x41)).isEmpty, "garbage")
    assert(Tar.parse(null).isEmpty, "null")
    // empty archive = just the two zero blocks
    assert(Tar.parse(Tar.build(Seq.empty)).get.isEmpty)
    // a directory entry (typeflag '5') is skipped, files around it kept
    val three = Tar.build(Seq("a.bin" -> Array[Byte](1, 2),
      "dir/" -> Array.emptyByteArray, "b.bin" -> Array[Byte](3)))
    // patch the middle entry's typeflag to '5' and re-checksum
    val hOff = 512 + 512 // after a.bin's header+padded data
    three(hOff + 156) = '5'
    var sum = 0L
    for (i <- 0 until 512)
      sum += (if (i >= 148 && i < 156) ' '.toInt else three(hOff + i) & 0xff)
    val cs = (java.lang.Long.toOctalString(sum).reverse + "000000")
      .take(6).reverse + "  "
    System.arraycopy(cs.getBytes("US-ASCII"), 0, three, hOff + 148, 8)
    val kept = Tar.parse(three).get
    assert(kept.map(_._1) == Seq("a.bin", "b.bin"), "dir entry not skipped")
  }

  // ---- AutoCodec dispatch ---------------------------------------------

  test("AutoCodec: sniffs magic bytes and dispatches to the right " +
    "codec with count-histogram L1 = decoded units") {
    import graft.multimodal.Codecs
    val auto = new Codecs.AutoCodec
    def l1(f: Array[Float]): Long = f.map(_.toLong).sum
    val png = Png.build(8, 6, pngPixels(8, 6, 2))
    assert(l1(auto.decode(png, null).get) == 3L * 8 * 6, "png: 3/px")
    val gif = Gif.build(10, 5, Array.tabulate(50)(i => (i % 256).toByte))
    assert(l1(auto.decode(gif, null).get) == 50L, "gif: 1/px")
    val wav = Mulaw.build(8000, Array.tabulate(77)(i => (i * 55).toShort))
    assert(l1(auto.decode(wav, null).get) == 77L, "mulaw: 1/sample")
    val jpg = flatJpeg(16, 16, 3)
    assert(l1(auto.decode(jpg, null).get) == 16L * 16 * 3 / 2,
      "jpeg: 1.5/px")
    val avi = Avi.build(16, 16, Seq(flatJpeg(16, 16, 1), flatJpeg(16, 16, 2)))
    assert(l1(auto.decode(avi, null).get) == 2L * 16 * 16, "avi: luma only")
    // the WAVE fmt-tag sub-dispatch: PCM (tag 1) and ADPCM (tag 0x11)
    // DECODE through their own codecs instead of quarantining as
    // failed mu-law — a mixed intake must not count its own sibling
    // formats as corruption
    val pcm = graft.multimodal.Multimodal.Wav.build(8000,
      Array.tabulate[Short](33)(i => (i * 100).toShort))
    assert(l1(auto.decode(pcm, null).get) == 33L, "pcm: 1/sample")
    val adp = graft.multimodal.Adpcm.build(8000,
      Array.tabulate[Short](41)(i => (i * 70).toShort))
    assert(l1(auto.decode(adp, null).get) == 41L, "adpcm: 1/sample")
    // an unknown WAVE format tag still quarantines (fail-closed on
    // e.g. IEEE-float tag 3)
    val alien = pcm.clone()
    alien(20) = 3 // fmt tag little-endian low byte (fmt chunk at 12+8)
    assert(auto.decode(alien, null).isEmpty, "unknown wave tag decoded")
    assert(auto.decode(Array.fill[Byte](40)(0x00), null).isEmpty, "garbage")
    assert(auto.decode(null, null).isEmpty, "null")
    // truncation quarantines for EVERY format (the mm_codec_dispatch
    // corruption rule)
    for ((b, n) <- Seq((png, "png"), (gif, "gif"), (wav, "wav"),
        (jpg, "jpg"), (avi, "avi"), (pcm, "pcm"), (adp, "adpcm")))
      assert(auto.decode(b.take(b.length / 2), null).isEmpty,
        s"truncated $n decoded")
  }

  test("Avi.parse: header/frame dimension mismatch and malformations " +
    "reject") {
    val frames = Seq(flatJpeg(16, 16, 4))
    val good = Avi.build(16, 16, frames)
    assert(Avi.parse(good).isDefined)
    // corrupt avih's declared width (offset: RIFF(12) + LIST hdr(12) +
    // 'avih'+len(8) + 32 bytes into avih payload)
    val bad = good.clone()
    bad(12 + 12 + 8 + 32) = 99.toByte
    assert(Avi.parse(bad).isEmpty, "dim mismatch accepted")
    assert(Avi.parse(good.take(good.length / 2)).isEmpty, "truncated")
    assert(Avi.parse(Array.fill[Byte](30)(0x52)).isEmpty, "garbage")
    assert(Avi.parse(null).isEmpty, "null")
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 codec additions: half-pel motion (Mcv/Gop stage 2) and
  * the MP2-class 32-subband audio tier. */
class Round13OpsSpec extends AnyFunSuite {

  import graft.multimodal.Subband

  test("Subband: threshold allocation drops quiet bands, keeps tones, " +
    "bounded round-trip error, stream beats raw") {
    val n = 2 * Subband.FrameSamples
    val xs = Array.tabulate(n) { i =>
      (1200 * Subband.walshSign(9, i % 32) +
        300 * Subband.walshSign(3, i % 32) + (i % 5) - 2).toShort
    }
    val stream = Subband.encode(xs, 16000)
    assert(stream.length < 2 * n, "coded stream must beat raw PCM")
    val (rate, dec, nActive, nDropped) = Subband.decode(stream).get
    assert(rate == 16000)
    assert(nActive == 4 && nDropped == 60,
      "two tones per frame keep bits; the dither bands drop")
    val errs = xs.indices.map(i => math.abs(dec(i) - xs(i)))
    assert(errs.max <= 256, s"round-trip error ${errs.max} out of band")
    assert(errs.max > 0, "a lossy codec that is bit-exact here would " +
      "mean the threshold never engaged")
    // energy conservation within the quantization bound
    def energy(a: IndexedSeq[Int]): Double =
      a.map(v => v.toDouble * v).sum
    val e0 = energy(xs.map(_.toInt))
    val e1 = energy(dec.map(_.toInt).toIndexedSeq)
    assert(math.abs(e1 - e0) / e0 < 0.01,
      "subband energy must be conserved within the quantization bound")
  }

  test("Subband: a silent signal codes all-dropped and decodes to " +
    "silence; a full-scale signal survives the clamp") {
    val silent = new Array[Short](Subband.FrameSamples)
    val (_, ds, a0, d0) = Subband.decode(Subband.encode(silent, 8000)).get
    assert(a0 == 0 && d0 == 32 && ds.forall(_ == 0))
    val loud = Array.tabulate(Subband.FrameSamples)(i =>
      (if ((i % 32) < 16) 32000 else -32000).toShort)
    val (_, dl, _, _) = Subband.decode(Subband.encode(loud, 8000)).get
    dl.indices.foreach(i => assert(math.abs(dl(i) - loud(i)) <= 2048,
      s"sample $i: ${dl(i)} vs ${loud(i)}"))
  }

  /** The mm_bvec corpus: two unrelated anchors; B = rounded average
    * of the first shifted +2 px (clamped) and the column-constant
    * second. */
  private def bvecFrames(id: Long, w: Int,
      h: Int): Seq[Array[Byte]] = {
    def cF(i: Int, j: Int): Int = 140 + (id % 40).toInt + 3 * i + 7 * j
    def cG(i: Int, j: Int): Int = 20 + (id % 20).toInt + 2 * i + 5 * j
    val f0 = Array.tabulate(w * h)(p => cF((p % w) / 8, (p / w) / 8).toByte)
    val f2 = Array.tabulate(w * h)(p => cG((p % w) / 8, (p / w) / 8).toByte)
    val f1 = Array.tabulate(w * h) { p =>
      val x = p % w; val j = (p / w) / 8
      ((cF(math.min(x + 2, w - 1) / 8, j) +
        cG(math.max(x - 2, 0) / 8, j) + 1) >> 1).toByte
    }
    Seq(f0, f1, f2)
  }

  test("Gop: a B frame whose anchors move INDEPENDENTLY is lossless " +
    "only through per-direction vector pairs — a shared vector " +
    "provably cannot do it") {
    val (w, h) = (48, 32)
    val frames = bvecFrames(7L, w, h)
    val stream = graft.multimodal.Gop.build(w, h, frames)
    val (_, _, dec, _, bCensus) = graft.multimodal.Gop.parse(stream).get
    val b = bCensus.head
    val nBlocks = (w / 8) * (h / 8)
    assert(b.avgBlocks == nBlocks && b.splitPairs == nBlocks,
      "every block must ride the average mode with two DIFFERENT vectors")
    assert(b.residBlocks == 0 && b.intraBlocks == 0)
    assert(java.util.Arrays.equals(dec(1), frames(1)),
      "pair biprediction must reproduce the B frame exactly")
    // the capability claim, measured: the best SHARED-vector average
    // over the full integer range leaves every block at SAD > 0
    val prevA = dec(0); val nextA = dec(2)
    var sharedLossless = 0
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      var best = Int.MaxValue
      for {
        dy <- -4 to 4 if by * 8 + dy >= 0 && by * 8 + dy + 8 <= h
        dx <- -4 to 4 if bx * 8 + dx >= 0 && bx * 8 + dx + 8 <= w
      } {
        var s = 0
        for (r <- 0 until 8; c <- 0 until 8) {
          val off = (by * 8 + dy + r) * w + bx * 8 + dx + c
          val avg = ((prevA(off) & 0xff) + (nextA(off) & 0xff) + 1) >> 1
          s += math.abs(
            (frames(1)((by * 8 + r) * w + bx * 8 + c) & 0xff) - avg)
        }
        if (s < best) best = s
      }
      if (best == 0) sharedLossless += 1
    }
    assert(sharedLossless == 0,
      "no shared-vector average may reach SAD 0 on this corpus")
  }

  test("Gop: hostile PAIR bytes fail closed — invalid second vector, " +
    "truncation inside a 5-byte average entry") {
    val (w, h) = (48, 32)
    val good = graft.multimodal.Gop.build(w, h, bvecFrames(3L, w, h))
    assert(graft.multimodal.Gop.parse(good).isDefined)
    def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    // walk past the P section to the B section's first (dir, pair,
    // pair) entry; P is all-intra in this corpus (no P vectors)
    val wb = w / 8; val hb = h / 8
    val bmLen = (wb * hb + 7) / 8
    var off = (14L + u32(good, 10)).toInt // P intra bitmap
    def bitCount(o: Int): Int =
      (0 until wb * hb).count(i => (good(o + i / 8) & (1 << (i % 8))) != 0)
    assert(bitCount(off) == wb * hb, "corpus contract: P all-intra")
    val pStripLen = u32(good, off + 2 * bmLen).toInt
    off += 2 * bmLen + 4 + pStripLen // B intra bitmap
    assert(bitCount(off) == 0, "corpus contract: all B blocks are MC")
    val entry = off + 2 * bmLen // first (dir, fwd pair, bwd pair)
    assert((good(entry) & 0xff) == 2, "corpus contract: average mode")
    // the SECOND pair's x byte out of range
    val badPair = good.clone()
    badPair(entry + 3) = 0xFF.toByte
    assert(graft.multimodal.Gop.parse(badPair).isEmpty)
    // the second pair footprint out of bounds for block 0 (dxH = -8)
    val oobPair = good.clone()
    oobPair(entry + 3) = 0x00.toByte
    assert(graft.multimodal.Gop.parse(oobPair).isEmpty)
  }

  test("Subband: hostile streams fail closed — bad alloc nibble, " +
    "non-canonical scalefactor, nonzero pad bits, bad header, " +
    "trailing garbage") {
    val xs = Array.tabulate(Subband.FrameSamples)(i =>
      (1000 * Subband.walshSign(7, i % 32) + (i % 5) - 2).toShort)
    val good = Subband.encode(xs, 16000)
    assert(Subband.decode(good).isDefined)
    // alloc nibble 11..15 is out of range: the first body byte holds
    // the allocations of bands 0 and 1
    val badAlloc = good.clone()
    badAlloc(10) = 0xFF.toByte
    assert(Subband.decode(badAlloc).isEmpty)
    // n_samples not a multiple of 384
    val badN = good.clone()
    badN(4) = 1.toByte
    assert(Subband.decode(badN).isEmpty)
    // absurd sample rate
    val badRate = good.clone()
    badRate(8) = 0.toByte; badRate(9) = 0.toByte
    assert(Subband.decode(badRate).isEmpty)
    assert(Subband.decode(good.take(good.length / 2)).isEmpty)
    assert(Subband.decode(good ++ Array[Byte](0)).isEmpty)
    assert(Subband.decode(null).isEmpty)
    assert(Subband.decode(Array.emptyByteArray).isEmpty)
  }

  /** The mm_halfpel corpus: block-constant I frame; P frame = its
    * half-sample interpolation (clamped at the right edge). */
  private def halfpelPair(id: Long, w: Int,
      h: Int): (Array[Byte], Array[Byte]) = {
    def cell(i: Int, j: Int): Int = 20 + (id % 30).toInt + 3 * i + 17 * j
    val f0 = Array.tabulate(w * h)(p => cell((p % w) / 8, (p / w) / 8).toByte)
    val f1 = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      ((cell(x / 8, y / 8) + cell(math.min(x + 1, w - 1) / 8, y / 8) + 1)
        >> 1).toByte
    }
    (f0, f1)
  }

  test("Mcv: a half-sample-translating frame is FULLY lossless through " +
    "half-pel vectors, and integer-only search provably cannot do it") {
    val (w, h) = (48, 32)
    val wb = w / 8; val hb = h / 8
    val (f0, f1) = halfpelPair(5L, w, h)
    val stream = graft.multimodal.Mcv.build(w, h, Seq(f0, f1))
    val (_, _, dec, census) = graft.multimodal.Mcv.parse(stream).get
    // pure MC: no residual, no intra — and the reconstruction is
    // BYTE-IDENTICAL (the interpolation filter is the prediction)
    assert(census.head.residBlocks == 0 && census.head.intraBlocks == 0)
    assert(java.util.Arrays.equals(dec(1), f1),
      "half-pel prediction must reproduce the interpolated frame exactly")
    // the census splits on geometry: every interior block needed a
    // half-sample component; the clamped right edge rides zero vectors
    assert(census.head.halfVectors == (wb - 1) * hb)
    assert(census.head.zeroVectors == hb)
    // half-pel beats full-pel: an exhaustive INTEGER search against
    // the same reference leaves every moving block at SAD > 0
    val ref = dec(0)
    var fullpelLossless = 0
    for (by <- 0 until hb; bx <- 0 until wb) {
      var best = Int.MaxValue
      for {
        dy <- -4 to 4 if by * 8 + dy >= 0 && by * 8 + dy + 8 <= h
        dx <- -4 to 4 if bx * 8 + dx >= 0 && bx * 8 + dx + 8 <= w
      } {
        var s = 0
        for (r <- 0 until 8; c <- 0 until 8)
          s += math.abs((f1((by * 8 + r) * w + bx * 8 + c) & 0xff) -
            (ref((by * 8 + dy + r) * w + bx * 8 + dx + c) & 0xff))
        if (s < best) best = s
      }
      if (best == 0) fullpelLossless += 1
    }
    assert(fullpelLossless == hb,
      "only the flat edge column should be integer-predictable at SAD 0")
  }

  test("Mcv: a quarter-sample-translating frame is lossless through " +
    "the three-stage ladder, and an exhaustive integer+half sweep " +
    "provably cannot do it") {
    val (w, h) = (48, 32)
    val wb = w / 8; val hb = h / 8
    def cell(i: Int, j: Int): Int = 20 + 11 + 4 * i + 17 * j
    val f0 = Array.tabulate(w * h)(p => cell((p % w) / 8, (p / w) / 8).toByte)
    val f1 = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      ((3 * cell(x / 8, y / 8) +
        cell(math.min(x + 1, w - 1) / 8, y / 8) + 2) >> 2).toByte
    }
    val stream = graft.multimodal.Mcv.build(w, h, Seq(f0, f1))
    val (_, _, dec, census) = graft.multimodal.Mcv.parse(stream).get
    assert(census.head.residBlocks == 0 && census.head.intraBlocks == 0)
    assert(java.util.Arrays.equals(dec(1), f1),
      "quarter-pel prediction must reproduce the interpolated frame")
    assert(census.head.quarterVectors == (wb - 1) * hb,
      "every interior block needs a quarter-sample component")
    assert(census.head.halfVectors == 0 &&
      census.head.zeroVectors == hb)
    // the boundary column sits one level above its cell — a value the
    // half-pel filter (averages of cells differing by 4) cannot form
    val ref = dec(0)
    var subHalfLossless = 0
    for (by <- 0 until hb; bx <- 0 until wb) {
      var best = Int.MaxValue
      for {
        hy <- -8 to 8; hx <- -8 to 8
        ixq = hx >> 1; iyq = hy >> 1; fxh = hx & 1; fyh = hy & 1
        if bx * 8 + ixq >= 0 && bx * 8 + ixq + 8 + fxh <= w &&
          by * 8 + iyq >= 0 && by * 8 + iyq + 8 + fyh <= h
      } {
        var s = 0
        for (r <- 0 until 8; c <- 0 until 8) {
          val row0 = (by * 8 + iyq + r) * w + bx * 8 + ixq
          val row1 = if (fyh == 1) row0 + w else row0
          val p00 = ref(row0 + c) & 0xff
          val v =
            if (fxh == 1 && fyh == 1)
              (p00 + (ref(row0 + c + 1) & 0xff) + (ref(row1 + c) & 0xff) +
                (ref(row1 + c + 1) & 0xff) + 2) >> 2
            else if (fxh == 1) (p00 + (ref(row0 + c + 1) & 0xff) + 1) >> 1
            else if (fyh == 1) (p00 + (ref(row1 + c) & 0xff) + 1) >> 1
            else p00
          s += math.abs((f1((by * 8 + r) * w + bx * 8 + c) & 0xff) - v)
        }
        if (s < best) best = s
      }
      if (best == 0) subHalfLossless += 1
    }
    assert(subHalfLossless == hb,
      "only the flat edge column should be half-or-coarser predictable")
  }

  test("Gop: B-frames refine to half-pel through the shared stage — a " +
    "half-sample pan is lossless end to end") {
    val (w, h) = (48, 32)
    val (f0, f1) = halfpelPair(9L, w, h)
    // display order I, B, P with P = I (a hold) and B the half-pel
    // interpolation: the B must predict losslessly from EITHER anchor
    // at (dxH=1, dyH=0) — integer search alone cannot
    val stream = graft.multimodal.Gop.build(w, h, Seq(f0, f1, f0))
    val (_, _, dec, _, bCensus) = graft.multimodal.Gop.parse(stream).get
    assert(bCensus.head.residBlocks == 0 && bCensus.head.intraBlocks == 0)
    assert(bCensus.head.halfVectors > 0,
      "the B section must have used half-sample vectors")
    assert(java.util.Arrays.equals(dec(1), f1),
      "half-pel B prediction must reproduce the interpolated frame")
  }
}

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

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 codec additions: half-pel motion (Mcv/Gop stage 2). */
class Round13OpsSpec extends AnyFunSuite {

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

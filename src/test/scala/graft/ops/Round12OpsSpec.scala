package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Round-12 pins: the ADVICE hardenings (Dctv padding-bit strictness,
  * semantic boolean config compare) plus the round's new operators'
  * edge behavior, each driven with injected fixtures rather than the
  * clean shipped corpus. */
class Round12OpsSpec extends SparkFunSuite {

  private def dctvFrames(w: Int, h: Int): Seq[Array[Byte]] =
    (0 until 3).map { f =>
      Array.tabulate(w * h) { p =>
        val bx = (p % w) / 8; val by = (p / w) / 8
        if (bx >= f && bx < f + 2 && by == 1) (150 + f * 9).toByte
        else ((bx * 13 + by * 31) % 112).toByte
      }
    }

  test("Dctv: a set padding bit above wb*hb in a P-frame bitmap is " +
    "non-canonical and rejected (round-11 ADVICE)") {
    // 48x48: wb*hb = 36 blocks -> bmLen 5 bytes, so padding bits live
    // at indices 36..39 of the final bitmap byte
    val (pw, ph) = (48, 48)
    val good = graft.multimodal.Dctv.build(pw, ph, dctvFrames(pw, ph))
    assert(graft.multimodal.Dctv.parse(good).isDefined)
    def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    val bmOff = (14L + u32(good, 10)).toInt // first P-frame bitmap
    val bmLen = ((pw / 8) * (ph / 8) + 7) / 8
    val padByte = bmOff + bmLen - 1
    val bad = good.clone()
    // set the TOP bit of the final bitmap byte = block index 39 >= 36
    bad(padByte) = (bad(padByte) | 0x80).toByte
    assert(graft.multimodal.Dctv.parse(bad).isEmpty,
      "a non-canonical padding bit must fail closed")
  }

  test("mojibakeRepair: both double-UTF8 classes re-decode, controls " +
    "strip, clean and unrepairable text pass byte-identical") {
    import TextOps.{mojibakeRepair => fix}
    // the e-acute class: (0xC3, 0xA9) -> U+00E9
    assert(fix("caf\u00C3\u00A9 latte") == "caf\u00E9 latte")
    // the smart-quote class: (0xE2, 0x20AC, 0x2122) -> U+2019
    assert(fix("it\u00E2\u20AC\u2122s fine") == "it\u2019s fine")
    // left/right double quotes via the CP1252 specials table
    assert(fix("\u00E2\u20AC\u0153q\u00E2\u20AC\u009D") ==
      "\u201Cq\u201D")
    // stray C1 and C0 strip; TAB/LF/CR survive
    assert(fix("x\u0085y") == "xy")
    assert(fix("a\u0001b\u0002c") == "abc")
    assert(fix("tabs\tand\nlines\rstay") == "tabs\tand\nlines\rstay")
    // clean text round-trips byte-identical
    assert(fix("perfectly clean text") == "perfectly clean text")
    // U+FFFD records upstream loss: NOT repairable, passes through
    assert(fix("bad\uFFFDbyte") == "bad\uFFFDbyte")
    // an unrepairable 'â€' (third char maps outside a continuation
    // byte) stays visible to the detector
    assert(fix("\u00E2\u20ACZ") == "\u00E2\u20ACZ")
    // a C1 char that is a continuation of a live Ã repairs, never strips
    assert(fix("\u00C3\u0086") == "\u00C6")
    // chained lead bytes: only the aligned pair re-decodes
    assert(fix("\u00C3\u00C3\u00A9") == "\u00C3\u00E9")
  }

  test("text_mojibake_fix: the repaired corpus' detector counts drop " +
    "to zero for repairable classes and the ledger is computed") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mojifix").toString
    Seq(
      (1L, "caf\u00C3\u00A9 latte", "en", "a", 11L),   // repairable
      (2L, "it\u00E2\u20AC\u2122s ok", "en", "a", 8L), // repairable
      (3L, "bad\uFFFDbyte", "en", "a", 8L),            // NOT repairable
      (4L, "x\u0085y\u0007z", "en", "b", 5L),          // strip classes
      (5L, "perfectly clean", "en", "b", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.textMojibakeFix(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a"); val b = got("b")
    assert(a.getAs[Long]("n_changed") == 2 &&
      a.getAs[Long]("chars_removed") == 1 + 2, // 2-char and 3-char fixes
      "both double-UTF8 repairs must land")
    assert(a.getAs[Long]("post_double_utf8") == 0 &&
      a.getAs[Long]("post_c1") == 0,
      "repairable detector classes must read zero after repair")
    assert(a.getAs[Long]("post_replacement") == 1,
      "U+FFFD survives repair (honest: the loss already happened)")
    assert(b.getAs[Long]("n_changed") == 1 &&
      b.getAs[Long]("chars_removed") == 2 &&
      b.getAs[Long]("post_c1") == 0 && b.getAs[Long]("post_controls") == 0)
  }

  // ---- motion-compensated video -------------------------------------

  /** The mm_mc_features corpus class: an infinite block-constant field
    * translating +4 px/frame, leftmost two column cells equal. */
  private def mcFrames(id: Long, w: Int, h: Int): Seq[Array[Byte]] = {
    def cell(i: Int, j: Int): Int =
      ((id * 7 + math.max(i, 1) * 13 + j * 31) % 256).toInt
    (0 until 3).map { f =>
      Array.tabulate(w * h) { p =>
        cell((p % w - 4 * f + 8) / 8, (p / w) / 8).toByte
      }
    }
  }

  test("Mcv: a translating scene is FULLY lossless through pure motion " +
    "compensation — zero residuals, zero intra, and the MC stream " +
    "beats conditional replenishment") {
    val (w, h) = (48, 32)
    val frames = mcFrames(5L, w, h)
    val stream = graft.multimodal.Mcv.build(w, h, frames)
    val (pw, ph, dec, census) = graft.multimodal.Mcv.parse(stream).get
    assert((pw, ph) == (w, h) && dec.length == 3)
    frames.zip(dec).zipWithIndex.foreach { case ((exp, got), f) =>
      assert(java.util.Arrays.equals(exp, got),
        s"frame $f diverged — MC prediction must be exact here")
    }
    val wb = w / 8; val hb = h / 8
    census.foreach { c =>
      assert(c.intraBlocks == 0 && c.residBlocks == 0,
        "the translating corpus needs no intra/residual blocks")
      assert(c.zeroVectors == hb, "the left column rides (0,0)")
      assert(c.mvBlocks == wb * hb)
    }
    // the tier's reason to exist: CR re-sends every straddling block
    // as a DCT strip; MC sends one byte per block
    val cr = graft.multimodal.Dctv.build(w, h, frames)
    assert(stream.length < cr.length,
      s"MC (${stream.length} B) must beat CR (${cr.length} B) on a " +
        "translating scene")
  }

  test("Mcv: a scene cut falls back to intra coding (no displacement " +
    "explains the new content)") {
    val (w, h) = (48, 32)
    val f0 = Array.tabulate(w * h)(p =>
      ((((p % w) / 8) * 13 + ((p / w) / 8) * 31) % 100).toByte)
    val cut = Array.tabulate(w * h)(p => (200 + ((p % w) / 8)).toByte)
    val stream = graft.multimodal.Mcv.build(w, h, Seq(f0, cut))
    val (_, _, dec, census) = graft.multimodal.Mcv.parse(stream).get
    assert(census.head.intraBlocks == (w / 8) * (h / 8),
      "every block of the cut frame must code intra")
    // flat blocks ride the all-ones-quantization JPEG exactly
    assert(java.util.Arrays.equals(dec(1), cut))
  }

  test("Mcv: near-predictable noise rides the residual path with " +
    "bounded loss and bounded generational drift") {
    val (w, h) = (48, 32)
    def mix(i: Long): Int = {
      var x = i * 0x9e3779b97f4a7c15L
      x ^= x >>> 32; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 29
      (x & 0xff).toInt
    }
    val f0 = Array.tabulate(w * h)(p => (64 + mix(p.toLong) % 128).toByte)
    // frame 1 = frame 0 + a small per-pixel wiggle (±7): best SAD is
    // small but nonzero -> MC + residual, never intra
    val f1 = Array.tabulate(w * h) { p =>
      ((f0(p) & 0xff) + (mix(p.toLong + 999) % 15) - 7).toByte
    }
    val stream = graft.multimodal.Mcv.build(w, h, Seq(f0, f1))
    val (_, _, dec, census) = graft.multimodal.Mcv.parse(stream).get
    assert(census.head.intraBlocks == 0, "wiggle must not trip intra")
    assert(census.head.residBlocks > 0, "wiggle must need residuals")
    var maxErr = 0
    var p = 0
    while (p < f1.length) {
      val e = math.abs((f1(p) & 0xff) - (dec(1)(p) & 0xff))
      if (e > maxErr) maxErr = e
      p += 1
    }
    assert(maxErr <= 10, s"residual reconstruction error $maxErr")
    // closed loop: re-encoding the DECODED frames stays in band
    val second = graft.multimodal.Mcv.build(w, h, dec)
    val dec2 = graft.multimodal.Mcv.parse(second).get._3
    var drift = 0
    p = 0
    while (p < dec(1).length) {
      val e = math.abs((dec(1)(p) & 0xff) - (dec2(1)(p) & 0xff))
      if (e > drift) drift = e
      p += 1
    }
    assert(drift <= 10, s"generation-2 drift $drift")
  }

  test("Mcv: hostile streams fail closed — padding bits, conflicting " +
    "mode bits, bad nibbles, out-of-bounds vectors, truncation, " +
    "trailing garbage") {
    // 48x48 -> 36 blocks -> bmLen 5, so padding bits exist at 36..39
    val (pw, ph) = (48, 48)
    val good = graft.multimodal.Mcv.build(pw, ph, mcFrames(3L, pw, ph))
    assert(graft.multimodal.Mcv.parse(good).isDefined)
    def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    val bmLen = ((pw / 8) * (ph / 8) + 7) / 8
    val intraOff = (14L + u32(good, 10)).toInt // first P-frame bitmaps
    // padding bit in the INTRA bitmap
    val padI = good.clone()
    padI(intraOff + bmLen - 1) = (padI(intraOff + bmLen - 1) | 0x80).toByte
    assert(graft.multimodal.Mcv.parse(padI).isEmpty)
    // padding bit in the RESIDUAL bitmap
    val padR = good.clone()
    padR(intraOff + 2 * bmLen - 1) =
      (padR(intraOff + 2 * bmLen - 1) | 0x80).toByte
    assert(graft.multimodal.Mcv.parse(padR).isEmpty)
    // intra AND residual on the same block is non-canonical
    val conflict = good.clone()
    conflict(intraOff) = (conflict(intraOff) | 1).toByte
    conflict(intraOff + bmLen) = (conflict(intraOff + bmLen) | 1).toByte
    assert(graft.multimodal.Mcv.parse(conflict).isEmpty)
    // a half-sample vector byte above 16 is out of range
    val badNibble = good.clone()
    badNibble(intraOff + 2 * bmLen) = 0xFF.toByte
    assert(graft.multimodal.Mcv.parse(badNibble).isEmpty)
    // block 0 with dxH = -8 (byte 0) points outside the frame — in
    // range, but the footprint leaves the left edge
    val oob = good.clone()
    oob(intraOff + 2 * bmLen) = 0x00.toByte
    assert(graft.multimodal.Mcv.parse(oob).isEmpty)
    // block 0 with dxH = -1 (byte 7): the ODD component needs one
    // extra interpolation column past the left edge — also hostile
    val oobHalf = good.clone()
    oobHalf(intraOff + 2 * bmLen) = 0x07.toByte
    assert(graft.multimodal.Mcv.parse(oobHalf).isEmpty)
    assert(graft.multimodal.Mcv.parse(good.take(good.length / 2)).isEmpty)
    assert(graft.multimodal.Mcv
      .parse(good ++ Array[Byte](0)).isEmpty)
    assert(graft.multimodal.Mcv.parse(null).isEmpty)
  }

  // ---- bidirectional (B-frame) video ---------------------------------

  /** The mm_bframe_features corpus: field translating +2 px/frame and
    * a flat 2x2-block object appearing at the B frame. */
  private def gopFrames(id: Long, w: Int, h: Int): Seq[Array[Byte]] = {
    val wb = w / 8; val hb = h / 8
    val rbx = 1 + (id % (wb - 3)).toInt
    val rby = (id % (hb - 1)).toInt
    (0 until 3).map { f =>
      Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        val inRect = f >= 1 && x >= 8 * rbx && x < 8 * rbx + 16 &&
          y >= 8 * rby && y < 8 * rby + 16
        if (inRect) 255.toByte
        else ((id * 7 + math.max((x - 2 * f + 8) / 8, 1) * 13 +
          (y / 8) * 31) % 128).toByte
      }
    }
  }

  test("Gop: content APPEARING at the B frame rides backward " +
    "prediction, the whole I-B-P group is lossless, and only the " +
    "B tier explains it without intra") {
    val (w, h) = (48, 32)
    val frames = gopFrames(7L, w, h)
    val stream = graft.multimodal.Gop.build(w, h, frames)
    val (pw, ph, dec, pCensus, bCensus) =
      graft.multimodal.Gop.parse(stream).get
    assert((pw, ph) == (w, h) && dec.length == 3)
    frames.zip(dec).zipWithIndex.foreach { case ((exp, got), f) =>
      assert(java.util.Arrays.equals(exp, got), s"frame $f diverged")
    }
    val wb = w / 8; val hb = h / 8
    val b = bCensus.head
    assert(b.bwdBlocks == 4,
      "the appearing object's 4 blocks must predict BACKWARD")
    assert(b.fwdBlocks == wb * hb - 4 && b.avgBlocks == 0)
    assert(b.intraBlocks == 0 && b.residBlocks == 0,
      "the constructed GOP needs no intra/residual in the B frame")
    assert(b.zeroVectors == hb + 1,
      "left column fwd (0,0) + the object's top-left bwd (0,0)")
    // in the P anchor the same object has NO past to predict from
    assert(pCensus.head.intraBlocks == 4)
  }

  test("Gop: the average mode wins on a cross-fade (B = midpoint of " +
    "its anchors)") {
    val (w, h) = (48, 32)
    val a0 = Array.fill[Byte](w * h)(100.toByte)
    val b1 = Array.fill[Byte](w * h)(150.toByte)
    val a2 = Array.fill[Byte](w * h)(200.toByte)
    val stream = graft.multimodal.Gop.build(w, h, Seq(a0, b1, a2))
    val (_, _, dec, _, bCensus) = graft.multimodal.Gop.parse(stream).get
    assert(bCensus.head.avgBlocks == (w / 8) * (h / 8),
      "every block of the midpoint frame must ride the average mode")
    assert(bCensus.head.residBlocks == 0, "the rounded average is exact")
    assert(java.util.Arrays.equals(dec(1), b1))
  }

  test("Gop: hostile streams fail closed — bad direction byte, even " +
    "frame count, trailing garbage") {
    val (w, h) = (48, 32)
    val good = graft.multimodal.Gop.build(w, h, gopFrames(3L, w, h))
    assert(graft.multimodal.Gop.parse(good).isDefined)
    def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    // walk to the B section: header+I, then the P section (2 bitmaps
    // + 2-byte MV pairs + strip), then the B bitmaps, then
    // (dir, mv-pair) triples
    val wb = w / 8; val hb = h / 8
    val bmLen = (wb * hb + 7) / 8
    var off = (14L + u32(good, 10)).toInt // P intra bitmap
    def bitCount(o: Int): Int =
      (0 until wb * hb).count(i => (good(o + i / 8) & (1 << (i % 8))) != 0)
    val pIntra = bitCount(off)
    val pMv = wb * hb - pIntra
    val pStripLen = u32(good, off + 2 * bmLen + 2 * pMv).toInt
    off += 2 * bmLen + 2 * pMv + 4 + pStripLen // B intra bitmap
    val bIntra = bitCount(off)
    assert(bIntra == 0) // corpus contract: all B blocks are MC
    val dirOff = off + 2 * bmLen // first (dir, mv-pair) triple
    val bad = good.clone()
    bad(dirOff) = 3.toByte // direction 3 does not exist
    assert(graft.multimodal.Gop.parse(bad).isEmpty,
      "an invalid direction byte must fail closed")
    // an even display count cannot end on an anchor
    val evenNf = good.clone()
    evenNf(8) = 4.toByte; evenNf(9) = 0.toByte
    assert(graft.multimodal.Gop.parse(evenNf).isEmpty)
    assert(graft.multimodal.Gop.parse(good ++ Array[Byte](0)).isEmpty)
    assert(graft.multimodal.Gop.parse(null).isEmpty)
  }

  test("crawl_funnel: the composed extract -> repair -> gates path " +
    "routes each fixture class to the right stage") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("crawlfun").toString
    val long = ("the quick brown fox jumps over the lazy dog and keeps " +
      "on running through the field ") * 3
    Seq(
      // survives everything (en, long, quality prose)
      (1L, long, "en", "a", 100L),
      // an exact duplicate: dropped only at the dedup tail
      (2L, long, "en", "a", 100L),
      // too short for the boilerplate rule: dies at `extracted`
      (3L, "three words only", "en", "a", 3L),
      // extractable but not English: dies at lang_en
      (4L, long, "de", "a", 100L),
      // the repair-in-composition path: a C1 control INSIDE the text
      // is stripped by the repair stage and the doc still survives
      (5L, long + "x\u0085y", "en", "a", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.crawlFunnel(spark, d).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got("total") == 5)
    assert(got("extracted") == 4, "the 3-word doc dies at extraction")
    assert(got("nonempty") == 4 && got("lang_en") == 3)
    assert(got("quality") == 3 && got("token_range") == 3)
    assert(got("exact_unique") == 2,
      "the duplicate dies only at the dedup tail")
  }

  test("plan census: boolean-valued configs compare semantically " +
    "('TRUE'/'True' is the same plan regime, not a drift)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "TRUE")
    s2.conf.set("spark.sql.codegen.wholeStage", "True")
    // must NOT throw: differently rendered booleans are equal
    PlanCensus.assertCensusConfig(s2)
    // a semantically DIFFERENT boolean still fails fast with the
    // named diagnosis
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val e = intercept[IllegalStateException] {
      PlanCensus.assertCensusConfig(s2)
    }
    assert(e.getMessage.contains("CONFIG MISMATCH"))
  }
}

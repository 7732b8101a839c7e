package graft.ops

import graft.SparkFunSuite

/** Round-9 operator pins. */
class Round9OpsSpec extends SparkFunSuite {

  test("plan_buildsides: census columns, one row per panel query, sane counts") {
    val rows = PlanCensus.planBuildSides(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("q02", "q09", "q18"))
    rows.foreach { r =>
      val (bhj, smj, bl, br) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // every join is SOME strategy and every strategy has a build side
      assert(bhj + smj >= 2, s"${r.getString(0)}: too few joins ($bhj+$smj)")
      assert(bl + br == bhj + smj,
        s"${r.getString(0)}: build sides ($bl+$br) != joins (${bhj + smj})")
      // at fixture scale AQE must broadcast every panel join — a
      // sort-merge here is the exact regression the census exists
      // to catch (lost stats, stray hint, disabled AQE rule)
      assert(smj == 0, s"${r.getString(0)}: lost a broadcast to sort-merge")
    }
  }

  test("plan_buildsides: the census is deterministic run-over-run") {
    val a = PlanCensus.planBuildSides(spark, sfDir).collect().toSeq
    val b = PlanCensus.planBuildSides(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("plan_shuffles: static census invariants hold at fixture scale") {
    val rows = PlanCensus.planShuffles(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("a02_keepoldest", "j01_enrich", "j06_anti", "o01_topk",
        "q01_pricing"))
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the TakeOrdered head is shuffle-free; nothing re-scans its fact
    assert(byName("o01_topk")._1 == 0, "o01 grew a shuffle")
    rows.foreach { r =>
      assert(r.getLong(3) <= 3, s"${r.getString(0)} re-scans a table")
    }
    // the enrichment fact shuffles once and broadcasts both dims
    assert(byName("j01_enrich") == ((1L, 2L, 3L)), byName("j01_enrich"))
  }

  test("profile_skew: census identities hold on the fixture") {
    val rows = Profiling.profileSkew(spark, sfDir).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("events", "event_type"), ("events", "user_id"),
      ("lineitem", "l_orderkey"), ("lineitem", "l_suppkey"),
      ("orders", "o_custkey")))
    rows.foreach { r =>
      val (nRows, nKeys, maxC) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (share, ratio) = (r.getDouble(6), r.getDouble(7))
      assert(maxC >= 1 && maxC <= nRows && nKeys <= nRows)
      assert(math.abs(share - maxC.toDouble / nRows) < 1e-6)
      // ratio = share * n_keys (max over avg), and max >= avg always
      assert(ratio >= 1.0 - 1e-6 &&
        math.abs(ratio - share * nKeys) < 1e-3 * ratio)
      assert(r.getBoolean(8) == (ratio > 10.0))
    }
    // the low-cardinality event type concentrates load: a visible
    // max-share contrast vs the fine-grained FK keys
    val byKey = rows.map(r => r.getString(1) -> r.getDouble(6)).toMap
    assert(byKey("event_type") > 10 * byKey("l_orderkey"))
  }

  test("layout_bucketing: bucketed layout eliminates the join shuffle") {
    val rows = LayoutOlap.layoutBucketing(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("bucketed", "plain"))
    // same data through both layouts
    assert(rows("bucketed")._3 == rows("plain")._3)
    assert(rows("bucketed")._3 > 0)
    // the mechanism: plain merge-join shuffles both sides, the
    // bucketed scan shuffles neither
    assert(rows("plain")._1 == 2, s"plain census: ${rows("plain")}")
    assert(rows("bucketed")._1 == 0,
      s"bucketed join still shuffles: ${rows("bucketed")}")
  }

  test("Wav codec: round trip, chunk walking, pad bytes, rejection") {
    import graft.multimodal.Multimodal.Wav
    // round trip across lengths incl. 0 and odd counts
    for (n <- Seq(0, 1, 3, 256, 999)) {
      val in = Array.tabulate(n)(i => ((i * 37 - 5000) % 32768).toShort)
      val out = Wav.parse(Wav.build(8000, in))
      assert(out.isDefined, s"n=$n failed to parse")
      assert(out.get._1 == 8000 && out.get._2.sameElements(in), s"n=$n")
    }
    // the builder's junk LIST chunk is 5 bytes (odd) — a parser that
    // forgets the even-length pad byte walks into garbage; reaching
    // data at all proves both chunk walking and pad handling
    val wav = Wav.build(16000, Array[Short](1, -1, 32767, -32768))
    assert(new String(wav, 36, 4, "US-ASCII") == "LIST")
    assert(Wav.parse(wav).get._2.sameElements(
      Array[Short](1, -1, 32767, -32768)))
    // rejection: not RIFF, truncated data, stereo fmt
    assert(Wav.parse("not a wave file at all........................"
      .getBytes("US-ASCII")).isEmpty)
    assert(Wav.parse(wav.dropRight(3)).isEmpty)
    val stereo = wav.clone()
    stereo(22) = 2 // channel count field inside fmt
    assert(Wav.parse(stereo).isEmpty)
  }

  test("Bmp codec: round trip, orientation, stride padding, rejection") {
    import graft.multimodal.Multimodal.Bmp
    // odd width exercises the 4-byte row stride; asymmetric pixel
    // field exercises the bottom-up flip (pixels come back TOP-DOWN
    // exactly as written)
    val (w, h) = (5, 3)
    val px = Array.tabulate(w * h)(p => p * 0x010203)
    val bmp = Bmp.build(w, h, px)
    val (pw, ph, dec) = Bmp.parse(bmp).get
    assert(pw == w && ph == h && dec.sameElements(px))
    // file stores rows bottom-up: the LAST stored row is the FIRST
    // logical row — check the raw bytes to prove the writer flipped
    val stride = (w * 3 + 3) & ~3
    assert(stride == 16) // 15 data bytes + 1 pad
    val lastRowFirstBlue = bmp(54 + (h - 1) * stride) & 0xff
    assert(lastRowFirstBlue == (px(0) & 0xff), "writer is not bottom-up")
    // rejection: wrong magic, truncated, unsupported bpp
    assert(Bmp.parse("XXnot a bitmap".getBytes("US-ASCII") ++
      new Array[Byte](60)).isEmpty)
    assert(Bmp.parse(bmp.dropRight(5)).isEmpty)
    val bad = bmp.clone(); bad(28) = 8 // bpp field
    assert(Bmp.parse(bad).isEmpty)
  }

  test("Y4m codec: round trip, frame parameters, rejection") {
    import graft.multimodal.Multimodal.Y4m
    val (w, h) = (4, 2)
    val mk = (seed: Int) => (
      Array.tabulate(w * h)(i => (seed + i).toByte),
      Array.tabulate(2)(i => (seed * 2 + i).toByte),
      Array.tabulate(2)(i => (seed * 3 + i).toByte))
    val frames = Seq(mk(1), mk(50), mk(99))
    val stream = Y4m.build(w, h, frames)
    // frame 1 carries a FRAME-line parameter by construction — a
    // parser that assumes bare "FRAME\n" desynchronizes
    assert(new String(stream, "US-ASCII").contains("FRAME Xgraft"))
    val (pw, ph, dec) = Y4m.parse(stream).get
    assert(pw == w && ph == h && dec.length == 3)
    frames.zip(dec).foreach { case ((y, cb, cr), (dy, dcb, dcr)) =>
      assert(y.sameElements(dy) && cb.sameElements(dcb) &&
        cr.sameElements(dcr))
    }
    // rejection: wrong magic, truncated plane, non-420 colorspace
    assert(Y4m.parse("MPEG4YUV2 W4 H2\nFRAME\n12345678"
      .getBytes("US-ASCII")).isEmpty)
    assert(Y4m.parse(stream.dropRight(1)).isEmpty)
    val s444 = new String(stream, "US-ASCII")
      .replace("C420jpeg", "C444jpeg").getBytes("US-ASCII")
    assert(Y4m.parse(s444).isEmpty)
  }

  test("ann_ivfadc: prune → ADC → refine composition holds recall") {
    val adc = SimOps.annIvfadc(spark, sfDir).collect()
    assert(adc.length == 10)
    assert(adc.map(_.getLong(0)).distinct.length == 10)
    // refined output is ordered by exact cosine
    val coss = adc.map(_.getDouble(2))
    assert(coss.sameElements(coss.sorted.reverse))
    // the composed index keeps real recall: ≥ 5 of the 10 refined
    // hits sit in brute force's exact top-20 (measured 9/10 at this
    // fixture; the bound leaves room for quantizer drift, not failure)
    val brute = SimOps.annBrute(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val hits = adc.count(r => brute.contains(r.getLong(0)))
    assert(hits >= 5, s"IVFADC recall collapsed: $hits/10 in brute top-20")
  }
}

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

  test("plan census: boolean-valued configs compare semantically " +
    "('TRUE'/'True' is the same plan regime, not a drift)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "TRUE")
    s2.conf.set("spark.sql.codegen.wholeStage", "True")
    // must NOT throw: differently rendered booleans are equal
    CoreRelational.assertCensusConfig(s2)
    // a semantically DIFFERENT boolean still fails fast with the
    // named diagnosis
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val e = intercept[IllegalStateException] {
      CoreRelational.assertCensusConfig(s2)
    }
    assert(e.getMessage.contains("CONFIG MISMATCH"))
  }
}

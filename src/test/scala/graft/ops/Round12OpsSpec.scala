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

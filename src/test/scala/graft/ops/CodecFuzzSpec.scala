package graft.ops

import graft.SparkFunSuite
import graft.multimodal._

/** Seeded corruption sweep over EVERY codec parser — the fail-closed
  * contract the intake rows (mm_codec_dispatch / mm_binary_intake /
  * mm_tar_shards) depend on: ANY corrupted payload must yield None or
  * a well-formed result, never a throw, hang, or out-of-bounds write.
  * Corruptions are deterministic (seeded xxhash-style mixing, no
  * RNG): single-byte XORs at spread positions, truncations at every
  * eighth, and a zero-fill window. */
class CodecFuzzSpec extends SparkFunSuite {

  private def mix(seed: Long): Long = {
    var x = seed * 0x9e3779b97f4a7c15L
    x ^= x >>> 32; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 29
    x
  }

  /** Deterministic corruption variants of a golden payload. */
  private def variants(golden: Array[Byte]): Iterator[Array[Byte]] = {
    val xors = (0 until 200).iterator.map { k =>
      val b = golden.clone()
      val pos = (math.abs(mix(k.toLong)) % golden.length).toInt
      val bit = (math.abs(mix(k.toLong + 7777)) % 8).toInt
      b(pos) = (b(pos) ^ (1 << bit)).toByte
      b
    }
    val truncs = (1 until 8).iterator.map(k => golden.take(golden.length * k / 8))
    val zeroed = Iterator.single {
      val b = golden.clone()
      val at = golden.length / 3
      java.util.Arrays.fill(b, at, math.min(golden.length, at + 16), 0.toByte)
      b
    }
    xors ++ truncs ++ zeroed
  }

  private def sweep(name: String, golden: Array[Byte],
      parse: Array[Byte] => Option[Any]): Unit = {
    assert(parse(golden).isDefined, s"$name: golden payload must parse")
    var crashed = 0
    variants(golden).foreach { v =>
      try parse(v)
      catch { case e: Throwable => crashed += 1 }
    }
    assert(crashed == 0, s"$name: $crashed corruptions crashed the parser")
  }

  test("every codec parser survives 208 seeded corruptions without a " +
    "throw (None or well-formed only)") {
    val pngPx = Array.tabulate(11 * 9) { p =>
      ((p * 37 % 256) << 16) | ((p * 11 % 256) << 8) | (p % 256)
    }
    sweep("png", Png.build(11, 9, pngPx), b => Png.parse(b))
    sweep("gif", Gif.build(14, 10,
      Array.tabulate(140)(i => (i % 256).toByte)), b => Gif.parse(b))
    sweep("mulaw", Mulaw.build(8000,
      Array.tabulate(120)(i => ((i * 431 % 3000) - 1500).toShort)),
      b => Mulaw.parse(b))
    sweep("adpcm", Adpcm.build(8000,
      Array.tabulate(120)(i => ((i * 431 % 3000) - 1500).toShort)),
      b => Adpcm.parse(b))
    sweep("wav", Multimodal.Wav.build(8000,
      Array.tabulate(120)(i => (i * 99).toShort)),
      b => Multimodal.Wav.parse(b))
    sweep("bmp", Multimodal.Bmp.build(9, 7, pngPx.take(63)),
      b => Multimodal.Bmp.parse(b))
    val y = Array.tabulate(12 * 8)(p => (p % 251).toByte)
    val c = Array.tabulate(24)(p => (p * 3 % 251).toByte)
    sweep("y4m", Multimodal.Y4m.build(12, 8, Seq((y, c, c))),
      b => Multimodal.Y4m.parse(b))
    val jy = Array.tabulate(16 * 16)(p =>
      (((p % 16) / 8 * 13 + (p / 16) / 8 * 31) % 256).toByte)
    val jc = Array.tabulate(64)(p => 99.toByte)
    val jpg = Jpeg.build(16, 16, jy, jc, jc)
    sweep("jpeg", jpg, b => Jpeg.parse(b))
    sweep("avi", Avi.build(16, 16, Seq(jpg, jpg)), b => Avi.parse(b))
    sweep("tar", Tar.build(Seq(
      "a.bin" -> Array.tabulate(700)(_.toByte),
      "b.bin" -> Array.tabulate(123)(_.toByte))), b => Tar.parse(b))
    // intra-DCT conditional-replenishment video: a corrupted bitmap,
    // strip length, or strip payload must quarantine, never crash
    val dv = (0 until 3).map { f =>
      Array.tabulate(48 * 32) { p =>
        val bx = (p % 48) / 8; val by = (p / 48) / 8
        if (bx == (f + 1) % 5 && by == f % 3) (140 + f * 7).toByte
        else ((bx * 13 + by * 31) % 112).toByte
      }
    }
    sweep("dctv", Dctv.build(48, 32, dv), b => Dctv.parse(b))
    // motion-compensated video: a corrupted bitmap, motion byte
    // (nibble/bounds), strip length, or strip payload must
    // quarantine, never crash
    val mv = (0 until 3).map { f =>
      Array.tabulate(48 * 32) { p =>
        val x = p % 48; val y = p / 48
        ((math.max((x - 4 * f + 8) / 8, 1) * 13 + (y / 8) * 31) % 256).toByte
      }
    }
    sweep("mcv", Mcv.build(48, 32, mv), b => Mcv.parse(b))
    // bidirectional GOP: a corrupted direction byte, bitmap, vector,
    // or strip in either the P or B section must quarantine
    val gop = (0 until 3).map { f =>
      Array.tabulate(48 * 32) { p =>
        val x = p % 48; val y = p / 48
        if (f >= 1 && x >= 16 && x < 32 && y >= 8 && y < 24) 255.toByte
        else ((math.max((x - 2 * f + 8) / 8, 1) * 13 +
          (y / 8) * 31) % 128).toByte
      }
    }
    sweep("gop", Gop.build(48, 32, gop), b => Gop.parse(b))
    // 32-subband perceptual audio: a corrupted allocation nibble,
    // non-canonical scalefactor, out-of-range quantized field,
    // nonzero pad bit, or truncation must quarantine, never crash
    val sb = Array.tabulate(768) { i =>
      (900 * Subband.walshSign(5, i % 32) +
        300 * Subband.walshSign(11, i % 32) + (i % 5) - 2).toShort
    }
    sweep("subband", Subband.encode(sb, 16000), b => Subband.decode(b))
  }

  test("Rle8.decode survives seeded corruption of key and delta chunks") {
    val w = 24; val h = 12
    val f0 = Array.tabulate(w * h)(p => ((p / 8) % 100).toByte)
    val f1 = f0.clone()
    for (x <- 3 until 11) f1(5 * w + x) = 120.toByte
    val key = Rle8.encodeKey(w, h, f0)
    val delta = Rle8.encodeDelta(w, h, f0, f1)
    for (chunk <- Seq(key, delta); prev <- Seq(None, Some(f0))) {
      var crashed = 0
      variants(chunk).foreach { v =>
        try Rle8.decode(w, h, v, prev)
        catch { case _: Throwable => crashed += 1 }
      }
      assert(crashed == 0, s"rle8: $crashed corruptions crashed")
    }
  }

  test("AutoCodec quarantines every corruption of every dispatchable " +
    "format (the intake contract)") {
    val auto = new Codecs.AutoCodec
    val goldens = Seq(
      Png.build(8, 6, Array.tabulate(48)(p => p * 0x010101)),
      Gif.build(10, 5, Array.tabulate(50)(i => (i % 256).toByte)),
      Mulaw.build(8000, Array.tabulate(77)(i => (i * 55).toShort)),
      // the WAVE fmt-tag sub-dispatch branches: PCM and IMA ADPCM
      graft.multimodal.Multimodal.Wav.build(8000,
        Array.tabulate[Short](64)(i => (i * 91).toShort)),
      graft.multimodal.Adpcm.build(8000,
        Array.tabulate[Short](50)(i => (i * 83).toShort)))
    goldens.foreach { g =>
      assert(auto.decode(g, null).isDefined)
      var crashed = 0
      variants(g).foreach { v =>
        try auto.decode(v, null)
        catch { case _: Throwable => crashed += 1 }
      }
      assert(crashed == 0, s"autocodec: $crashed corruptions crashed")
    }
  }
}

package graft.multimodal

import org.apache.spark.sql.Row
import graft.multimodal.Multimodal.MediaCodec

/** The round-10 codec family behind the SAME batched
  * [[Multimodal.MediaCodec]] trait the stand-ins and [[Multimodal.JpegCodec]]
  * ride — one object per real format, plus [[AutoCodec]], the
  * magic-byte dispatcher a mixed-format intake actually runs.
  *
  * Every feature vector here is a COUNT histogram (each decoded unit
  * increments integer bins), so downstream digests (L1 mass = units
  * decoded, weighted sums) replay exactly in an oracle without
  * floating-point drift.
  */
object Codecs {

  /** PNG → 32-dim count histogram: 16 red/16 bins + 8 green/32 + 8
    * blue/32 (every pixel increments 3 bins ⇒ L1 = 3·w·h). */
  final class PngCodec extends MediaCodec {
    val featureDim: Int = 32
    def decode(payload: Array[Byte], meta: Row): Option[Array[Float]] =
      Png.parse(payload).map { case (_, _, px) =>
        val f = new Array[Float](featureDim)
        var i = 0
        while (i < px.length) {
          f(((px(i) >> 16) & 0xff) / 16) += 1f
          f(16 + (((px(i) >> 8) & 0xff) / 32)) += 1f
          f(24 + ((px(i) & 0xff) / 32)) += 1f
          i += 1
        }
        f
      }
  }

  /** GIF → 32-dim count histogram over palette indices / 8
    * (L1 = w·h). */
  final class GifCodec extends MediaCodec {
    val featureDim: Int = 32
    def decode(payload: Array[Byte], meta: Row): Option[Array[Float]] =
      Gif.parse(payload).map { case (_, _, idx, _) =>
        val f = new Array[Float](featureDim)
        var i = 0
        while (i < idx.length) { f((idx(i) & 0xff) / 8) += 1f; i += 1 }
        f
      }
  }

  /** The shared audio feature map: 32-bin count histogram over 16-bit
    * samples shifted to [0, 65535] and binned by 2048 (L1 = sample
    * count) — one definition so the three WAVE codecs cannot drift
    * apart from each other or their oracles. */
  private def sampleHistogram(samples: Array[Short]): Array[Float] = {
    val f = new Array[Float](32)
    var i = 0
    while (i < samples.length) {
      f((samples(i).toInt + 32768) / 2048) += 1f
      i += 1
    }
    f
  }

  /** μ-law WAVE → the shared decoded-sample histogram. */
  final class MulawCodec extends MediaCodec {
    val featureDim: Int = 32
    def decode(payload: Array[Byte], meta: Row): Option[Array[Float]] =
      Mulaw.parse(payload).map { case (_, s) => sampleHistogram(s) }
  }

  /** MJPEG/AVI → 32-dim LUMA count histogram over every decoded frame
    * (16 bins used, /16; L1 = n_frames·w·h). */
  final class AviCodec extends MediaCodec {
    val featureDim: Int = 32
    def decode(payload: Array[Byte], meta: Row): Option[Array[Float]] =
      Avi.parse(payload).map { case (_, _, frames) =>
        val f = new Array[Float](featureDim)
        frames.foreach { planes =>
          val y = planes(0)
          var i = 0
          while (i < y.length) { f((y(i) & 0xff) / 16) += 1f; i += 1 }
        }
        f
      }
  }

  /** PCM WAVE → the shared decoded-sample histogram. The uncompressed
    * sibling format a mixed audio intake sees most often. */
  final class PcmCodec extends MediaCodec {
    val featureDim: Int = 32
    def decode(payload: Array[Byte], meta: Row): Option[Array[Float]] =
      Multimodal.Wav.parse(payload).map { case (_, s) => sampleHistogram(s) }
  }

  /** IMA/DVI ADPCM WAVE → the shared histogram over the EXPANDED
    * samples (the full adaptive decode loop runs). */
  final class AdpcmCodec extends MediaCodec {
    val featureDim: Int = 32
    def decode(payload: Array[Byte], meta: Row): Option[Array[Float]] =
      Adpcm.parse(payload).map { case (_, s) => sampleHistogram(s) }
  }

  /** The production intake shape: sniff the container by magic bytes
    * and dispatch to the right real codec — unknown or malformed
    * payloads quarantine as None instead of poisoning the batch. The
    * dispatcher itself stays cheap (a few byte compares per asset,
    * plus one bounded chunk walk for RIFF/WAVE — the container tag
    * alone does not identify the audio codec, so the fmt chunk's
    * format tag sub-dispatches PCM (1) vs G.711 μ-law (7) vs IMA/DVI
    * ADPCM (0x11); any other tag quarantines). The delegates are
    * constructed once with the dispatcher, so the per-partition
    * amortization of [[Multimodal.extractFeatures]] carries
    * through. */
  final class AutoCodec extends MediaCodec {
    val featureDim: Int = 32
    private val png = new PngCodec
    private val gif = new GifCodec
    private val mulaw = new MulawCodec
    private val pcm = new PcmCodec
    private val adpcm = new AdpcmCodec
    private val avi = new AviCodec
    private val jpeg = new Multimodal.JpegCodec

    /** Walk the RIFF chunks to the fmt chunk and return its format
      * tag, or -1 for anything malformed (Long cursor + negative-size
      * reject, the [[Multimodal.Wav]] hostile-bytes posture). */
    private def waveFmtTag(p: Array[Byte]): Int = {
      def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      var off = 12L
      while (off + 8 <= p.length) {
        val o = off.toInt
        val len = ((p(o + 4) & 0xffL)) | ((p(o + 5) & 0xffL) << 8) |
          ((p(o + 6) & 0xffL) << 16) | ((p(o + 7) & 0xffL) << 24)
        if (len.toInt < 0) return -1
        if (p(o) == 'f' && p(o + 1) == 'm' && p(o + 2) == 't' &&
            p(o + 3) == ' ')
          return if (len >= 16 && off + 10 <= p.length) u16(o + 8) else -1
        off += 8L + len.toInt + (len.toInt & 1)
      }
      -1
    }

    def decode(payload: Array[Byte], meta: Row): Option[Array[Float]] = {
      if (payload == null || payload.length < 12) return None
      def at(o: Int, s: String): Boolean = {
        val b = s.getBytes("US-ASCII")
        var i = 0
        while (i < b.length) {
          if (payload(o + i) != b(i)) return false
          i += 1
        }
        true
      }
      if ((payload(0) & 0xff) == 0x89 && at(1, "PNG")) png.decode(payload, meta)
      else if (at(0, "GIF8")) gif.decode(payload, meta)
      else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
        jpeg.decode(payload, meta)
      else if (at(0, "RIFF") && at(8, "WAVE")) waveFmtTag(payload) match {
        case 1    => pcm.decode(payload, meta)
        case 7    => mulaw.decode(payload, meta)
        case 0x11 => adpcm.decode(payload, meta)
        case _    => None
      }
      else if (at(0, "RIFF") && at(8, "AVI ")) avi.decode(payload, meta)
      else None
    }
  }
}

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

  /** μ-law WAVE → 32-dim count histogram over decoded 16-bit samples
    * shifted to [0, 65535] and binned by 2048 (L1 = sample count). */
  final class MulawCodec extends MediaCodec {
    val featureDim: Int = 32
    def decode(payload: Array[Byte], meta: Row): Option[Array[Float]] =
      Mulaw.parse(payload).map { case (_, samples) =>
        val f = new Array[Float](featureDim)
        var i = 0
        while (i < samples.length) {
          f((samples(i).toInt + 32768) / 2048) += 1f
          i += 1
        }
        f
      }
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

  /** The production intake shape: sniff the container by magic bytes
    * and dispatch to the right real codec — unknown or malformed
    * payloads quarantine as None instead of poisoning the batch. The
    * dispatcher itself stays cheap (a few byte compares per asset);
    * the delegates are constructed once with the dispatcher, so the
    * per-partition amortization of [[Multimodal.extractFeatures]]
    * carries through. */
  final class AutoCodec extends MediaCodec {
    val featureDim: Int = 32
    private val png = new PngCodec
    private val gif = new GifCodec
    private val mulaw = new MulawCodec
    private val avi = new AviCodec
    private val jpeg = new Multimodal.JpegCodec

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
      else if (at(0, "RIFF") && at(8, "WAVE")) mulaw.decode(payload, meta)
      else if (at(0, "RIFF") && at(8, "AVI ")) avi.decode(payload, meta)
      else None
    }
  }
}

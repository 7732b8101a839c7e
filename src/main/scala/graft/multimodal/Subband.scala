package graft.multimodal

/** From-spec 32-SUBBAND perceptual audio codec — the MP2-class tier
  * that closes the last line of the honest-limits codec ledger: the
  * ISO 11172-3 Layer-I architecture (32 uniform subbands, 12
  * coefficients per band per frame, per-band scalefactors,
  * THRESHOLD-BASED bit allocation that silences bands below the
  * audibility floor, midtread quantization of the survivors), with
  * the polyphase prototype simplified to a rectangular window so the
  * filterbank is an exact integer block transform — the 32-point
  * Walsh–Hadamard transform, H[b][j] = (−1)^popcount(b AND j),
  * self-inverse up to the factor 32. The simplification is the
  * honest trade: every quantization decision and every reconstructed
  * sample is pure integer arithmetic, so the DuckDB oracle REPLAYS
  * THE CODEC MATH ITSELF (transform, scalefactors, allocation,
  * quantize, dequantize, synthesis, per-sample error) — the
  * `mm_mulaw_features` (T256) standard, now for a LOSSY
  * transform codec.
  *
  * Frame = 384 samples = 12 blocks × 32 samples. Per frame and band:
  * scalefactor sf = bit length of the max |coefficient| over the 12
  * blocks; allocation alloc = 0 when sf ≤ 7 (the threshold floor —
  * the band is inaudible next to the frame's strong bands and is
  * DROPPED), else min(sf − 7, 10). Active coefficients quantize
  * midtread at step 2^(sf − alloc): q = trunc((c + step/2) / step),
  * |q| ≤ 2^alloc. Synthesis: x̂_j = trunc((Σ_b q·step·H[b][j] + 16)
  * / 32), clamped to 16-bit. All divisions TRUNCATE toward zero
  * (matching SQL `//`).
  *
  * Wire format (MSB-first bit packing via [[Rice]]'s shared bit I/O):
  *  - magic `SBA2` (bumped with the 48 kHz rate-band narrowing — a
  *    format change must never silently re-interpret old streams),
  *    u32 n_samples (≥ 384, multiple of 384, ≤ 2^22),
  *    u16 sample_rate (8000..48000 — the u16 field caps the band, so
  *    the encoder REJECTS higher rates instead of silently wrapping
  *    them) — little-endian header;
  *  - per frame: 32 four-bit allocation fields (0 or 1..10; anything
  *    else rejected); then per ACTIVE band in band order: an 8-bit
  *    scalefactor that must be CANONICAL (alloc == min(sf−7, 10),
  *    sf ≤ 21 — a stream whose fields contradict the declared
  *    allocation rule is hostile), then 12 fields of (alloc+2) bits
  *    holding q + 2^alloc (values above 2^(alloc+1) rejected);
  *  - each frame pads to a byte boundary with ZERO bits (checked);
  *    trailing garbage after the last frame is rejected.
  *
  * Closed-loop in the codec sense: there is no inter-frame state, and
  * every reported feature derives from the DECODED samples, never the
  * encoder's intent.
  */
object Subband {

  val Bands = 32
  val BlocksPerFrame = 12
  val FrameSamples: Int = Bands * BlocksPerFrame // 384
  /** Bands whose scalefactor is at or below this are dropped. */
  val Threshold = 7
  val AllocMax = 10
  val SfMax = 21
  val MaxSamples: Int = 1 << 22

  /** H[b][j] = (−1)^popcount(b AND j) — the Sylvester-ordered
    * Hadamard matrix the fast butterflies below realize. */
  def walshSign(b: Int, j: Int): Int =
    if (Integer.bitCount(b & j) % 2 == 0) 1 else -1

  /** In-place-free fast 32-point WHT (Sylvester order): radix-2
    * butterflies; WHT(WHT(x)) = 32·x. */
  private[multimodal] def wht(in: Array[Int]): Array[Int] = {
    val a = in.clone()
    var len = 1
    while (len < Bands) {
      var i = 0
      while (i < Bands) {
        var j = i
        while (j < i + len) {
          val u = a(j); val v = a(j + len)
          a(j) = u + v; a(j + len) = u - v
          j += 1
        }
        i += 2 * len
      }
      len <<= 1
    }
    a
  }

  /** The threshold-based allocation rule (encoder policy AND decoder
    * canonical-form check). */
  def allocOf(sf: Int): Int =
    if (sf <= Threshold) 0 else math.min(sf - Threshold, AllocMax)

  private def header(n: Int, rate: Int): java.io.ByteArrayOutputStream = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("SBA2".getBytes("US-ASCII"))
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    out.write(rate & 0xff); out.write((rate >> 8) & 0xff)
    out
  }

  /** Encode 16-bit mono samples (length a positive multiple of 384). */
  def encode(samples: Array[Short], rate: Int): Array[Byte] = {
    require(samples.nonEmpty && samples.length % FrameSamples == 0 &&
      samples.length <= MaxSamples, "length must be a multiple of 384")
    // 48000 is also the u16 wire-field safety line: a 96 kHz rate
    // would wrap modulo 65536 and decode as a WRONG rate silently
    require(rate >= 8000 && rate <= 48000, "rate out of band")
    val out = header(samples.length, rate)
    var f = 0
    while (f < samples.length / FrameSamples) {
      // analysis: 12 blocks of 32 → coefficient matrix [block][band]
      val coefs = Array.ofDim[Int](BlocksPerFrame, Bands)
      var blk = 0
      while (blk < BlocksPerFrame) {
        val in = new Array[Int](Bands)
        var j = 0
        while (j < Bands) {
          in(j) = samples(f * FrameSamples + blk * Bands + j).toInt
          j += 1
        }
        coefs(blk) = wht(in)
        blk += 1
      }
      val sf = new Array[Int](Bands)
      val alloc = new Array[Int](Bands)
      var b = 0
      while (b < Bands) {
        var mx = 0
        var t = 0
        while (t < BlocksPerFrame) {
          val a = math.abs(coefs(t)(b)); if (a > mx) mx = a; t += 1
        }
        sf(b) = if (mx == 0) 0 else 32 - Integer.numberOfLeadingZeros(mx)
        alloc(b) = allocOf(sf(b))
        b += 1
      }
      val bw = new Rice.BitWriter
      b = 0
      while (b < Bands) { bw.bits(alloc(b), 4); b += 1 }
      b = 0
      while (b < Bands) {
        if (alloc(b) > 0) {
          bw.bits(sf(b), 8)
          val shift = sf(b) - alloc(b)
          val step = 1 << shift
          var t = 0
          while (t < BlocksPerFrame) {
            // truncating division (matches SQL //) — q in [-2^a, 2^a]
            val q = (coefs(t)(b) + (step >> 1)) / step
            bw.bits(q + (1 << alloc(b)), alloc(b) + 2)
            t += 1
          }
        }
        b += 1
      }
      val body = bw.finish() // zero-padded to the byte boundary
      out.write(body)
      f += 1
    }
    out.toByteArray
  }

  /** Parse + decode: (rate, decoded samples, active-band count,
    * dropped-band count across all frames), or None for anything
    * hostile. */
  def decode(payload: Array[Byte])
      : Option[(Int, Array[Short], Int, Int)] = {
    if (payload == null || payload.length < 10) return None
    val m = "SBA2".getBytes("US-ASCII")
    var k = 0
    while (k < 4) { if (payload(k) != m(k)) return None; k += 1 }
    val n = (payload(4) & 0xff) | ((payload(5) & 0xff) << 8) |
      ((payload(6) & 0xff) << 16) | ((payload(7) & 0xff) << 24)
    if (n <= 0 || n > MaxSamples || n % FrameSamples != 0) return None
    val rate = (payload(8) & 0xff) | ((payload(9) & 0xff) << 8)
    if (rate < 8000 || rate > 48000) return None
    val nFrames = n / FrameSamples
    val outS = new Array[Short](n)
    var nActive = 0; var nDropped = 0
    var off = 10L
    var f = 0
    while (f < nFrames) {
      // per-frame body: bit-read with an explicit byte budget
      val alloc = new Array[Int](Bands)
      var frameBits = Bands * 4L
      if (off + (frameBits + 7) / 8 > payload.length) return None
      // the frame length depends on the allocations about to be read,
      // so read the whole frame through ONE reader positioned at the
      // frame start; the slice is bounded by the format's maximum
      // frame size (not the remaining payload — an attacker must not
      // be able to make each frame re-copy the whole stream)
      val maxFrameBytes = Bands / 2 + Bands *
        (1 + (BlocksPerFrame * (AllocMax + 2) + 7) / 8)
      val sliceEnd = math.min(payload.length.toLong, off + maxFrameBytes)
      val br = new Rice.BitReader(java.util.Arrays.copyOfRange(
        payload, off.toInt, sliceEnd.toInt))
      var b = 0
      while (b < Bands) {
        val a = br.bits(4)
        if (a < 0 || a > AllocMax) return None
        alloc(b) = a
        if (a > 0) nActive += 1 else nDropped += 1
        b += 1
      }
      val coefs = Array.ofDim[Int](BlocksPerFrame, Bands)
      b = 0
      while (b < Bands) {
        if (alloc(b) > 0) {
          val sf = br.bits(8)
          if (sf < 0 || sf > SfMax || allocOf(sf) != alloc(b)) return None
          frameBits += 8
          val shift = sf - alloc(b)
          val step = 1 << shift
          val bias = 1 << alloc(b)
          var t = 0
          while (t < BlocksPerFrame) {
            val vfld = br.bits(alloc(b) + 2)
            if (vfld < 0 || vfld > 2 * bias) return None
            coefs(t)(b) = (vfld - bias) * step
            t += 1
          }
          frameBits += BlocksPerFrame.toLong * (alloc(b) + 2)
        }
        b += 1
      }
      // the frame pads to a byte boundary with ZERO bits
      val frameBytes = (frameBits + 7) / 8
      if (off + frameBytes > payload.length) return None
      var p = frameBits
      while (p < frameBytes * 8) {
        val z = br.bit()
        if (z != 0) return None
        p += 1
      }
      // synthesis
      var blk = 0
      while (blk < BlocksPerFrame) {
        val rec = wht(coefs(blk))
        var j = 0
        while (j < Bands) {
          val v = (rec(j) + 16) / 32 // truncating, matches SQL //
          val cl = math.max(-32768, math.min(32767, v))
          outS(f * FrameSamples + blk * Bands + j) = cl.toShort
          j += 1
        }
        blk += 1
      }
      off += frameBytes
      f += 1
    }
    if (off != payload.length) return None // trailing garbage
    Some((rate, outS, nActive, nDropped))
  }
}

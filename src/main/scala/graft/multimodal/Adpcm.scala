package graft.multimodal

/** From-spec IMA/DVI ADPCM audio codec (the IMA Digital Audio
  * reference algorithm; WAVE format tag 0x11) — REAL ADAPTIVE
  * compression: 16-bit samples compress 4:1 into 4-bit nibbles
  * through a STATEFUL predictive loop (predictor + step-size index
  * adapt per sample), one tier above [[Mulaw]]'s stateless
  * companding. Perceptual codecs (MP3 class) remain the documented
  * out-of-reach tier.
  *
  * The decode recursion is pure integer arithmetic (step table
  * lookup, three threshold bits, shift-sum reconstruction, clamped
  * state updates), so an oracle can replay the ENTIRE adaptation
  * loop — decoded samples, not just container plumbing — with a
  * recursive CTE.
  *
  * Container: single-block WAVE_FORMAT_DVI_ADPCM — 20-byte fmt
  * (cbSize = 2, samplesPerBlock) and the canonical 4-byte block
  * header (initial predictor s16, step index u8, reserved u8)
  * followed by low-nibble-first codewords.
  */
object Adpcm {

  private val Steps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)
  private val IdxTab: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** (predictor, step index) — the adaptive state. */
  final case class State(pred: Int, idx: Int)

  private def reconstruct(code: Int, sign: Int, st: State): State = {
    val step = Steps(st.idx)
    val vp = (step >> 3) +
      (if ((code & 4) != 0) step else 0) +
      (if ((code & 2) != 0) step >> 1 else 0) +
      (if ((code & 1) != 0) step >> 2 else 0)
    val predN = math.max(-32768, math.min(32767,
      if (sign != 0) st.pred - vp else st.pred + vp))
    val idxN = math.max(0, math.min(88, st.idx + IdxTab(code)))
    State(predN, idxN)
  }

  /** Quantize one sample against the state; returns (nibble, state'). */
  def encodeNibble(s: Int, st: State): (Int, State) = {
    val step = Steps(st.idx)
    val diff0 = s - st.pred
    val sign = if (diff0 < 0) 8 else 0
    var d = math.abs(diff0)
    var code = 0
    if (d >= step) { code |= 4; d -= step }
    if (d >= (step >> 1)) { code |= 2; d -= (step >> 1) }
    if (d >= (step >> 2)) code |= 1
    (sign | code, reconstruct(code, sign, st))
  }

  /** Expand one nibble; the new predictor IS the decoded sample. */
  def decodeNibble(nib: Int, st: State): (Int, State) = {
    val stN = reconstruct(nib & 7, nib & 8, st)
    (stN.pred, stN)
  }

  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def tag(b: java.io.ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes("US-ASCII"))

  /** Compress and serialize as a single-block DVI-ADPCM WAVE. */
  def build(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    // samplesPerBlock and block-align are u16 wire fields: a longer
    // input would silently truncate into a corrupt container
    require(samples.nonEmpty && samples.length <= 0xffff,
      s"single-block ADPCM holds at most 65535 samples, got ${samples.length}")
    val n = samples.length
    val nibbles = new Array[Int](n - 1)
    var st = State(samples(0).toInt, 0)
    var i = 1
    while (i < n) {
      val (nib, stN) = encodeNibble(samples(i).toInt, st)
      nibbles(i - 1) = nib; st = stN
      i += 1
    }
    val dataLen = 4 + (n - 1 + 1) / 2
    val b = new java.io.ByteArrayOutputStream()
    tag(b, "RIFF"); le32(b, 4 + (8 + 20) + 8 + dataLen + (dataLen & 1))
    tag(b, "WAVE")
    tag(b, "fmt "); le32(b, 20)
    le16(b, 0x11)        // WAVE_FORMAT_DVI_ADPCM
    le16(b, 1)           // mono
    le32(b, sampleRate)
    le32(b, sampleRate / 2) // ~4 bits/sample byte rate
    le16(b, dataLen)     // block align: one block
    le16(b, 4)           // bits per codeword
    le16(b, 2)           // cbSize
    le16(b, n)           // samplesPerBlock
    tag(b, "data"); le32(b, dataLen)
    le16(b, samples(0).toInt & 0xffff) // block header: predictor
    b.write(0)           // initial step index
    b.write(0)           // reserved
    var j = 0
    while (j < n - 1) {  // low nibble first
      val lo = nibbles(j)
      val hi = if (j + 1 < n - 1) nibbles(j + 1) else 0
      b.write(lo | (hi << 4))
      j += 2
    }
    if ((dataLen & 1) == 1) b.write(0)
    b.toByteArray
  }

  /** Parse + EXPAND a single-block DVI-ADPCM WAVE: (rate, decoded
    * samples) or None. The first sample is the block predictor. */
  def parse(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload == null || payload.length < 48) return None
    def u32(o: Int): Long =
      ((payload(o) & 0xffL)) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def tagAt(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (tagAt(0) != "RIFF" || tagAt(8) != "WAVE") return None
    var off = 12L
    var rate = -1; var nSamples = -1
    var ok = false
    var out: Array[Short] = null
    while (off + 8 <= payload.length && out == null) {
      val o = off.toInt
      val ct = tagAt(o)
      val len = u32(o + 4).toInt
      if (len < 0) return None
      if (ct == "fmt " && len >= 20) {
        if (off + 8 + 20 > payload.length) return None
        ok = u16(o + 8) == 0x11 && u16(o + 10) == 1 && u16(o + 22) == 4
        rate = u32(o + 12).toInt
        nSamples = u16(o + 26)
      } else if (ct == "data" && ok) {
        if (off + 8 + len > payload.length) return None
        if (nSamples < 1 || len < 4 + (nSamples - 1 + 1) / 2) return None
        val pred0 = (u16(o + 8) << 16) >> 16 // sign-extend
        val idx0 = payload(o + 10) & 0xff
        if (idx0 > 88) return None
        out = new Array[Short](nSamples)
        out(0) = pred0.toShort
        var st = State(pred0, idx0)
        var i = 1
        while (i < nSamples) {
          val byte = payload(o + 12 + (i - 1) / 2) & 0xff
          val nib = if (((i - 1) & 1) == 0) byte & 0xf else byte >> 4
          val (v, stN) = decodeNibble(nib, st)
          out(i) = v.toShort; st = stN
          i += 1
        }
      }
      off += 8L + len + (len & 1)
    }
    if (ok && rate > 0 && out != null) Some((rate, out)) else None
  }
}

package graft.multimodal

/** From-spec G.711 μ-law audio codec in a RIFF/WAVE container — REAL
  * compressed audio next to [[Multimodal.Wav]]'s uncompressed PCM.
  * μ-law is the telephony log-companding codec: 16-bit linear samples
  * compress 2:1 into 8-bit codewords through a sign + 3-bit segment
  * exponent + 4-bit mantissa layout (ITU-T G.711, the classic Sun
  * `ulaw` tables done arithmetically). Unlike adaptive codecs
  * (ADPCM), the transform is a pure per-sample function with NO
  * state, so encode∘decode is closed-form and the oracle replays it
  * exactly in SQL — the decoded (lossy) samples hash-check
  * cross-engine, not just the container plumbing.
  *
  * Container traps mirror [[Multimodal.Wav]]: a junk LIST chunk sits
  * between fmt and data, and the fmt chunk is 18 bytes (cbSize=0 —
  * non-PCM formats carry the extension field per RIFF spec), so a
  * parser hard-coding the 16-byte PCM fmt layout or fixed offsets
  * reads garbage. The chunk walk itself is Long-cursored like Wav's.
  */
object Mulaw {

  private val Bias = 0x84  // 132
  private val Clip = 32635

  /** Linear 16-bit → μ-law codeword (G.711). */
  def encodeSample(s: Int): Int = {
    val sign = if (s < 0) 0x80 else 0
    var m = if (s < 0) -s else s
    if (m > Clip) m = Clip
    m += Bias
    // segment = position of the top bit among bits 7..14
    var e = 7
    var mask = 0x4000
    while (e > 0 && (m & mask) == 0) { e -= 1; mask >>= 1 }
    val mant = (m >> (e + 3)) & 0x0f
    ~(sign | (e << 4) | mant) & 0xff
  }

  /** μ-law codeword → linear 16-bit (G.711 expansion). */
  def decodeSample(b: Int): Int = {
    val u = ~b & 0xff
    val sign = u & 0x80
    val e = (u >> 4) & 7
    val mant = u & 0x0f
    val m = (((mant << 3) + Bias) << e) - Bias
    if (sign != 0) -m else m
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

  /** Compress 16-bit mono samples to μ-law and serialize as a
    * WAVE_FORMAT_MULAW (tag 7) container with an 18-byte fmt chunk
    * and a junk LIST chunk between fmt and data. */
  def build(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    val dataLen = samples.length // one byte per sample
    val junk = "graft-ulaw".getBytes("US-ASCII")
    val junkLen = junk.length + (junk.length & 1)
    val dataPad = dataLen & 1
    tag(b, "RIFF")
    le32(b, 4 + (8 + 18) + (8 + junkLen) + 8 + dataLen + dataPad)
    tag(b, "WAVE")
    tag(b, "fmt "); le32(b, 18)
    le16(b, 7)          // WAVE_FORMAT_MULAW
    le16(b, 1)          // mono
    le32(b, sampleRate)
    le32(b, sampleRate) // byte rate: 1 byte/sample
    le16(b, 1)          // block align
    le16(b, 8)          // bits per codeword
    le16(b, 0)          // cbSize — the 18-byte fmt trap
    tag(b, "LIST"); le32(b, junk.length); b.write(junk)
    if ((junk.length & 1) == 1) b.write(0)
    tag(b, "data"); le32(b, dataLen)
    samples.foreach(s => b.write(encodeSample(s.toInt)))
    if (dataPad == 1) b.write(0) // odd data chunk pads to even
    b.toByteArray
  }

  /** Parse a μ-law WAVE container and EXPAND the codewords: returns
    * (sampleRate, decoded 16-bit samples) or None for anything that
    * is not 8-bit mono μ-law. */
  def parse(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload == null || payload.length < 46) return None
    def u32(o: Int): Long =
      ((payload(o) & 0xffL)) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def tagAt(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (tagAt(0) != "RIFF" || tagAt(8) != "WAVE") return None
    var off = 12L
    var rate = -1
    var ok = false
    var out: Array[Short] = null
    while (off + 8 <= payload.length && out == null) {
      val o = off.toInt
      val ct = tagAt(o)
      val len = u32(o + 4).toInt
      if (len < 0) return None
      if (ct == "fmt " && len >= 16) {
        if (off + 24 > payload.length) return None
        ok = u16(o + 8) == 7 && u16(o + 10) == 1 && u16(o + 22) == 8
        rate = u32(o + 12).toInt
      } else if (ct == "data" && ok) {
        if (off + 8 + len > payload.length) return None
        out = new Array[Short](len)
        var i = 0
        while (i < len) {
          out(i) = decodeSample(payload(o + 8 + i) & 0xff).toShort
          i += 1
        }
      }
      off += 8L + len + (len & 1)
    }
    if (ok && rate > 0 && out != null) Some((rate, out)) else None
  }
}

package graft.multimodal

/** From-spec Rice/Golomb residual coder with a fixed order-1 linear
  * predictor — the FLAC-style LOSSLESS audio tier, and the same
  * integer entropy-coding family columnar storage formats use for
  * deltas. Residual r zigzags to unsigned u = (r << 1) ^ (r >> 31),
  * then codes as q = u >> k unary ones, a terminating zero, and the
  * k low bits — so the encoded size is CLOSED-FORM:
  * bits(u) = (u >> k) + 1 + k. Unlike DEFLATE, an oracle can replay
  * the exact encoded bit count, not just bound it.
  *
  * Stream layout: first sample verbatim (16 bits, MSB first), then
  * Rice(k)-coded order-1 residuals s_i − s_{i−1}. MSB-first bit
  * packing throughout. The decoder bounds the unary scan and fails
  * closed on truncation.
  */
object Rice {

  /** MSB-first bit packer, shared with [[Subband]] (one bit-I/O
    * implementation for every bit-packed codec). */
  private[multimodal] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); n += 1
      if (n == 8) { out.write(acc); acc = 0; n = 0 }
    }
    def bits(v: Int, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    def finish(): Array[Byte] = {
      while (n != 0) bit(0) // pad with zeros
      out.toByteArray
    }
  }

  private[multimodal] final class BitReader(data: Array[Byte]) {
    private var pos = 0L
    private val total = data.length.toLong * 8
    def bit(): Int = {
      if (pos >= total) return -1
      val b = (data((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
      pos += 1
      b
    }
    def bits(width: Int): Int = {
      var v = 0; var i = 0
      while (i < width) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
  }

  private def zigzag(r: Int): Int = (r << 1) ^ (r >> 31)
  private def unzigzag(u: Int): Int = (u >>> 1) ^ -(u & 1)

  /** Closed-form encoded size of one residual at parameter k. */
  def residualBits(r: Int, k: Int): Long = (zigzag(r) >>> k) + 1L + k

  /** Encode: 16-bit first sample + Rice(k) order-1 residuals. */
  def encode(samples: Array[Short], k: Int): Array[Byte] = {
    require(samples.nonEmpty && k >= 0 && k < 30)
    val bw = new BitWriter
    bw.bits(samples(0) & 0xffff, 16)
    var i = 1
    while (i < samples.length) {
      val u = zigzag(samples(i) - samples(i - 1))
      var q = u >>> k
      while (q > 0) { bw.bit(1); q -= 1 }
      bw.bit(0)
      bw.bits(u & ((1 << k) - 1), k)
      i += 1
    }
    bw.finish()
  }

  /** Decode n samples; None on truncation or a unary run past any
    * plausible residual (the fail-closed bound). */
  def decode(data: Array[Byte], n: Int, k: Int): Option[Array[Short]] = {
    if (data == null || n <= 0 || k < 0 || k >= 30) return None
    val br = new BitReader(data)
    val first = br.bits(16)
    if (first < 0) return None
    val out = new Array[Short](n)
    out(0) = ((first << 16) >> 16).toShort // sign-extend
    var i = 1
    while (i < n) {
      var q = 0
      var b = br.bit()
      while (b == 1) {
        q += 1
        if (q > (1 << (18 - math.min(k, 17)))) return None // hostile run
        b = br.bit()
      }
      if (b < 0) return None
      val low = br.bits(k)
      if (low < 0) return None
      val r = unzigzag((q << k) | low)
      out(i) = (out(i - 1) + r).toShort
      i += 1
    }
    Some(out)
  }
}

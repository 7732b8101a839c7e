package graft.multimodal

/** From-spec AVI (RIFF) container with MJPG video frames — REAL
  * compressed video: each frame is an independent sequential-baseline
  * JPEG ([[Jpeg]] — Huffman entropy coding, restart markers, IDCT),
  * framed in the nested-LIST RIFF layout every AVI reader walks
  * (`hdrl` with avih/strh/strf, then `movi` with `00dc` chunks).
  * Motion-JPEG is the archival/capture format this exact layout comes
  * from; inter-frame-predicted codecs (H.264 class) remain the one
  * honestly-out-of-reach tier without external libraries.
  *
  * Container traps, exercised deliberately:
  *  - RIFF chunks pad to EVEN lengths — JPEG streams are frequently
  *    odd-sized, so a parser that forgets the pad byte desynchronizes
  *    on the very next chunk header;
  *  - a JUNK chunk sits INSIDE the movi list between frames (the
  *    alignment padding real muxers emit), so frame iteration must
  *    skip unknown chunk ids rather than assume back-to-back 00dc;
  *  - the movi LIST is preceded by the full hdrl LIST, so a parser
  *    must walk lists by their declared sizes, not scan for magics.
  *
  * The parser cross-checks avih's declared dims against each decoded
  * frame and rejects mismatches.
  */
object Avi {

  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def tag(b: java.io.ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes("US-ASCII"))

  private def chunk(out: java.io.ByteArrayOutputStream, id: String,
      data: Array[Byte]): Unit = {
    tag(out, id); le32(out, data.length)
    out.write(data)
    if ((data.length & 1) == 1) out.write(0) // RIFF even padding
  }

  private def list(out: java.io.ByteArrayOutputStream, ltype: String,
      body: Array[Byte]): Unit = {
    tag(out, "LIST"); le32(out, 4 + body.length)
    tag(out, ltype)
    out.write(body)
    if ((body.length & 1) == 1) out.write(0)
  }

  /** Mux pre-encoded JPEG frames (all w x h) into an AVI stream. */
  def build(w: Int, h: Int, jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(jpegFrames.nonEmpty)
    val avih = new java.io.ByteArrayOutputStream()
    le32(avih, 40000)               // usec per frame (25 fps)
    le32(avih, 0); le32(avih, 0)    // max bytes/sec, padding
    le32(avih, 0x10)                // AVIF_HASINDEX off; 0x10 = flags
    le32(avih, jpegFrames.length)   // total frames
    le32(avih, 0); le32(avih, 1)    // initial frames, streams
    le32(avih, 0)                   // suggested buffer
    le32(avih, w); le32(avih, h)
    le32(avih, 0); le32(avih, 0); le32(avih, 0); le32(avih, 0)

    val strh = new java.io.ByteArrayOutputStream()
    tag(strh, "vids"); tag(strh, "MJPG")
    le32(strh, 0); le32(strh, 0)    // flags, priority+language
    le32(strh, 0)                   // initial frames
    le32(strh, 1); le32(strh, 25)   // scale, rate
    le32(strh, 0); le32(strh, jpegFrames.length)
    le32(strh, 0); le32(strh, 0xffffffff) // buffer, quality
    le32(strh, 0)                   // sample size
    le32(strh, 0); le32(strh, (h << 16) | w) // rcFrame

    val strf = new java.io.ByteArrayOutputStream() // BITMAPINFOHEADER
    le32(strf, 40); le32(strf, w); le32(strf, h)
    strf.write(1); strf.write(0); strf.write(24); strf.write(0)
    tag(strf, "MJPG")
    le32(strf, w * h * 3); le32(strf, 0); le32(strf, 0)
    le32(strf, 0); le32(strf, 0)

    val strl = new java.io.ByteArrayOutputStream()
    chunk(strl, "strh", strh.toByteArray)
    chunk(strl, "strf", strf.toByteArray)

    val hdrl = new java.io.ByteArrayOutputStream()
    chunk(hdrl, "avih", avih.toByteArray)
    list(hdrl, "strl", strl.toByteArray)

    val movi = new java.io.ByteArrayOutputStream()
    jpegFrames.zipWithIndex.foreach { case (f, i) =>
      chunk(movi, "00dc", f)
      // trap: real muxers interleave JUNK alignment chunks
      if (i == 0) chunk(movi, "JUNK", Array.fill[Byte](6)(0))
    }

    val body = new java.io.ByteArrayOutputStream()
    list(body, "hdrl", hdrl.toByteArray)
    chunk(body, "JUNK", "graft".getBytes("US-ASCII"))
    list(body, "movi", movi.toByteArray)
    val bodyBytes = body.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    tag(out, "RIFF"); le32(out, 4 + bodyBytes.length)
    tag(out, "AVI ")
    out.write(bodyBytes)
    out.toByteArray
  }

  /** Demux + decode: returns (w, h, per-frame decoded JPEG planes)
    * or None for malformed containers, non-MJPG-decodable frames, or
    * frames whose dims contradict the avih header. */
  def parse(payload: Array[Byte])
      : Option[(Int, Int, Seq[Array[Array[Byte]]])] = {
    if (payload == null || payload.length < 24) return None
    def u32(o: Int): Long =
      ((payload(o) & 0xffL)) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tagAt(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (tagAt(0) != "RIFF" || tagAt(8) != "AVI ") return None
    var w = -1; var h = -1
    val frames = scala.collection.mutable.ArrayBuffer
      .empty[Array[Array[Byte]]]
    // walk chunks in [from, to); recurse into LISTs we care about —
    // depth-capped: a legal AVI nests hdrl/strl/movi at most ~3 deep,
    // and a hostile LIST-in-LIST chain must quarantine, not overflow
    // the stack
    def walk(from: Long, to: Long, inMovi: Boolean, depth: Int): Boolean = {
      if (depth > 4) return false
      var off = from
      while (off + 8 <= to) {
        val o = off.toInt
        val id = tagAt(o)
        val len = u32(o + 4)
        if (len < 0 || off + 8 + len > to) return false
        if (id == "LIST") {
          if (len < 4) return false
          val lt = tagAt(o + 8)
          if (lt == "hdrl" || lt == "movi")
            if (!walk(off + 12, off + 8 + len, lt == "movi", depth + 1))
              return false
          // other lists (strl handled inside hdrl walk) skipped whole
        } else if (id == "avih") {
          if (len < 40) return false
          w = u32(o + 8 + 32).toInt; h = u32(o + 8 + 36).toInt
          if (w <= 0 || h <= 0 || w > 16384 || h > 16384) return false
        } else if (inMovi && (id.endsWith("dc") || id.endsWith("db"))) {
          val jpg = java.util.Arrays.copyOfRange(payload, o + 8,
            (off + 8 + len).toInt)
          Jpeg.parse(jpg) match {
            case Some((fw, fh, planes)) =>
              if (w > 0 && (fw != w || fh != h)) return false
              frames += planes
            case None => return false
          }
        }
        off += 8L + len + (len & 1) // RIFF even padding
      }
      true
    }
    val total = u32(4)
    if (8 + total > payload.length) return None
    if (!walk(12L, 8L + total, inMovi = false, depth = 0)) return None
    if (w > 0 && frames.nonEmpty) Some((w, h, frames.toSeq)) else None
  }
}

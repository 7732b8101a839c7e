package graft.multimodal

/** From-spec MOTION-COMPENSATED video codec — the tier above
  * [[Dctv]]'s conditional replenishment: per 8x8 block a bounded
  * EXHAUSTIVE integer displacement search (±4 px, the H.261
  * search-range idea) over the DECODED previous frame, refined to
  * HALF-PEL and then QUARTER-PEL (round 13, closing the sub-pixel
  * ladder of the honest-limits ledger): when the best integer SAD is
  * nonzero, the eight half-sample neighbours of the winner are
  * probed, then the eight quarter-sample neighbours of THAT winner —
  * the H.264 coarse-to-fine ladder — against a 2D bilinear
  * (4−f, f)/4-weight +8-rounding interpolation (the MPEG-4
  * simple-profile filter shape, which reduces exactly to the H.261
  * half-sample filter at half positions). A zero-SAD block transmits
  * ONLY its vector; a block the prediction nearly matches adds a
  * DCT-coded RESIDUAL through the proven [[Jpeg]] strip machinery
  * (shared with [[Dctv]]); a block no displacement explains falls
  * back to INTRA coding through the same strip. The bidirectional
  * tier above this one is [[Gop]] (B-frames predicted from BOTH
  * surrounding anchors, with per-direction vector pairs).
  *
  * Wire format (little-endian):
  *  - magic `MCV3`, u16 width, u16 height, u16 n_frames
  *    (dims multiples of 16, bounded like [[Dctv]]);
  *  - I-frame: u32 length + a full 4:2:0 baseline JPEG (flat chroma);
  *  - each P-frame:
  *     - an INTRA bitmap, 1 bit per block (row-major, LSB-first;
  *       padding bits above wb·hb must be zero);
  *     - a RESIDUAL bitmap, same shape (a set bit marks an MC block
  *       carrying a coded residual; a bit here AND in the intra
  *       bitmap is non-canonical — rejected);
  *     - TWO MOTION bytes per NON-intra block in scan order:
  *       (dxQ+16, dyQ+16) in QUARTER-SAMPLE units, each in [0, 32] —
  *       any other value, or a vector whose interpolation footprint
  *       (one extra row/column per fractional component) leaves the
  *       frame, is rejected (no edge extension: the encoder only
  *       emits in-bounds vectors, so out-of-bounds is hostile by
  *       definition);
  *     - u32 length + ONE JPEG strip holding the intra blocks then
  *       the residual blocks, in scan order (length 0 ⇔ neither).
  *
  * Residuals are coded as clamp(cur−pred, −128, 127) + 128 (the
  * standard level shift); reconstruction clamps pred + (dec−128) to
  * [0, 255]. The encoder is CLOSED-LOOP throughout: the search
  * reference, the residual base and the change detection all use the
  * DECODED previous frame, and the reconstruction scattered into the
  * reference is exactly the decoder's, so references can never
  * diverge and generational drift stays bounded (the [[Dctv]] noise
  * spec's property, inherited).
  *
  * Mode policy (deterministic): integer stage scans (dy, dx) in
  * row-major order from (−4, −4), keeps the first strictly-better
  * SAD and short-circuits at zero; if still nonzero,
  * [[refineFractional]] probes the 8 neighbours at quarter-step 2
  * (the half-pel ring, (uy, ux) row-major from (−1, −1)), re-centres,
  * then at step 1 (the quarter ring) under the same rule. Final SAD
  * 0 → MC only; 0 < SAD < 1024 → MC + residual; SAD ≥ 1024 (mean
  * |error| ≥ 16 — a scene cut, nothing to predict) → intra.
  *
  * The parser fails closed on everything hostile (the CodecFuzzSpec
  * contract): Long cursor, dimension/frame caps, total-output cap,
  * bitmap padding bits, conflicting mode bits, range and
  * footprint-bounds checks on every vector byte, strip-geometry
  * cross-check, trailing garbage.
  *
  * The per-P-frame section encode/decode pair is `private[multimodal]`
  * so [[Gop]]'s anchors ride the IDENTICAL code path — a P-section
  * fix lands in exactly one place.
  */
object Mcv {

  private[multimodal] val MaxDim = 4096
  private[multimodal] val MaxFrames = 64
  private[multimodal] val MaxDecodedBytes = 1L << 26
  private[multimodal] val Range = 4
  /** Vector range in QUARTER-SAMPLE units (±4 px = ±16 quarters). */
  private[multimodal] val QRange = 4 * Range
  /** SAD at or above this codes the block intra (mean |err| ≥ 16). */
  private[multimodal] val IntraSad = 1024

  /** Per-P-frame mode census from a real parse: how many blocks rode
    * each path, the zero-vector count (static background), and how
    * many vectors' FINEST fractional component is a half sample
    * (blocks integer search could not explain) or a quarter sample
    * (blocks half-pel search could not explain either). */
  final case class FrameCensus(mvBlocks: Int, residBlocks: Int,
      intraBlocks: Int, zeroVectors: Int, halfVectors: Int,
      quarterVectors: Int)

  /** Finest-fraction classifiers over a vector's two quarter-unit
    * components. */
  private[multimodal] def isQuarterVec(vx: Int, vy: Int): Boolean =
    ((vx | vy) & 1) != 0
  private[multimodal] def isHalfVec(vx: Int, vy: Int): Boolean =
    !isQuarterVec(vx, vy) && ((vx | vy) & 2) != 0

  private[multimodal] def le16(b: java.io.ByteArrayOutputStream,
      v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private[multimodal] def le32(b: java.io.ByteArrayOutputStream,
      v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  /** Prediction block at (bx·8+dx, by·8+dy) — caller guarantees
    * bounds. */
  private[multimodal] def grabAt(plane: Array[Byte], w: Int, bx: Int,
      by: Int, dx: Int, dy: Int): Array[Byte] = {
    val blk = new Array[Byte](64)
    var r = 0
    while (r < 8) {
      System.arraycopy(plane, (by * 8 + dy + r) * w + bx * 8 + dx,
        blk, r * 8, 8)
      r += 1
    }
    blk
  }

  private[multimodal] def sad(a: Array[Byte], plane: Array[Byte],
      w: Int, bx: Int, by: Int, dx: Int, dy: Int): Int = {
    var s = 0
    var r = 0
    while (r < 8) {
      val off = (by * 8 + dy + r) * w + bx * 8 + dx
      val ao = r * 8
      var c = 0
      while (c < 8) {
        s += math.abs((a(ao + c) & 0xff) - (plane(off + c) & 0xff))
        c += 1
      }
      r += 1
    }
    s
  }

  /** Prediction block at QUARTER-SAMPLE displacement (dxQ, dyQ in
    * quarter-pel units): 2D bilinear interpolation with (4−f, f)/4
    * weights and +8 rounding over the 4 nearest integer samples (the
    * MPEG-4 simple-profile filter shape). At half positions (f = 2)
    * the weights reduce EXACTLY to the H.261 half-sample filter
    * ((a+b+1)>>1 and the +2/4-tap diagonal), and at integer positions
    * to the plain grab, so the quarter filter is a strict extension
    * of the coarser tiers. Caller guarantees the footprint (8 + one
    * extra row/column per fractional component) is in bounds —
    * [[quarterVectorValid]]. */
  private[multimodal] def grabAtQuarter(plane: Array[Byte], w: Int,
      bx: Int, by: Int, dxQ: Int, dyQ: Int): Array[Byte] = {
    val ix = dxQ >> 2; val iy = dyQ >> 2 // arithmetic shift = floor
    val fx = dxQ & 3; val fy = dyQ & 3
    if (fx == 0 && fy == 0) return grabAt(plane, w, bx, by, ix, iy)
    val blk = new Array[Byte](64)
    val w00 = (4 - fx) * (4 - fy); val w10 = fx * (4 - fy)
    val w01 = (4 - fx) * fy; val w11 = fx * fy
    var r = 0
    while (r < 8) {
      val row0 = (by * 8 + iy + r) * w + bx * 8 + ix
      val row1 = if (fy != 0) row0 + w else row0
      var c = 0
      while (c < 8) {
        val p00 = plane(row0 + c) & 0xff
        val p10 = if (fx != 0) plane(row0 + c + 1) & 0xff else p00
        val p01 = plane(row1 + c) & 0xff
        val p11 = if (fx != 0) plane(row1 + c + 1) & 0xff else p01
        blk(r * 8 + c) =
          ((w00 * p00 + w10 * p10 + w01 * p01 + w11 * p11 + 8) >> 4).toByte
        c += 1
      }
      r += 1
    }
    blk
  }

  private[multimodal] def sadBlk(a: Array[Byte], b: Array[Byte]): Int = {
    var s = 0; var p = 0
    while (p < 64) { s += math.abs((a(p) & 0xff) - (b(p) & 0xff)); p += 1 }
    s
  }

  /** Range + interpolation-footprint bounds for a quarter-sample
    * vector: a fractional component reads one extra row/column past
    * the block. */
  private[multimodal] def quarterVectorValid(dxQ: Int, dyQ: Int, bx: Int,
      by: Int, w: Int, h: Int): Boolean = {
    if (dxQ < -QRange || dxQ > QRange ||
      dyQ < -QRange || dyQ > QRange) return false
    val ix = dxQ >> 2; val iy = dyQ >> 2
    val ex = if ((dxQ & 3) != 0) 1 else 0
    val ey = if ((dyQ & 3) != 0) 1 else 0
    bx * 8 + ix >= 0 && bx * 8 + ix + 8 + ex <= w &&
      by * 8 + iy >= 0 && by * 8 + iy + 8 + ey <= h
  }

  /** The level-shift residual coder: res = clamp(cur−pred)+128. */
  private[multimodal] def residualOf(curBlk: Array[Byte],
      pred: Array[Byte]): Array[Byte] = {
    val res = new Array[Byte](64)
    var p = 0
    while (p < 64) {
      val d = (curBlk(p) & 0xff) - (pred(p) & 0xff)
      res(p) = (math.max(-128, math.min(127, d)) + 128).toByte
      p += 1
    }
    res
  }

  /** res ∘ pred reconstruction, clamped to [0, 255]. */
  private[multimodal] def applyResidual(pred: Array[Byte],
      rb: Array[Byte]): Array[Byte] = {
    val outB = new Array[Byte](64)
    var p = 0
    while (p < 64) {
      val vv = (pred(p) & 0xff) + ((rb(p) & 0xff) - 128)
      outB(p) = math.max(0, math.min(255, vv)).toByte
      p += 1
    }
    outB
  }

  /** Encode ONE P-frame section against the decoded reference;
    * returns (section bytes, closed-loop reconstruction). */
  private[multimodal] def encodeP(cur: Array[Byte], ref: Array[Byte],
      w: Int, h: Int): (Array[Byte], Array[Byte]) = {
    val wb = w / 8; val hb = h / 8
    val bmLen = (wb * hb + 7) / 8
    val intraBm = new Array[Byte](bmLen)
    val residBm = new Array[Byte](bmLen)
    val intraBlocks =
      scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val residBlocks =
      scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val rec = new Array[Byte](w * h)
    val modes = new Array[Int](wb * hb) // 0 = mv, 1 = mv+resid, 2 = intra
    val vx = new Array[Int](wb * hb) // half-sample units
    val vy = new Array[Int](wb * hb)
    var by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        val idx = by * wb + bx
        val curBlk = Dctv.grabBlock(cur, w, bx, by)
        // stage 1: exhaustive integer search
        var bestSad = Int.MaxValue
        var bestDx = 0; var bestDy = 0
        var dy = -Range
        while (dy <= Range && bestSad > 0) {
          if (by * 8 + dy >= 0 && by * 8 + dy + 8 <= h) {
            var dx = -Range
            while (dx <= Range && bestSad > 0) {
              if (bx * 8 + dx >= 0 && bx * 8 + dx + 8 <= w) {
                val s = sad(curBlk, ref, w, bx, by, dx, dy)
                if (s < bestSad) { bestSad = s; bestDx = dx; bestDy = dy }
              }
              dx += 1
            }
          }
          dy += 1
        }
        // stages 2+3: half-pel then quarter-pel refinement around the
        // integer winner (the shared coarse-to-fine ladder)
        val (refSad, bDxQ, bDyQ) = refineFractional(bestSad,
          4 * bestDx, 4 * bestDy, bx, by, w, h) { (qx, qy) =>
          sadBlk(curBlk, grabAtQuarter(ref, w, bx, by, qx, qy))
        }
        bestSad = refSad
        if (bestSad >= IntraSad) {
          modes(idx) = 2
          intraBm(idx / 8) = (intraBm(idx / 8) | (1 << (idx % 8))).toByte
          intraBlocks += curBlk
        } else {
          vx(idx) = bDxQ; vy(idx) = bDyQ
          if (bestSad == 0) modes(idx) = 0
          else {
            modes(idx) = 1
            residBm(idx / 8) = (residBm(idx / 8) | (1 << (idx % 8))).toByte
            residBlocks += residualOf(curBlk,
              grabAtQuarter(ref, w, bx, by, bDxQ, bDyQ))
          }
        }
        bx += 1
      }
      by += 1
    }
    val stripIn = (intraBlocks ++ residBlocks).toArray
    val strip =
      if (stripIn.isEmpty) Array.emptyByteArray
      else Dctv.encodeStrip(stripIn)
    val dec =
      if (stripIn.isEmpty) Array.empty[Array[Byte]]
      else Dctv.decodeStrip(strip, stripIn.length)
        .getOrElse(throw new IllegalStateException("strip self-decode"))
    // reconstruct EXACTLY like the decoder (closed loop)
    var intraSeen = 0
    var residSeen = 0
    val nIntra = intraBlocks.length
    by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        val idx = by * wb + bx
        modes(idx) match {
          case 2 =>
            Dctv.putBlock(rec, w, bx, by, dec(intraSeen)); intraSeen += 1
          case m =>
            val pred = grabAtQuarter(ref, w, bx, by, vx(idx), vy(idx))
            if (m == 0) Dctv.putBlock(rec, w, bx, by, pred)
            else {
              Dctv.putBlock(rec, w, bx, by,
                applyResidual(pred, dec(nIntra + residSeen)))
              residSeen += 1
            }
        }
        bx += 1
      }
      by += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(intraBm); out.write(residBm)
    var i = 0
    while (i < wb * hb) {
      if (modes(i) != 2) {
        out.write(vx(i) + QRange); out.write(vy(i) + QRange)
      }
      i += 1
    }
    le32(out, strip.length)
    out.write(strip)
    (out.toByteArray, rec)
  }

  private[multimodal] def bit(bm: Array[Byte], i: Int): Boolean =
    (bm(i / 8) & (1 << (i % 8))) != 0

  /** Read + validate the two mode bitmaps shared by P and B sections:
    * padding bits must be zero in BOTH, and no block may be intra and
    * residual at once (canonical strictness — one implementation, so
    * the two frame types cannot diverge on hostile input). Returns
    * (intraBm, residBm, nIntra, nResid, offset after). */
  private[multimodal] def readModeBitmaps(payload: Array[Byte],
      off0: Long, nBlocks: Int)
      : Option[(Array[Byte], Array[Byte], Int, Int, Long)] = {
    val bmLen = (nBlocks + 7) / 8
    if (off0 + 2L * bmLen > payload.length) return None
    val intraBm = java.util.Arrays.copyOfRange(payload, off0.toInt,
      (off0 + bmLen).toInt)
    val residBm = java.util.Arrays.copyOfRange(payload,
      (off0 + bmLen).toInt, (off0 + 2 * bmLen).toInt)
    var i = nBlocks
    while (i < bmLen * 8) {
      if (bit(intraBm, i) || bit(residBm, i)) return None
      i += 1
    }
    var nIntra = 0; var nResid = 0
    i = 0
    while (i < nBlocks) {
      if (bit(intraBm, i)) {
        if (bit(residBm, i)) return None
        nIntra += 1
      } else if (bit(residBm, i)) nResid += 1
      i += 1
    }
    Some((intraBm, residBm, nIntra, nResid, off0 + 2L * bmLen))
  }

  /** Validate one motion byte PAIR for block i: both bytes in
    * [0, 2·QRange] AND the interpolation footprint fully inside
    * the frame (shared strictness for P and B sections). */
  private[multimodal] def vectorValid(b0: Int, b1: Int, i: Int, wb: Int,
      w: Int, h: Int): Boolean = {
    if (b0 > 2 * QRange || b1 > 2 * QRange) return false
    quarterVectorValid(b0 - QRange, b1 - QRange, i % wb, i / wb, w, h)
  }

  /** The shared fractional refinement: probe the 8 neighbours of the
    * current winner at quarter-unit step 2 (the half-pel ring), move
    * the centre to that winner, then at step 1 (the quarter ring) —
    * the H.264 coarse-to-fine ladder. `eval` scores one candidate;
    * returns (sad, dxQ, dyQ). */
  private[multimodal] def refineFractional(startSad: Int, startX: Int,
      startY: Int, bx: Int, by: Int, w: Int, h: Int)(
      eval: (Int, Int) => Int): (Int, Int, Int) = {
    var best = startSad
    var cx = startX; var cy = startY
    var step = 2
    while (step >= 1 && best > 0) {
      var nx = cx; var ny = cy
      var uy = -1
      while (uy <= 1 && best > 0) {
        var ux = -1
        while (ux <= 1 && best > 0) {
          if ((ux | uy) != 0) {
            val qx = cx + ux * step; val qy = cy + uy * step
            if (quarterVectorValid(qx, qy, bx, by, w, h)) {
              val s = eval(qx, qy)
              if (s < best) { best = s; nx = qx; ny = qy }
            }
          }
          ux += 1
        }
        uy += 1
      }
      cx = nx; cy = ny
      step -= 1
    }
    (best, cx, cy)
  }

  /** Read + decode the u32-length strip holding nStrip blocks (shared
    * by P and B sections; length 0 ⇔ no blocks). */
  private[multimodal] def readStripBlocks(payload: Array[Byte],
      off0: Long, nStrip: Int): Option[(Array[Array[Byte]], Long)] = {
    if (off0 + 4 > payload.length) return None
    def u32(o: Int): Long =
      ((payload(o) & 0xffL)) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    val sLen = u32(off0.toInt)
    if (sLen < 0 || off0 + 4 + sLen > payload.length) return None
    if (nStrip == 0) {
      if (sLen != 0) None else Some((Array.empty[Array[Byte]], off0 + 4))
    } else {
      if (sLen == 0) return None
      val strip = java.util.Arrays.copyOfRange(payload,
        (off0 + 4).toInt, (off0 + 4 + sLen).toInt)
      Dctv.decodeStrip(strip, nStrip)
        .map(d => (d, off0 + 4 + sLen))
    }
  }

  /** Decode ONE P-frame section at `off0`; returns
    * (frame, census, offset after), or None for anything hostile. */
  private[multimodal] def decodeP(payload: Array[Byte], off0: Long,
      ref: Array[Byte], w: Int,
      h: Int): Option[(Array[Byte], FrameCensus, Long)] = {
    val wb = w / 8; val hb = h / 8
    val nBlocks = wb * hb
    val (intraBm, residBm, nIntra, nResid, off1) =
      readModeBitmaps(payload, off0, nBlocks) match {
        case Some(t) => t
        case None    => return None
      }
    var off = off1
    val nMv = nBlocks - nIntra
    if (off + 2L * nMv > payload.length) return None
    val vx = new Array[Int](nBlocks)
    val vy = new Array[Int](nBlocks)
    var zeroVecs = 0
    var halfVecs = 0
    var quarterVecs = 0
    var vOff = off.toInt
    var i = 0
    while (i < nBlocks) {
      if (!bit(intraBm, i)) {
        val b0 = payload(vOff) & 0xff
        val b1 = payload(vOff + 1) & 0xff
        vOff += 2
        if (!vectorValid(b0, b1, i, wb, w, h)) return None
        vx(i) = b0 - QRange; vy(i) = b1 - QRange
        if (vx(i) == 0 && vy(i) == 0) zeroVecs += 1
        if (isHalfVec(vx(i), vy(i))) halfVecs += 1
        if (isQuarterVec(vx(i), vy(i))) quarterVecs += 1
      }
      i += 1
    }
    off += 2L * nMv
    val (dec, off2) = readStripBlocks(payload, off, nIntra + nResid) match {
      case Some(t) => t
      case None    => return None
    }
    off = off2
    val cur = new Array[Byte](w * h)
    var intraSeen = 0
    var residSeen = 0
    i = 0
    while (i < nBlocks) {
      val bx = i % wb; val by = i / wb
      if (bit(intraBm, i)) {
        Dctv.putBlock(cur, w, bx, by, dec(intraSeen)); intraSeen += 1
      } else {
        val pred = grabAtQuarter(ref, w, bx, by, vx(i), vy(i))
        if (bit(residBm, i)) {
          Dctv.putBlock(cur, w, bx, by,
            applyResidual(pred, dec(nIntra + residSeen)))
          residSeen += 1
        } else Dctv.putBlock(cur, w, bx, by, pred)
      }
      i += 1
    }
    Some((cur, FrameCensus(nMv, nResid, nIntra, zeroVecs, halfVecs,
      quarterVecs), off))
  }

  /** Validate + decode the common header; returns
    * (w, h, nf, I-frame, offset after). Shared with [[Gop]] (whose
    * magic differs). */
  private[multimodal] def decodeHeader(payload: Array[Byte],
      magic: String): Option[(Int, Int, Int, Array[Byte], Long)] = {
    if (payload == null || payload.length < 14) return None
    val m = magic.getBytes("US-ASCII")
    var k = 0
    while (k < 4) {
      if (payload(k) != m(k)) return None
      k += 1
    }
    def u16(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      ((payload(o) & 0xffL)) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    val w = u16(4); val h = u16(6); val nf = u16(8)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
      w % 16 != 0 || h % 16 != 0) return None
    if (nf < 1 || nf > MaxFrames) return None
    if (w.toLong * h * nf > MaxDecodedBytes) return None
    var off = 10L
    val iLen = u32(off.toInt)
    if (iLen <= 0 || off + 4 + iLen > payload.length) return None
    val iBytes = java.util.Arrays.copyOfRange(payload,
      (off + 4).toInt, (off + 4 + iLen).toInt)
    off += 4 + iLen
    Jpeg.parse(iBytes) match {
      case Some((pw, ph, planes))
          if pw == w && ph == h && planes.nonEmpty =>
        Some((w, h, nf, planes(0), off))
      case _ => None
    }
  }

  /** Encode the header + I-frame; returns (stream builder, decoded
    * I-frame reference). */
  private[multimodal] def encodeHeader(w: Int, h: Int,
      frames: Seq[Array[Byte]], magic: String)
      : (java.io.ByteArrayOutputStream, Array[Byte]) = {
    require(w % 16 == 0 && h % 16 == 0 && w > 0 && h > 0 &&
      w <= MaxDim && h <= MaxDim)
    require(frames.nonEmpty && frames.length <= MaxFrames &&
      frames.forall(_.length == w * h))
    require(w.toLong * h * frames.length <= MaxDecodedBytes,
      "stream exceeds the decoder's total-output cap")
    val out = new java.io.ByteArrayOutputStream()
    out.write(magic.getBytes("US-ASCII"))
    le16(out, w); le16(out, h); le16(out, frames.length)
    val flatC = Array.fill[Byte]((w / 2) * (h / 2))(128.toByte)
    val iFrame = Jpeg.build(w, h, frames.head, flatC, flatC)
    le32(out, iFrame.length); out.write(iFrame)
    val ref = Jpeg.parse(iFrame)
      .getOrElse(throw new IllegalStateException("i-frame self-decode"))
      ._3(0)
    (out, ref)
  }

  /** Encode luma frames (w·h bytes each, dims multiples of 16). */
  def build(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val (out, ref) = encodeHeader(w, h, frames, "MCV3")
    frames.tail.foreach { cur =>
      val (section, rec) = encodeP(cur, ref, w, h)
      out.write(section)
      System.arraycopy(rec, 0, ref, 0, w * h)
    }
    out.toByteArray
  }

  /** Parse + decode: (w, h, decoded frames, per-P-frame census), or
    * None for anything hostile. */
  def parse(payload: Array[Byte])
      : Option[(Int, Int, Seq[Array[Byte]], Seq[FrameCensus])] = {
    decodeHeader(payload, "MCV3") match {
      case None => None
      case Some((w, h, nf, first, off0)) =>
        val frames = scala.collection.mutable.ArrayBuffer(first)
        val census = scala.collection.mutable.ArrayBuffer.empty[FrameCensus]
        var ref = first
        var off = off0
        var f = 1
        while (f < nf) {
          decodeP(payload, off, ref, w, h) match {
            case None => return None
            case Some((cur, c, newOff)) =>
              frames += cur
              census += c
              ref = cur
              off = newOff
          }
          f += 1
        }
        if (off != payload.length) return None // trailing garbage
        Some((w, h, frames.toSeq, census.toSeq))
    }
  }
}

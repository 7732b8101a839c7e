package graft.multimodal

/** From-spec GROUP-OF-PICTURES codec with BIDIRECTIONAL (B) frames —
  * the tier above [[Mcv]]'s forward-only motion compensation, closing
  * the next line of the honest-limits ledger: odd display positions
  * are B-frames predicted from BOTH surrounding anchors (the classic
  * IBPBP structure), choosing per 8x8 block among FORWARD (previous
  * anchor), BACKWARD (next anchor — the mode that explains content
  * APPEARING mid-GOP, which no forward codec can predict) and AVERAGE
  * ((fwd + bwd + 1) >> 1 with one shared vector — the cross-fade
  * mode), each with its own bounded ±4 px exhaustive search; residual
  * and intra fallback ride the same [[Jpeg]] strip machinery. Since
  * round 13 every direction's winning vector REFINES TO HALF-PEL
  * through [[Mcv]]'s shared bilinear interpolation stage (applied to
  * BOTH anchors in the average mode). What remains out of scope:
  * per-direction vector pairs for the average mode (the H.264-class
  * refinement above one shared vector).
  *
  * Structure: display order f0 f1 f2 ... f_{nf-1} with nf ODD —
  * anchors at even indices (I at 0, then P chained anchor-to-anchor),
  * one B between each anchor pair. CODED order interleaves each
  * anchor BEFORE its preceding B (the decoder needs both references):
  * I, P2, B1, P4, B3, ... — the standard decode-order/display-order
  * split, reordered back by the parser.
  *
  * Wire format (little-endian): magic `MCB2`, then exactly [[Mcv]]'s
  * header and P-frame sections (shared code paths, not copies); each
  * B-frame section is:
  *  - INTRA bitmap + RESIDUAL bitmap (same padding/conflict rules);
  *  - per NON-intra block in scan order: a DIRECTION byte
  *    (0 = forward, 1 = backward, 2 = average; anything else
  *    rejected) then the [[Mcv]] motion byte PAIR (half-sample
  *    units, each byte ≤ 16, interpolation footprint bounds-checked
  *    against the frame);
  *  - u32 length + ONE strip of intra blocks then residual blocks.
  *
  * B-frames are NOT reference frames (the standard rule), so their
  * quantization error never compounds into the anchor chain; anchors
  * stay closed-loop through [[Mcv.encodeP]]/[[Mcv.decodeP]].
  *
  * Mode policy (deterministic): directions probed in order
  * fwd → bwd → avg, each scanning integer (dy, dx) row-major from
  * (−4, −4) with first-strictly-better SAD and a zero short-circuit;
  * a nonzero winner then refines to half-pel around the winning
  * (direction, vector) — [[Mcv]]'s 8-neighbour probe order. Overall
  * best SAD 0 → vector only; < 1024 → vector + residual; else intra.
  */
object Gop {

  /** Per-B-frame mode census from a real parse. */
  final case class BCensus(fwdBlocks: Int, bwdBlocks: Int,
      avgBlocks: Int, residBlocks: Int, intraBlocks: Int,
      zeroVectors: Int, halfVectors: Int)

  private def avgBlock(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val o = new Array[Byte](64)
    var p = 0
    while (p < 64) {
      o(p) = (((a(p) & 0xff) + (b(p) & 0xff) + 1) >> 1).toByte
      p += 1
    }
    o
  }

  /** B prediction at a HALF-SAMPLE vector: the shared [[Mcv]]
    * interpolation against one anchor (fwd/bwd) or both (avg — the
    * same vector drives both references, interpolated independently
    * then averaged). */
  private def predictB(dir: Int, prevA: Array[Byte], nextA: Array[Byte],
      w: Int, bx: Int, by: Int, dxH: Int, dyH: Int): Array[Byte] =
    dir match {
      case 0 => Mcv.grabAtHalf(prevA, w, bx, by, dxH, dyH)
      case 1 => Mcv.grabAtHalf(nextA, w, bx, by, dxH, dyH)
      case _ => avgBlock(Mcv.grabAtHalf(prevA, w, bx, by, dxH, dyH),
        Mcv.grabAtHalf(nextA, w, bx, by, dxH, dyH))
    }

  /** Allocation-free average-mode SAD: reads both planes in place —
    * the search probes up to 81 candidates per block, so the hot loop
    * must not materialize three arrays per candidate. */
  private def sadAvg(curBlk: Array[Byte], prevA: Array[Byte],
      nextA: Array[Byte], w: Int, bx: Int, by: Int, dx: Int,
      dy: Int): Int = {
    var s = 0
    var r = 0
    while (r < 8) {
      val off = (by * 8 + dy + r) * w + bx * 8 + dx
      val ao = r * 8
      var c = 0
      while (c < 8) {
        val avg = ((prevA(off + c) & 0xff) + (nextA(off + c) & 0xff) + 1) >> 1
        s += math.abs((curBlk(ao + c) & 0xff) - avg)
        c += 1
      }
      r += 1
    }
    s
  }

  /** Encode ONE B-frame section against the two decoded anchors. */
  private def encodeB(cur: Array[Byte], prevA: Array[Byte],
      nextA: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val wb = w / 8; val hb = h / 8
    val bmLen = (wb * hb + 7) / 8
    val intraBm = new Array[Byte](bmLen)
    val residBm = new Array[Byte](bmLen)
    val intraBlocks =
      scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val residBlocks =
      scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val modes = new Array[Int](wb * hb) // 0 mv, 1 mv+resid, 2 intra
    val dirs = new Array[Int](wb * hb)
    val vx = new Array[Int](wb * hb) // half-sample units
    val vy = new Array[Int](wb * hb)
    var by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        val idx = by * wb + bx
        val curBlk = Dctv.grabBlock(cur, w, bx, by)
        // stage 1: exhaustive integer search across the 3 directions
        var bestSad = Int.MaxValue
        var bestDir = 0; var bestDx = 0; var bestDy = 0
        var dir = 0
        while (dir <= 2 && bestSad > 0) {
          var dy = -Mcv.Range
          while (dy <= Mcv.Range && bestSad > 0) {
            if (by * 8 + dy >= 0 && by * 8 + dy + 8 <= h) {
              var dx = -Mcv.Range
              while (dx <= Mcv.Range && bestSad > 0) {
                if (bx * 8 + dx >= 0 && bx * 8 + dx + 8 <= w) {
                  val s = dir match {
                    case 0 => Mcv.sad(curBlk, prevA, w, bx, by, dx, dy)
                    case 1 => Mcv.sad(curBlk, nextA, w, bx, by, dx, dy)
                    case _ => sadAvg(curBlk, prevA, nextA, w, bx, by,
                      dx, dy)
                  }
                  if (s < bestSad) {
                    bestSad = s; bestDir = dir; bestDx = dx; bestDy = dy
                  }
                }
                dx += 1
              }
            }
            dy += 1
          }
          dir += 1
        }
        // stage 2: half-pel refinement around the winning
        // (direction, vector) — Mcv's probe order
        var bDxH = 2 * bestDx; var bDyH = 2 * bestDy
        var uy = -1
        while (uy <= 1 && bestSad > 0) {
          var ux = -1
          while (ux <= 1 && bestSad > 0) {
            if ((ux | uy) != 0) {
              val dxH = 2 * bestDx + ux; val dyH = 2 * bestDy + uy
              if (Mcv.halfVectorValid(dxH, dyH, bx, by, w, h)) {
                val s = Mcv.sadBlk(curBlk,
                  predictB(bestDir, prevA, nextA, w, bx, by, dxH, dyH))
                if (s < bestSad) { bestSad = s; bDxH = dxH; bDyH = dyH }
              }
            }
            ux += 1
          }
          uy += 1
        }
        if (bestSad >= Mcv.IntraSad) {
          modes(idx) = 2
          intraBm(idx / 8) = (intraBm(idx / 8) | (1 << (idx % 8))).toByte
          intraBlocks += curBlk
        } else {
          dirs(idx) = bestDir
          vx(idx) = bDxH; vy(idx) = bDyH
          if (bestSad == 0) modes(idx) = 0
          else {
            modes(idx) = 1
            residBm(idx / 8) = (residBm(idx / 8) | (1 << (idx % 8))).toByte
            residBlocks += Mcv.residualOf(curBlk,
              predictB(bestDir, prevA, nextA, w, bx, by, bDxH, bDyH))
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
    val out = new java.io.ByteArrayOutputStream()
    out.write(intraBm); out.write(residBm)
    var i = 0
    while (i < wb * hb) {
      if (modes(i) != 2) {
        out.write(dirs(i))
        out.write(vx(i) + Mcv.HalfRange); out.write(vy(i) + Mcv.HalfRange)
      }
      i += 1
    }
    Mcv.le32(out, strip.length)
    out.write(strip)
    out.toByteArray
  }

  /** Decode ONE B-frame section at `off0` — the bitmap, vector-bounds
    * and strip strictness all ride [[Mcv]]'s shared primitives, so a
    * hostile-input fix to the P section applies here automatically;
    * only the direction byte and the two-anchor prediction are
    * B-specific. */
  private def decodeB(payload: Array[Byte], off0: Long,
      prevA: Array[Byte], nextA: Array[Byte], w: Int,
      h: Int): Option[(Array[Byte], BCensus, Long)] = {
    val wb = w / 8; val hb = h / 8
    val nBlocks = wb * hb
    val (intraBm, residBm, nIntra, nResid, off1) =
      Mcv.readModeBitmaps(payload, off0, nBlocks) match {
        case Some(t) => t
        case None    => return None
      }
    var off = off1
    val nMv = nBlocks - nIntra
    if (off + 3L * nMv > payload.length) return None
    val dirs = new Array[Int](nBlocks)
    val vx = new Array[Int](nBlocks)
    val vy = new Array[Int](nBlocks)
    var nFwd = 0; var nBwd = 0; var nAvg = 0
    var zeroVecs = 0; var halfVecs = 0
    var vOff = off.toInt
    var i = 0
    while (i < nBlocks) {
      if (!Mcv.bit(intraBm, i)) {
        val d = payload(vOff) & 0xff
        val b0 = payload(vOff + 1) & 0xff
        val b1 = payload(vOff + 2) & 0xff
        vOff += 3
        if (d > 2) return None
        if (!Mcv.vectorValid(b0, b1, i, wb, w, h)) return None
        dirs(i) = d
        vx(i) = b0 - Mcv.HalfRange; vy(i) = b1 - Mcv.HalfRange
        d match {
          case 0 => nFwd += 1
          case 1 => nBwd += 1
          case _ => nAvg += 1
        }
        if (vx(i) == 0 && vy(i) == 0) zeroVecs += 1
        if (((vx(i) | vy(i)) & 1) != 0) halfVecs += 1
      }
      i += 1
    }
    off += 3L * nMv
    val (dec, off2) =
      Mcv.readStripBlocks(payload, off, nIntra + nResid) match {
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
      if (Mcv.bit(intraBm, i)) {
        Dctv.putBlock(cur, w, bx, by, dec(intraSeen)); intraSeen += 1
      } else {
        val pred = predictB(dirs(i), prevA, nextA, w, bx, by,
          vx(i), vy(i))
        if (Mcv.bit(residBm, i)) {
          Dctv.putBlock(cur, w, bx, by,
            Mcv.applyResidual(pred, dec(nIntra + residSeen)))
          residSeen += 1
        } else Dctv.putBlock(cur, w, bx, by, pred)
      }
      i += 1
    }
    Some((cur,
      BCensus(nFwd, nBwd, nAvg, nResid, nIntra, zeroVecs, halfVecs), off))
  }

  /** Encode luma frames in DISPLAY order; nf must be odd (the GOP
    * ends on an anchor so every B has both references). */
  def build(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.length % 2 == 1,
      "GOP must end on an anchor (odd display-frame count)")
    val (out, ref) = Mcv.encodeHeader(w, h, frames, "MCB2")
    var k = 1
    var prevAnchor = ref
    while (k < frames.length) {
      // coded order: the NEXT anchor first (P vs previous anchor),
      // then the B between them (needs both decoded)
      val (pSection, pRec) = Mcv.encodeP(frames(k + 1), prevAnchor, w, h)
      out.write(pSection)
      out.write(encodeB(frames(k), prevAnchor, pRec, w, h))
      prevAnchor = pRec
      k += 2
    }
    out.toByteArray
  }

  /** Parse + decode: (w, h, frames in DISPLAY order, per-P census,
    * per-B census), or None for anything hostile. */
  def parse(payload: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]],
      Seq[Mcv.FrameCensus], Seq[BCensus])] = {
    Mcv.decodeHeader(payload, "MCB2") match {
      case None => None
      case Some((w, h, nf, first, off0)) =>
        if (nf % 2 == 0) return None // a GOP ends on an anchor
        val frames = new Array[Array[Byte]](nf)
        frames(0) = first
        val pCensus =
          scala.collection.mutable.ArrayBuffer.empty[Mcv.FrameCensus]
        val bCensus = scala.collection.mutable.ArrayBuffer.empty[BCensus]
        var prevAnchor = first
        var off = off0
        var k = 1
        while (k < nf) {
          Mcv.decodeP(payload, off, prevAnchor, w, h) match {
            case None => return None
            case Some((anchor, pc, o1)) =>
              decodeB(payload, o1, prevAnchor, anchor, w, h) match {
                case None => return None
                case Some((bFrame, bc, o2)) =>
                  frames(k) = bFrame
                  frames(k + 1) = anchor
                  pCensus += pc
                  bCensus += bc
                  prevAnchor = anchor
                  off = o2
              }
          }
          k += 2
        }
        if (off != payload.length) return None // trailing garbage
        Some((w, h, frames.toSeq, pCensus.toSeq, bCensus.toSeq))
    }
  }
}

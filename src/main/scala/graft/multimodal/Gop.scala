package graft.multimodal

/** From-spec GROUP-OF-PICTURES codec with BIDIRECTIONAL (B) frames —
  * the tier above [[Mcv]]'s forward-only motion compensation: odd
  * display positions are B-frames predicted from BOTH surrounding
  * anchors (the classic IBPBP structure), choosing per 8x8 block
  * among FORWARD (previous anchor), BACKWARD (next anchor — the mode
  * that explains content APPEARING mid-GOP, which no forward codec
  * can predict) and AVERAGE with a PER-DIRECTION VECTOR PAIR
  * ((fwd@v1 + bwd@v2 + 1) >> 1 — the H.264-class biprediction that
  * explains a B frame whose two anchors move INDEPENDENTLY, e.g. a
  * cross-fade of two pans; round 13 closed both this and the
  * sub-pixel ladder of the honest-limits ledger). Residual and intra
  * fallback ride the same [[Jpeg]] strip machinery; all vectors are
  * [[Mcv]]'s quarter-sample pairs.
  *
  * Structure: display order f0 f1 f2 ... f_{nf-1} with nf ODD —
  * anchors at even indices (I at 0, then P chained anchor-to-anchor),
  * one B between each anchor pair. CODED order interleaves each
  * anchor BEFORE its preceding B (the decoder needs both references):
  * I, P2, B1, P4, B3, ... — the standard decode-order/display-order
  * split, reordered back by the parser.
  *
  * Wire format (little-endian): magic `MCB4`, then exactly [[Mcv]]'s
  * header and P-frame sections (shared code paths, not copies); each
  * B-frame section is:
  *  - INTRA bitmap + RESIDUAL bitmap (same padding/conflict rules);
  *  - per NON-intra block in scan order: a DIRECTION byte
  *    (0 = forward, 1 = backward, 2 = average; anything else
  *    rejected) then ONE [[Mcv]] motion byte pair for dirs 0/1 or
  *    TWO pairs (forward then backward) for dir 2 — quarter-sample
  *    units, each byte ≤ 32, every pair's interpolation footprint
  *    bounds-checked against the frame;
  *  - u32 length + ONE strip of intra blocks then residual blocks.
  *
  * B-frames are NOT reference frames (the standard rule), so their
  * quantization error never compounds into the anchor chain; anchors
  * stay closed-loop through [[Mcv.encodeP]]/[[Mcv.decodeP]].
  *
  * Mode policy (deterministic): the two single directions run the
  * full search ladder (row-major integer sweep from (−4, −4),
  * first-strictly-better, zero short-circuit, then [[Mcv]]'s
  * half-pel and quarter-pel rings) in order fwd → bwd; if neither
  * reaches zero, the average PAIR runs an EXHAUSTIVE integer product
  * search (fwd-major over the two precomputed 81-candidate lists,
  * first-strictly-better — coordinate descent provably sticks in
  * local optima when the two motions interact through the average,
  * and 81² SADs over precomputed 8×8 grabs is cheap), then refines
  * coordinate-wise (fwd side then bwd side, two rounds at the
  * half-pel ring then two at the quarter ring, zero short-circuit).
  * Overall best SAD 0 → vector(s) only; < 1024 → vector(s) +
  * residual; else intra.
  */
object Gop {

  /** Per-B-frame mode census from a real parse. `halfVectors` counts
    * blocks carrying ANY fractional (half- or quarter-sample)
    * component; `splitPairs` counts average-mode blocks whose two
    * vectors DIFFER — the blocks only the per-direction-pair
    * capability can explain. */
  final case class BCensus(fwdBlocks: Int, bwdBlocks: Int,
      avgBlocks: Int, residBlocks: Int, intraBlocks: Int,
      zeroVectors: Int, halfVectors: Int, splitPairs: Int)

  private def avgBlock(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val o = new Array[Byte](64)
    var p = 0
    while (p < 64) {
      o(p) = (((a(p) & 0xff) + (b(p) & 0xff) + 1) >> 1).toByte
      p += 1
    }
    o
  }

  /** Single-anchor B prediction at a QUARTER-SAMPLE vector (dirs 0/1);
    * the average mode goes through [[pairPred]] with its own vector
    * per anchor. */
  private def predictB(dir: Int, prevA: Array[Byte], nextA: Array[Byte],
      w: Int, bx: Int, by: Int, dxH: Int, dyH: Int): Array[Byte] =
    if (dir == 0) Mcv.grabAtQuarter(prevA, w, bx, by, dxH, dyH)
    else Mcv.grabAtQuarter(nextA, w, bx, by, dxH, dyH)

  /** One direction's full search ladder against one anchor: the
    * integer stage rides [[Mcv.sad]]'s ALLOCATION-FREE in-place SAD
    * (81 candidates per block per direction — materializing a
    * prediction array per candidate on this hot path is the garbage
    * churn the old shared-vector search deliberately avoided); only
    * the ≤16 fractional-ring probes pay a [[Mcv.grabAtQuarter]]
    * allocation. Returns (sad, dxQ, dyQ). */
  private def searchOne(curBlk: Array[Byte], anchor: Array[Byte],
      w: Int, h: Int, bx: Int, by: Int): (Int, Int, Int) = {
    var best = Int.MaxValue
    var cx = 0; var cy = 0 // integer-stage winner (quarter units)
    var dy = -Mcv.Range
    while (dy <= Mcv.Range && best > 0) {
      if (by * 8 + dy >= 0 && by * 8 + dy + 8 <= h) {
        var dx = -Mcv.Range
        while (dx <= Mcv.Range && best > 0) {
          if (bx * 8 + dx >= 0 && bx * 8 + dx + 8 <= w) {
            val s = Mcv.sad(curBlk, anchor, w, bx, by, dx, dy)
            if (s < best) { best = s; cx = 4 * dx; cy = 4 * dy }
          }
          dx += 1
        }
      }
      dy += 1
    }
    Mcv.refineFractional(best, cx, cy, bx, by, w, h) { (dxQ, dyQ) =>
      Mcv.sadBlk(curBlk, Mcv.grabAtQuarter(anchor, w, bx, by, dxQ, dyQ))
    }
  }

  private def pairPred(prevA: Array[Byte], nextA: Array[Byte], w: Int,
      bx: Int, by: Int, fx: Int, fy: Int, gx: Int,
      gy: Int): Array[Byte] =
    avgBlock(Mcv.grabAtQuarter(prevA, w, bx, by, fx, fy),
      Mcv.grabAtQuarter(nextA, w, bx, by, gx, gy))

  /** All in-bounds INTEGER candidates of one anchor for one block, in
    * scan order, with their prediction blocks precomputed — the two
    * sides of the pair product search share these 81-entry lists
    * instead of re-grabbing per pair. Vectors in quarter units
    * (multiples of 4). */
  private def integerCands(anchor: Array[Byte], w: Int, h: Int, bx: Int,
      by: Int): Array[(Int, Int, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Array[Byte])]
    var dy = -Mcv.Range
    while (dy <= Mcv.Range) {
      var dx = -Mcv.Range
      while (dx <= Mcv.Range) {
        if (Mcv.quarterVectorValid(4 * dx, 4 * dy, bx, by, w, h))
          out += ((4 * dx, 4 * dy,
            Mcv.grabAt(anchor, w, bx, by, dx, dy)))
        dx += 1
      }
      dy += 1
    }
    out.toArray
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
    val vx = new Array[Int](wb * hb) // quarter units (fwd / single)
    val vy = new Array[Int](wb * hb)
    val wx = new Array[Int](wb * hb) // bwd vector of an average pair
    val wy = new Array[Int](wb * hb)
    var by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        val idx = by * wb + bx
        val curBlk = Dctv.grabBlock(cur, w, bx, by)
        // per-direction two-stage searches; probe order fwd → bwd →
        // average PAIR keeps the deterministic mode preference and
        // lets a zero-SAD single direction short-circuit the rest
        val (sadF, fx0, fy0) = searchOne(curBlk, prevA, w, h, bx, by)
        var bestSad = sadF; var bestDir = 0
        var bFx = fx0; var bFy = fy0; var bGx = 0; var bGy = 0
        if (bestSad > 0) {
          val (sadB, gx0, gy0) = searchOne(curBlk, nextA, w, h, bx, by)
          if (sadB < bestSad) {
            bestSad = sadB; bestDir = 1; bFx = gx0; bFy = gy0
          }
          if (bestSad > 0) {
            // average mode with a PER-DIRECTION VECTOR PAIR — the
            // H.264-class step above one shared vector, able to
            // explain a B frame whose two anchors move independently.
            // The INTEGER pair is found by an exhaustive product
            // search (≤ 81×81 candidates — affordable at this block
            // size because both sides' prediction blocks precompute
            // once, and coordinate descent provably sticks in local
            // optima when the two motions interact through the
            // average); the winner then refines to half-pel
            // coordinate-wise with Mcv's 8-neighbour probe, two
            // rounds, zero short-circuit throughout.
            val fC = integerCands(prevA, w, h, bx, by)
            val gC = integerCands(nextA, w, h, bx, by)
            var sadP = Int.MaxValue
            var pFx = 0; var pFy = 0; var pGx = 0; var pGy = 0
            var fi = 0
            while (fi < fC.length && sadP > 0) {
              val (fxc, fyc, fb) = fC(fi)
              var gi = 0
              while (gi < gC.length && sadP > 0) {
                val (gxc, gyc, gb) = gC(gi)
                var s = 0; var p = 0
                while (p < 64 && s < sadP) {
                  val avg = ((fb(p) & 0xff) + (gb(p) & 0xff) + 1) >> 1
                  s += math.abs((curBlk(p) & 0xff) - avg)
                  p += 1
                }
                if (s < sadP) {
                  sadP = s; pFx = fxc; pFy = fyc; pGx = gxc; pGy = gyc
                }
                gi += 1
              }
              fi += 1
            }
            // fractional ladder per side: two coordinate rounds at
            // quarter-step 2 (the half-pel ring), then two at step 1
            // (the quarter ring) — Mcv's coarse-to-fine order
            var round = 0
            while (round < 4 && sadP > 0) {
              val step = if (round < 2) 2 else 1
              var side = 0
              while (side < 2 && sadP > 0) {
                var uy = -1
                while (uy <= 1 && sadP > 0) {
                  var ux = -1
                  while (ux <= 1 && sadP > 0) {
                    if ((ux | uy) != 0) {
                      val cx = (if (side == 0) pFx else pGx) + ux * step
                      val cy = (if (side == 0) pFy else pGy) + uy * step
                      if (Mcv.quarterVectorValid(cx, cy, bx, by, w, h)) {
                        val s = Mcv.sadBlk(curBlk,
                          if (side == 0)
                            pairPred(prevA, nextA, w, bx, by, cx, cy,
                              pGx, pGy)
                          else pairPred(prevA, nextA, w, bx, by,
                            pFx, pFy, cx, cy))
                        if (s < sadP) {
                          sadP = s
                          if (side == 0) { pFx = cx; pFy = cy }
                          else { pGx = cx; pGy = cy }
                        }
                      }
                    }
                    ux += 1
                  }
                  uy += 1
                }
                side += 1
              }
              round += 1
            }
            if (sadP < bestSad) {
              bestSad = sadP; bestDir = 2
              bFx = pFx; bFy = pFy; bGx = pGx; bGy = pGy
            }
          }
        }
        if (bestSad >= Mcv.IntraSad) {
          modes(idx) = 2
          intraBm(idx / 8) = (intraBm(idx / 8) | (1 << (idx % 8))).toByte
          intraBlocks += curBlk
        } else {
          dirs(idx) = bestDir
          vx(idx) = bFx; vy(idx) = bFy; wx(idx) = bGx; wy(idx) = bGy
          if (bestSad == 0) modes(idx) = 0
          else {
            modes(idx) = 1
            residBm(idx / 8) = (residBm(idx / 8) | (1 << (idx % 8))).toByte
            val pred =
              if (bestDir == 2)
                pairPred(prevA, nextA, w, bx, by, bFx, bFy, bGx, bGy)
              else predictB(bestDir, prevA, nextA, w, bx, by, bFx, bFy)
            residBlocks += Mcv.residualOf(curBlk, pred)
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
        out.write(vx(i) + Mcv.QRange); out.write(vy(i) + Mcv.QRange)
        if (dirs(i) == 2) {
          out.write(wx(i) + Mcv.QRange)
          out.write(wy(i) + Mcv.QRange)
        }
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
    // minimum possible vector-section size (3 bytes per MV block); the
    // exact size depends on how many blocks ride the 5-byte average
    // pair, so each block ALSO bounds-checks before reading
    if (off + 3L * nMv > payload.length) return None
    val dirs = new Array[Int](nBlocks)
    val vx = new Array[Int](nBlocks)
    val vy = new Array[Int](nBlocks)
    val wx = new Array[Int](nBlocks)
    val wy = new Array[Int](nBlocks)
    var nFwd = 0; var nBwd = 0; var nAvg = 0
    var zeroVecs = 0; var halfVecs = 0; var splitPairs = 0
    var vOff = off
    var i = 0
    while (i < nBlocks) {
      if (!Mcv.bit(intraBm, i)) {
        if (vOff + 3 > payload.length) return None
        val d = payload(vOff.toInt) & 0xff
        if (d > 2) return None
        val need = if (d == 2) 5L else 3L
        if (vOff + need > payload.length) return None
        val b0 = payload(vOff.toInt + 1) & 0xff
        val b1 = payload(vOff.toInt + 2) & 0xff
        if (!Mcv.vectorValid(b0, b1, i, wb, w, h)) return None
        dirs(i) = d
        vx(i) = b0 - Mcv.QRange; vy(i) = b1 - Mcv.QRange
        var zero = vx(i) == 0 && vy(i) == 0
        var half = ((vx(i) | vy(i)) & 3) != 0
        if (d == 2) {
          val b2 = payload(vOff.toInt + 3) & 0xff
          val b3 = payload(vOff.toInt + 4) & 0xff
          if (!Mcv.vectorValid(b2, b3, i, wb, w, h)) return None
          wx(i) = b2 - Mcv.QRange; wy(i) = b3 - Mcv.QRange
          zero = zero && wx(i) == 0 && wy(i) == 0
          half = half || ((wx(i) | wy(i)) & 3) != 0
          if (wx(i) != vx(i) || wy(i) != vy(i)) splitPairs += 1
        }
        vOff += need
        d match {
          case 0 => nFwd += 1
          case 1 => nBwd += 1
          case _ => nAvg += 1
        }
        if (zero) zeroVecs += 1
        if (half) halfVecs += 1
      }
      i += 1
    }
    off = vOff
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
        val pred =
          if (dirs(i) == 2)
            pairPred(prevA, nextA, w, bx, by, vx(i), vy(i), wx(i), wy(i))
          else predictB(dirs(i), prevA, nextA, w, bx, by, vx(i), vy(i))
        if (Mcv.bit(residBm, i)) {
          Dctv.putBlock(cur, w, bx, by,
            Mcv.applyResidual(pred, dec(nIntra + residSeen)))
          residSeen += 1
        } else Dctv.putBlock(cur, w, bx, by, pred)
      }
      i += 1
    }
    Some((cur, BCensus(nFwd, nBwd, nAvg, nResid, nIntra, zeroVecs,
      halfVecs, splitPairs), off))
  }

  /** Encode luma frames in DISPLAY order; nf must be odd (the GOP
    * ends on an anchor so every B has both references). */
  def build(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.length % 2 == 1,
      "GOP must end on an anchor (odd display-frame count)")
    val (out, ref) = Mcv.encodeHeader(w, h, frames, "MCB4")
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
    Mcv.decodeHeader(payload, "MCB4") match {
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

package graft.pipeline

import H264._

/** Fixture-grade H.264 baseline-intra ENCODER: IDR frames of I_16x16
  * (DC prediction), I_4x4 (most-probable-mode prediction), and I_PCM
  * macroblocks with real CAVLC residual coding — enough to produce
  * CONFORMING bitstreams that exercise every decode path in [[H264]]
  * (entropy tables, both transform chains, chroma DC/AC, cropping).
  * Reconstruction runs through the DECODER's dequant/inverse-transform
  * functions, so the encoder's predicted reference planes are
  * bit-identical to what the decoder reconstructs — the roundtrip
  * tests in H264Spec assert exactly that.
  *
  * Not a production encoder: no mode decision (the mode is a per-MB
  * callback), no rate control, no deblocking (slices set
  * `disable_deblocking_filter_idc = 1`, which conforming decoders
  * honor — the output is valid baseline H.264 any real decoder plays).
  */
object H264Encoder {

  /** Per-MB mode for [[encodeFrame]]. */
  val Mode16x16 = 0
  val ModePcm = 1
  val Mode4x4 = 2

  private[pipeline] def quant(v: Int, mf: Int, f: Int, qbits: Int): Int = {
    val lvl = (math.abs(v) * mf + f) >> qbits
    if (v < 0) -lvl else lvl
  }

  /** Encode one IDR frame. Planes are full-range 8-bit, luma
    * `widthMbs*16 × heightMbs*16`, chroma quarter-size. Returns the
    * three NAL payloads (SPS, PPS, IDR slice — no start codes) and the
    * reconstructed frame (what any conforming decoder must output).
    */
  def encodeFrame(y: Array[Int], cb: Array[Int], cr: Array[Int],
                  widthMbs: Int, heightMbs: Int, qp: Int,
                  cropR: Int = 0, cropB: Int = 0,
                  mbMode: (Int, Int) => Int = (_, _) => Mode16x16,
                  deblock: Boolean = false)
      : (Array[Byte], Array[Byte], Array[Byte], Frame) = {
    val (spsN, ppsN, slices, recon) = encodeFrameSlices(y, cb, cr,
      widthMbs, heightMbs, qp, cropR, cropB, mbMode, Seq(0), Seq(deblock))
    (spsN, ppsN, slices.head, recon)
  }

  /** Multi-slice variant: `sliceFirstMbs` lists each slice's
    * first_mb_in_slice (ascending, head 0); `sliceDeblock` gives each
    * slice's loop-filter flag. Cross-slice neighbor MBs are treated
    * UNAVAILABLE for intra prediction, mode prediction and CAVLC nC
    * context on both encode and decode sides (§6.4.8), and the loop
    * filter applies each slice's own settings to its own MBs (§8.7) —
    * the returned recon is what a conforming decoder outputs for the
    * heterogeneous-slice picture.
    */
  def encodeFrameSlices(y: Array[Int], cb: Array[Int], cr: Array[Int],
                        widthMbs: Int, heightMbs: Int, qp: Int,
                        cropR: Int, cropB: Int,
                        mbMode: (Int, Int) => Int,
                        sliceFirstMbs: Seq[Int], sliceDeblock: Seq[Boolean],
                        cabac: Boolean = false)
      : (Array[Byte], Array[Byte], Seq[Array[Byte]], Frame) = {
    require(qp >= 0 && qp <= 51)
    val nMbs = widthMbs * heightMbs
    require(sliceFirstMbs.nonEmpty && sliceFirstMbs.head == 0 &&
      sliceFirstMbs == sliceFirstMbs.sorted &&
      sliceFirstMbs.distinct == sliceFirstMbs && sliceFirstMbs.last < nMbs,
      "sliceFirstMbs must be ascending distinct MB indices starting at 0")
    require(sliceDeblock.size == sliceFirstMbs.size)
    // CABAC streams signal Main profile (77) — baseline forbids CABAC
    val sps = Sps(if (cabac) 77 else 66, 20, 4, 2, 0, widthMbs, heightMbs,
      0, cropR, 0, cropB)
    val pps = Pps(cabac = cabac, bottomFieldPoc = false, picInitQp = qp,
      chromaQpOff = 0, deblockCtrl = true, constrainedIntra = false,
      redundantPicCnt = false)
    val st = new PicState(sps)

    val qbits = 15 + qp / 6
    val f2 = (1 << qbits) / 3 // intra rounding
    val mf = QuantMf(qp % 6)
    val qpc = chromaQp(qp, 0)
    val qbitsC = 15 + qpc / 6
    val fC = (1 << qbitsC) / 3
    val mfC = QuantMf(qpc % 6)

    val bounds = sliceFirstMbs :+ nMbs
    val sliceNals = for (si <- sliceFirstMbs.indices) yield {
      st.currentSlice = si // earlier slices' MBs become unusable neighbors
      val w = new BitWriter()
      // slice header (IDR, slice_type 7, qp from PPS)
      w.ue(bounds(si)) // first_mb_in_slice
      w.ue(7) // slice_type I (all slices in picture)
      w.ue(0) // pps_id
      w.put(0, sps.log2MaxFrameNum) // frame_num
      w.ue(0) // idr_pic_id
      w.put(0, 2) // no_output_of_prior_pics, long_term_reference
      w.se(0) // slice_qp_delta
      if (sliceDeblock(si)) { w.ue(0); w.se(0); w.se(0) } // filter ON, zero offsets
      else w.ue(1) // disable_deblocking_filter_idc = 1

      if (cabac) {
        // cabac_alignment_one_bit (7.3.4), then the arithmetic layer;
        // its final flush emits the stop bit, zeros pad the last byte
        while (w.bitLength % 8 != 0) w.put(1, 1)
        H264Cabac.encodeSliceMbs(w, st, y, cb, cr,
          bounds(si), bounds(si + 1), qp, mbMode)
        for (mb <- bounds(si) until bounds(si + 1))
          st.deblockOnOfMb(mb) = sliceDeblock(si)
        w.byteAlign()
      } else {
        for (mb <- bounds(si) until bounds(si + 1)) {
          val mbX = mb % widthMbs
          val mbY = mb / widthMbs
          mbMode(mbX, mbY) match {
            case ModePcm =>
              encodePcm(w, st, y, cb, cr, mb, mbX, mbY)
              st.qpOfMb(mb) = 0
            case Mode4x4 =>
              encodeI4x4(w, st, y, cb, cr, mb, mbX, mbY, qp,
                qbits, f2, mf, qpc, qbitsC, fC, mfC)
              st.qpOfMb(mb) = qp
            case _ =>
              encodeI16x16(w, st, y, cb, cr, mb, mbX, mbY, qp,
                qbits, f2, mf, qpc, qbitsC, fC, mfC)
              st.qpOfMb(mb) = qp
          }
          st.mbDecoded(mb) = true
          st.sliceOfMb(mb) = si
          st.deblockOnOfMb(mb) = sliceDeblock(si)
        }
        w.rbspTrailing()
      }
      Array(0x65.toByte) ++ addEmulation(w.toBytes)
    }
    // prediction used UNFILTERED samples above (the conforming order
    // for intra pictures); the returned recon is what a decoder
    // outputs — filtered per slice where the loop filter is enabled
    if (st.deblockOnOfMb.exists(identity)) deblockPicture(st)
    (spsNal(sps), ppsNal(pps), sliceNals, st.cropped)
  }

  /** Encode an I + P group of pictures: frame 0 as an IDR I_16x16
    * picture, every later frame as a P picture whose macroblocks are
    * P_L0_16x16 (or P_Skip where the target motion equals the skip
    * predictor and every quantized residual is zero) over the SINGLE
    * reference of the previously reconstructed picture — the encoder
    * counterpart of the decoder's P ceiling, so roundtrips stay
    * self-contained. `mvOf(frameIdx)(mbX, mbY)` supplies the motion
    * vector in QUARTER-sample units for each P macroblock; fractional
    * vectors exercise the decoder's 6-tap/bilinear interpolation
    * because the encoder predicts through the SAME [[H264.mcLuma]] /
    * [[H264.mcChroma]] the decoder uses. Returns (SPS NAL, PPS NAL,
    * one slice NAL per frame, per-frame reconstructions) — the recons
    * are bit-exact decode targets.
    */
  def encodeIpGop(frames: Seq[(Array[Int], Array[Int], Array[Int])],
                  widthMbs: Int, heightMbs: Int, qp: Int,
                  mvOf: Int => (Int, Int) => (Int, Int),
                  deblock: Boolean = false)
      : (Array[Byte], Array[Byte], Seq[Array[Byte]], Seq[Frame]) = {
    require(frames.nonEmpty && qp >= 0 && qp <= 51)
    val sps = Sps(66, 20, 4, 2, 0, widthMbs, heightMbs, 0, 0, 0, 0)
    val pps = Pps(cabac = false, bottomFieldPoc = false, picInitQp = qp,
      chromaQpOff = 0, deblockCtrl = true, constrainedIntra = false,
      redundantPicCnt = false)
    val nMbs = widthMbs * heightMbs
    val qbits = 15 + qp / 6
    val fIntra = (1 << qbits) / 3
    val fInter = (1 << qbits) / 6 // spec-typical inter rounding
    val mf = QuantMf(qp % 6)
    val qpc = chromaQp(qp, 0)
    val qbitsC = 15 + qpc / 6
    val fC = (1 << qbitsC) / 3
    val mfC = QuantMf(qpc % 6)
    var ref: PicState = null
    val out = frames.zipWithIndex.map { case ((y, cb, cr), idx) =>
      val st = new PicState(sps)
      val w = new BitWriter()
      if (idx == 0) {
        w.ue(0); w.ue(7); w.ue(0) // first_mb, slice_type I, pps_id
        w.put(0, sps.log2MaxFrameNum) // frame_num
        w.ue(0) // idr_pic_id
        w.put(0, 2) // dec_ref_pic_marking (IDR)
        w.se(0) // slice_qp_delta
        if (deblock) { w.ue(0); w.se(0); w.se(0) } else w.ue(1)
        for (mb <- 0 until nMbs) {
          encodeI16x16(w, st, y, cb, cr, mb, mb % widthMbs, mb / widthMbs,
            qp, qbits, fIntra, mf, qpc, qbitsC, fC, mfC)
          st.qpOfMb(mb) = qp
          st.mbDecoded(mb) = true
          st.deblockOnOfMb(mb) = deblock
        }
      } else {
        st.refPic = ref
        w.ue(0); w.ue(5); w.ue(0) // first_mb, slice_type P, pps_id
        w.put(idx % (1 << sps.log2MaxFrameNum), sps.log2MaxFrameNum)
        w.put(0, 1) // num_ref_idx_active_override_flag (default: 1 ref)
        w.put(0, 1) // ref_pic_list_modification_flag_l0
        w.put(0, 1) // adaptive_ref_pic_marking_mode_flag
        w.se(0) // slice_qp_delta
        if (deblock) { w.ue(0); w.se(0); w.se(0) } else w.ue(1)
        var skipRun = 0
        for (mb <- 0 until nMbs) {
          val mbX = mb % widthMbs
          val mbY = mb / widthMbs
          val (bx, by) = (mbX * 4, mbY * 4)
          val (px, py) = (mbX * 16, mbY * 16)
          val (mvx, mvy) = mvOf(idx)(mbX, mbY)
          // predictors BEFORE this MB's blocks are assigned — the
          // decoder-visible neighbor state
          val a = mvNeighbor(st, mb, bx - 1, by)
          val b = mvNeighbor(st, mb, bx, by - 1)
          val skipMv =
            if (!a._1 || !b._1 ||
              (a._2 == 0 && a._3 == 0 && a._4 == 0) ||
              (b._2 == 0 && b._3 == 0 && b._4 == 0)) (0, 0)
            else mvPred(st, mb, 0, bx, by, 4, 4, 0)
          val mvp = mvPred(st, mb, 0, bx, by, 4, 4, 0)
          val predY = new Array[Int](256)
          val predCb = new Array[Int](64)
          val predCr = new Array[Int](64)
          applyPartition(st, ref, mb, bx, by, 4, 4, mvx, mvy,
            predY, predCb, predCr)
          // luma residual: quantize all 16 blocks against the MC pred
          val qBlk = Array.ofDim[Int](16, 16)
          val nzAny = new Array[Boolean](16)
          for (bIdx <- 0 until 16) {
            val (lx, ly) = Blk4x4Pos(bIdx)
            val blk = new Array[Int](16)
            for (yy <- 0 until 4; xx <- 0 until 4)
              blk(yy * 4 + xx) =
                y((py + ly * 4 + yy) * st.w + px + lx * 4 + xx) -
                  predY((ly * 4 + yy) * 16 + lx * 4 + xx)
            val tw = forwardTransform4x4(blk)
            for (i <- 0 until 16) {
              val q = quant(tw(i), mf(posClass(i)), fInter, qbits)
              qBlk(bIdx)(i) = q
              if (q != 0) nzAny(bIdx) = true
            }
          }
          val cbpLuma = (0 until 4).map { g =>
            if ((g * 4 until g * 4 + 4).exists(nzAny(_))) 1 << g else 0
          }.sum
          val chroma = codeChroma(st, cb, cr, mb, mbX, mbY, qpc,
            qbitsC, fC, mfC, interPred = Some((predCb, predCr)))
          val cbp = cbpLuma | (chroma.cbpChroma << 4)
          if (cbp == 0 && (mvx, mvy) == skipMv) {
            // P_Skip: prediction is the reconstruction
            skipRun += 1
            for (yy <- 0 until 16; xx <- 0 until 16)
              st.y((py + yy) * st.w + px + xx) = predY(yy * 16 + xx)
            // codeChroma already wrote pred+0 into the chroma planes
            for (bIdx <- 0 until 16) {
              val (lx, ly) = Blk4x4Pos(bIdx)
              st.lumaNz((mbY * 4 + ly) * st.wMbs * 4 + mbX * 4 + lx) = 0
              st.i4Modes((mbY * 4 + ly) * st.wMbs * 4 + mbX * 4 + lx) = 2
            }
            for (bIdx <- 0 until 4) {
              val cIdx = (mbY * 2 + bIdx / 2) * st.wMbs * 2 + mbX * 2 + bIdx % 2
              st.cbNz(cIdx) = 0
              st.crNz(cIdx) = 0
            }
          } else {
            w.ue(skipRun)
            skipRun = 0
            w.ue(0) // mb_type P_L0_16x16
            w.se(mvx - mvp._1)
            w.se(mvy - mvp._2)
            w.ue(CbpInterInv(cbp))
            if (cbp != 0) w.se(0) // mb_qp_delta
            for (bIdx <- 0 until 16) {
              val (lx, ly) = Blk4x4Pos(bIdx)
              val bax = mbX * 4 + lx
              val bay = mbY * 4 + ly
              val nz =
                if ((cbpLuma & (1 << (bIdx / 4))) != 0) {
                  val scan = new Array[Int](16)
                  for (i <- 0 until 16) scan(i) = qBlk(bIdx)(Zigzag4x4(i))
                  encodeResidualBlock(w, scan, lumaNc(st, bax, bay))
                } else 0
              st.lumaNz(bay * st.wMbs * 4 + bax) = nz
              st.i4Modes(bay * st.wMbs * 4 + bax) = 2
              // reconstruct with exactly the transmitted levels
              val res =
                if (nz == 0 && (cbpLuma & (1 << (bIdx / 4))) == 0)
                  new Array[Int](16)
                else inverseTransform4x4(dequant4x4(qBlk(bIdx), qp, skipDc = false))
              for (yy <- 0 until 4; xx <- 0 until 4)
                st.y((py + ly * 4 + yy) * st.w + px + lx * 4 + xx) =
                  clip255(predY((ly * 4 + yy) * 16 + lx * 4 + xx) + res(yy * 4 + xx))
            }
            writeChroma(w, st, chroma, mbX, mbY)
          }
          st.qpOfMb(mb) = qp
          st.mbDecoded(mb) = true
          st.deblockOnOfMb(mb) = deblock
        }
        if (skipRun > 0) w.ue(skipRun) // slice may end on a skip run
      }
      w.rbspTrailing()
      if (st.deblockOnOfMb.exists(identity)) deblockPicture(st)
      ref = st
      val header = if (idx == 0) 0x65.toByte else 0x41.toByte // IDR / P ref
      (Array(header) ++ addEmulation(w.toBytes), st.cropped)
    }
    (spsNal(sps), ppsNal(pps), out.map(_._1), out.map(_._2))
  }

  /** Chroma encode shared by both predicted modes: returns cbpChroma
    * after writing NOTHING (caller writes residuals later via the
    * returned closures' data). Reconstruction mirrors the decoder for
    * the chosen cbp.
    */
  private[pipeline] final case class ChromaCoded(cbpChroma: Int,
                                       dcScan: Array[Array[Int]],
                                       acScan: Array[Array[Array[Int]]])

  private[pipeline] def codeChroma(st: PicState, cb: Array[Int], cr: Array[Int],
                         mb: Int, mbX: Int, mbY: Int, qpc: Int,
                         qbitsC: Int, fC: Int, mfC: Array[Int],
                         interPred: Option[(Array[Int], Array[Int])] = None): ChromaCoded = {
    val cw = st.w / 2
    val px = mbX * 8
    val py = mbY * 8
    val dcScan = Array.ofDim[Int](2, 4)
    val acScan = Array.ofDim[Int](2, 4, 15)
    val preds = new Array[Array[Int]](2)
    val qAc = Array.ofDim[Int](2, 4, 16) // raster, [0] unused
    val qDcRaw = Array.ofDim[Int](2, 4)
    var anyAc = false
    var anyDc = false
    for (c <- 0 until 2) {
      val src = if (c == 0) cb else cr
      val plane = if (c == 0) st.cb else st.cr
      val pred = interPred.map(p => if (c == 0) p._1 else p._2)
        .getOrElse(predictChroma(st, plane, 0, px, py, mb))
      preds(c) = pred
      val dcW = new Array[Int](4)
      for (b <- 0 until 4) {
        val lx = b % 2
        val ly = b / 2
        val blk = new Array[Int](16)
        for (yy <- 0 until 4; xx <- 0 until 4)
          blk(yy * 4 + xx) = src((py + ly * 4 + yy) * cw + px + lx * 4 + xx) -
            pred((ly * 4 + yy) * 8 + lx * 4 + xx)
        val tw = forwardTransform4x4(blk)
        dcW(b) = tw(0)
        for (i <- 1 until 16) {
          val q = quant(tw(i), mfC(posClass(i)), fC, qbitsC)
          qAc(c)(b)(i) = q
          if (q != 0) anyAc = true
        }
      }
      // 2x2 Hadamard forward, then DC quant with doubled rounding
      val had = Array(
        dcW(0) + dcW(1) + dcW(2) + dcW(3), dcW(0) - dcW(1) + dcW(2) - dcW(3),
        dcW(0) + dcW(1) - dcW(2) - dcW(3), dcW(0) - dcW(1) - dcW(2) + dcW(3))
      for (i <- 0 until 4) {
        val q = quant(had(i), mfC(0), 2 * fC, qbitsC + 1)
        qDcRaw(c)(i) = q
        if (q != 0) anyDc = true
      }
    }
    val cbpChroma = if (anyAc) 2 else if (anyDc) 1 else 0
    // reconstruction with exactly the transmitted data
    for (c <- 0 until 2) {
      val plane = if (c == 0) st.cb else st.cr
      val dcQ = if (cbpChroma >= 1) qDcRaw(c) else Array(0, 0, 0, 0)
      val dc = if (cbpChroma >= 1) dequantChromaDc(dcQ, qpc) else Array(0, 0, 0, 0)
      for (b <- 0 until 4) {
        val lx = b % 2
        val ly = b / 2
        val res =
          if (cbpChroma == 0) new Array[Int](16)
          else {
            val d0 = new Array[Int](16)
            if (cbpChroma == 2) for (i <- 1 until 16) d0(i) = qAc(c)(b)(i)
            val d = dequant4x4(d0, qpc, skipDc = true)
            d(0) = dc(b)
            inverseTransform4x4(d)
          }
        for (yy <- 0 until 4; xx <- 0 until 4)
          plane((py + ly * 4 + yy) * cw + px + lx * 4 + xx) =
            clip255(preds(c)((ly * 4 + yy) * 8 + lx * 4 + xx) + res(yy * 4 + xx))
      }
      // scan-order views for entropy coding
      for (i <- 0 until 4) dcScan(c)(i) = dcQ(i)
      for (b <- 0 until 4; i <- 1 until 16)
        acScan(c)(b)(i - 1) = if (cbpChroma == 2) qAc(c)(b)(Zigzag4x4(i)) else 0
    }
    ChromaCoded(cbpChroma, dcScan, acScan)
  }

  /** Write chroma residuals in decode order and update nz state. */
  private def writeChroma(w: BitWriter, st: PicState, coded: ChromaCoded,
                          mbX: Int, mbY: Int): Unit = {
    if (coded.cbpChroma != 0)
      for (c <- 0 until 2) encodeResidualBlock(w, coded.dcScan(c), -1)
    for (c <- 0 until 2) {
      val nzPlane = if (c == 0) st.cbNz else st.crNz
      for (b <- 0 until 4) {
        val lx = b % 2
        val ly = b / 2
        val nz =
          if (coded.cbpChroma == 2)
            encodeResidualBlock(w, coded.acScan(c)(b),
              chromaNc(st, nzPlane, mbX * 2 + lx, mbY * 2 + ly))
          else 0
        nzPlane((mbY * 2 + ly) * st.wMbs * 2 + mbX * 2 + lx) = nz
      }
    }
  }

  private def encodeI16x16(w: BitWriter, st: PicState, y: Array[Int],
                           cb: Array[Int], cr: Array[Int], mb: Int,
                           mbX: Int, mbY: Int, qp: Int, qbits: Int, f2: Int,
                           mf: Array[Int], qpc: Int, qbitsC: Int, fC: Int,
                           mfC: Array[Int]): Unit = {
    val px = mbX * 16
    val py = mbY * 16
    // spec 8.3.1.1: an I_16x16 MB contributes mode 2 (DC) to later
    // I_4x4 neighbors' most-probable-mode predictor (mirrors decoder)
    for (b <- 0 until 16) {
      val (lx, ly) = Blk4x4Pos(b)
      st.i4Modes((mbY * 4 + ly) * st.wMbs * 4 + mbX * 4 + lx) = 2
    }
    val pred = predict16x16(st, 2, px, py, mb) // DC prediction
    val qAc = Array.ofDim[Int](16, 16) // per block, raster, [0] unused
    val dcW = new Array[Int](16) // raster by (ly*4+lx)
    var anyAc = false
    for (b <- 0 until 16) {
      val (lx, ly) = Blk4x4Pos(b)
      val blk = new Array[Int](16)
      for (yy <- 0 until 4; xx <- 0 until 4)
        blk(yy * 4 + xx) = y((py + ly * 4 + yy) * st.w + px + lx * 4 + xx) -
          pred((ly * 4 + yy) * 16 + lx * 4 + xx)
      val tw = forwardTransform4x4(blk)
      dcW(ly * 4 + lx) = tw(0)
      for (i <- 1 until 16) {
        val q = quant(tw(i), mf(posClass(i)), f2, qbits)
        qAc(b)(i) = q
        if (q != 0) anyAc = true
      }
    }
    // forward luma-DC transform is Hadamard/2 (JM/x264 convention): the
    // decoder's §8.5.10 dequant assumes the halved scale — without it
    // reconstruction lands at exactly 2× the residual (pinned by the
    // flat-gray test)
    val hadDc = hadamard4x4(dcW).map(v => if (v >= 0) (v + 1) / 2 else -((-v + 1) / 2))
    val qDc = hadDc.map(v => quant(v, mf(0), 2 * f2, qbits + 1))
    val cbpLuma = if (anyAc) 15 else 0
    val chroma = codeChroma(st, cb, cr, mb, mbX, mbY, qpc, qbitsC, fC, mfC)
    val mbType = 1 + 2 /*predMode DC*/ + 4 * chroma.cbpChroma +
      (if (cbpLuma == 15) 12 else 0)
    w.ue(mbType)
    w.ue(0) // intra_chroma_pred_mode DC
    w.se(0) // mb_qp_delta
    // Intra16x16DCLevel (zigzag of the quantized Hadamard block)
    val dcScan = new Array[Int](16)
    for (i <- 0 until 16) dcScan(i) = qDc(Zigzag4x4(i))
    encodeResidualBlock(w, dcScan, lumaNc(st, mbX * 4, mbY * 4))
    // reconstruction (decoder-identical) + AC writes interleaved in
    // coding order so nz context matches the decoder's
    val dcDeq = dequantLumaDc(qDc, qp)
    for (b <- 0 until 16) {
      val (lx, ly) = Blk4x4Pos(b)
      val bx = mbX * 4 + lx
      val by = mbY * 4 + ly
      val nz =
        if (cbpLuma != 0) {
          val acScan = new Array[Int](15)
          for (i <- 1 until 16) acScan(i - 1) = qAc(b)(Zigzag4x4(i))
          encodeResidualBlock(w, acScan, lumaNc(st, bx, by))
        } else 0
      st.lumaNz(by * st.wMbs * 4 + bx) = nz
      val d0 = new Array[Int](16)
      if (cbpLuma != 0) for (i <- 1 until 16) d0(i) = qAc(b)(i)
      val d = dequant4x4(d0, qp, skipDc = true)
      d(0) = dcDeq(ly * 4 + lx)
      val res = inverseTransform4x4(d)
      for (yy <- 0 until 4; xx <- 0 until 4)
        st.y((py + ly * 4 + yy) * st.w + px + lx * 4 + xx) =
          clip255(pred((ly * 4 + yy) * 16 + lx * 4 + xx) + res(yy * 4 + xx))
    }
    writeChroma(w, st, chroma, mbX, mbY)
  }

  private def encodeI4x4(w: BitWriter, st: PicState, y: Array[Int],
                         cb: Array[Int], cr: Array[Int], mb: Int,
                         mbX: Int, mbY: Int, qp: Int, qbits: Int, f2: Int,
                         mf: Array[Int], qpc: Int, qbitsC: Int, fC: Int,
                         mfC: Array[Int]): Unit = {
    val px = mbX * 16
    val py = mbY * 16
    val wB = st.wMbs * 4
    // pass 1: per block (coding order): most-probable mode, quantize,
    // reconstruct — transmission cannot change recon (dropped groups
    // are exactly the all-zero ones)
    val qBlk = Array.ofDim[Int](16, 16) // raster
    val nzCount = new Array[Int](16)
    val modes = new Array[Int](16)
    val predModes = new Array[Int](16)
    for (b <- 0 until 16) {
      val (lx, ly) = Blk4x4Pos(b)
      val bx = mbX * 4 + lx
      val by = mbY * 4 + ly
      def neighborMode(x: Int, yy: Int): Int =
        if (x < 0 || yy < 0 || x >= wB) -1
        else {
          // cross-slice neighbor MBs are unavailable (§6.4.8)
          val nMb = (yy / 4) * st.wMbs + (x / 4)
          if (nMb != mb && !st.mbUsable(nMb)) -1 else st.i4Modes(yy * wB + x)
        }
      val mA = neighborMode(bx - 1, by)
      val mB = neighborMode(bx, by - 1)
      val predMode = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
      // cycle through all 9 prediction modes deterministically so a
      // multi-MB fixture exercises every decode arm; fall back to DC
      // where the mode's neighbors sit outside the picture OR in a
      // different slice (cross-slice samples are unavailable, §6.4.8 —
      // a conforming bitstream must not predict from them)
      val desired = (b + mbX * 3 + mbY * 5) % 9
      val topMbOk = mbY > 0 && st.mbUsable(mb - st.wMbs)
      val leftMbOk = mbX > 0 && st.mbUsable(mb - 1)
      val tlMbOk = mbX > 0 && mbY > 0 && st.mbUsable(mb - st.wMbs - 1)
      val topOk = if (ly == 0) topMbOk else true
      val leftOk = if (lx == 0) leftMbOk else true
      val topLeftOk =
        if (lx > 0 && ly > 0) true
        else if (lx == 0 && ly > 0) leftMbOk
        else if (lx > 0) topMbOk
        else tlMbOk
      val mode = desired match {
        case 0 | 3 | 7 => if (topOk) desired else 2
        case 1 | 8 => if (leftOk) desired else 2
        case 4 | 5 | 6 => if (topOk && leftOk && topLeftOk) desired else 2
        case _ => 2
      }
      modes(b) = mode
      predModes(b) = predMode
      st.i4Modes(by * wB + bx) = mode
      val pred = predict4x4(st, mode, px + lx * 4, py + ly * 4, mb, b)
      val blk = new Array[Int](16)
      for (yy <- 0 until 4; xx <- 0 until 4)
        blk(yy * 4 + xx) = y((py + ly * 4 + yy) * st.w + px + lx * 4 + xx) -
          pred(yy * 4 + xx)
      val tw = forwardTransform4x4(blk)
      var n = 0
      for (i <- 0 until 16) {
        val q = quant(tw(i), mf(posClass(i)), f2, qbits)
        qBlk(b)(i) = q
        if (q != 0) n += 1
      }
      nzCount(b) = n
      val res =
        if (n == 0) new Array[Int](16)
        else inverseTransform4x4(dequant4x4(qBlk(b), qp, skipDc = false))
      for (yy <- 0 until 4; xx <- 0 until 4)
        st.y((py + ly * 4 + yy) * st.w + px + lx * 4 + xx) =
          clip255(pred(yy * 4 + xx) + res(yy * 4 + xx))
    }
    val cbpLuma = (0 until 4).map { g =>
      if ((g * 4 until g * 4 + 4).exists(nzCount(_) > 0)) 1 << g else 0
    }.sum
    val chroma = codeChroma(st, cb, cr, mb, mbX, mbY, qpc, qbitsC, fC, mfC)
    val cbp = cbpLuma | (chroma.cbpChroma << 4)
    w.ue(0) // mb_type I_4x4
    for (b <- 0 until 16) {
      if (modes(b) == predModes(b)) w.put(1, 1) // prev_intra4x4_pred_mode_flag
      else {
        w.put(0, 1)
        w.put(if (modes(b) < predModes(b)) modes(b) else modes(b) - 1, 3)
      }
    }
    w.ue(0) // intra_chroma_pred_mode DC
    w.ue(CbpIntraInv(cbp)) // coded_block_pattern me(v)
    if (cbp != 0) w.se(0) // mb_qp_delta
    for (b <- 0 until 16) {
      val (lx, ly) = Blk4x4Pos(b)
      val bx = mbX * 4 + lx
      val by = mbY * 4 + ly
      val nz =
        if ((cbpLuma & (1 << (b / 4))) != 0) {
          val scan = new Array[Int](16)
          for (i <- 0 until 16) scan(i) = qBlk(b)(Zigzag4x4(i))
          encodeResidualBlock(w, scan, lumaNc(st, bx, by))
        } else 0
      st.lumaNz(by * st.wMbs * 4 + bx) = nz
    }
    writeChroma(w, st, chroma, mbX, mbY)
  }

  private def encodePcm(w: BitWriter, st: PicState, y: Array[Int],
                        cb: Array[Int], cr: Array[Int], mb: Int,
                        mbX: Int, mbY: Int): Unit = {
    val px = mbX * 16
    val py = mbY * 16
    val cw = st.w / 2
    w.ue(25) // I_PCM
    w.byteAlign()
    for (yy <- 0 until 16; xx <- 0 until 16) {
      val v = y((py + yy) * st.w + px + xx)
      w.put(v, 8)
      st.y((py + yy) * st.w + px + xx) = v
    }
    for (yy <- 0 until 8; xx <- 0 until 8) {
      val v = cb((py / 2 + yy) * cw + px / 2 + xx)
      w.put(v, 8)
      st.cb((py / 2 + yy) * cw + px / 2 + xx) = v
    }
    for (yy <- 0 until 8; xx <- 0 until 8) {
      val v = cr((py / 2 + yy) * cw + px / 2 + xx)
      w.put(v, 8)
      st.cr((py / 2 + yy) * cw + px / 2 + xx) = v
    }
    for (b <- 0 until 16) {
      val (lx, ly) = Blk4x4Pos(b)
      st.lumaNz((mbY * 4 + ly) * st.wMbs * 4 + mbX * 4 + lx) = 16
      // spec 8.3.1.1: I_PCM contributes mode 2 (DC), not "unavailable"
      st.i4Modes((mbY * 4 + ly) * st.wMbs * 4 + mbX * 4 + lx) = 2
    }
    for (b <- 0 until 4) {
      val cIdx = (mbY * 2 + b / 2) * st.wMbs * 2 + mbX * 2 + b % 2
      st.cbNz(cIdx) = 16
      st.crNz(cIdx) = 16
    }
  }

  /** SPS NAL payload (header byte + emulation-protected RBSP). */
  private[pipeline] def spsNal(s: Sps): Array[Byte] = {
    val w = new BitWriter()
    w.put(s.profile, 8) // baseline (66) / Main for CABAC (77)
    w.put(0, 8) // constraint flags
    w.put(s.level, 8)
    w.ue(0) // sps_id
    w.ue(s.log2MaxFrameNum - 4)
    w.ue(2) // pic_order_cnt_type
    w.ue(0) // max_num_ref_frames
    w.put(0, 1) // gaps
    w.ue(s.widthMbs - 1)
    w.ue(s.heightMbs - 1)
    w.put(1, 1) // frame_mbs_only
    w.put(1, 1) // direct_8x8_inference
    val crop = s.cropL != 0 || s.cropR != 0 || s.cropT != 0 || s.cropB != 0
    w.put(if (crop) 1 else 0, 1)
    if (crop) { w.ue(s.cropL); w.ue(s.cropR); w.ue(s.cropT); w.ue(s.cropB) }
    w.put(0, 1) // vui
    w.rbspTrailing()
    Array(0x67.toByte) ++ addEmulation(w.toBytes)
  }

  /** PPS NAL payload. */
  private[pipeline] def ppsNal(p: Pps): Array[Byte] = {
    val w = new BitWriter()
    w.ue(0) // pps_id
    w.ue(0) // sps_id
    w.put(if (p.cabac) 1 else 0, 1) // entropy_coding_mode_flag
    w.put(0, 1) // bottom_field_poc
    w.ue(0) // slice groups
    w.ue(0); w.ue(0) // ref idx defaults
    w.put(0, 1) // weighted_pred
    w.put(0, 2) // weighted_bipred
    w.se(p.picInitQp - 26)
    w.se(0) // qs
    w.se(p.chromaQpOff)
    w.put(1, 1) // deblocking_filter_control_present
    w.put(0, 1) // constrained_intra
    w.put(0, 1) // redundant_pic_cnt
    w.rbspTrailing()
    Array(0x68.toByte) ++ addEmulation(w.toBytes)
  }

  /** AVCDecoderConfigurationRecord for one SPS + one PPS, 4-byte NAL
    * lengths.
    */
  def avcC(sps: Array[Byte], pps: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // configurationVersion
    out.write(sps(1)); out.write(sps(2)); out.write(sps(3)) // profile/compat/level
    out.write(0xFF) // reserved + lengthSizeMinusOne = 3
    out.write(0xE1) // reserved + 1 SPS
    out.write(sps.length >> 8); out.write(sps.length & 0xFF)
    out.write(sps, 0, sps.length)
    out.write(1) // 1 PPS
    out.write(pps.length >> 8); out.write(pps.length & 0xFF)
    out.write(pps, 0, pps.length)
    out.toByteArray
  }

  /** One AVCC sample (4-byte length-prefixed NALs). */
  def avccSample(nals: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (n <- nals) {
      out.write(n.length >> 24); out.write((n.length >> 16) & 0xFF)
      out.write((n.length >> 8) & 0xFF); out.write(n.length & 0xFF)
      out.write(n, 0, n.length)
    }
    out.toByteArray
  }

  /** Gray flat planes helper for fixtures: (y, cb, cr) all-`luma`,
    * neutral chroma.
    */
  def flatPlanes(widthMbs: Int, heightMbs: Int, luma: Int): (Array[Int], Array[Int], Array[Int]) = {
    val w = widthMbs * 16
    val h = heightMbs * 16
    (Array.fill(w * h)(luma), Array.fill(w / 2 * h / 2)(128), Array.fill(w / 2 * h / 2)(128))
  }
}

package graft.pipeline

import H264._

/** CABAC entropy layer for INTRA (I-slice) pictures — the Main/High-
  * profile keyframe arm the CAVLC decoder ([[H264]]) cannot read.
  * Covers the same macroblock surface as the CAVLC arm (I_4x4,
  * I_16x16, I_PCM, 4:2:0 chroma, per-slice QP deltas, multi-slice);
  * CABAC-coded P/B slices and the 8x8 transform remain the documented
  * ceiling (CAVLC P slices decode through [[H264]]'s inter path).
  *
  * VALIDATION BOUNDARY (same contract as the CAVLC tables, see the
  * [[H264]] module scaladoc): no external H.264 decoder or conformance
  * stream exists in this environment. What IS verified here:
  *   - the arithmetic ENGINE is checked structurally ([[H264CabacSpec]]:
  *     rangeTabLPS monotone in both axes with the spec's endpoint
  *     values, state transitions total and terminating, bypass/
  *     terminate arms exercised) and by exhaustive encode↔decode
  *     roundtrips over random bin sequences;
  *   - the SYNTAX layer roundtrips whole frames bit-exactly against
  *     [[H264Encoder]]'s CABAC mode across MB modes, QPs and slices.
  * The context-initialization constants (Table 9-12 sqq.) are
  * transcribed from the spec; a transcription slip cannot be caught by
  * the shared-constant roundtrip, so decoding of WILD CABAC streams is
  * experimental — fixture decode is exact, wild streams decode through
  * the same fail-loud paths (corrupt data → None, never garbage).
  *
  * Reference anchor: the reference repo has no video path at all —
  * this extends the multimodal pillar (SURVEY §2 pipeline ops), not
  * reference parity.
  */
object H264Cabac {

  // ------------------------------------------------------------ engine

  /** rangeTabLPS (spec Table 9-44): LPS sub-range by (pStateIdx,
    * quantized range). Structurally validated: strictly decreasing in
    * pStateIdx per column, nondecreasing across each row, endpoints
    * {128,176,208,240} / {2,2,2,2}.
    */
  private[pipeline] val RangeTabLps: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  /** transIdxLPS (Table 9-45); MPS transition is min(p+1, 62). */
  private[pipeline] val TransIdxLps: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63)

  /** Context count actually used by the intra syntax (0..275). */
  private[pipeline] val NumCtx = 276

  /** Context initialization (m, n) pairs, I-slice column (Table 9-12
    * through 9-23, ctxIdx 0..275). Entries outside the intra-decode
    * ranges (11..59, P/B-only) are never read and init to (0, 64)
    * (pState 0, an even prior) as placeholders.
    */
  private[pipeline] val InitI: Array[(Int, Int)] = {
    val t = Array.fill(NumCtx)((0, 64))
    def put(from: Int, vals: (Int, Int)*): Unit =
      vals.zipWithIndex.foreach { case (v, i) => t(from + i) = v }
    // 0..10: mb_type (SI/I)
    put(0, (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
      (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51))
    // 60..63: mb_qp_delta
    put(60, (0, 41), (0, 63), (0, 63), (0, 63))
    // 64..67: intra_chroma_pred_mode
    put(64, (-9, 83), (4, 86), (0, 97), (-7, 72))
    // 68..69: prev_intra4x4_pred_mode_flag / rem_intra4x4_pred_mode
    put(68, (13, 41), (3, 62))
    // 70..72: mb_field_decoding_flag (unused here, spec values kept)
    put(70, (0, 45), (-4, 78), (-3, 96))
    // 73..76: coded_block_pattern luma; 77..84 chroma
    put(73, (-27, 126), (-28, 98), (-25, 101), (-23, 67))
    put(77, (-28, 82), (-20, 94), (-16, 83), (-22, 110),
      (-21, 91), (-18, 102), (-13, 93), (-29, 127))
    // 85..104: coded_block_flag (cats 0..4, 4 ctxs each)
    put(85, (-7, 92), (-5, 89), (-7, 96), (-13, 108),
      (-3, 46), (-1, 65), (-1, 57), (-9, 93),
      (-3, 74), (-9, 92), (-8, 87), (-23, 126),
      (5, 54), (6, 60), (6, 59), (6, 69),
      (-1, 48), (0, 68), (-4, 69), (-8, 88))
    // 105..165: significant_coeff_flag (frame, cats 0..4)
    put(105,
      (-2, 85), (-6, 78), (-1, 75), (-7, 77), (2, 54), (5, 50),
      (-3, 68), (1, 50), (6, 42), (-4, 81), (1, 63), (-4, 70),
      (0, 67), (2, 57), (-2, 76), (11, 35), (4, 64), (1, 61),
      (11, 35), (18, 25), (12, 24), (13, 29), (13, 36), (-10, 93),
      (-7, 73), (-2, 73), (13, 46), (9, 49), (-7, 100), (9, 53),
      (2, 53), (5, 53), (-2, 61), (0, 56), (0, 56), (-13, 63),
      (-5, 60), (-1, 62), (4, 57), (-6, 69), (4, 57), (14, 39),
      (4, 51), (13, 68), (3, 64), (1, 61), (9, 63), (7, 50),
      (16, 39), (5, 44), (4, 52), (11, 48), (-5, 60), (-1, 59),
      (0, 59), (22, 33), (5, 44), (14, 43), (-1, 78), (0, 60),
      (9, 69))
    // 166..226: last_significant_coeff_flag (frame, cats 0..4)
    put(166,
      (11, 28), (2, 40), (3, 44), (0, 49), (0, 46), (2, 44),
      (2, 51), (0, 47), (4, 39), (2, 62), (6, 46), (0, 54),
      (3, 54), (2, 58), (4, 63), (6, 51), (6, 57), (7, 53),
      (6, 52), (6, 55), (11, 45), (14, 36), (8, 53), (-1, 82),
      (7, 55), (-3, 78), (15, 46), (22, 31), (-1, 84), (25, 7),
      (30, -7), (28, 3), (28, 4), (32, 0), (34, -1), (30, 6),
      (30, 6), (32, 9), (31, 19), (26, 27), (26, 30), (37, 20),
      (28, 34), (17, 70), (1, 67), (5, 59), (9, 67), (16, 30),
      (18, 32), (18, 35), (22, 29), (24, 31), (23, 38), (18, 43),
      (20, 41), (11, 63), (9, 59), (9, 64), (-1, 94), (-2, 89),
      (-9, 108))
    // 227..275: coeff_abs_level_minus1 (cats 0..4, 10 ctxs each — the
    // last cat uses 9; ctx 275 closes the block)
    put(227,
      (-6, 76), (-2, 44), (0, 45), (0, 52), (-3, 64), (-2, 59),
      (-4, 70), (-4, 75), (-8, 82), (-17, 102), (-9, 77), (3, 24),
      (0, 42), (0, 48), (0, 55), (-6, 59), (-7, 71), (-12, 83),
      (-11, 87), (-30, 119), (1, 58), (-3, 29), (-1, 36), (1, 38),
      (2, 43), (-6, 55), (0, 58), (0, 64), (-3, 74), (-10, 90),
      (0, 70), (-4, 29), (5, 31), (7, 42), (1, 59), (-2, 58),
      (-3, 72), (-3, 81), (-11, 97), (0, 58), (8, 5), (10, 14),
      (14, 18), (13, 27), (2, 40), (0, 58), (-3, 70), (-6, 79),
      (-8, 85))
    t
  }

  /** Per-slice context state: pStateIdx + valMPS per ctxIdx,
    * initialized from [[InitI]] at the slice QP (spec 9.3.1.1).
    */
  private[pipeline] final class Ctx(sliceQp: Int) {
    val pState = new Array[Int](NumCtx)
    val valMps = new Array[Int](NumCtx)
    private def clip3(a: Int, b: Int, v: Int) = math.max(a, math.min(b, v))
    locally {
      var i = 0
      while (i < NumCtx) {
        val (m, n) = InitI(i)
        val pre = clip3(1, 126, ((m * clip3(0, 51, sliceQp)) >> 4) + n)
        if (pre <= 63) { pState(i) = 63 - pre; valMps(i) = 0 }
        else { pState(i) = pre - 64; valMps(i) = 1 }
        i += 1
      }
    }
  }

  /** Arithmetic decoder (spec 9.3.3.2) over an RBSP starting at a
    * byte-aligned bit position. Throws on byte-array exhaustion — the
    * caller's corrupt-data contract turns that into None.
    */
  private[pipeline] final class Decoder(d: Array[Byte], startByte: Int, ctx: Ctx) {
    private var pos = startByte
    private var bits = 0 // bits consumed within d(pos)
    private var codIRange = 510
    private var codIOffset = 0
    for (_ <- 0 until 9) codIOffset = (codIOffset << 1) | nextBit()

    private def nextBit(): Int = {
      // reading past the RBSP is allowed by the spec's decoding
      // process (the encoder's flush relies on it) — feed zeros
      if (pos >= d.length) return 0
      val b = (d(pos) >> (7 - bits)) & 1
      bits += 1
      if (bits == 8) { bits = 0; pos += 1 }
      b
    }

    def decision(ctxIdx: Int): Int = {
      val p = ctx.pState(ctxIdx)
      val lps = RangeTabLps(p)((codIRange >> 6) & 3)
      codIRange -= lps
      val bin =
        if (codIOffset >= codIRange) {
          val out = 1 - ctx.valMps(ctxIdx)
          codIOffset -= codIRange
          codIRange = lps
          if (p == 0) ctx.valMps(ctxIdx) = 1 - ctx.valMps(ctxIdx)
          ctx.pState(ctxIdx) = TransIdxLps(p)
          out
        } else {
          ctx.pState(ctxIdx) = if (p < 62) p + 1 else p
          ctx.valMps(ctxIdx)
        }
      while (codIRange < 256) {
        codIRange <<= 1
        codIOffset = (codIOffset << 1) | nextBit()
      }
      bin
    }

    def bypass(): Int = {
      codIOffset = (codIOffset << 1) | nextBit()
      if (codIOffset >= codIRange) { codIOffset -= codIRange; 1 } else 0
    }

    def terminate(): Int =
      if ({ codIRange -= 2; codIOffset >= codIRange }) 1
      else {
        while (codIRange < 256) {
          codIRange <<= 1
          codIOffset = (codIOffset << 1) | nextBit()
        }
        0
      }

    /** Byte position where I_PCM samples start after a terminate
      * bin = 1: the next byte boundary of the CONSUMED bit count,
      * which matches the encoder's flushed+aligned position (see
      * [[Encoder.terminate]]).
      */
    def pcmBytePos: Int = (pos * 8 + bits + 7) / 8

    /** Re-seat the decoder at a byte boundary after I_PCM samples
      * (spec 9.3.1.2: the engine re-initializes, contexts persist).
      */
    def pcmRealign(newBytePos: Int): Unit = {
      pos = newBytePos
      bits = 0
      codIRange = 510
      codIOffset = 0
      for (_ <- 0 until 9) codIOffset = (codIOffset << 1) | nextBit()
    }
  }

  /** Arithmetic encoder (spec 9.3.4) writing into a [[BitWriter]]. */
  private[pipeline] final class Encoder(w: BitWriter, ctx: Ctx) {
    private var codILow = 0
    private var codIRange = 510
    private var outstanding = 0
    private var firstBit = true

    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false else w.put(b, 1)
      while (outstanding > 0) { w.put(1 - b, 1); outstanding -= 1 }
    }

    private def renorm(): Unit =
      while (codIRange < 256) {
        if (codILow >= 512) { putBit(1); codILow -= 512 }
        else if (codILow < 256) putBit(0)
        else { outstanding += 1; codILow -= 256 }
        codIRange <<= 1
        codILow <<= 1
      }

    def decision(ctxIdx: Int, bin: Int): Unit = {
      val p = ctx.pState(ctxIdx)
      val lps = RangeTabLps(p)((codIRange >> 6) & 3)
      codIRange -= lps
      if (bin != ctx.valMps(ctxIdx)) {
        codILow += codIRange
        codIRange = lps
        if (p == 0) ctx.valMps(ctxIdx) = 1 - ctx.valMps(ctxIdx)
        ctx.pState(ctxIdx) = TransIdxLps(p)
      } else ctx.pState(ctxIdx) = if (p < 62) p + 1 else p
      renorm()
    }

    def bypass(bin: Int): Unit = {
      codILow <<= 1
      if (bin == 1) codILow += codIRange
      if (codILow >= 1024) { putBit(1); codILow -= 1024 }
      else if (codILow < 512) putBit(0)
      else { outstanding += 1; codILow -= 512 }
    }

    /** Terminate bin (9.3.4.5): bin 1 flushes the engine — used for
      * end_of_slice_flag = 1 and the I_PCM escape. With the
      * first-bit-swallow convention, the encoder's written bit count
      * at flush end EQUALS the decoder's consumed bit count at the
      * matching terminate — which is what makes the spec's
      * byte-aligned PCM sample placement line up on both sides.
      */
    def terminate(bin: Int): Unit = {
      codIRange -= 2
      if (bin == 1) { codILow += codIRange; flush() }
      else renorm()
    }

    /** EncodeFlush (9.3.4.6): drains codILow; the final written 1 bit
      * doubles as the rbsp stop bit.
      */
    private def flush(): Unit = {
      codIRange = 2
      renorm()
      putBit((codILow >> 9) & 1)
      w.put(((codILow >> 7) & 3) | 1, 2)
    }

    /** Restart the engine after I_PCM samples (contexts persist). */
    def pcmRestart(): Unit = {
      codILow = 0
      codIRange = 510
      outstanding = 0
      firstBit = true
    }
  }

  // ------------------------------------------------------ syntax layer

  /** Per-slice neighbor-context state for ctxIdxInc derivations
    * (9.3.3.1.1.x). Allocated fresh per slice: MBs of earlier slices
    * read as undecoded here, which IS the spec's availability rule
    * (§6.4.8 — cross-slice neighbors are unavailable for contexts).
    */
  private[pipeline] final class SliceCtx(st: PicState) {
    val wMbs = st.wMbs
    val nMbs = st.wMbs * st.hMbs
    val wB = st.wMbs * 4
    val wC = st.wMbs * 2
    val typeClass = Array.fill(nMbs)(-1) // 0=I_4x4, 1=I_16x16, 2=I_PCM
    val cbpLumaOf = new Array[Int](nMbs)
    val cbpChromaOf = new Array[Int](nMbs)
    val chromaModeOf = new Array[Int](nMbs)
    val dcCbfY = new Array[Int](nMbs)
    val dcCbfCb = new Array[Int](nMbs)
    val dcCbfCr = new Array[Int](nMbs)
    val cbfL = new Array[Int](wB * st.hMbs * 4) // luma 4x4 / I16 AC blocks
    val cbfCb = new Array[Int](wC * st.hMbs * 2)
    val cbfCr = new Array[Int](wC * st.hMbs * 2)
    var prevQpDeltaNonzero = false

    def avail(mb: Int): Boolean = mb >= 0 && mb < nMbs && typeClass(mb) >= 0

    /** mb_type bin0 (9.3.3.1.1.3): neighbor coded and not I_NxN. */
    def mbTypeInc(mbX: Int, mbY: Int): Int = {
      val mb = mbY * wMbs + mbX
      def cond(n: Int, ok: Boolean) =
        if (ok && avail(n) && typeClass(n) != 0) 1 else 0
      cond(mb - 1, mbX > 0) + cond(mb - wMbs, mbY > 0)
    }

    /** intra_chroma_pred_mode bin0 (9.3.3.1.1.8). */
    def chromaModeInc(mbX: Int, mbY: Int): Int = {
      val mb = mbY * wMbs + mbX
      def cond(n: Int, ok: Boolean) =
        if (ok && avail(n) && typeClass(n) != 2 && chromaModeOf(n) != 0) 1 else 0
      cond(mb - 1, mbX > 0) + cond(mb - wMbs, mbY > 0)
    }

    /** coded_block_pattern luma bin `b` (9.3.3.1.1.4): neighbor 8x8
      * block NOT coded → 1; unavailable or I_PCM → 0. `partial` holds
      * the luma bits decoded so far this MB.
      */
    def cbpLumaInc(b: Int, partial: Int, mbX: Int, mbY: Int): Int = {
      val mb = mbY * wMbs + mbX
      def bitOf(n: Int, blk: Int, ok: Boolean): Int = {
        if (!ok) return 0 // unavailable → "coded" → condTermFlag 0
        if (!avail(n)) return 0
        if (typeClass(n) == 2) return 0 // I_PCM → coded
        if ((cbpLumaOf(n) & (1 << blk)) != 0) 0 else 1
      }
      val condA =
        if (b % 2 == 1) (if ((partial & (1 << (b - 1))) != 0) 0 else 1)
        else bitOf(mb - 1, b + 1, mbX > 0)
      val condB =
        if (b / 2 == 1) (if ((partial & (1 << (b - 2))) != 0) 0 else 1)
        else bitOf(mb - wMbs, b + 2, mbY > 0)
      condA + 2 * condB
    }

    /** coded_block_pattern chroma bins (9.3.3.1.1.4). */
    def cbpChromaInc(binIdx: Int, mbX: Int, mbY: Int): Int = {
      val mb = mbY * wMbs + mbX
      def cond(n: Int, ok: Boolean, two: Boolean) =
        if (ok && avail(n) &&
          (typeClass(n) == 2 || (if (two) cbpChromaOf(n) == 2 else cbpChromaOf(n) != 0)))
          1
        else 0
      if (binIdx == 0)
        cond(mb - 1, mbX > 0, two = false) + 2 * cond(mb - wMbs, mbY > 0, two = false)
      else
        4 + cond(mb - 1, mbX > 0, two = true) + 2 * cond(mb - wMbs, mbY > 0, two = true)
    }

    /** mb_qp_delta bin ctxIdx (9.3.3.1.1.5). */
    def qpDeltaCtx(binIdx: Int): Int =
      if (binIdx == 0) 60 + (if (prevQpDeltaNonzero) 1 else 0)
      else if (binIdx == 1) 62
      else 63

    /** coded_block_flag ctxIdx = 85 + cat*4 + inc (9.3.3.1.1.9). */
    def cbfCtxLumaDc(mbX: Int, mbY: Int): Int = {
      val mb = mbY * wMbs + mbX
      def term(n: Int, ok: Boolean) =
        if (!ok || !avail(n)) 1 // unavailable + intra current → 1
        else if (typeClass(n) == 2) 1
        else if (typeClass(n) != 1) 0 // neighbor has no luma DC block
        else dcCbfY(n)
      85 + term(mb - 1, mbX > 0) + 2 * term(mb - wMbs, mbY > 0)
    }

    /** cat 1 (I16 AC) / cat 2 (I4x4) luma blocks share the 4x4 grid. */
    def cbfCtxLuma(cat: Int, bx: Int, by: Int): Int = {
      val curMb = (by / 4) * wMbs + (bx / 4)
      def term(x: Int, y: Int) =
        if (x < 0 || y < 0 || x >= wB) 1
        else {
          val n = (y / 4) * wMbs + (x / 4)
          if (n != curMb && !avail(n)) 1
          else if (n != curMb && typeClass(n) == 2) 1
          else cbfL(y * wB + x)
        }
      85 + cat * 4 + term(bx - 1, by) + 2 * term(bx, by - 1)
    }

    def cbfCtxChromaDc(c: Int, mbX: Int, mbY: Int): Int = {
      val mb = mbY * wMbs + mbX
      val dc = if (c == 0) dcCbfCb else dcCbfCr
      def term(n: Int, ok: Boolean) =
        if (!ok || !avail(n)) 1
        else if (typeClass(n) == 2) 1
        else dc(n)
      85 + 12 + term(mb - 1, mbX > 0) + 2 * term(mb - wMbs, mbY > 0)
    }

    def cbfCtxChromaAc(c: Int, cx: Int, cy: Int): Int = {
      val grid = if (c == 0) cbfCb else cbfCr
      val curMb = (cy / 2) * wMbs + (cx / 2)
      def term(x: Int, y: Int) =
        if (x < 0 || y < 0 || x >= wC) 1
        else {
          val n = (y / 2) * wMbs + (x / 2)
          if (n != curMb && !avail(n)) 1
          else if (n != curMb && typeClass(n) == 2) 1
          else grid(y * wC + x)
        }
      85 + 16 + term(cx - 1, cy) + 2 * term(cx, cy - 1)
    }
  }

  /** Significance-map / level context offsets per block category
    * (cats 0..4: luma DC, luma AC, luma 4x4, chroma DC, chroma AC).
    */
  private val SigCatOff = Array(0, 15, 29, 44, 47)
  private val AbsCatOff = Array(0, 10, 20, 30, 39)

  /** Decode one residual block (coded_block_flag already 1): the
    * significance map then levels in reverse scan order (9.3.2.3 UEG0
    * binarization, uCoff 14). Returns coefficients in scan order.
    */
  private def decodeResidualCabac(dec: Decoder, cat: Int,
                                  maxNumCoeff: Int): Array[Int] = {
    val coeffs = new Array[Int](maxNumCoeff)
    val sig = new Array[Boolean](maxNumCoeff)
    var i = 0
    var lastFound = false
    while (i < maxNumCoeff - 1 && !lastFound) {
      if (dec.decision(105 + SigCatOff(cat) + i) == 1) {
        sig(i) = true
        if (dec.decision(166 + SigCatOff(cat) + i) == 1) lastFound = true
      }
      i += 1
    }
    if (!lastFound) sig(maxNumCoeff - 1) = true
    var numGt1 = 0
    var numEq1 = 0
    var j = maxNumCoeff - 1
    while (j >= 0) {
      if (sig(j)) {
        val ctx0 = 227 + AbsCatOff(cat) +
          (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
        var absM1 = 0
        if (dec.decision(ctx0) == 1) {
          val ctxN = 227 + AbsCatOff(cat) + 5 + math.min(4, numGt1)
          var k = 1
          while (k < 14 && dec.decision(ctxN) == 1) k += 1
          absM1 = k
          if (k == 14) {
            // UEG0 suffix (bypass exp-golomb order 0)
            var k2 = 0
            while (dec.bypass() == 1) {
              absM1 += 1 << k2
              k2 += 1
              if (k2 > 30) throw new IllegalStateException("EG0 overflow")
            }
            var add = 0
            for (_ <- 0 until k2) add = (add << 1) | dec.bypass()
            absM1 += add
          }
        }
        val abs = absM1 + 1
        if (abs > 1) numGt1 += 1 else numEq1 += 1
        coeffs(j) = if (dec.bypass() == 1) -abs else abs
      }
      j -= 1
    }
    coeffs
  }

  /** Encode-side mirror of [[decodeResidualCabac]]. */
  private def encodeResidualCabac(enc: Encoder, cat: Int,
                                  coeffs: Array[Int]): Unit = {
    val n = coeffs.length
    var last = n - 1
    while (coeffs(last) == 0) last -= 1 // cbf==1 guarantees one nonzero
    var i = 0
    while (i < n - 1 && i <= last) {
      val s = if (coeffs(i) != 0) 1 else 0
      enc.decision(105 + SigCatOff(cat) + i, s)
      if (s == 1) enc.decision(166 + SigCatOff(cat) + i, if (i == last) 1 else 0)
      i += 1
    }
    var numGt1 = 0
    var numEq1 = 0
    var j = n - 1
    while (j >= 0) {
      val v = coeffs(j)
      if (v != 0) {
        val abs = math.abs(v)
        val absM1 = abs - 1
        val ctx0 = 227 + AbsCatOff(cat) +
          (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
        if (absM1 == 0) enc.decision(ctx0, 0)
        else {
          enc.decision(ctx0, 1)
          val ctxN = 227 + AbsCatOff(cat) + 5 + math.min(4, numGt1)
          val pref = math.min(absM1, 14)
          for (_ <- 1 until pref) enc.decision(ctxN, 1)
          if (absM1 < 14) enc.decision(ctxN, 0)
          else {
            // UEG0 suffix
            var rem = absM1 - 14
            var k2 = 0
            while (rem >= (1 << k2)) { enc.bypass(1); rem -= 1 << k2; k2 += 1 }
            enc.bypass(0)
            var b = k2 - 1
            while (b >= 0) { enc.bypass((rem >> b) & 1); b -= 1 }
          }
        }
        if (abs > 1) numGt1 += 1 else numEq1 += 1
        enc.bypass(if (v < 0) 1 else 0)
      }
      j -= 1
    }
  }

  /** mb_qp_delta: mapped unary, ctxs via [[SliceCtx.qpDeltaCtx]]. */
  private def decodeQpDelta(dec: Decoder, sc: SliceCtx): Int = {
    var u = 0
    while (dec.decision(sc.qpDeltaCtx(u)) == 1) {
      u += 1
      if (u > 80) throw new IllegalStateException("qp_delta overflow")
    }
    sc.prevQpDeltaNonzero = u != 0
    if (u % 2 == 1) (u + 1) / 2 else -(u / 2)
  }

  private def encodeQpDelta(enc: Encoder, sc: SliceCtx, d: Int): Unit = {
    val u = if (d > 0) 2 * d - 1 else -2 * d
    for (i <- 0 until u) enc.decision(sc.qpDeltaCtx(i), 1)
    enc.decision(sc.qpDeltaCtx(u), 0)
    sc.prevQpDeltaNonzero = u != 0
  }

  // -------------------------------------------------------- decoding

  /** Decode one CABAC I slice's macroblocks (the [[H264]] CAVLC arm's
    * counterpart; called from decodeNalsState after the byte-aligned
    * slice-data start). Returns false on unsupported/corrupt data.
    */
  private[pipeline] def decodeSliceData(rbsp: Array[Byte], startByte: Int,
                                        st: PicState, pps: Pps,
                                        firstMb: Int, sliceQp: Int): Boolean = {
    val ctx = new Ctx(sliceQp)
    val dec = new Decoder(rbsp, startByte, ctx)
    val sc = new SliceCtx(st)
    var qp = sliceQp
    var mb = firstMb
    val nMbs = st.wMbs * st.hMbs
    var done = false
    while (!done) {
      if (mb >= nMbs) return false // no end_of_slice before picture end
      val mbX = mb % st.wMbs
      val mbY = mb / st.wMbs
      val px = mbX * 16
      val py = mbY * 16
      val wB = st.wMbs * 4

      if (dec.decision(3 + sc.mbTypeInc(mbX, mbY)) == 0) {
        // ---- I_4x4
        sc.typeClass(mb) = 0
        val modes = new Array[Int](16)
        for (b <- 0 until 16) {
          val (lx, ly) = Blk4x4Pos(b)
          val bx = mbX * 4 + lx
          val by = mbY * 4 + ly
          def neighborMode(x: Int, y: Int): Int =
            if (x < 0 || y < 0 || x >= wB) -1
            else {
              val nMb = (y / 4) * st.wMbs + (x / 4)
              if (nMb != mb && !st.mbUsable(nMb)) -1 else st.i4Modes(y * wB + x)
            }
          val mA = neighborMode(bx - 1, by)
          val mB = neighborMode(bx, by - 1)
          val pred = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
          val mode =
            if (dec.decision(68) == 1) pred
            else {
              // FL, LSB first (9.3.2.5)
              val rem = dec.decision(69) | (dec.decision(69) << 1) |
                (dec.decision(69) << 2)
              if (rem < pred) rem else rem + 1
            }
          modes(b) = mode
          st.i4Modes(by * wB + bx) = mode
        }
        val chromaMode = decodeChromaMode(dec, sc, mbX, mbY)
        if (chromaMode > 3) return false
        var cbpLuma = 0
        for (b <- 0 until 4)
          cbpLuma |= dec.decision(73 + sc.cbpLumaInc(b, cbpLuma, mbX, mbY)) << b
        val cbpChroma =
          if (dec.decision(77 + sc.cbpChromaInc(0, mbX, mbY)) == 0) 0
          else 1 + dec.decision(77 + sc.cbpChromaInc(1, mbX, mbY))
        sc.cbpLumaOf(mb) = cbpLuma
        sc.cbpChromaOf(mb) = cbpChroma
        sc.chromaModeOf(mb) = chromaMode
        if (cbpLuma != 0 || cbpChroma != 0)
          qp = ((qp + decodeQpDelta(dec, sc) + 52) % 52 + 52) % 52
        for (b <- 0 until 16) {
          val (lx, ly) = Blk4x4Pos(b)
          val bx = mbX * 4 + lx
          val by = mbY * 4 + ly
          val pred = predict4x4(st, modes(b), px + lx * 4, py + ly * 4, mb, b)
          val scan =
            if ((cbpLuma & (1 << (b / 4))) != 0 &&
                dec.decision(sc.cbfCtxLuma(2, bx, by)) == 1) {
              sc.cbfL(by * wB + bx) = 1
              decodeResidualCabac(dec, 2, 16)
            } else { sc.cbfL(by * wB + bx) = 0; new Array[Int](16) }
          val nz = scan.count(_ != 0)
          st.lumaNz(by * st.wMbs * 4 + bx) = nz
          val raster = new Array[Int](16)
          for (i <- 0 until 16) raster(Zigzag4x4(i)) = scan(i)
          val res =
            if (nz == 0) new Array[Int](16)
            else inverseTransform4x4(dequant4x4(raster, qp, skipDc = false))
          for (y <- 0 until 4; x <- 0 until 4)
            st.y((py + ly * 4 + y) * st.w + px + lx * 4 + x) =
              clip255(pred(y * 4 + x) + res(y * 4 + x))
        }
        decodeChromaCabac(dec, sc, st, pps, mb, mbX, mbY, chromaMode, cbpChroma, qp)
        finishMb(st, sc, mb, qp)
      } else if (dec.terminate() == 1) {
        // ---- I_PCM: flush, byte-aligned samples, engine restart
        sc.typeClass(mb) = 2
        sc.cbpLumaOf(mb) = 15
        sc.cbpChromaOf(mb) = 2
        var p = dec.pcmBytePos
        if (p + 384 > rbsp.length) return false
        for (y <- 0 until 16; x <- 0 until 16) {
          st.y((py + y) * st.w + px + x) = rbsp(p) & 0xFF; p += 1
        }
        val cw = st.w / 2
        for (y <- 0 until 8; x <- 0 until 8) {
          st.cb((py / 2 + y) * cw + px / 2 + x) = rbsp(p) & 0xFF; p += 1
        }
        for (y <- 0 until 8; x <- 0 until 8) {
          st.cr((py / 2 + y) * cw + px / 2 + x) = rbsp(p) & 0xFF; p += 1
        }
        for (b <- 0 until 16) {
          val (lx, ly) = Blk4x4Pos(b)
          st.lumaNz((mbY * 4 + ly) * st.wMbs * 4 + mbX * 4 + lx) = 16
          sc.cbfL((mbY * 4 + ly) * wB + mbX * 4 + lx) = 1
          st.i4Modes((mbY * 4 + ly) * wB + mbX * 4 + lx) = 2
        }
        for (b <- 0 until 4) {
          val cIdx = (mbY * 2 + b / 2) * st.wMbs * 2 + mbX * 2 + b % 2
          st.cbNz(cIdx) = 16
          st.crNz(cIdx) = 16
          sc.cbfCb(cIdx) = 1
          sc.cbfCr(cIdx) = 1
        }
        dec.pcmRealign(p)
        finishMb(st, sc, mb, 0)
      } else {
        // ---- I_16x16 (mb_type bins after the non-PCM terminate)
        sc.typeClass(mb) = 1
        val cbpLuma = if (dec.decision(6) == 1) 15 else 0
        val cbpChroma =
          if (dec.decision(7) == 0) 0 else 1 + dec.decision(8)
        val predMode = (dec.decision(9) << 1) | dec.decision(10)
        val chromaMode = decodeChromaMode(dec, sc, mbX, mbY)
        if (chromaMode > 3) return false
        sc.cbpLumaOf(mb) = cbpLuma
        sc.cbpChromaOf(mb) = cbpChroma
        sc.chromaModeOf(mb) = chromaMode
        qp = ((qp + decodeQpDelta(dec, sc) + 52) % 52 + 52) % 52
        for (b <- 0 until 16) {
          val (lx, ly) = Blk4x4Pos(b)
          st.i4Modes((mbY * 4 + ly) * wB + mbX * 4 + lx) = 2
        }
        val pred = predict16x16(st, predMode, px, py, mb)
        val dcCbf = dec.decision(sc.cbfCtxLumaDc(mbX, mbY))
        sc.dcCbfY(mb) = dcCbf
        val dcScan =
          if (dcCbf == 1) decodeResidualCabac(dec, 0, 16) else new Array[Int](16)
        val dcRaster = new Array[Int](16)
        for (i <- 0 until 16) dcRaster(Zigzag4x4(i)) = dcScan(i)
        val dc = dequantLumaDc(dcRaster, qp)
        for (b <- 0 until 16) {
          val (lx, ly) = Blk4x4Pos(b)
          val bx = mbX * 4 + lx
          val by = mbY * 4 + ly
          val acScan =
            if (cbpLuma != 0 && dec.decision(sc.cbfCtxLuma(1, bx, by)) == 1) {
              sc.cbfL(by * wB + bx) = 1
              decodeResidualCabac(dec, 1, 15)
            } else { sc.cbfL(by * wB + bx) = 0; new Array[Int](15) }
          val nz = acScan.count(_ != 0)
          st.lumaNz(by * st.wMbs * 4 + bx) = nz
          val raster = new Array[Int](16)
          for (i <- 1 until 16) raster(Zigzag4x4(i)) = acScan(i - 1)
          val d = dequant4x4(raster, qp, skipDc = true)
          d(0) = dc(ly * 4 + lx)
          val res = inverseTransform4x4(d)
          for (y <- 0 until 4; x <- 0 until 4)
            st.y((py + ly * 4 + y) * st.w + px + lx * 4 + x) =
              clip255(pred((ly * 4 + y) * 16 + lx * 4 + x) + res(y * 4 + x))
        }
        decodeChromaCabac(dec, sc, st, pps, mb, mbX, mbY, chromaMode, cbpChroma, qp)
        finishMb(st, sc, mb, qp)
      }
      mb += 1
      if (dec.terminate() == 1) done = true
    }
    true
  }

  private def finishMb(st: PicState, sc: SliceCtx, mb: Int, qp: Int): Unit = {
    st.qpOfMb(mb) = qp
    st.mbDecoded(mb) = true
    st.sliceOfMb(mb) = st.currentSlice
  }

  private def decodeChromaMode(dec: Decoder, sc: SliceCtx,
                               mbX: Int, mbY: Int): Int = {
    // TU cMax 3: bin0 ctx 64+inc, bins 1..2 ctx 67
    if (dec.decision(64 + sc.chromaModeInc(mbX, mbY)) == 0) 0
    else if (dec.decision(67) == 0) 1
    else if (dec.decision(67) == 0) 2
    else 3
  }

  private def encodeChromaMode(enc: Encoder, sc: SliceCtx,
                               mbX: Int, mbY: Int, mode: Int): Unit = {
    enc.decision(64 + sc.chromaModeInc(mbX, mbY), if (mode == 0) 0 else 1)
    if (mode > 0) enc.decision(67, if (mode == 1) 0 else 1)
    if (mode > 1) enc.decision(67, if (mode == 2) 0 else 1)
  }

  /** CABAC counterpart of the CAVLC arm's decodeChroma: DC cbf +
    * coeffs per component, then ACs when cbpChroma == 2;
    * reconstruction identical.
    */
  private def decodeChromaCabac(dec: Decoder, sc: SliceCtx, st: PicState,
                                pps: Pps, mb: Int, mbX: Int, mbY: Int,
                                chromaMode: Int, cbpChroma: Int, qp: Int): Unit = {
    // per-plane QP: Cb uses chroma_qp_index_offset, Cr the High-profile
    // second offset (equal unless the PPS tail set them apart)
    def qpcOf(c: Int): Int =
      chromaQp(qp, if (c == 0) pps.chromaQpOff else pps.chromaQpOffCr)
    val cw = st.w / 2
    val px = mbX * 8
    val py = mbY * 8
    val dcs = Array.ofDim[Int](2, 4)
    if (cbpChroma != 0)
      for (c <- 0 until 2) {
        val cbf = dec.decision(sc.cbfCtxChromaDc(c, mbX, mbY))
        if (c == 0) sc.dcCbfCb(mb) = cbf else sc.dcCbfCr(mb) = cbf
        if (cbf == 1) dcs(c) = decodeResidualCabac(dec, 3, 4)
      }
    for (c <- 0 until 2) {
      val plane = if (c == 0) st.cb else st.cr
      val nzPlane = if (c == 0) st.cbNz else st.crNz
      val cbfGrid = if (c == 0) sc.cbfCb else sc.cbfCr
      val pred = predictChroma(st, plane, chromaMode, px, py, mb)
      val qpc = qpcOf(c)
      val dc = if (cbpChroma != 0) dequantChromaDc(dcs(c), qpc) else Array(0, 0, 0, 0)
      for (b <- 0 until 4) {
        val lx = b % 2
        val ly = b / 2
        val cx = mbX * 2 + lx
        val cy = mbY * 2 + ly
        val acScan =
          if (cbpChroma == 2 && dec.decision(sc.cbfCtxChromaAc(c, cx, cy)) == 1) {
            cbfGrid(cy * sc.wC + cx) = 1
            decodeResidualCabac(dec, 4, 15)
          } else { cbfGrid(cy * sc.wC + cx) = 0; new Array[Int](15) }
        val nz = acScan.count(_ != 0)
        nzPlane(cy * st.wMbs * 2 + cx) = nz
        val raster = new Array[Int](16)
        for (i <- 1 until 16) raster(Zigzag4x4(i)) = acScan(i - 1)
        val d = dequant4x4(raster, qpc, skipDc = true)
        d(0) = dc(b)
        val res =
          if (cbpChroma == 0) new Array[Int](16)
          else inverseTransform4x4(d)
        for (y <- 0 until 4; x <- 0 until 4)
          plane((py + ly * 4 + y) * cw + px + lx * 4 + x) =
            clip255(pred((ly * 4 + y) * 8 + lx * 4 + x) + res(y * 4 + x))
      }
    }
  }

  // -------------------------------------------------------- encoding

  /** Encode the MBs [firstMb, untilMb) of one CABAC I slice into `w`
    * (slice header already written and byte-aligned). Mirrors
    * [[H264Encoder]]'s compute exactly (same prediction, transforms
    * and decoder-identical reconstruction into `st`); only the entropy
    * layer differs. The final end_of_slice_flag = 1 flushes the engine
    * (its trailing 1 bit is the rbsp stop bit — the caller byte-aligns
    * with zeros).
    */
  private[pipeline] def encodeSliceMbs(w: BitWriter, st: PicState,
      y: Array[Int], cb: Array[Int], cr: Array[Int],
      firstMb: Int, untilMb: Int, qp: Int,
      mbMode: (Int, Int) => Int): Unit = {
    import H264Encoder.{quant, codeChroma, Mode4x4, ModePcm}
    val ctx = new Ctx(qp)
    val enc = new Encoder(w, ctx)
    val sc = new SliceCtx(st)
    val qbits = 15 + qp / 6
    val f2 = (1 << qbits) / 3
    val mf = QuantMf(qp % 6)
    val qpc = chromaQp(qp, 0)
    val qbitsC = 15 + qpc / 6
    val fC = (1 << qbitsC) / 3
    val mfC = QuantMf(qpc % 6)
    val wB = st.wMbs * 4

    for (mb <- firstMb until untilMb) {
      val mbX = mb % st.wMbs
      val mbY = mb / st.wMbs
      val px = mbX * 16
      val py = mbY * 16
      val mode = mbMode(mbX, mbY)

      if (mode == ModePcm) {
        enc.decision(3 + sc.mbTypeInc(mbX, mbY), 1)
        enc.terminate(1) // PCM escape: flushes the engine
        w.byteAlign()
        sc.typeClass(mb) = 2
        sc.cbpLumaOf(mb) = 15
        sc.cbpChromaOf(mb) = 2
        val cw = st.w / 2
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
          st.lumaNz((mbY * 4 + ly) * wB + mbX * 4 + lx) = 16
          sc.cbfL((mbY * 4 + ly) * wB + mbX * 4 + lx) = 1
          st.i4Modes((mbY * 4 + ly) * wB + mbX * 4 + lx) = 2
        }
        for (b <- 0 until 4) {
          val cIdx = (mbY * 2 + b / 2) * st.wMbs * 2 + mbX * 2 + b % 2
          st.cbNz(cIdx) = 16
          st.crNz(cIdx) = 16
          sc.cbfCb(cIdx) = 1
          sc.cbfCr(cIdx) = 1
        }
        st.qpOfMb(mb) = 0
        enc.pcmRestart()
      } else if (mode == Mode4x4) {
        // ---- I_4x4: identical compute to H264Encoder.encodeI4x4
        sc.typeClass(mb) = 0
        val qBlk = Array.ofDim[Int](16, 16)
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
              val nMb = (yy / 4) * st.wMbs + (x / 4)
              if (nMb != mb && !st.mbUsable(nMb)) -1 else st.i4Modes(yy * wB + x)
            }
          val mA = neighborMode(bx - 1, by)
          val mB = neighborMode(bx, by - 1)
          val predMode = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
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
          val m = desired match {
            case 0 | 3 | 7 => if (topOk) desired else 2
            case 1 | 8 => if (leftOk) desired else 2
            case 4 | 5 | 6 => if (topOk && leftOk && topLeftOk) desired else 2
            case _ => 2
          }
          modes(b) = m
          predModes(b) = predMode
          st.i4Modes(by * wB + bx) = m
          val pred = predict4x4(st, m, px + lx * 4, py + ly * 4, mb, b)
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

        enc.decision(3 + sc.mbTypeInc(mbX, mbY), 0) // I_4x4
        for (b <- 0 until 16) {
          if (modes(b) == predModes(b)) enc.decision(68, 1)
          else {
            enc.decision(68, 0)
            val rem = if (modes(b) < predModes(b)) modes(b) else modes(b) - 1
            enc.decision(69, rem & 1) // FL, LSB first
            enc.decision(69, (rem >> 1) & 1)
            enc.decision(69, (rem >> 2) & 1)
          }
        }
        encodeChromaMode(enc, sc, mbX, mbY, 0)
        var partial = 0
        for (b <- 0 until 4) {
          val bit = (cbpLuma >> b) & 1
          enc.decision(73 + sc.cbpLumaInc(b, partial, mbX, mbY), bit)
          partial |= bit << b
        }
        enc.decision(77 + sc.cbpChromaInc(0, mbX, mbY),
          if (chroma.cbpChroma == 0) 0 else 1)
        if (chroma.cbpChroma != 0)
          enc.decision(77 + sc.cbpChromaInc(1, mbX, mbY),
            if (chroma.cbpChroma == 2) 1 else 0)
        sc.cbpLumaOf(mb) = cbpLuma
        sc.cbpChromaOf(mb) = chroma.cbpChroma
        sc.chromaModeOf(mb) = 0
        if (cbpLuma != 0 || chroma.cbpChroma != 0) encodeQpDelta(enc, sc, 0)
        for (b <- 0 until 16) {
          val (lx, ly) = Blk4x4Pos(b)
          val bx = mbX * 4 + lx
          val by = mbY * 4 + ly
          if ((cbpLuma & (1 << (b / 4))) != 0) {
            val cbf = if (nzCount(b) > 0) 1 else 0
            enc.decision(sc.cbfCtxLuma(2, bx, by), cbf)
            sc.cbfL(by * wB + bx) = cbf
            if (cbf == 1) {
              val scan = new Array[Int](16)
              for (i <- 0 until 16) scan(i) = qBlk(b)(Zigzag4x4(i))
              encodeResidualCabac(enc, 2, scan)
            }
          } else sc.cbfL(by * wB + bx) = 0
          st.lumaNz(by * wB + bx) = nzCount(b)
        }
        encodeChromaCabac(enc, sc, st, mb, mbX, mbY, chroma)
        st.qpOfMb(mb) = qp
      } else {
        // ---- I_16x16 (DC prediction): compute as encodeI16x16
        sc.typeClass(mb) = 1
        for (b <- 0 until 16) {
          val (lx, ly) = Blk4x4Pos(b)
          st.i4Modes((mbY * 4 + ly) * wB + mbX * 4 + lx) = 2
        }
        val pred = predict16x16(st, 2, px, py, mb)
        val qAc = Array.ofDim[Int](16, 16)
        val dcW = new Array[Int](16)
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
        val hadDc = hadamard4x4(dcW).map(v => if (v >= 0) (v + 1) / 2 else -((-v + 1) / 2))
        val qDc = hadDc.map(v => quant(v, mf(0), 2 * f2, qbits + 1))
        val cbpLuma = if (anyAc) 15 else 0
        val chroma = codeChroma(st, cb, cr, mb, mbX, mbY, qpc, qbitsC, fC, mfC)

        enc.decision(3 + sc.mbTypeInc(mbX, mbY), 1)
        enc.terminate(0) // not I_PCM
        enc.decision(6, if (cbpLuma == 15) 1 else 0)
        enc.decision(7, if (chroma.cbpChroma == 0) 0 else 1)
        if (chroma.cbpChroma != 0)
          enc.decision(8, if (chroma.cbpChroma == 2) 1 else 0)
        enc.decision(9, 1) // predMode DC = 2 -> bins (1, 0)
        enc.decision(10, 0)
        encodeChromaMode(enc, sc, mbX, mbY, 0)
        sc.cbpLumaOf(mb) = cbpLuma
        sc.cbpChromaOf(mb) = chroma.cbpChroma
        sc.chromaModeOf(mb) = 0
        encodeQpDelta(enc, sc, 0)
        // luma DC
        val dcScan = new Array[Int](16)
        for (i <- 0 until 16) dcScan(i) = qDc(Zigzag4x4(i))
        val dcCbf = if (dcScan.exists(_ != 0)) 1 else 0
        enc.decision(sc.cbfCtxLumaDc(mbX, mbY), dcCbf)
        sc.dcCbfY(mb) = dcCbf
        if (dcCbf == 1) encodeResidualCabac(enc, 0, dcScan)
        // luma AC + reconstruction (decoder-identical)
        val dcDeq = dequantLumaDc(qDc, qp)
        for (b <- 0 until 16) {
          val (lx, ly) = Blk4x4Pos(b)
          val bx = mbX * 4 + lx
          val by = mbY * 4 + ly
          var nz = 0
          if (cbpLuma != 0) {
            val acScan = new Array[Int](15)
            for (i <- 1 until 16) acScan(i - 1) = qAc(b)(Zigzag4x4(i))
            nz = acScan.count(_ != 0)
            val cbf = if (nz > 0) 1 else 0
            enc.decision(sc.cbfCtxLuma(1, bx, by), cbf)
            sc.cbfL(by * wB + bx) = cbf
            if (cbf == 1) encodeResidualCabac(enc, 1, acScan)
          } else sc.cbfL(by * wB + bx) = 0
          st.lumaNz(by * wB + bx) = nz
          val d0 = new Array[Int](16)
          if (cbpLuma != 0) for (i <- 1 until 16) d0(i) = qAc(b)(i)
          val d = dequant4x4(d0, qp, skipDc = true)
          d(0) = dcDeq(ly * 4 + lx)
          val res = inverseTransform4x4(d)
          for (yy <- 0 until 4; xx <- 0 until 4)
            st.y((py + ly * 4 + yy) * st.w + px + lx * 4 + xx) =
              clip255(pred((ly * 4 + yy) * 16 + lx * 4 + xx) + res(yy * 4 + xx))
        }
        encodeChromaCabac(enc, sc, st, mb, mbX, mbY, chroma)
        st.qpOfMb(mb) = qp
      }
      st.mbDecoded(mb) = true
      st.sliceOfMb(mb) = st.currentSlice
      enc.terminate(if (mb == untilMb - 1) 1 else 0)
    }
  }

  /** CABAC chroma write: mirrors [[H264Encoder]]'s writeChroma order
    * (DC cb, DC cr, then ACs per component) with cbf bins; the
    * RECONSTRUCTION side already happened inside codeChroma.
    */
  private def encodeChromaCabac(enc: Encoder, sc: SliceCtx, st: PicState,
                                mb: Int, mbX: Int, mbY: Int,
                                chroma: H264Encoder.ChromaCoded): Unit = {
    if (chroma.cbpChroma != 0) {
      for (c <- 0 until 2) {
        val cbf = if (chroma.dcScan(c).exists(_ != 0)) 1 else 0
        enc.decision(sc.cbfCtxChromaDc(c, mbX, mbY), cbf)
        if (c == 0) sc.dcCbfCb(mb) = cbf else sc.dcCbfCr(mb) = cbf
        if (cbf == 1) encodeResidualCabac(enc, 3, chroma.dcScan(c))
      }
    }
    for (c <- 0 until 2) {
      val cbfGrid = if (c == 0) sc.cbfCb else sc.cbfCr
      val nzPlane = if (c == 0) st.cbNz else st.crNz
      for (b <- 0 until 4) {
        val cx = mbX * 2 + b % 2
        val cy = mbY * 2 + b / 2
        if (chroma.cbpChroma == 2) {
          val nz = chroma.acScan(c)(b).count(_ != 0)
          val cbf = if (nz > 0) 1 else 0
          enc.decision(sc.cbfCtxChromaAc(c, cx, cy), cbf)
          cbfGrid(cy * sc.wC + cx) = cbf
          if (cbf == 1) encodeResidualCabac(enc, 4, chroma.acScan(c)(b))
          nzPlane(cy * st.wMbs * 2 + cx) = nz
        } else {
          cbfGrid(cy * sc.wC + cx) = 0
          nzPlane(cy * st.wMbs * 2 + cx) = 0
        }
      }
    }
  }
}

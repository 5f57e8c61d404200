package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.H264._

/** CABAC intra validation — engine structural checks + exhaustive
  * engine roundtrips + whole-frame roundtrips against the encoder's
  * CABAC mode (the full extent verifiable without an external decoder;
  * see the validation-boundary note on [[H264Cabac]]).
  */
class H264CabacSpec extends AnyFunSuite {

  // ---------------------------------------------------------- engine

  test("rangeTabLPS: shape, endpoints, monotonicity (spec Table 9-44)") {
    assert(H264Cabac.RangeTabLps.length === 64)
    assert(H264Cabac.RangeTabLps.forall(_.length === 4))
    assert(H264Cabac.RangeTabLps(0).toSeq === Seq(128, 176, 208, 240))
    assert(H264Cabac.RangeTabLps(63).toSeq === Seq(2, 2, 2, 2))
    // rows nondecreasing across the quantized-range axis
    for (r <- H264Cabac.RangeTabLps; i <- 0 until 3)
      assert(r(i) <= r(i + 1), s"row ${r.mkString(",")} not nondecreasing")
    // columns nonincreasing in pStateIdx (probability decreases)
    for (c <- 0 until 4; p <- 0 until 63)
      assert(H264Cabac.RangeTabLps(p)(c) >= H264Cabac.RangeTabLps(p + 1)(c),
        s"column $c not nonincreasing at state $p")
    // renormalization terminates: every LPS value >= 2
    assert(H264Cabac.RangeTabLps.forall(_.forall(_ >= 2)))
  }

  test("transIdxLPS: total, bounded, absorbing at 63; MPS transition sane") {
    assert(H264Cabac.TransIdxLps.length === 64)
    assert(H264Cabac.TransIdxLps(63) === 63)
    for (p <- 0 until 64) {
      val t = H264Cabac.TransIdxLps(p)
      assert(t >= 0 && t <= 63)
      assert(t <= p || (p <= 1 && t <= 2), s"LPS transition must not increase confidence: $p -> $t")
    }
    // near-nondecreasing: the spec's table has exactly one local dip
    // (states 28→29 map 23→22); allow a single-step dip, nothing more
    for (p <- 0 until 62)
      assert(H264Cabac.TransIdxLps(p) <= H264Cabac.TransIdxLps(p + 1) + 1)
  }

  test("context init: every (m,n) lands in a legal state at every QP") {
    for (qp <- Seq(0, 10, 26, 40, 51)) {
      val ctx = new H264Cabac.Ctx(qp)
      for (i <- 0 until H264Cabac.NumCtx) {
        assert(ctx.pState(i) >= 0 && ctx.pState(i) <= 62, s"ctx $i qp $qp")
        assert(ctx.valMps(i) == 0 || ctx.valMps(i) == 1)
      }
    }
  }

  test("engine roundtrip: random decision/bypass/terminate sequences") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 50) {
      val qp = rnd.nextInt(52)
      // random mixed sequence ending in terminate(1)
      val ops = (0 until (50 + rnd.nextInt(400))).map { _ =>
        rnd.nextInt(3) match {
          case 0 => ("d", rnd.nextInt(H264Cabac.NumCtx), rnd.nextInt(2))
          case 1 => ("b", 0, rnd.nextInt(2))
          case _ => ("t", 0, 0) // non-final terminates are 0
        }
      } :+ (("t", 0, 1))
      val w = new BitWriter()
      val encCtx = new H264Cabac.Ctx(qp)
      val enc = new H264Cabac.Encoder(w, encCtx)
      ops.foreach {
        case ("d", c, v) => enc.decision(c, v)
        case ("b", _, v) => enc.bypass(v)
        case ("t", _, v) => enc.terminate(v)
      }
      w.byteAlign()
      val data = w.toBytes
      val decCtx = new H264Cabac.Ctx(qp)
      val dec = new H264Cabac.Decoder(data, 0, decCtx)
      ops.foreach {
        case ("d", c, v) =>
          assert(dec.decision(c) === v, s"trial $trial decision ctx $c")
        case ("b", _, v) => assert(dec.bypass() === v, s"trial $trial bypass")
        case ("t", _, v) => assert(dec.terminate() === v, s"trial $trial terminate")
      }
    }
  }

  test("engine: encoder bits == decoder consumed bits at terminate (PCM alignment invariant)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val w = new BitWriter()
      val enc = new H264Cabac.Encoder(w, new H264Cabac.Ctx(26))
      val ops = (0 until 200).map(_ => (rnd.nextInt(276), rnd.nextInt(2)))
      ops.foreach { case (c, v) => enc.decision(c, v) }
      enc.terminate(1)
      val encBits = w.bitLength
      w.byteAlign()
      val data = w.toBytes ++ Array[Byte](99, 98, 97) // trailing marker bytes
      val dec = new H264Cabac.Decoder(data, 0, new H264Cabac.Ctx(26))
      ops.foreach { case (c, v) => assert(dec.decision(c) === v) }
      assert(dec.terminate() === 1)
      // the next byte boundary on the decode side is exactly where the
      // encoder's aligned payload (PCM samples) would start
      assert(dec.pcmBytePos === (encBits + 7) / 8)
    }
  }

  // ------------------------------------------------------ frame layer

  private def gradientPlanes(wMbs: Int, hMbs: Int, seed: Int) = {
    val w = wMbs * 16
    val h = hMbs * 16
    val rnd = new scala.util.Random(seed)
    val y = Array.tabulate(w * h)(i => ((i % w) * 2 + (i / w) * 3 + rnd.nextInt(24)) % 256)
    val cb = Array.tabulate(w / 2 * h / 2)(i => (90 + (i % (w / 2)) + rnd.nextInt(10)) % 256)
    val cr = Array.tabulate(w / 2 * h / 2)(i => (160 + (i / (w / 2)) * 2 + rnd.nextInt(10)) % 256)
    (y, cb, cr)
  }

  private def assertFrameEquals(a: Frame, b: Frame): Unit = {
    assert(a.width === b.width && a.height === b.height)
    assert(a.y.toSeq === b.y.toSeq, "luma planes differ")
    assert(a.cb.toSeq === b.cb.toSeq, "cb planes differ")
    assert(a.cr.toSeq === b.cr.toSeq, "cr planes differ")
  }

  private def cabacFrame(y: Array[Int], cb: Array[Int], cr: Array[Int],
                         wMbs: Int, hMbs: Int, qp: Int,
                         mbMode: (Int, Int) => Int = (_, _) => H264Encoder.Mode16x16,
                         slices: Seq[Int] = Seq(0), deblock: Boolean = false) =
    H264Encoder.encodeFrameSlices(y, cb, cr, wMbs, hMbs, qp, 0, 0, mbMode,
      slices, Seq.fill(slices.size)(deblock), cabac = true)

  test("CABAC frame roundtrip: I_16x16 across QPs") {
    for (qp <- Seq(8, 20, 31, 40)) {
      val (y, cb, cr) = gradientPlanes(3, 2, qp)
      val (sps, pps, sl, recon) = cabacFrame(y, cb, cr, 3, 2, qp)
      val dec = H264.decodeNals(Seq(sps, pps) ++ sl)
      assert(dec.isDefined, s"CABAC I16x16 qp=$qp failed to decode")
      assertFrameEquals(dec.get, recon)
    }
  }

  test("CABAC frame roundtrip: I_4x4 cycles all 9 prediction modes") {
    for (qp <- Seq(12, 26)) {
      val (y, cb, cr) = gradientPlanes(3, 3, 7 + qp)
      val (sps, pps, sl, recon) = cabacFrame(y, cb, cr, 3, 3, qp,
        mbMode = (_, _) => H264Encoder.Mode4x4)
      val dec = H264.decodeNals(Seq(sps, pps) ++ sl)
      assert(dec.isDefined, s"CABAC I4x4 qp=$qp failed to decode")
      assertFrameEquals(dec.get, recon)
    }
  }

  test("CABAC frame roundtrip: I_PCM restart + mixed-mode checkerboard") {
    val (y, cb, cr) = gradientPlanes(2, 2, 99)
    val (sps, pps, sl, recon) = cabacFrame(y, cb, cr, 2, 2, 30,
      mbMode = (_, _) => H264Encoder.ModePcm)
    val dec = H264.decodeNals(Seq(sps, pps) ++ sl)
    assert(dec.isDefined, "all-PCM CABAC frame failed")
    assertFrameEquals(dec.get, recon)
    assert(dec.get.y.toSeq === y.toSeq, "I_PCM must reproduce the source exactly")
    // PCM beside predicted MBs exercises the engine restart mid-slice
    val (y2, cb2, cr2) = gradientPlanes(4, 3, 123)
    val (s2, p2, sl2, rec2) = cabacFrame(y2, cb2, cr2, 4, 3, 24,
      mbMode = (mx, my) => (mx + my) % 3)
    val dec2 = H264.decodeNals(Seq(s2, p2) ++ sl2)
    assert(dec2.isDefined, "mixed-mode CABAC frame failed")
    assertFrameEquals(dec2.get, rec2)
  }

  test("CABAC multi-slice: fresh contexts per slice, cross-slice unavailability") {
    val (y, cb, cr) = gradientPlanes(3, 2, 777)
    val (sps, pps, sl, recon) = cabacFrame(y, cb, cr, 3, 2, 26,
      mbMode = (mx, my) => (mx + my) % 3, slices = Seq(0, 4))
    assert(sl.size === 2)
    val dec = H264.decodeNals(Seq(sps, pps) ++ sl)
    assert(dec.isDefined, "2-slice CABAC frame failed")
    assertFrameEquals(dec.get, recon)
  }

  test("CABAC + deblocking: loop filter applies to the arithmetic-coded picture") {
    val w = 32
    val h = 16
    val y = Array.tabulate(w * h)(i => if (i % w < 16) 120 else 100)
    val cbp = Array.fill(w / 2 * h / 2)(110)
    val crp = Array.fill(w / 2 * h / 2)(140)
    val (sps, pps, sl, recon) = cabacFrame(y, cbp, crp, 2, 1, 36, deblock = true)
    val dec = H264.decodeNals(Seq(sps, pps) ++ sl)
    assert(dec.isDefined)
    assertFrameEquals(dec.get, recon)
    val (_, _, _, reconOff) = cabacFrame(y, cbp, crp, 2, 1, 36, deblock = false)
    val seam = (0 until h).map(r => r * w + 15)
    assert(seam.exists(i => recon.y(i) != reconOff.y(i)), "filter never fired")
  }

  test("CABAC degradation: corrupt / truncated payloads → None, never garbage") {
    val (y, cb, cr) = gradientPlanes(2, 2, 5)
    val (sps, pps, sl, recon) = cabacFrame(y, cb, cr, 2, 2, 26)
    assertFrameEquals(H264.decodeNals(Seq(sps, pps) ++ sl).get, recon)
    val slice = sl.head
    assert(H264.decodeNals(Seq(sps, pps, slice.take(6))).isEmpty,
      "truncated CABAC slice must not decode")
    // flip bits through the arithmetic payload: either the syntax
    // breaks (None) or — if the corruption lands after the last MB's
    // terminate — the decode is byte-identical-prefix valid; accept
    // None or a full frame, never a partial/garbled success claim
    for (at <- Seq(slice.length / 2, slice.length - 2)) {
      val bad = slice.clone()
      bad(at) = (bad(at) ^ 0x55).toByte
      H264.decodeNals(Seq(sps, pps, bad)) match {
        case None => () // the expected outcome
        case Some(f) =>
          assert(f.width === recon.width && f.height === recon.height)
      }
    }
  }

  test("CABAC through the MP4/avc1 container (Main-profile keyframe path)") {
    def flat(g: Int): (Array[Int], Array[Int], Array[Int]) =
      (Array.fill(32 * 16)(g), Array.fill(16 * 8)(110), Array.fill(16 * 8)(140))
    val (y, cb, cr) = flat(96)
    val (sps, pps, sl, _) = cabacFrame(y, cb, cr, 2, 1, 10)
    val cfg = H264Encoder.avcC(sps, pps)
    val mp4 = Multimodal.avc1Mp4(Seq(H264Encoder.avccSample(sl.head)), 32, 16, cfg)
    import org.apache.spark.sql.functions._
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    val df = Multimodal.decodeVideo(Seq((1L, mp4)).toDF("media_id", "payload"),
      dims = 4, maxFrames = 3)
    val row = df.select(col("decoded_frames"),
      round(element_at(col("video_features"), 2) * 100).cast("int")).head()
    assert(row.getInt(0) === 1, "CABAC avc1 keyframe must decode")
    assert(row.getInt(1) === 100, "flat gray 96 lands fully in luma bucket 1")
  }
}

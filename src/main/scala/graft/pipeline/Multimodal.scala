package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata structs.
  *
  * The IMAGE path is real: [[decodeImages]]/[[resizeImages]] run the
  * JDK's `javax.imageio` codecs (PNG/GIF/BMP/JPEG) partition-wise —
  * true pixel dimensions, luminance features, bilinear resize with
  * PNG re-encode. The AUDIO path is real for the JDK's
  * `javax.sound.sampled` formats (WAV/AIFF/AU): [[decodeAudio]]
  * yields true sample rate, duration, and an RMS-energy envelope.
  * VIDEO is real for MJPEG-in-AVI ([[decodeVideo]]: RIFF container
  * walk + per-frame JPEG via `javax.imageio`), animated GIF
  * ([[gifFrames]]: composited multi-frame read), and MJPEG-in-MP4
  * ([[mp4VideoTrack]]: full ISO-BMFF sample-table demux; samples
  * decode when the fourcc is a JPEG family) — the moving-image shapes
  * needing no native codec. For MP4's dominant real-world codecs
  * (H.264/H.265/VP9) the CONTAINER walk is the same real demux but
  * the per-sample pixel decode remains a clearly-marked STUB seam —
  * dropping a native decoder into the [[clipFrames]] dispatch changes
  * nothing else.
  */
object Multimodal {

  /** Media-table schema: payload + mime + typed metadata. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("duration_ms", LongType), StructField("sample_rate", IntegerType)))

  /** Wrap a text table as a media table (payload = utf8 bytes). Real
    * pipelines read payloads via `binaryFile` data source; the schema
    * and downstream operators are identical.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      when(pmod(col(idCol), lit(3)) === 0, "image/png")
        .when(pmod(col(idCol), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      struct(
        (pmod(col(idCol), lit(640)) + 1).cast(IntegerType).as("width"),
        (pmod(col(idCol), lit(480)) + 1).cast(IntegerType).as("height"),
        (pmod(col(idCol), lit(60000))).cast(LongType).as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))

  /** Content-derived decode→featurize, replacing the former md5
    * pseudo-feature stub: each payload is decoded with the JVM's real
    * codecs and the feature vector is a statistic of the CONTENT, so
    * two encodings of the same media land on (near-)equal vectors —
    * which is what every downstream consumer (semdedup, embedding
    * near-dup) actually needs. Dispatch, in order (each codec is only
    * ATTEMPTED behind a magic-byte sniff — see [[looksLikeImage]] —
    * because per-row codec rejection dominates everything else on a
    * mostly-text corpus):
    *
    *  1. image magic (PNG/JPEG/GIF/BMP) and `javax.imageio` decode
    *     succeeds → `dims`-bucket luminance HISTOGRAM (fraction of
    *     pixels per luma bucket). Lossless re-encodes (PNG↔BMP)
    *     produce identical vectors; lossy re-encodes near-equal ones.
    *  2. audio magic (WAV/AIFF/AU) and `javax.sound.sampled` decode
    *     succeeds → `dims`-window RMS energy moments of the 16-bit
    *     PCM stream.
    *  3. otherwise (text/opaque blobs) → per-strip mean byte value in
    *     [0,1]: the payload split into `dims` contiguous strips,
    *     feature i = mean(bytes of strip i)/255.
    *
    * The model seam is unchanged: swap any branch's statistic for a
    * real embedding model inside the same `mapPartitions` shape. The
    * output schema (fixed-size float array) is the contract.
    */
  def extractContentFeatures(df: DataFrame, dims: Int = 8,
                             payloadCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ contentFeatures(payload, dims))
      }
    }(Encoders.row(outSchema))
  }

  /** Magic-byte sniff for the formats the JDK ships image codecs for
    * (PNG/JPEG/GIF/BMP). Decoding is attempted ONLY behind a matching
    * magic: `ImageIO.read` on a non-image payload walks the whole
    * reader-SPI registry before failing, and at corpus scale that
    * per-row rejection cost dominates the actual decodes (p09 was
    * ~10 s/50k rows of it). A payload with a matching magic that still
    * fails to decode keeps the corrupt-blob-degrades policy.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 &&
      ((p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
        (p(0) == 'B' && p(1) == 'M') ||
        // TIFF, both byte orders (the JDK ships a TIFF reader too)
        (p(0) == 'I' && p(1) == 'I' && p(2) == 0x2A.toByte && p(3) == 0) ||
        (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 0x2A.toByte))
  // Known sniff gap: WBMP has no magic bytes, so WBMP payloads (which
  // ImageIO could read) take the opaque-blob branch. Acceptable: the
  // format is extinct in crawls, and a magic-less sniff would reopen
  // the per-row registry walk this guard exists to avoid.

  /** Same pre-sniff for the JDK's audio container formats (WAV/AIFF/
    * AU): `AudioSystem.getAudioInputStream` REJECTS by throwing, and an
    * exception per non-audio row is even costlier than the image-SPI
    * walk.
    */
  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 4 &&
      ((p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') ||
        (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') ||
        (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

  /** The per-payload kernel behind [[extractContentFeatures]]. */
  private[pipeline] def contentFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
    if (payload == null || payload.isEmpty) return new Array[Float](dims)
    val img =
      if (!looksLikeImage(payload)) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null } // codec bugs degrade, never kill the job
    if (img != null) {
      val (w, h) = (img.getWidth, img.getHeight)
      val counts = new Array[Long](dims)
      // Bulk row fetch: getRGB(0,y,w,1,…) does ONE color-model conversion
      // pass per row instead of one per pixel — same default-sRGB values
      // as getRGB(x,y), so the histogram is bit-identical, ~5-10× faster.
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val luma = (((rgb >> 16) & 0xFF) * 0.299 +
            ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114) / 255.0
          counts(math.min(dims - 1, (luma * dims).toInt)) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      return Array.tabulate(dims)(i => (counts(i).toDouble / n).toFloat)
    }
    val clip = if (looksLikeAudio(payload)) decodePcm(payload) else null
    if (clip != null) return windowedRms(clip.samples, dims)
    // opaque-blob fallback: per-strip mean byte value (engine-portable —
    // this is the branch the DuckDB oracle reproduces over text payloads)
    val n = payload.length
    Array.tabulate(dims) { i =>
      val from = n.toLong * i / dims
      val until = n.toLong * (i + 1) / dims
      if (until == from) 0f
      else {
        var s = 0.0
        var j = from.toInt
        while (j < until) { s += (payload(j) & 0xFF); j += 1 }
        ((s / (until - from)) / 255.0).toFloat
      }
    }
  }

  /** A decoded audio payload: format info + normalized [-1,1) 16-bit
    * PCM samples. One kernel shared by [[decodeAudio]] and
    * [[extractContentFeatures]] so the byte→PCM conversion and its
    * failure policy cannot drift between the two paths.
    */
  private[pipeline] final case class PcmClip(sampleRate: Int, channels: Int,
                                             samples: Array[Double])

  /** Decode payload via `javax.sound.sampled`, or null when no codec
    * reads it OR the conversion to 16-bit signed PCM is unsupported —
    * `getAudioInputStream(fmt, in)` throws IllegalArgumentException
    * for that case, so the catch is NonFatal: one exotic payload must
    * degrade to the opaque-blob branch, never kill the job.
    */
  private def decodePcm(payload: Array[Byte]): PcmClip =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val pcmFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels,
          fmt.getChannels * 2, fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, in)
        val bytes = pcm.readAllBytes()
        val nSamples = bytes.length / 2
        val out = new Array[Double](nSamples)
        var i = 0
        while (i < nSamples) {
          val lo = bytes(2 * i) & 0xFF
          val hi = bytes(2 * i + 1).toInt
          out(i) = ((hi << 8) | lo) / 32768.0
          i += 1
        }
        PcmClip(fmt.getSampleRate.toInt, math.max(1, fmt.getChannels), out)
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  /** `dims`-window RMS-energy envelope of a sample array. */
  private def windowedRms(samples: Array[Double], dims: Int): Array[Float] = {
    val nSamples = samples.length
    val sums = new Array[Double](dims)
    val counts = new Array[Long](dims)
    var i = 0
    while (i < nSamples) {
      val w = math.min(dims - 1, (i.toLong * dims / math.max(1, nSamples)).toInt)
      sums(w) += samples(i) * samples(i); counts(w) += 1
      i += 1
    }
    Array.tabulate(dims)(d =>
      if (counts(d) == 0) 0f else math.sqrt(sums(d) / counts(d)).toFloat)
  }

  /** STUB image resize: passes metadata through with new dimensions —
    * the real version maps payload bytes partition-wise through a
    * codec; the plan shape (narrow map, no shuffle) is what matters.
    */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta",
      col("meta").withField("width", lit(w)).withField("height", lit(h)))

  /** Frame-sample offsets for video rows: every `everyMs` within the
    * clip duration (array of timestamps, exploded downstream as
    * needed) — pure expression, proportional output size.
    */
  def frameSampleOffsets(df: DataFrame, everyMs: Long = 1000L): DataFrame =
    df.withColumn("frame_offsets_ms",
      when(col("mime").startsWith("video"),
        sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))

  /** Partition-wise decode: the shape a real media decoder runs in —
    * one partition of payload rows at a time through `mapPartitions`
    * (a narrow map: no shuffle, and per-partition init is where codec
    * handles / model weights load once). The decode body here is a
    * clearly-marked deterministic STUB (payload bytes → [0,1) floats);
    * swapping it for a real codec changes nothing about the plan
    * shape, batching, or output schema.
    */
  def decodePartitionwise(df: DataFrame, dims: Int = 8): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition initialization point (codec/model setup in prod)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = Array.tabulate(dims) { i => // STUB decode
          if (payload == null || payload.isEmpty) 0f
          else (payload(i % payload.length) & 0xFF) / 255.0f
        }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image decode for `image/png` (and any other format the JVM's
    * `javax.imageio` registry reads — PNG/GIF/BMP/JPEG ship with the
    * JDK): payloads are decoded partition-wise to true pixel
    * dimensions plus a `dims`-bucket mean-luminance feature vector
    * (the image split into `dims` vertical strips; each feature is
    * that strip's mean luma in [0,1]). Rows whose payload does not
    * decode (non-image mimes, truncated bytes) get null width/height
    * and a null feature vector — decode failure is data, not an error,
    * exactly like a corrupt blob in a 100 TB crawl.
    *
    * Same plan shape as [[decodePartitionwise]]: a narrow
    * `mapPartitions` (no shuffle), per-partition init point for codec
    * state, output schema fixed up front.
    */
  def decodeImages(df: DataFrame, dims: Int = 8): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema
      .add("decoded_width", IntegerType)
      .add("decoded_height", IntegerType)
      .add("image_features", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // ImageIO scans its plugin registry on first use; touching it here
      // keeps that per-partition, off the driver.
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img =
          if (payload == null || payload.isEmpty || !looksLikeImage(payload)) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null } // codec bugs degrade, never kill the job
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = new Array[Double](dims)
          val counts = new Array[Long](dims)
          // Bulk row fetch (see contentFeatures): one conversion pass per
          // row, bit-identical values to per-pixel getRGB(x,y).
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val rgb = rowBuf(x)
              val luma = (((rgb >> 16) & 0xFF) * 0.299 +
                ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114) / 255.0
              val strip = math.min(dims - 1, x * dims / w)
              sums(strip) += luma; counts(strip) += 1
              x += 1
            }
            y += 1
          }
          val feats = Array.tabulate(dims)(i =>
            if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
          Row.fromSeq(r.toSeq ++ Seq(w, h, feats))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image resize for decodable payloads: decode, scale through
    * `Graphics2D` bilinear interpolation, re-encode as PNG, and update
    * both the payload bytes and the metadata dimensions. Undecodable
    * rows pass through unchanged (same corrupt-blob policy as
    * [[decodeImages]]). Narrow map — the 100 TB shape is one pass over
    * the payload column, no shuffle.
    */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    require(w > 0 && h > 0, s"resize target ${w}x$h must be positive")
    val payloadIdx = df.schema.fieldIndex("payload")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img =
          if (payload == null || payload.isEmpty || !looksLikeImage(payload)) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null } // codec bugs degrade, never kill the job
        if (img == null) r
        else {
          val scaled = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", out)
          val oldMeta = r.getStruct(metaIdx)
          val newMeta = Row(Integer.valueOf(w), Integer.valueOf(h),
            oldMeta.get(2), oldMeta.get(3))
          val vals = r.toSeq.toArray
          vals(payloadIdx) = out.toByteArray
          vals(metaIdx) = newMeta
          Row.fromSeq(vals.toSeq)
        }
      }
    }(Encoders.row(df.schema))
  }

  /** REAL audio decode for the formats the JDK ships codecs for
    * (WAV/AIFF/AU via `javax.sound.sampled`): payloads decode
    * partition-wise to true sample rate, frame count, duration, and a
    * `dims`-bucket RMS-energy envelope (the clip split into `dims`
    * time windows; each feature is that window's root-mean-square
    * amplitude in [0,1]). Undecodable rows (compressed formats,
    * truncated bytes) get null metadata and features — the same
    * corrupt-blob-is-data policy as [[decodeImages]]. Narrow
    * `mapPartitions`, no shuffle.
    */
  def decodeAudio(df: DataFrame, dims: Int = 8): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema
      .add("decoded_sample_rate", IntegerType)
      .add("decoded_duration_ms", LongType)
      .add("audio_features", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val clip =
          if (payload == null || payload.isEmpty || !looksLikeAudio(payload)) null
          else decodePcm(payload) // shared byte→16-bit-PCM kernel
        if (clip == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val feats = windowedRms(clip.samples, dims)
          val frames = clip.samples.length / clip.channels
          val durMs = frames * 1000L / math.max(1, clip.sampleRate)
          Row.fromSeq(r.toSeq ++ Seq(clip.sampleRate, durMs, feats))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** RIFF/AVI sniff: "RIFF" fourcc + "AVI " form type at offset 8. */
  private def looksLikeAvi(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  /** Extract the JPEG frame payloads of an MJPEG-in-AVI container by
    * walking its RIFF chunk tree: `RIFF`/`LIST` chunks descend (their
    * payload is a 4-byte form type then sub-chunks), stream chunks
    * `NNdc`/`NNdb` whose bytes start with the JPEG SOI marker are
    * frames. Tolerant by design — truncated or malformed trees yield
    * the frames parsed so far (corrupt-blob-is-data policy), and
    * `maxFrames` bounds work per payload. Pure JDK: the container walk
    * here + `javax.imageio`'s JPEG codec per frame is a REAL video
    * decode for the one mainstream format that needs no native codec.
    */
  private[pipeline] def aviJpegFrames(payload: Array[Byte], maxFrames: Int): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var found = 0
    def chunkSize(at: Int): Long =
      (payload(at) & 0xFFL) | ((payload(at + 1) & 0xFFL) << 8) |
        ((payload(at + 2) & 0xFFL) << 16) | ((payload(at + 3) & 0xFFL) << 24)
    def isStreamData(at: Int): Boolean = {
      val c2 = payload(at + 2).toChar
      val c3 = payload(at + 3).toChar
      Character.isDigit(payload(at).toChar) && Character.isDigit(payload(at + 1).toChar) &&
        (c2 == 'd' || c2 == 'D') && (c3 == 'b' || c3 == 'c' || c3 == 'B' || c3 == 'C')
    }
    // recursion depth is CAPPED: each nested RIFF/LIST header costs 12
    // bytes, so a crafted payload could nest ~100k lists in ~1 MB and
    // overflow the stack — and StackOverflowError is not NonFatal, so
    // it would kill the task instead of degrading (the corrupt-blob-is-
    // data policy). Real AVIs nest 2-3 deep; 64 is generous headroom,
    // and deeper trees just stop descending cleanly.
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var at = from
      while (at + 8 <= until && found < maxFrames) {
        val size = chunkSize(at + 4)
        val body = at + 8
        val end = math.min(body + size, until.toLong).toInt
        if (end < body) return // size overflow / truncation: stop cleanly
        val isList = (payload(at) == 'R' && payload(at + 1) == 'I' &&
          payload(at + 2) == 'F' && payload(at + 3) == 'F') ||
          (payload(at) == 'L' && payload(at + 1) == 'I' &&
            payload(at + 2) == 'S' && payload(at + 3) == 'T')
        if (isList) {
          if (end - body >= 4 && depth < 64)
            walk(body + 4, end, depth + 1) // skip the form type
        } else if (isStreamData(at) && end - body >= 2 &&
          payload(body) == 0xFF.toByte && payload(body + 1) == 0xD8.toByte) {
          out += java.util.Arrays.copyOfRange(payload, body, end)
          found += 1
        }
        // advance from the CLAMPED end, never raw size.toInt (a bogus
        // 32-bit size would overflow negative and loop forever); when
        // the declared size was clamped, end == until and we exit
        at = end + (size & 1L).toInt // chunks pad to even
      }
    }
    walk(0, payload.length, 0)
    out.result()
  }

  /** Pack JPEG frame payloads into a minimal MJPEG-in-AVI container —
    * the inverse of [[aviJpegFrames]], for round-trip tests and for
    * emitting preview clips from frame samples. Container-only: no
    * timing header (`hdrl`) is written, which [[decodeVideo]] and
    * frame extractors don't need (players wanting a frame rate do).
    */
  def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(n: Int): Array[Byte] = Array(
      (n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte,
      ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(id: String, form: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length + 4) ++
        form.getBytes("US-ASCII") ++ body
    list("RIFF", "AVI ", list("LIST", "movi",
      frames.toArray.flatMap(f => chunk("00dc", f))))
  }

  /** GIF sniff: "GIF87a" / "GIF89a" signature. */
  private def looksLikeGif(p: Array[Byte]): Boolean =
    p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  /** Decode up to `maxFrames` frames of an (animated) GIF — the second
    * JDK-native video container, widening [[decodeVideo]] beyond
    * MJPEG-AVI with zero new dependencies. Frames are COMPOSITED: each
    * stored frame is drawn at its descriptor offset onto a persistent
    * canvas sized from the logical screen descriptor, so patch-encoded
    * animations (each frame storing only the changed rectangle) yield
    * full frames, which is what the luma-signature paths must see.
    * Simplification, documented: disposal methods are treated as
    * "do not dispose" — restore-to-background/previous animations
    * composite slightly differently, which shifts luma mass but never
    * fails. Malformed payloads yield the frames decoded so far
    * (corrupt-blob-is-data policy).
    */
  private[pipeline] def gifFrames(payload: Array[Byte], maxFrames: Int): Seq[java.awt.image.BufferedImage] = {
    import java.awt.image.BufferedImage
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Seq.empty
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false)
      // logical screen = the animation's full frame size
      val (sw, sh) =
        try {
          val tree = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
          val kids = tree.getChildNodes
          var w = 0; var h = 0
          var j = 0
          while (j < kids.getLength) {
            val n = kids.item(j)
            if (n.getNodeName == "LogicalScreenDescriptor") {
              val at = n.getAttributes
              w = at.getNamedItem("logicalScreenWidth").getNodeValue.toInt
              h = at.getNamedItem("logicalScreenHeight").getNodeValue.toInt
            }
            j += 1
          }
          (w, h)
        } catch { case scala.util.control.NonFatal(_) => (0, 0) }
      val out = Seq.newBuilder[BufferedImage]
      var canvas: BufferedImage = null
      var i = 0
      var done = false
      while (i < maxFrames && !done) {
        try {
          val frame = reader.read(i)
          // frame placement from the image descriptor (patch encoding)
          var (fx, fy) = (0, 0)
          try {
            val tree = reader.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
            val kids = tree.getChildNodes
            var j = 0
            while (j < kids.getLength) {
              val n = kids.item(j)
              if (n.getNodeName == "ImageDescriptor") {
                val at = n.getAttributes
                fx = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
                fy = at.getNamedItem("imageTopPosition").getNodeValue.toInt
              }
              j += 1
            }
          } catch { case scala.util.control.NonFatal(_) => }
          if (canvas == null) {
            val w = math.max(sw, fx + frame.getWidth)
            val h = math.max(sh, fy + frame.getHeight)
            canvas = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          }
          val g = canvas.createGraphics()
          try g.drawImage(frame, fx, fy, null) finally g.dispose()
          val snap = new BufferedImage(canvas.getWidth, canvas.getHeight,
            BufferedImage.TYPE_INT_RGB)
          val gs = snap.createGraphics()
          try gs.drawImage(canvas, 0, 0, null) finally gs.dispose()
          out += snap
          i += 1
        } catch {
          case _: IndexOutOfBoundsException => done = true // past last frame
          case scala.util.control.NonFatal(_) => done = true // truncated/corrupt
        }
      }
      out.result()
    } finally {
      try reader.dispose() finally { try iis.close() catch { case _: Throwable => } }
    }
  }

  /** Pack frames into an animated GIF (JDK `gif` writer sequence API) —
    * the [[mjpegAvi]] analogue for round-trip tests and constructed-
    * fact oracles. GIF is palette-based, so solid-color test frames
    * survive EXACTLY (no JPEG loss).
    */
  def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally {
      try writer.dispose() finally ios.close()
    }
    buf.toByteArray
  }

  // ------------------------------------------------------------ MP4

  /** ISO-BMFF sniff: every MP4-family file opens with a box whose type
    * is `ftyp` at byte 4 (ISO/IEC 14496-12 §4.3).
    */
  private def looksLikeMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  private def be16(p: Array[Byte], at: Int): Int =
    ((p(at) & 0xFF) << 8) | (p(at + 1) & 0xFF)
  private def be32(p: Array[Byte], at: Int): Long =
    ((p(at) & 0xFFL) << 24) | ((p(at + 1) & 0xFFL) << 16) |
      ((p(at + 2) & 0xFFL) << 8) | (p(at + 3) & 0xFFL)
  private def be64(p: Array[Byte], at: Int): Long =
    (be32(p, at) << 32) | be32(p, at + 4)

  /** Child boxes of the byte range `[from, until)` as
    * `(type, payloadStart, payloadEnd)` triples. Handles 64-bit
    * (`size==1`) and to-end-of-file (`size==0`) largesize forms;
    * stops (returning what parsed so far) at the first corrupt or
    * truncated header — degradation, never an exception.
    */
  private def mp4Boxes(p: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var at = from
    var ok = true
    while (ok && at + 8 <= until) {
      var size = be32(p, at)
      var hdr = 8
      val typ = new String(p, at + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (size == 1L && at + 16 <= until) { size = be64(p, at + 8); hdr = 16 }
      else if (size == 0L) size = (until - at).toLong
      if (size < hdr || at.toLong + size > until) ok = false
      else {
        out += ((typ, at + hdr, at + size.toInt))
        at += size.toInt
      }
    }
    out.toSeq
  }

  /** The demuxed video track of an MP4: codec fourcc, declared
    * dimensions, and each sample's (absolute offset, size) — the
    * sample table decoded from `stsd`/`stsz`/`stsc`/`stco`(`co64`).
    */
  private[graft] final case class Mp4Track(
      fourcc: String, width: Int, height: Int, samples: Seq[(Long, Int)],
      avcc: Option[Array[Byte]] = None)

  /** REAL ISO-BMFF demux (ISO/IEC 14496-12): walk
    * `moov → trak → mdia`, pick the track whose `hdlr` handler is
    * `vide`, and rebuild its frame byte-ranges from the sample tables —
    * `stsd` (codec fourcc + declared dims), `stsz` (sizes, fixed or
    * per-sample), `stsc` (sample→chunk runs), `stco`/`co64` (chunk
    * offsets). Returns None on anything malformed or truncated
    * (corrupt-blob-is-data, like the AVI walk). Pure JVM, no codec —
    * whether the samples then DECODE depends on the fourcc
    * ([[mp4JpegFrames]]).
    */
  private[graft] def mp4VideoTrack(p: Array[Byte]): Option[Mp4Track] =
    try {
      def kids(b: (String, Int, Int)) = mp4Boxes(p, b._2, b._3)
      def find(bs: Seq[(String, Int, Int)], t: String) = bs.filter(_._1 == t)
      val top = mp4Boxes(p, 0, p.length)
      find(top, "moov").headOption.flatMap { moov =>
        find(kids(moov), "trak").iterator.flatMap { trak =>
          val mdia = find(kids(trak), "mdia")
          val isVideo = mdia.exists(m => find(kids(m), "hdlr").exists { h =>
            // hdlr payload: version/flags(4) pre_defined(4) handler(4)
            h._2 + 12 <= h._3 &&
              new String(p, h._2 + 8, 4, java.nio.charset.StandardCharsets.ISO_8859_1) == "vide"
          })
          if (!isVideo) Iterator.empty
          else mdia.iterator.flatMap(m => find(kids(m), "minf"))
            .flatMap(mi => find(kids(mi), "stbl"))
            .flatMap { stbl =>
              val bs = kids(stbl)
              for {
                stsd <- find(bs, "stsd").headOption
                stsz <- find(bs, "stsz").headOption
                stsc <- find(bs, "stsc").headOption
                stco <- find(bs, "stco").headOption
                  .orElse(find(bs, "co64").headOption)
                track <- decodeSampleTables(p, stsd, stsz, stsc, stco)
              } yield track
            }
        }.nextOption()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Sample-table decode for [[mp4VideoTrack]]; bounds-checked
    * throughout, None on any inconsistency.
    */
  private def decodeSampleTables(p: Array[Byte],
                                 stsd: (String, Int, Int), stsz: (String, Int, Int),
                                 stsc: (String, Int, Int),
                                 stco: (String, Int, Int)): Option[Mp4Track] = {
    // stsd: version/flags(4) entry_count(4), then the first visual
    // sample entry: size(4) fourcc(4) reserved(6) dri(2)
    // pre_defined/reserved(16) width(2) height(2) …
    if (stsd._2 + 8 > stsd._3 || be32(p, stsd._2 + 4) < 1) return None
    val entry = stsd._2 + 8
    if (entry + 36 > stsd._3) return None
    val fourcc = new String(p, entry + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    val width = be16(p, entry + 32)
    val height = be16(p, entry + 34)
    // codec-specific config sits in child boxes after the 86-byte
    // visual sample entry — avcC carries H.264's SPS/PPS
    val entrySize = be32(p, entry).toInt
    val avcc =
      if (entrySize >= 86 && entry + entrySize <= stsd._3)
        mp4Boxes(p, entry + 86, entry + entrySize).collectFirst {
          case ("avcC", from, until) => java.util.Arrays.copyOfRange(p, from, until)
        }
      else None
    // stsz: version/flags(4) sample_size(4) sample_count(4) [sizes…]
    if (stsz._2 + 12 > stsz._3) return None
    val fixedSize = be32(p, stsz._2 + 4)
    val nSamples = be32(p, stsz._2 + 8).toInt
    if (nSamples < 0 || nSamples > (1 << 22)) return None // sanity cap
    val sizes: Int => Long =
      if (fixedSize != 0L) _ => fixedSize
      else {
        if (stsz._2 + 12 + 4L * nSamples > stsz._3) return None
        i => be32(p, stsz._2 + 12 + 4 * i)
      }
    // stco/co64: version/flags(4) entry_count(4) [offsets…]
    if (stco._2 + 8 > stco._3) return None
    val nChunks = be32(p, stco._2 + 4).toInt
    val w = if (stco._1 == "co64") 8 else 4
    if (nChunks < 0 || stco._2 + 8 + w.toLong * nChunks > stco._3) return None
    def chunkOffset(i: Int): Long =
      if (w == 8) be64(p, stco._2 + 8 + 8 * i) else be32(p, stco._2 + 8 + 4 * i)
    // stsc: version/flags(4) entry_count(4) [(first_chunk,
    // samples_per_chunk, sample_description_index)…] — runs: entry k
    // applies from its first_chunk until the next entry's
    if (stsc._2 + 8 > stsc._3) return None
    val nRuns = be32(p, stsc._2 + 4).toInt
    if (nRuns < 1 || stsc._2 + 8 + 12L * nRuns > stsc._3) return None
    def run(k: Int): (Int, Int) =
      (be32(p, stsc._2 + 8 + 12 * k).toInt, be32(p, stsc._2 + 8 + 12 * k + 4).toInt)
    val samples = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var s = 0
    var k = 0
    var chunk = 1
    while (s < nSamples && chunk <= nChunks) {
      while (k + 1 < nRuns && run(k + 1)._1 <= chunk) k += 1
      val perChunk = run(k)._2
      var off = chunkOffset(chunk - 1)
      var j = 0
      while (j < perChunk && s < nSamples) {
        val sz = sizes(s)
        if (sz < 0 || off < 0 || off + sz > p.length) return None
        samples += ((off, sz.toInt))
        off += sz
        s += 1; j += 1
      }
      chunk += 1
    }
    if (samples.isEmpty) None
    else Some(Mp4Track(fourcc, width, height, samples.toSeq, avcc))
  }

  /** Frame payloads of an MP4 whose video track is motion-JPEG
    * (fourcc `jpeg`/`mjpa`/`mjpb` — every sample a complete JPEG the
    * JDK codec decodes). Inter-coded codecs (`avc1` H.264, `hev1`,
    * `vp09`, …) demux fine but need a native entropy decoder the JVM
    * does not have — for those the container walk still yields the
    * sample table (count, dims, byte ranges) while THIS returns empty:
    * the pixel-decode step is the documented stub seam, exactly like
    * non-MJPEG AVI.
    */
  private[graft] def mp4JpegFrames(payload: Array[Byte], maxFrames: Int): Seq[Array[Byte]] =
    mp4VideoTrack(payload) match {
      case Some(t) if Set("jpeg", "mjpa", "mjpb").contains(t.fourcc) =>
        t.samples.take(maxFrames).map { case (off, len) =>
          java.util.Arrays.copyOfRange(payload, off.toInt, off.toInt + len)
        }
      case _ => Seq.empty
    }

  /** REAL pixel decode for `avc1` (H.264) MP4 tracks via the in-repo
    * decoder ([[H264]], CAVLC + CABAC via [[H264Cabac]]): SPS/PPS from
    * the track's avcC record, each sample's length-prefixed NALs
    * decoded in sample order. I/IDR samples decode standalone; P
    * samples motion-compensate from the PREVIOUS decoded picture
    * (single-reference chains, the [[H264]] inter ceiling). A sample
    * the decoder cannot handle (B slices, P_8x8, 8x8-transform,
    * CABAC-P) is SKIPPED and — crucially — BREAKS the reference
    * chain: subsequent P samples are also skipped until the next
    * decodable I picture, so a gap never fabricates pixels from the
    * wrong reference. On B-frame-bearing corpora this degrades to
    * keyframe(+leading-P) sampling, the production frame-sampler
    * shape. Returns empty on anything malformed.
    */
  private[graft] def mp4AvcFrames(payload: Array[Byte],
                                  maxFrames: Int): Seq[java.awt.image.BufferedImage] =
    mp4VideoTrack(payload) match {
      case Some(t) if t.fourcc == "avc1" && t.avcc.isDefined =>
        H264.parseAvcC(t.avcc.get) match {
          case Some((lengthSize, spsList, ppsList)) =>
            val paramNals = spsList ++ ppsList
            var ref: Option[H264.PicState] = None
            t.samples.iterator.map { case (off, len) =>
              if (off < 0 || off + len > payload.length) { ref = None; None }
              else {
                val sample = java.util.Arrays.copyOfRange(payload, off.toInt, off.toInt + len)
                val st = H264.decodeNalsRef(
                  paramNals ++ H264.splitAvccSample(sample, lengthSize), ref)
                ref = st // a failed sample drops the chain until the next I
                st.map(_.cropped)
              }
            }.collect { case Some(f) => f.toImage }.take(maxFrames).toSeq
          case None => Seq.empty
        }
      case _ => Seq.empty
    }

  /** Minimal MJPEG-in-MP4 writer (fixture/test constructor, the MP4
    * counterpart of [[mjpegAvi]]/[[animatedGif]]): one `vide` track,
    * fourcc `jpeg`, one chunk holding all samples back-to-back in
    * `mdat`, sample tables in `moov`. 10 fps at timescale 1000.
    */
  def mjpegMp4(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    require(frames.nonEmpty, "mjpegMp4 needs at least one frame")
    def u16(n: Int): Array[Byte] = Array(((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte)
    def u32(n: Long): Array[Byte] = Array(
      ((n >> 24) & 0xFF).toByte, ((n >> 16) & 0xFF).toByte,
      ((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val payload = body.flatten.toArray
      u32(8L + payload.length) ++ fourcc(typ) ++ payload
    }
    val n = frames.length
    val ftyp = box("ftyp", fourcc("isom"), u32(0x200), fourcc("isom"), fourcc("mp41"))
    val mdat = box("mdat", frames.flatten.toArray)
    val firstSample = ftyp.length + 8L // samples start after mdat's header
    val matrix = u32(0x10000) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0x10000) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0x40000000)
    val durMs = 100L * n
    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(1000), u32(durMs),
      u32(0x10000), u16(0x0100), u16(0), u32(0), u32(0), matrix,
      Array.fill(24)(0.toByte), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0), u32(durMs),
      u32(0), u32(0), u16(0), u16(0), u16(0), u16(0), matrix,
      u32(width.toLong << 16), u32(height.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(1000), u32(durMs),
      u16(0x55C4), u16(0))
    val hdlr = box("hdlr", u32(0), u32(0), fourcc("vide"), u32(0), u32(0), u32(0),
      "VideoHandler".getBytes ++ Array(0.toByte))
    val sampleEntry = u32(86L) ++ fourcc("jpeg") ++ Array.fill(6)(0.toByte) ++
      u16(1) ++ Array.fill(16)(0.toByte) ++ u16(width) ++ u16(height) ++
      u32(0x480000) ++ u32(0x480000) ++ u32(0) ++ u16(1) ++
      Array.fill(32)(0.toByte) ++ u16(24) ++ u16(0xFFFF)
    val stsd = box("stsd", u32(0), u32(1), sampleEntry)
    val stts = box("stts", u32(0), u32(1), u32(n.toLong), u32(100))
    val stsc = box("stsc", u32(0), u32(1), u32(1), u32(n.toLong), u32(1))
    val stsz = box("stsz", u32(0), u32(0), u32(n.toLong),
      frames.toArray.flatMap(f => u32(f.length.toLong)))
    val stco = box("stco", u32(0), u32(1), u32(firstSample))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val dinf = box("dinf", box("dref", u32(0), u32(1), box("url ", u32(1))))
    val vmhd = box("vmhd", u32(1), u16(0), u16(0), u16(0), u16(0))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** avc1 (H.264) MP4 writer — [[mjpegMp4]]'s sibling for the codec the
    * in-repo [[H264]] decoder handles: one `vide` track whose sample
    * entry carries the `avcC` configuration record (SPS/PPS, 4-byte
    * NAL lengths); `samples` are AVCC-format access units (e.g. from
    * [[H264Encoder.avccSample]]). 10 fps at timescale 1000.
    */
  def avc1Mp4(samples: Seq[Array[Byte]], width: Int, height: Int,
              avcc: Array[Byte]): Array[Byte] = {
    require(samples.nonEmpty, "avc1Mp4 needs at least one sample")
    def u16(n: Int): Array[Byte] = Array(((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte)
    def u32(n: Long): Array[Byte] = Array(
      ((n >> 24) & 0xFF).toByte, ((n >> 16) & 0xFF).toByte,
      ((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val payload = body.flatten.toArray
      u32(8L + payload.length) ++ fourcc(typ) ++ payload
    }
    val n = samples.length
    val ftyp = box("ftyp", fourcc("isom"), u32(0x200), fourcc("isom"),
      fourcc("avc1"), fourcc("mp41"))
    val mdat = box("mdat", samples.flatten.toArray)
    val firstSample = ftyp.length + 8L
    val matrix = u32(0x10000) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0x10000) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0x40000000)
    val durMs = 100L * n
    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(1000), u32(durMs),
      u32(0x10000), u16(0x0100), u16(0), u32(0), u32(0), matrix,
      Array.fill(24)(0.toByte), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0), u32(durMs),
      u32(0), u32(0), u16(0), u16(0), u16(0), u16(0), matrix,
      u32(width.toLong << 16), u32(height.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(1000), u32(durMs),
      u16(0x55C4), u16(0))
    val hdlr = box("hdlr", u32(0), u32(0), fourcc("vide"), u32(0), u32(0), u32(0),
      "VideoHandler".getBytes ++ Array(0.toByte))
    val avcCBox = box("avcC", avcc)
    val sampleEntry = u32(86L + avcCBox.length) ++ fourcc("avc1") ++
      Array.fill(6)(0.toByte) ++
      u16(1) ++ Array.fill(16)(0.toByte) ++ u16(width) ++ u16(height) ++
      u32(0x480000) ++ u32(0x480000) ++ u32(0) ++ u16(1) ++
      Array.fill(32)(0.toByte) ++ u16(24) ++ u16(0xFFFF) ++ avcCBox
    val stsd = box("stsd", u32(0), u32(1), sampleEntry)
    val stts = box("stts", u32(0), u32(1), u32(n.toLong), u32(100))
    val stsc = box("stsc", u32(0), u32(1), u32(1), u32(n.toLong), u32(1))
    val stsz = box("stsz", u32(0), u32(0), u32(n.toLong),
      samples.toArray.flatMap(f => u32(f.length.toLong)))
    val stco = box("stco", u32(0), u32(1), u32(firstSample))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val dinf = box("dinf", box("dref", u32(0), u32(1), box("url ", u32(1))))
    val vmhd = box("vmhd", u32(1), u16(0), u16(0), u16(0), u16(0))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** Container dispatch shared by [[decodeVideo]] and
    * [[videoFrameSignatures]]: sniff the payload and decode up to
    * `maxFrames` frames — MJPEG-in-AVI via the RIFF walk + JPEG codec,
    * animated GIF via the composited reader, MJPEG-in-MP4 via the
    * ISO-BMFF sample-table demux + JPEG codec. Unknown containers,
    * undecodable payloads, and MP4 tracks in codecs the JVM cannot
    * decode (H.264 etc. — [[mp4JpegFrames]]) yield no frames. Every
    * new decoder dropped in here immediately feeds the whole
    * signature/near-dup stack.
    */
  private def clipFrames(payload: Array[Byte], maxFrames: Int): Seq[java.awt.image.BufferedImage] = {
    def jpegs(fs: Seq[Array[Byte]]) = fs.flatMap { f =>
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)))
      catch { case scala.util.control.NonFatal(_) => None }
    }
    if (payload == null || payload.length < 12) Seq.empty
    else if (looksLikeAvi(payload)) jpegs(aviJpegFrames(payload, maxFrames))
    else if (looksLikeGif(payload)) gifFrames(payload, maxFrames)
    else if (looksLikeMp4(payload)) {
      val jpegFrames = jpegs(mp4JpegFrames(payload, maxFrames))
      if (jpegFrames.nonEmpty) jpegFrames
      else mp4AvcFrames(payload, maxFrames) // avc1 → in-repo H.264 intra decode
    } else Seq.empty
  }

  /** REAL video decode for the JDK-native containers ([[clipFrames]]:
    * MJPEG-in-AVI via RIFF walk + per-frame JPEG, animated GIF via the
    * composited multi-frame reader, MJPEG-in-MP4 via the ISO-BMFF
    * sample-table demux): payloads decode partition-wise to
    * a frame count, first-frame dimensions, and a `dims`-bucket
    * luminance histogram AVERAGED over up to `maxFrames` sampled
    * frames — the same content-derived statistic as the image branch,
    * so a video and a still of the same scene land near each other.
    * Unknown-container or undecodable payloads get null columns
    * (corrupt-blob-is-data). Other codecs (H.264 etc.) still need a
    * native decoder dropped into the same dispatch. Narrow map, no
    * shuffle.
    */
  def decodeVideo(df: DataFrame, dims: Int = 8, maxFrames: Int = 8): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema
      .add("decoded_frames", IntegerType)
      .add("frame_width", IntegerType)
      .add("frame_height", IntegerType)
      .add("video_features", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val imgs = clipFrames(payload, maxFrames)
        if (imgs.isEmpty) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        else {
          val acc = new Array[Double](dims)
          imgs.foreach { img =>
            val h = lumaHistogram(img, dims)
            var i = 0
            while (i < dims) { acc(i) += h(i); i += 1 }
          }
          val feats = Array.tabulate(dims)(i => (acc(i) / imgs.length).toFloat)
          Row.fromSeq(r.toSeq ++ Seq(imgs.length, imgs.head.getWidth, imgs.head.getHeight, feats))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** `dims`-bucket luminance histogram of one frame (bulk row fetch,
    * Rec.601 luma) — the shared content statistic of the image and
    * video branches, per-frame here and frame-averaged in
    * [[decodeVideo]].
    */
  private def lumaHistogram(img: java.awt.image.BufferedImage,
                            dims: Int): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val counts = new Array[Long](dims)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        val luma = (((rgb >> 16) & 0xFF) * 0.299 +
          ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114) / 255.0
        counts(math.min(dims - 1, (luma * dims).toInt)) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Array.tabulate(dims)(i => counts(i).toDouble / n)
  }

  /** Explode each clip (MJPEG-AVI or animated GIF) into per-frame rows
    * (input columns + `frame_idx` + `frame_sig`, the frame's
    * `dims`-bucket luma histogram). The frame-level complement of
    * [[decodeVideo]]'s clip average — the input to frame dedup.
    * Undecodable payloads simply emit no rows (corrupt-blob-is-data).
    * Narrow map: explosion happens inside the partition, no shuffle,
    * and work per payload is bounded by `maxFrames`.
    */
  def videoFrameSignatures(df: DataFrame, dims: Int = 8,
                           maxFrames: Int = 8): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema
      .add("frame_idx", IntegerType)
      .add("frame_sig", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        clipFrames(payload, maxFrames).zipWithIndex.map { case (img, i) =>
          Row.fromSeq(r.toSeq ++ Seq(i,
            lumaHistogram(img, dims).map(_.toFloat)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Near-duplicate CLIPS via shared frame content: two clips pair when
    * at least `minShared` of their distinct quantized frame signatures
    * collide (luma histogram buckets rounded to 1/`quant` — absorbing
    * JPEG loss while separating genuinely different frames). The video
    * member of the dedup family, same plan discipline as
    * [[Dedup.containmentPairs]]: signatures whose clip frequency
    * exceeds `maxSigFreq` (black frames, station logos — the all-pairs
    * blowup shape) are anti-joined away BEFORE the self-join, so the
    * join is signature-equality only and output is bounded by true
    * collisions, never corpus².
    */
  def videoNearDupClips(media: DataFrame, idCol: String, dims: Int = 4,
                        maxFrames: Int = 8, quant: Int = 8,
                        minShared: Int = 2, maxSigFreq: Int = 64): DataFrame = {
    val sigs = videoFrameSignatures(media, dims, maxFrames)
      .select(col(idCol),
        xxhash64(transform(col("frame_sig"),
          x => round(x * quant).cast("int"))).as("__sig"))
      .distinct()
    val hot = sigs.groupBy("__sig").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxSigFreq).select("__sig")
    val kept = sigs.join(broadcast(hot), Seq("__sig"), "left_anti")
    val a = kept.select(col("__sig"), col(idCol).as("id_a"))
    val b = kept.select(col("__sig"), col(idCol).as("id_b"))
    a.join(b, Seq("__sig")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** Full demo pipeline over a text table standing in for media blobs. */
  def pipeline(docs: DataFrame): DataFrame =
    extractContentFeatures(frameSampleOffsets(asMediaTable(docs, "doc_id", "text")))
      .select(col("media_id"), col("mime"), length(col("payload")).as("payload_bytes"),
        col("meta.width").as("width"), col("meta.duration_ms").as("duration_ms"),
        size(coalesce(col("frame_offsets_ms"), array())).as("n_frames"),
        col("features"))
}

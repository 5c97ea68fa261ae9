package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9 X4 / north star).
  *
  * The pattern for image/audio/video at 100 TB: carry the raw media as an
  * opaque `binary` column with typed metadata beside it, and run
  * decode/feature-extraction as a *partition-wise batch function* over a
  * typed Dataset — the Scala analog of `mapInPandas` (one iterator per
  * partition, arbitrary native/JNI calls inside, no per-row UDF overhead,
  * no driver involvement). Partitioning, schema, and batch shape are the
  * real contract; the decoder itself is swappable.
  *
  * This container has no image/audio libraries, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`fakeDecode`): it derives features
  * (byte length, an MD5-prefix signature, fake width/height) purely from
  * the payload bytes and metadata. Because the stub is deterministic and
  * byte-defined, the whole pipeline — binary encode → partition-wise
  * decode → feature columns — is still oracle-checkable in DuckDB.
  */
object Multimodal {

  // JVM-wide, on first touch of any codec path (the mapPartitions
  // closures reference this object, so executors initialize it before
  // decoding): ImageIO's DEFAULT stream cache is file-backed —
  // ImageIO.read(InputStream) wraps the payload in a
  // FileCacheImageInputStream that writes EVERY payload to a temp file
  // and reads it back (ImageIO.write symmetrically). Per-decode disk
  // I/O is invisible on a quiet rig but couples the codec keys to
  // ambient I/O pressure: multimodal_decode_real measured 2.4-2.8x
  // elevated inside the full bench suite (shuffle spills + parquet
  // writes churning the page cache) while a restricted same-rig run sat
  // at 0.54 s — the r16 verdict's open anomaly. Our payloads are
  // in-memory byte arrays already; memory-cached streams are strictly
  // better at any scale (one bounded payload buffered at a time).
  javax.imageio.ImageIO.setUseCache(false)

  /** One media row entering the decode stage: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], n_chars: Long)

  /** Extracted features leaving the decode stage. */
  final case class MediaFeatures(
      doc_id: Long, byte_len: Long, sig8: String, width: Long, height: Long)

  /** STUB decoder — stands in for an image/audio decode + feature
    * extraction batch. Real deployments replace the body (e.g. JNI to a
    * codec) without touching the surrounding Spark plumbing. Deterministic
    * by construction: features are pure functions of the payload bytes.
    */
  def fakeDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // one digest per partition-batch, reused across rows (the batch-local
    // setup cost a real decoder would amortize the same way)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { r =>
      md.reset()
      val hex = md.digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = r.doc_id,
        byte_len = r.payload.length.toLong,
        sig8 = hex.substring(0, 8),
        width = r.n_chars % 640,
        height = (r.n_chars * 7) % 480)
    }
  }

  /** `multimodal_extract`: documents → binary payload column (stand-in
    * for media bytes) → partition-wise stub decode → feature columns.
    */
  def multimodalExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("n_chars"))
      .as[MediaRow]
    media.mapPartitions(fakeDecode).toDF()
      .select(col("doc_id"), col("byte_len"), col("sig8"), col("width"), col("height"))
      .orderBy("doc_id")
  }

  /** Oracle: the stub's features re-derived relationally (payload =
    * UTF-8 text bytes, so byte_len = length(text) on this ASCII corpus
    * and sig8 = md5 prefix).
    */
  val multimodalExtractSql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len,
      |       substr(md5(text), 1, 8) AS sig8,
      |       n_chars % 640 AS width, (n_chars * 7) % 480 AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- resize

  /** Stub "thumbnail" byte budget — a real resize re-encodes pixels;
    * the stub keeps the leading `ResizeBytes` of the payload (pure
    * byte-defined truncation, so DuckDB reproduces it exactly).
    */
  val ResizeBytes = 256

  final case class ResizedMedia(
      doc_id: Long, in_len: Long, out_len: Long, out_sig8: String)

  /** `multimodal_resize`: the resize stage of a media pipeline as the
    * same partition-wise batch shape as [[fakeDecode]] — payload in,
    * smaller payload out, features of the RESIZED bytes emitted (the
    * contract a real thumbnailer fills in; the stub truncates to
    * [[ResizeBytes]]).
    */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("n_chars"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val out = java.util.Arrays.copyOfRange(
          r.payload, 0, math.min(r.payload.length, ResizeBytes))
        md.reset()
        val hex = md.digest(out).map("%02x".format(_)).mkString
        ResizedMedia(r.doc_id, r.payload.length.toLong, out.length.toLong,
          hex.substring(0, 8))
      }
    }.toDF()
      .select(col("doc_id"), col("in_len"), col("out_len"), col("out_sig8"))
      .orderBy("doc_id")
  }

  val multimodalResizeSql: String =
    s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS in_len,
       |       CAST(least(length(text), $ResizeBytes) AS BIGINT) AS out_len,
       |       substr(md5(substr(text, 1, $ResizeBytes)), 1, 8) AS out_sig8
       |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------- real image codec (opt-in)

  /** REAL image decode behind the identical 1→1 partition-wise contract
    * as [[fakeDecode]] — the opt-in codec arm (r13 verdict "What's
    * missing" #1). `javax.imageio` ships in every JDK, so this adds no
    * dependency; `width`/`height` come from the DECODED pixels instead
    * of the stub's metadata arithmetic. Payloads ImageIO cannot decode
    * are DROPPED, carbon-parse style — a 100 TB media crawl must not
    * die on one truncated JPEG; pair with an `observe` counter when the
    * drop rate must be monitored. The registered `multimodal_*` query
    * keys stay on the byte-stub arm: the synthetic corpus carries no
    * real images, and the stub is what DuckDB can re-derive —
    * MultimodalCodecSpec pins THIS path on generated PNG/BMP bytes.
    */
  def imageDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.flatMap { r =>
      decodeImage(r.payload).map { im =>
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.payload.length.toLong, hex.substring(0, 8),
          im.getWidth.toLong, im.getHeight.toLong)
      }
    }
  }

  /** Thumbnail box for [[imageResize]] (longest side after fit). */
  val ThumbPx = 32

  /** REAL resize behind [[multimodalResize]]'s 1→1 contract: decode,
    * area-average downscale into a [[ThumbPx]]-fit box (aspect
    * preserved), PNG re-encode. Area-average is computed in pure
    * integer arithmetic over floor-partitioned pixel boxes —
    * deterministic across JVMs, unlike `Graphics2D` interpolation whose
    * rendering hints are implementation-defined. `out_sig8` is
    * therefore the md5 of the thumbnail's PIXELS (dims + RGB bytes, via
    * [[pixelSig8]]) — NOT of the encoded PNG, whose chunk layout and
    * compression are JDK-implementation-defined and would split any
    * signature-keyed dedup across a heterogeneous cluster (review r14).
    * `out_len` reports the encoded size — the storage cost on THIS JVM,
    * informational rather than identity. Undecodable payloads drop, as
    * in [[imageDecode]].
    */
  def imageResize(rows: Iterator[MediaRow]): Iterator[ResizedMedia] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.flatMap { r =>
      decodeImage(r.payload).map { im =>
        val (ow, oh) = fitBox(im.getWidth, im.getHeight, ThumbPx)
        val thumb = areaAverage(im, ow, oh)
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(thumb, "png", baos)
        ResizedMedia(r.doc_id, r.payload.length.toLong,
          baos.size().toLong, pixelSig8(thumb, md))
      }
    }
  }

  /** Deterministic image identity: md5 over `(width, height, row-major
    * RGB triples)` of the decoded pixels — stable wherever the pixel
    * math is, unlike encoder output bytes.
    */
  private[ops] def pixelSig8(im: java.awt.image.BufferedImage,
      md: java.security.MessageDigest): String = {
    md.reset()
    val (w, h) = (im.getWidth, im.getHeight)
    md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
    val rowBuf = new Array[Byte](w * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = im.getRGB(x, y)
        rowBuf(x * 3) = ((p >> 16) & 0xff).toByte
        rowBuf(x * 3 + 1) = ((p >> 8) & 0xff).toByte
        rowBuf(x * 3 + 2) = (p & 0xff).toByte
        x += 1
      }
      md.update(rowBuf)
      y += 1
    }
    md.digest().map("%02x".format(_)).mkString.substring(0, 8)
  }

  /** Extracted audio features leaving [[audioDecode]]: container
    * geometry plus `mean_abs`, the integer mean absolute 16-bit PCM
    * amplitude over the first [[AudioProbeFrames]] frames of channel 0
    * — a loudness probe computed in pure integer arithmetic (sum of
    * |sample| then one integer division), so it is deterministic and
    * cheap enough for a first-pass corpus filter (silence / clipped
    * uploads). `n_frames` is the CONTAINER's frame count; SPI-decoded
    * compressed streams often cannot state it up front, and those rows
    * carry the sentinel `-1` ("unspecified" — unambiguous, since a real
    * count is never negative) rather than a fake geometry.
    */
  final case class AudioFeatures(
      doc_id: Long, sample_rate: Long, channels: Long, n_frames: Long,
      mean_abs: Long)

  val AudioProbeFrames = 1024

  /** REAL audio decode behind the same 1→1 partition-wise contract —
    * the audio sibling of [[imageDecode]]. `javax.sound.sampled` ships
    * in every JDK (WAV/AIFF/AU containers, PCM codecs), so this too
    * adds no dependency; geometry comes from the DECODED stream, and
    * non-audio or truncated payloads drop carbon-style. Compressed
    * formats (MP3 etc.) have no JDK service provider — a deployment
    * drops a JavaSound SPI jar on the executor classpath and this code
    * path is unchanged, which is the point of the contract.
    */
  def audioDecode(rows: Iterator[MediaRow]): Iterator[AudioFeatures] =
    rows.flatMap { r =>
      decodeWav(r.payload).map { case (fmt, frames, pcm) =>
        // mean |amplitude| over channel-0 16-bit little-endian samples
        val bytesPerFrame = fmt.getFrameSize
        val n = math.min(AudioProbeFrames, pcm.length / math.max(1, bytesPerFrame))
        var sum = 0L
        var i = 0
        while (i < n) {
          val off = i * bytesPerFrame
          val s = ((pcm(off + 1) << 8) | (pcm(off) & 0xff)).toShort
          sum += math.abs(s.toLong)
          i += 1
        }
        AudioFeatures(r.doc_id, fmt.getSampleRate.toLong,
          fmt.getChannels.toLong, frames,
          if (n == 0) 0L else sum / n)
      }
    }

  /** Null-safe JavaSound decode to (format, frameLength, leading PCM
    * bytes): `None` when no installed reader accepts the bytes or the
    * stream is not 16-bit PCM (the probe's sample math assumes it — a
    * real deployment converts via `AudioSystem.getAudioInputStream
    * (targetFormat, in)` first).
    */
  private[ops] def decodeWav(
      payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Long, Array[Byte])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      // the probe math assumes SIGNED 16-bit little-endian PCM — gate
      // on the encoding too (an SPI-provided PCM_UNSIGNED stream would
      // pass a bits/endian-only check and read 32768-offset garbage).
      // The channel bound rejects crafted headers (channels=65535 would
      // size the probe buffer at ~134 MB per row, and the resulting OOM
      // is an Error the catch below does not stop — review r14) while
      // keeping the FULL documented probe window for legitimate audio,
      // including SPI-decoded compressed formats whose PCM exceeds the
      // container length (a payload-length cap would silently halve the
      // window there — second review pass): 64 channels ⇒ ≤ 128 KB.
      // (frameSize is the container's own blockAlign u16, not derived
      // from channels — bound it directly too: 16-bit × 64 ch = 128 B)
      // frameSize must also hold at least one 16-bit sample PER channel:
      // a third-party SPI reporting frameSize < 2*channels (e.g. a
      // crafted blockAlign of 1) would otherwise let the probe's
      // pcm(off+1) read past the buffer — an ArrayIndexOutOfBounds that
      // fails the task instead of dropping the row (r14 ADVICE; the
      // stock JDK WAV reader recomputes frameSize so this is SPI-only)
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getFrameSize < 2 * fmt.getChannels || fmt.getFrameSize > 128 ||
        fmt.getChannels < 1 || fmt.getChannels > 64) None
      else {
        val want = AudioProbeFrames * fmt.getFrameSize
        val buf = new Array[Byte](want)
        var got = 0
        var r = 0
        while (got < want && r >= 0) {
          r = in.read(buf, got, want - got)
          if (r > 0) got += r
        }
        // SPI-decoded compressed streams commonly report frame length as
        // AudioSystem.NOT_SPECIFIED (-1); normalize every negative value
        // to exactly -1L, the DOCUMENTED "container did not specify"
        // sentinel (see AudioFeatures) — never emit it as real geometry
        val frameLen = in.getFrameLength
        Some((fmt, if (frameLen < 0) -1L else frameLen,
          java.util.Arrays.copyOf(buf, got)))
      }
    } catch { case _: Exception => None }

  /** Null-safe ImageIO decode: `None` for bytes no installed reader
    * accepts (ImageIO.read returns null then) or that throw mid-decode
    * (truncated files).
    */
  private[ops] def decodeImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Fit (w, h) inside a square box of side `px`, preserving aspect via
    * integer arithmetic, never below 1 px, never upscaling.
    */
  private[ops] def fitBox(w: Int, h: Int, px: Int): (Int, Int) =
    if (w <= px && h <= px) (w, h)
    else if (w >= h) (px, math.max(1, (h.toLong * px / w).toInt))
    else (math.max(1, (w.toLong * px / h).toInt), px)

  /** Deterministic area-average downscale: output pixel (ox, oy) is the
    * per-channel integer mean of the input box
    * `[⌊ox·W/ow⌋, ⌊(ox+1)·W/ow⌋) × [⌊oy·H/oh⌋, ⌊(oy+1)·H/oh⌋)` (floor
    * partition — boxes tile the input exactly; a degenerate box widens
    * to one pixel). All sums and divisions are integer ops.
    */
  private[ops] def areaAverage(im: java.awt.image.BufferedImage,
      ow: Int, oh: Int): java.awt.image.BufferedImage = {
    val (w, h) = (im.getWidth, im.getHeight)
    val out = new java.awt.image.BufferedImage(
      ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var oy = 0
    while (oy < oh) {
      val y0 = oy * h / oh
      val y1 = math.max(y0 + 1, (oy + 1) * h / oh)
      var ox = 0
      while (ox < ow) {
        val x0 = ox * w / ow
        val x1 = math.max(x0 + 1, (ox + 1) * w / ow)
        var (rs, gs, bs) = (0L, 0L, 0L)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = im.getRGB(x, y)
            rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        out.setRGB(ox, oy,
          (((rs / n) << 16) | ((gs / n) << 8) | (bs / n)).toInt)
        ox += 1
      }
      oy += 1
    }
    out
  }

  // -------------------------------------------------------- frame sample

  /** Stub "video" geometry: the payload is a frame sequence of
    * [[FrameBytes]]-byte frames; every [[FrameStride]]-th frame is
    * sampled (the keyframe-sampling shape — a real pipeline seeks
    * keyframes; the stub chunks bytes).
    */
  val FrameBytes = 64
  val FrameStride = 3

  final case class SampledFrame(
      doc_id: Long, frame_idx: Long, frame_off: Long, frame_len: Long,
      frame_sig8: String)

  /** `multimodal_frame_sample`: one input row fans out to its sampled
    * frames — the 1→N batch shape (explode) a video pipeline needs,
    * still partition-wise with batch-amortized decoder setup.
    */
  def multimodalFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("n_chars"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val nFrames = (r.payload.length + FrameBytes - 1) / FrameBytes
        (0 until nFrames by FrameStride).iterator.map { i =>
          val off = i * FrameBytes
          val end = math.min(off + FrameBytes, r.payload.length)
          md.reset()
          val hex = md.digest(java.util.Arrays.copyOfRange(r.payload, off, end))
            .map("%02x".format(_)).mkString
          SampledFrame(r.doc_id, i.toLong, off.toLong, (end - off).toLong,
            hex.substring(0, 8))
        }
      }
    }.toDF()
      .select(col("doc_id"), col("frame_idx"), col("frame_off"),
        col("frame_len"), col("frame_sig8"))
      .orderBy("doc_id", "frame_idx")
  }

  val multimodalFrameSampleSql: String =
    s"""SELECT d.doc_id, CAST(f.i AS BIGINT) AS frame_idx,
       |       CAST(f.i * $FrameBytes AS BIGINT) AS frame_off,
       |       CAST(least($FrameBytes, length(text) - f.i * $FrameBytes) AS BIGINT)
       |         AS frame_len,
       |       substr(md5(substr(text, f.i * $FrameBytes + 1, $FrameBytes)), 1, 8)
       |         AS frame_sig8
       |FROM documents d,
       |     unnest(generate_series(0, (length(d.text) - 1) // $FrameBytes)) AS f(i)
       |WHERE f.i % $FrameStride = 0
       |ORDER BY d.doc_id, frame_idx""".stripMargin

  // ------------------------------- real video (MJPEG) codec arm (r15)

  /** One decoded, sampled video frame leaving [[mjpegFrameDecode]]:
    * geometry from the DECODED pixels plus the JVM-stable pixel
    * signature ([[pixelSig8]] — of decoded pixels, not encoder bytes).
    */
  final case class DecodedFrame(
      doc_id: Long, frame_idx: Long, width: Long, height: Long, sig8: String)

  /** Index just past a JPEG frame's EOI, walking the MARKER STRUCTURE
    * from the SOI at `start` — or −1 for a truncated/invalid frame.
    * Length-delimited segments (DQT/DHT/COM/APPn/SOF/…) are skipped by
    * their declared length, because their payloads may LEGALLY contain
    * the FF D9 byte pair (a quantization value 255 followed by 217, an
    * EXIF thumbnail's own EOI, arbitrary comment bytes) — a naive EOI
    * byte scan splits such frames early. Only inside entropy-coded scan
    * data is FF always stuffing (FF 00), a restart (FF D0–D7), or a
    * real marker, so there the byte scan IS exact; a non-restart marker
    * in scan data hands control back to segment parsing (progressive
    * JPEGs interleave further DHT/SOS segments).
    */
  private[ops] def jpegEnd(p: Array[Byte], start: Int): Int = {
    var i = start + 2 // past SOI
    var inScan = false
    while (i + 1 < p.length) {
      if (!inScan) {
        if (p(i) != 0xff.toByte) return -1
        val m = p(i + 1) & 0xff
        if (m == 0xd9) return i + 2                      // EOI
        else if (m == 0xd8) return -1                    // nested SOI: invalid
        else if (m == 0xff) i += 1                       // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else {
          if (i + 3 >= p.length) return -1
          val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
          if (len < 2) return -1
          if (m == 0xda) inScan = true                   // SOS: scan follows
          i += 2 + len
        }
      } else if (p(i) == 0xff.toByte) {
        val n = p(i + 1) & 0xff
        if (n == 0xd9) return i + 2                      // EOI
        else if (n == 0x00 ||
          (n >= 0xd0 && n <= 0xd7)) i += 2               // stuffing/RST
        // FF FF: advance ONE byte so the second FF can itself start a
        // marker — the spec allows any run of FF fill bytes before a
        // marker (FF FF D9 is a fill byte + EOI), and the former +2
        // skipped the real marker, misclassifying the frame (r15 advice)
        else if (n == 0xff) i += 1
        else inScan = false                              // next segment starts
      } else i += 1
    }
    -1
  }

  /** Split an MJPEG byte stream into its JPEG frames: each frame spans
    * SOI (FF D8) … EOI (FF D9) inclusive, with the frame's END located
    * by [[jpegEnd]]'s marker walk (exact for baseline and progressive
    * JPEG — see there for why a plain EOI byte scan is not). Garbage
    * between frames (padding, truncated tails) is skipped — the next
    * SOI starts the next frame; an unterminated or structurally invalid
    * frame is dropped, carbon-style, and scanning resumes past its SOI.
    */
  private[ops] def splitMjpeg(payload: Array[Byte]): Iterator[Array[Byte]] =
    mjpegFrameSpans(payload).map { case (s, e) =>
      java.util.Arrays.copyOfRange(payload, s, e)
    }

  /** The marker walk behind [[splitMjpeg]], emitting each valid frame's
    * `(start, end)` byte span instead of the bytes — the geometry form
    * the oracle-gated `multimodal_video_geometry` key re-derives
    * arithmetically (offsets and lengths ARE pure marker arithmetic on
    * a synthesized fixture, unlike pixel content behind JPEG entropy
    * coding).
    */
  private[ops] def mjpegFrameSpans(payload: Array[Byte]): Iterator[(Int, Int)] =
    new Iterator[(Int, Int)] {
      private var pos = 0
      private var nextSpan: (Int, Int) = null
      private def advance(): Unit = {
        nextSpan = null
        while (nextSpan == null && pos + 1 < payload.length) {
          // find the next SOI
          var s = pos
          while (s + 1 < payload.length &&
            !(payload(s) == 0xff.toByte && payload(s + 1) == 0xd8.toByte)) s += 1
          if (s + 1 >= payload.length) { pos = payload.length; return }
          val e = jpegEnd(payload, s)
          if (e < 0) pos = s + 2 // invalid/truncated: resume past this SOI
          else {
            nextSpan = (s, e)
            pos = e
          }
        }
      }
      override def hasNext: Boolean = {
        if (nextSpan == null && pos < payload.length) advance()
        nextSpan != null
      }
      override def next(): (Int, Int) = {
        if (!hasNext) throw new NoSuchElementException
        val f = nextSpan; nextSpan = null; f
      }
    }

  /** REAL video arm behind [[multimodalFrameSample]]'s 1→N contract
    * (r14 verdict "missing" #2): MJPEG — each frame its own JPEG, so
    * the JDK's javax.imageio JPEG reader decodes every frame with no
    * new dependency. Every [[FrameStride]]-th frame (by position in the
    * stream, the X25 keyframe-sampling shape) is decoded; frames
    * ImageIO rejects drop row-wise. Opt-in like the image/audio arms;
    * the registered key stays on the byte stub (a SQL oracle cannot
    * decode JPEG entropy coding) — MultimodalCodecSpec pins this path
    * on generated MJPEG bytes.
    */
  def mjpegFrameDecode(rows: Iterator[MediaRow]): Iterator[DecodedFrame] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.flatMap { r =>
      splitMjpeg(r.payload).zipWithIndex
        .filter(_._2 % FrameStride == 0)
        .flatMap { case (bytes, i) =>
          decodeImage(bytes).map { im =>
            DecodedFrame(r.doc_id, i.toLong, im.getWidth.toLong,
              im.getHeight.toLong, pixelSig8(im, md))
          }
        }
    }
  }

  // ---------------------- real image codec UNDER the oracle gate (r15)

  /** Thumbnail statistics leaving [[imageThumbStats]]: decoded geometry,
    * the fit-box thumbnail dims, and the per-channel BIGINT sums over
    * the thumbnail's pixels. The thumbnail pixels are [[areaAverage]]'s
    * per-box integer means, so the sums are exact integers both engines
    * can agree on — no float image math anywhere.
    */
  final case class ThumbStats(
      doc_id: Long, width: Long, height: Long, thumb_w: Long, thumb_h: Long,
      r_sum: Long, g_sum: Long, b_sum: Long)

  /** REAL decode + REAL thumbnail behind the 1→1 partition-wise
    * contract: javax.imageio decode, [[fitBox]] + [[areaAverage]], then
    * integer channel sums of the thumbnail. Undecodable payloads drop
    * carbon-style like the other real arms.
    */
  /** Per-channel integer sums over ALL pixels of `im` — the one shared
    * getRGB shift-and-mask fold ([[imageThumbStats]] runs it on the
    * thumbnail, the frozen codec canary on the full decode; r17 review
    * removed the hand-rolled copies).
    */
  private[ops] def channelSums(
      im: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var (rs, gs, bs) = (0L, 0L, 0L)
    var y = 0
    while (y < im.getHeight) {
      var x = 0
      while (x < im.getWidth) {
        val p = im.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
        x += 1
      }
      y += 1
    }
    (rs, gs, bs)
  }

  def imageThumbStats(rows: Iterator[MediaRow]): Iterator[ThumbStats] =
    rows.flatMap { r =>
      decodeImage(r.payload).map { im =>
        val (tw, th) = fitBox(im.getWidth, im.getHeight, ThumbPx)
        val (rs, gs, bs) = channelSums(areaAverage(im, tw, th))
        ThumbStats(r.doc_id, im.getWidth.toLong, im.getHeight.toLong,
          tw.toLong, th.toLong, rs, gs, bs)
      }
    }

  /** Deterministic per-doc fixture geometry for [[multimodalDecodeReal]]:
    * 40–63 × 33–48 px — always strictly LARGER than the [[ThumbPx]] box
    * in both dimensions, so the thumbnail is a genuine downscale and
    * (w > tw, h > th strictly) the floor boxes tile exactly with no
    * degenerate widening — which is what makes the oracle's closed-form
    * inverse box map (`((x+1)·tw − 1) // w`) provably exact.
    */
  private[ops] def fixtureDims(id: Long): (Int, Int) =
    ((40 + id % 24).toInt, (33 + (id * 3) % 16).toInt)

  /** Deterministic fixture pixel: each channel a small integer affine of
    * (x, y, doc_id) mod 256 — trivially re-derivable in SQL.
    */
  private[ops] def fixturePixel(id: Long, x: Int, y: Int): (Int, Int, Int) =
    (((x * 7 + y * 13 + id) % 256).toInt,
      ((x * 3 + y * 5 + id * 11) % 256).toInt,
      ((x + y + id * 7) % 256).toInt)

  /** A minimal UNCOMPRESSED 24-bpp BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes. Chosen
    * over PNG for the fixture because the payload is raw pixels — a
    * reader (or an auditor with a hex dump) can re-derive every pixel
    * from the bytes with pure arithmetic, no decompressor needed.
    */
  private[ops] def bmp24(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = w * 3
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** `multimodal_decode_real`: the REAL image-codec arm under the driver
    * oracle (r14 verdict "missing" #1). Per document a deterministic
    * uncompressed BMP is synthesized ([[fixtureDims]]/[[fixturePixel]] —
    * raw BGR bytes, nothing compressed), then the REAL javax.imageio
    * decoder reads it back and the REAL integer area-average thumbnail
    * runs, emitting exact per-channel sums. The oracle re-derives the
    * identical integers from the same pixel arithmetic in pure SQL —
    * so a wrong header, a row-padding slip, an upside-down decode, or
    * any non-integer resample shows up as a hash mismatch. The byte-stub
    * `multimodal_*` keys are untouched.
    *
    * At 100 TB the fixture synthesis is replaced by reading the media
    * column; the decode/thumbnail stage is the same partition-wise 1→1
    * batch map with no shuffle — cost scales linearly with payload bytes
    * and parallelizes per file split.
    */
  def multimodalDecodeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // repartition the 8-byte id column BEFORE the codec map: the corpus
    // table is one small parquet split, and without the fan-out the
    // whole decode+thumbnail loop runs on ONE core (measured 2.1 s →
    // 0.6 s at sf0.1/local[32]). The exchange moves ids only — the
    // payloads are synthesized after it. At 100 TB a real media column
    // arrives in thousands of splits and this fan-out is the free
    // file-level parallelism instead.
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism).as[Long]
    ids.mapPartitions { it =>
      imageThumbStats(it.map { id =>
        val (w, h) = fixtureDims(id)
        MediaRow(id, bmp24(w, h, (x, y) => fixturePixel(id, x, y)), 0L)
      })
    }.toDF()
      .select(col("doc_id"), col("width"), col("height"), col("thumb_w"),
        col("thumb_h"), col("r_sum"), col("g_sum"), col("b_sum"))
      .orderBy("doc_id")
  }

  /** Deterministic per-doc audio fixture for [[multimodalAudioReal]]:
    * mono/stereo alternating by id, 800–1299 frames — deliberately
    * straddling the [[AudioProbeFrames]] = 1024 window so both the
    * full-window and short-payload probe paths are under the gate.
    */
  private[ops] def audioFixtureGeo(id: Long): (Int, Int) =
    ((1 + id % 2).toInt, (800 + (id * 7) % 500).toInt)

  /** Deterministic fixture sample for frame `i`, channel `c`: an affine
    * mod into −2000..2000 — signed-16-bit safe, SQL re-derivable.
    */
  private[ops] def audioFixtureSample(id: Long, i: Int, c: Int): Int =
    ((i.toLong * 37 + c.toLong * 101 + id * 13) % 4001).toInt - 2000

  /** A minimal canonical PCM WAV: 44-byte RIFF/fmt/data header +
    * interleaved little-endian signed-16-bit frames. Hand-rolled (like
    * [[bmp24]]) so the payload bytes are pure arithmetic — re-derivable
    * without any encoder in the loop.
    */
  private[ops] def wav16(rate: Int, channels: Int, frames: Int,
      sample: (Int, Int) => Int): Array[Byte] = {
    val dataLen = frames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) { buf.putShort(sample(i, c).toShort); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** Fixture sample rate for [[multimodalAudioReal]]. */
  val AudioFixtureRate = 8000

  /** `multimodal_audio_real`: the REAL audio-codec arm under the driver
    * oracle — the WAV sibling of [[multimodalDecodeReal]]. Per document
    * a canonical PCM WAV is synthesized ([[audioFixtureGeo]]/
    * [[audioFixtureSample]]), the REAL javax.sound.sampled decoder
    * reads it back ([[audioDecode]]: header parse, frame geometry, PCM
    * extraction), and the integer loudness probe folds channel 0 over
    * the leading [[AudioProbeFrames]] frames. The oracle re-derives
    * geometry and probe from the same arithmetic — a header slip, an
    * endianness bug, a channel-interleave mistake, or a probe-window
    * off-by-one is a hash mismatch at the driver.
    */
  def multimodalAudioReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // same 8-byte-id fan-out as multimodalDecodeReal: one small parquet
    // split would serialize the whole synthesis+decode loop on one core
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism).as[Long]
    ids.mapPartitions { it =>
      audioDecode(it.map { id =>
        val (ch, frames) = audioFixtureGeo(id)
        MediaRow(id, wav16(AudioFixtureRate, ch, frames,
          (i, c) => audioFixtureSample(id, i, c)), 0L)
      })
    }.toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("n_frames"), col("mean_abs"))
      .orderBy("doc_id")
  }

  /** Oracle: geometry straight from the fixture arithmetic; the probe
    * as the identical integer fold over channel 0 of the leading
    * `min(n_frames, AudioProbeFrames)` frames.
    */
  val multimodalAudioRealSql: String =
    s"""WITH geo AS (
       |  SELECT doc_id,
       |         CAST(1 + doc_id % 2 AS BIGINT) AS channels,
       |         CAST(800 + (doc_id * 7) % 500 AS BIGINT) AS n_frames
       |  FROM documents)
       |SELECT g.doc_id, CAST($AudioFixtureRate AS BIGINT) AS sample_rate,
       |       g.channels, g.n_frames,
       |       CAST(sum(abs((gi.i * 37 + g.doc_id * 13) % 4001 - 2000))
       |            // count(*) AS BIGINT) AS mean_abs
       |FROM geo g,
       |     unnest(generate_series(0, least(g.n_frames, $AudioProbeFrames) - 1))
       |       AS gi(i)
       |GROUP BY g.doc_id, g.channels, g.n_frames
       |ORDER BY g.doc_id""".stripMargin

  /** Oracle: the fixture's pixel lattice via correlated generate_series,
    * each pixel assigned to its thumbnail box by the closed-form inverse
    * (exact here — strict downscale, see [[fixtureDims]]), per-box
    * integer means, then per-doc channel sums. Every step is integer
    * arithmetic; `//` is DuckDB floor division (operands non-negative).
    */
  val multimodalDecodeRealSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |         CAST(40 + doc_id % 24 AS BIGINT) AS w,
       |         CAST(33 + (doc_id * 3) % 16 AS BIGINT) AS h
       |  FROM documents),
       |boxed AS (
       |  SELECT doc_id, w, h,
       |         CAST(CASE WHEN w >= h THEN $ThumbPx
       |              ELSE greatest(1, (w * $ThumbPx) // h) END AS BIGINT) AS tw,
       |         CAST(CASE WHEN w >= h THEN greatest(1, (h * $ThumbPx) // w)
       |              ELSE $ThumbPx END AS BIGINT) AS th
       |  FROM dims),
       |px AS (
       |  SELECT d.doc_id, d.w, d.h, d.tw, d.th,
       |         ((gx.x + 1) * d.tw - 1) // d.w AS ox,
       |         ((gy.y + 1) * d.th - 1) // d.h AS oy,
       |         (gx.x * 7 + gy.y * 13 + d.doc_id) % 256 AS r,
       |         (gx.x * 3 + gy.y * 5 + d.doc_id * 11) % 256 AS g,
       |         (gx.x + gy.y + d.doc_id * 7) % 256 AS b
       |  FROM boxed d,
       |       unnest(generate_series(0, d.w - 1)) AS gx(x),
       |       unnest(generate_series(0, d.h - 1)) AS gy(y)),
       |means AS (
       |  SELECT doc_id, w, h, tw, th, ox, oy,
       |         sum(r) // count(*) AS rm,
       |         sum(g) // count(*) AS gm,
       |         sum(b) // count(*) AS bm
       |  FROM px GROUP BY doc_id, w, h, tw, th, ox, oy)
       |SELECT doc_id, w AS width, h AS height, tw AS thumb_w, th AS thumb_h,
       |       CAST(sum(rm) AS BIGINT) AS r_sum,
       |       CAST(sum(gm) AS BIGINT) AS g_sum,
       |       CAST(sum(bm) AS BIGINT) AS b_sum
       |FROM means GROUP BY doc_id, w, h, tw, th
       |ORDER BY doc_id""".stripMargin

  // ----------------- video frame GEOMETRY under the oracle gate (r16)

  /** Per-doc MJPEG fixture geometry (r15 verdict "missing" #2): frame
    * count 1..7, per-frame COM-payload / scan-data / inter-frame-gap
    * byte counts — all affine mods of (doc_id, frame index), so the
    * oracle re-derives every offset in closed form. Frame i's total
    * length is `14 + com + scan` (SOI 2, COM 4+com, SOS 6, scan, EOI 2).
    */
  private[ops] def videoFixtureFrames(id: Long): Int = (1 + id % 7).toInt
  private[ops] def videoFixtureCom(id: Long, i: Int): Int =
    ((id * 11 + i * 5) % 40 + 4).toInt
  private[ops] def videoFixtureScan(id: Long, i: Int): Int =
    ((id * 3 + i * 17) % 60 + 8).toInt
  private[ops] def videoFixtureGap(id: Long, i: Int): Int =
    ((id + i * 13) % 9).toInt

  /** Hand-rolled structurally-valid MJPEG stream: each frame a marker
    * SKELETON (SOI, a COM segment, a minimal SOS, scan bytes, EOI) that
    * [[mjpegFrameSpans]]' walk parses exactly, separated by zero-byte
    * garbage gaps and a trailing tail. Frames are NOT decodable images
    * — JPEG entropy coding is not SQL-re-derivable, so this fixture
    * gates frame GEOMETRY (count, offsets, lengths, which frames the
    * stride samples) and pixel checks stay with MultimodalCodecSpec's
    * real-decode specs. All payload bytes are < 0x7F, so no fake SOI or
    * marker can arise outside the written structure.
    */
  private[ops] def mjpegFixture(id: Long): Array[Byte] = {
    val n = videoFixtureFrames(id)
    val out = new java.io.ByteArrayOutputStream()
    for (i <- 0 until n) {
      for (_ <- 0 until videoFixtureGap(id, i)) out.write(0x00)
      out.write(0xff); out.write(0xd8)                    // SOI
      val p = videoFixtureCom(id, i)
      out.write(0xff); out.write(0xfe)                    // COM, len = p+2
      out.write((p + 2) >> 8); out.write((p + 2) & 0xff)
      for (j <- 0 until p) out.write(((id + i * 7 + j) % 0x7f).toInt)
      out.write(0xff); out.write(0xda)                    // SOS, len 4
      out.write(0); out.write(4)
      out.write(1); out.write(2)
      for (j <- 0 until videoFixtureScan(id, i)) out.write((j * 31 + i) % 0x7f)
      out.write(0xff); out.write(0xd9)                    // EOI
    }
    for (_ <- 0 until (id % 5).toInt) out.write(0x00)     // trailing tail
    out.toByteArray
  }

  /** One sampled frame's geometry leaving [[multimodalVideoGeometry]]. */
  final case class FrameGeo(doc_id: Long, n_frames: Long, frame_idx: Long,
    byte_offset: Long, frame_len: Long)

  /** `multimodal_video_geometry`: the video sibling of the image/audio
    * real-codec gates — the MJPEG marker walk's frame count, sampled
    * frame indexes (the X25 1→[[FrameStride]] contract), byte offsets
    * and lengths, all re-derived arithmetically by the oracle from the
    * [[mjpegFixture]] closed forms. A walk defect (a mis-skipped
    * segment, an off-by-one span, a wrong stride) is a hash mismatch at
    * the driver. Same 8-byte id fan-out as the other codec keys; at
    * 100 TB the synthesis is replaced by the media column and the walk
    * stays a partition-wise 1→N flatMap with no shuffle.
    */
  def multimodalVideoGeometry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism).as[Long]
    ids.mapPartitions { it =>
      it.flatMap { id =>
        val payload = mjpegFixture(id)
        val spans = mjpegFrameSpans(payload).toArray
        spans.iterator.zipWithIndex
          .filter(_._2 % FrameStride == 0)
          .map { case ((st, en), i) =>
            FrameGeo(id, spans.length.toLong, i.toLong, st.toLong,
              (en - st).toLong)
          }
      }
    }.toDF()
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        col("byte_offset"), col("frame_len"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Oracle: the fixture arithmetic verbatim — per-frame lengths
    * `14 + com + scan`, offsets as the running sum of prior frames and
    * gaps plus the frame's own leading gap, count from the inclusive
    * series, stride by `i % FrameStride`.
    */
  val multimodalVideoGeometrySql: String =
    s"""WITH f AS (
       |  SELECT d.doc_id, CAST(gi.i AS BIGINT) AS i,
       |         (d.doc_id * 11 + gi.i * 5) % 40 + 4 AS com,
       |         (d.doc_id * 3 + gi.i * 17) % 60 + 8 AS scan,
       |         (d.doc_id + gi.i * 13) % 9 AS gap
       |  FROM documents d,
       |       unnest(generate_series(0, d.doc_id % 7)) AS gi(i)),
       |geo AS (
       |  SELECT doc_id, i, 14 + com + scan AS len, gap,
       |         coalesce(sum(14 + com + scan + gap) OVER (
       |           PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS prior,
       |         count(*) OVER (PARTITION BY doc_id) AS n_frames
       |  FROM f)
       |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames, i AS frame_idx,
       |       CAST(prior + gap AS BIGINT) AS byte_offset,
       |       CAST(len AS BIGINT) AS frame_len
       |FROM geo WHERE i % $FrameStride = 0
       |ORDER BY doc_id, frame_idx""".stripMargin
}

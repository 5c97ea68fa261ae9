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
    * uploads).
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
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getFrameSize <= 0 || fmt.getFrameSize > 128 ||
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
        Some((fmt, in.getFrameLength, java.util.Arrays.copyOf(buf, got)))
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
}

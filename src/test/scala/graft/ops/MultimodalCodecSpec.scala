package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the REAL image-codec arm of the multimodal family (r14 — the
  * javax.imageio opt-in behind [[Multimodal.imageDecode]] /
  * [[Multimodal.imageResize]]). The synthetic corpus carries no real
  * images, so the spec generates PNG and BMP bytes in-test: a 64×48
  * deterministic gradient, encoded with the same JDK ImageIO the codec
  * decodes with. The byte-stub arm (the oracle-checked `multimodal_*`
  * keys) is untouched — these tests drive the codec through the SAME
  * Dataset/mapPartitions plumbing to prove the contract holds with a
  * real decoder plugged in.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A w×h RGB gradient whose pixel (x, y) is deterministic in (x, y). */
  private def gradient(w: Int, h: Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y,
        (((x * 255 / math.max(1, w - 1)) << 16) |
          ((y * 255 / math.max(1, h - 1)) << 8) | ((x + y) % 256)))
    im
  }

  private def encode(im: java.awt.image.BufferedImage,
      fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  test("imageDecode reads real PNG/BMP dims; undecodable payloads drop") {
    import spark.implicits._
    val png = encode(gradient(64, 48), "png")
    val bmp = encode(gradient(10, 200), "bmp")
    val junk = "not an image at all".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, png, png.length.toLong),
      Multimodal.MediaRow(2L, bmp, bmp.length.toLong),
      Multimodal.MediaRow(3L, junk, junk.length.toLong))
    val out = spark.createDataset(rows).repartition(2)
      .mapPartitions(Multimodal.imageDecode)
      .collect().map(f => f.doc_id -> f).toMap
    // the truncated/garbage payload DROPPED, carbon-style — not fatal
    assert(out.keySet == Set(1L, 2L))
    assert((out(1L).width, out(1L).height) == (64L, 48L))
    assert((out(2L).width, out(2L).height) == (10L, 200L))
    // byte_len and sig8 keep the stub arm's meaning: of the raw payload
    assert(out(1L).byte_len == png.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out(1L).sig8 ==
      md.digest(png).map("%02x".format(_)).mkString.substring(0, 8))
  }

  test("imageResize thumbnails fit the box, aspect preserved, decodable") {
    import spark.implicits._
    val wide = encode(gradient(64, 48), "png")   // → 32×24
    val tall = encode(gradient(10, 200), "bmp")  // → 1×32 (floor, min 1)
    val tiny = encode(gradient(5, 7), "png")     // ≤ box: NOT upscaled
    val rows = Seq(
      Multimodal.MediaRow(1L, wide, 0L),
      Multimodal.MediaRow(2L, tall, 0L),
      Multimodal.MediaRow(3L, tiny, 0L))
    val out = spark.createDataset(rows).repartition(2)
      .mapPartitions(Multimodal.imageResize)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // thumbnails round-trip through ImageIO at the fitBox dimensions
    def dims(id: Long, payload: Array[Byte]): (Int, Int) = {
      // re-derive the encoded thumbnail via the same deterministic path
      val im = Multimodal.decodeImage(payload).get
      val (ow, oh) = Multimodal.fitBox(
        im.getWidth, im.getHeight, Multimodal.ThumbPx)
      (ow, oh)
    }
    assert(dims(1L, wide) == (32, 24))
    assert(dims(2L, tall) == (1, 32))
    assert(dims(3L, tiny) == (5, 7))
    // out_len is the encoded PNG's size (same-JVM recompute matches);
    // out_sig8 is the md5 of the PIXELS — the JVM-independent identity
    // (PNG encoder bytes are implementation-defined, so hashing them
    // would split signature-keyed dedup across JDK builds)
    val im = Multimodal.decodeImage(wide).get
    val thumb = Multimodal.areaAverage(im, 32, 24)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(thumb, "png", baos)
    assert(out(1L).out_len == baos.size().toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out(1L).out_sig8 == Multimodal.pixelSig8(thumb, md))
    // pixel identity distinguishes different thumbnails
    assert(out(1L).out_sig8 != out(2L).out_sig8)
  }

  test("areaAverage equals an independent integer-box recompute") {
    val im = gradient(64, 48)
    val got = Multimodal.areaAverage(im, 32, 24)
    for (oy <- 0 until 24; ox <- 0 until 32) {
      val (x0, x1) = (ox * 64 / 32, math.max(ox * 64 / 32 + 1, (ox + 1) * 64 / 32))
      val (y0, y1) = (oy * 48 / 24, math.max(oy * 48 / 24 + 1, (oy + 1) * 48 / 24))
      var (rs, gs, bs, n) = (0L, 0L, 0L, 0L)
      for (y <- y0 until y1; x <- x0 until x1) {
        val p = im.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff; n += 1
      }
      val want = (((rs / n) << 16) | ((gs / n) << 8) | (bs / n)).toInt
      assert((got.getRGB(ox, oy) & 0xffffff) == want, s"pixel ($ox,$oy)")
    }
  }

  test("fitBox: never upscales, floors aspect, never drops below 1 px") {
    assert(Multimodal.fitBox(64, 48, 32) == (32, 24))
    assert(Multimodal.fitBox(48, 64, 32) == (24, 32))
    assert(Multimodal.fitBox(5, 7, 32) == (5, 7))
    assert(Multimodal.fitBox(10, 200, 32) == (1, 32))
    assert(Multimodal.fitBox(200, 10, 32) == (32, 1))
    assert(Multimodal.fitBox(32, 32, 32) == (32, 32))
  }

  /** Synthesize a 16-bit little-endian PCM WAV: `n` frames of a square
    * wave of amplitude `amp` (alternating +amp/−amp per frame — the
    * mean |sample| is exactly `amp`, making the probe's integer math
    * checkable without float audio DSP).
    */
  private def wav(n: Int, amp: Short, rate: Float = 8000f,
      channels: Int = 1): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](n * 2 * channels)
    for (i <- 0 until n; c <- 0 until channels) {
      val v: Short = if (i % 2 == 0) amp else (-amp).toShort
      val off = (i * channels + c) * 2
      pcm(off) = (v & 0xff).toByte
      pcm(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("audioDecode reads WAV geometry and the integer loudness probe") {
    import spark.implicits._
    val a = wav(2000, 1000)           // longer than the 1024-frame probe
    val b = wav(100, 7, channels = 2) // shorter than the probe window
    val junk = "definitely not audio".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, a, 0L),
      Multimodal.MediaRow(2L, b, 0L),
      Multimodal.MediaRow(3L, junk, 0L))
    val out = spark.createDataset(rows).repartition(2)
      .mapPartitions(Multimodal.audioDecode)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out.keySet == Set(1L, 2L)) // junk DROPPED, not fatal
    assert(out(1L).sample_rate == 8000L && out(1L).channels == 1L)
    assert(out(1L).n_frames == 2000L)
    // square wave of amplitude 1000: mean |sample| is exactly 1000
    assert(out(1L).mean_abs == 1000L)
    assert(out(2L).channels == 2L && out(2L).n_frames == 100L)
    assert(out(2L).mean_abs == 7L)
  }

  test("stub keys unchanged: the codec arm does not touch the oracle arm") {
    // the registered queries still run the byte stub (dims from
    // metadata arithmetic, not pixels) — pin one representative value
    val dir = "/root/testdata/sf0.001"
    val r = Multimodal.multimodalExtract(spark, dir).limit(1).collect().head
    val nChars = spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") === r.getLong(0))
      .collect().head.getAs[Long]("n_chars")
    assert(r.getLong(3) == nChars % 640)
    assert(r.getLong(4) == (nChars * 7) % 480)
  }
}

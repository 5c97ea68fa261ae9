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

  test("multimodal_decode_real: BMP fixture round-trips the REAL decoder") {
    // the oracle-gated key (r15): synthesized uncompressed BMP → REAL
    // javax.imageio decode → REAL integer area-average thumbnail. Pin
    // (a) a full independent recompute for every doc — straight from
    // fixturePixel, floor boxes, integer means, NOT through areaAverage
    // or the BMP bytes — and (b) two rows against values computed by a
    // SEPARATE engine (DuckDB, running multimodalDecodeRealSql), so the
    // spec fails if either engine's arithmetic drifts.
    val out = Multimodal.multimodalDecodeReal(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out.size == 500)
    assert(out(0L) == ((40L, 33L, 32L, 26L, 104360L, 109448L, 28664L)))
    assert(out(123L) == ((43L, 34L, 32L, 25L, 102849L, 116623L, 103446L)))
    for ((id, (w, h, tw, th, rs, gs, bs)) <- out) {
      val (ew, eh) = Multimodal.fixtureDims(id)
      assert((w, h) == ((ew.toLong, eh.toLong)), s"dims doc $id")
      val (etw, eth) = Multimodal.fitBox(ew, eh, Multimodal.ThumbPx)
      assert((tw, th) == ((etw.toLong, eth.toLong)), s"thumb dims doc $id")
      var (ers, egs, ebs) = (0L, 0L, 0L)
      for (oy <- 0 until eth; ox <- 0 until etw) {
        val (x0, x1) = (ox * ew / etw, (ox + 1) * ew / etw)
        val (y0, y1) = (oy * eh / eth, (oy + 1) * eh / eth)
        var (sr, sg, sb, n) = (0L, 0L, 0L, 0L)
        for (y <- y0 until y1; x <- x0 until x1) {
          val (r, g, b) = Multimodal.fixturePixel(id, x, y)
          sr += r; sg += g; sb += b; n += 1
        }
        ers += sr / n; egs += sg / n; ebs += sb / n
      }
      assert((rs, gs, bs) == ((ers, egs, ebs)), s"channel sums doc $id")
    }
  }

  test("bmp24 payload bytes are the documented raw layout") {
    // 2×2 image with distinct channel values; row stride pads 6 → 8
    val b = Multimodal.bmp24(2, 2, (x, y) => (10 * (x + 1), 20 * (y + 1), x + y))
    assert(b.length == 54 + 16)
    assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    // bottom-up: first stored row is y=1 → pixel (0,1) = (10, 40, 1) as BGR
    assert((b(54), b(55), b(56)) == ((1.toByte, 40.toByte, 10.toByte)))
    // and ImageIO agrees with the formula at every pixel
    val im = Multimodal.decodeImage(b).get
    for (y <- 0 until 2; x <- 0 until 2) {
      val p = im.getRGB(x, y)
      assert((((p >> 16) & 0xff), ((p >> 8) & 0xff), (p & 0xff)) ==
        ((10 * (x + 1), 20 * (y + 1), x + y)), s"pixel ($x,$y)")
    }
  }

  test("mjpegFrameDecode samples and really decodes generated MJPEG") {
    import spark.implicits._
    // 8 JPEG frames of distinct sizes, concatenated — a valid MJPEG
    // stream; plus inter-frame garbage and a truncated final frame
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(gradient(w, h), "jpg", baos))
      baos.toByteArray
    }
    val frames = (0 until 8).map(i => jpeg(16 + 2 * i, 12 + i))
    val clean = frames.reduce(_ ++ _)
    val messy = "junk".getBytes("UTF-8") ++ frames(0) ++
      "pad".getBytes("UTF-8") ++ frames(1) ++
      frames(2).dropRight(4) // truncated tail: no EOI → dropped
    val rows = Seq(
      Multimodal.MediaRow(1L, clean, 0L),
      Multimodal.MediaRow(2L, messy, 0L),
      Multimodal.MediaRow(3L, "not video".getBytes("UTF-8"), 0L))
    val out = spark.createDataset(rows).repartition(2)
      .mapPartitions(Multimodal.mjpegFrameDecode)
      .collect().groupBy(_.doc_id)
    // doc 1: 8 frames, stride 3 → indices 0, 3, 6; REAL decoded dims
    val d1 = out(1L).sortBy(_.frame_idx)
    assert(d1.map(_.frame_idx).toSeq == Seq(0L, 3L, 6L))
    assert(d1.map(f => (f.width, f.height)).toSeq ==
      Seq((16L, 12L), (22L, 15L), (28L, 18L)))
    // distinct content → distinct pixel signatures
    assert(d1.map(_.sig8).distinct.length == 3)
    // doc 2: garbage skipped, truncated tail dropped → 2 whole frames,
    // sampled at stride 3 → only index 0 survives
    assert(out(2L).map(_.frame_idx).toSeq == Seq(0L))
    assert((out(2L).head.width, out(2L).head.height) == ((16L, 12L)))
    // doc 3: no SOI/EOI at all → no frames, row-wise drop, no failure
    assert(!out.contains(3L))
  }

  test("splitMjpeg is exact on marker boundaries") {
    val f0 = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gradient(8, 8), "jpg", baos)
      baos.toByteArray
    }
    // frames re-split to the exact original byte spans
    val got = Multimodal.splitMjpeg(f0 ++ f0 ++ f0).toSeq
    assert(got.length == 3 && got.forall(_.sameElements(f0)))
    assert(Multimodal.splitMjpeg(Array[Byte]()).isEmpty)
    assert(Multimodal.splitMjpeg("no markers".getBytes("UTF-8")).isEmpty)
  }

  test("splitMjpeg survives FF D9 bytes inside marker-segment payloads") {
    // a length-delimited segment may LEGALLY contain the EOI byte pair
    // (quant value 255,217; comment text; an EXIF thumbnail's own EOI).
    // Inject a COM segment whose payload embeds FF D9 right after SOI:
    // the marker walk must skip it by length and return the WHOLE
    // frame; the r15 naive byte scan split here and dropped the frame.
    val f0 = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gradient(8, 8), "jpg", baos)
      baos.toByteArray
    }
    val payload = Array[Byte](1, 0xff.toByte, 0xd9.toByte, 2) // FF D9 inside
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0, (2 + payload.length).toByte) ++ payload
    val poisoned = f0.take(2) ++ com ++ f0.drop(2) // SOI, COM, rest
    val got = Multimodal.splitMjpeg(poisoned ++ f0).toSeq
    assert(got.length == 2, s"expected 2 frames, got ${got.length}")
    assert(got.head.sameElements(poisoned) && got(1).sameElements(f0))
    // and the poisoned frame still REALLY decodes (ImageIO skips COM)
    assert(Multimodal.decodeImage(got.head).exists(im =>
      im.getWidth == 8 && im.getHeight == 8))
    // a structurally truncated frame is dropped, later frames survive
    val got2 = Multimodal.splitMjpeg(f0.dropRight(6) ++ f0).toSeq
    assert(got2.length == 1 && got2.head.sameElements(f0))
  }

  test("splitMjpeg handles FF fill bytes before a marker in scan data") {
    // the spec allows any run of FF fill bytes before a marker, so
    // FF FF D9 inside entropy-coded data is a fill byte + EOI. The r15
    // in-scan walk advanced TWO bytes on FF FF, skipping the real
    // marker start and dropping the frame (r15 advice); advancing one
    // byte lets the second FF begin the EOI pair.
    val f0 = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gradient(8, 8), "jpg", baos)
      baos.toByteArray
    }
    val filled = f0.dropRight(2) ++ Array(0xff.toByte) ++ f0.takeRight(2)
    val got = Multimodal.splitMjpeg(filled ++ f0).toSeq
    assert(got.length == 2, s"expected 2 frames, got ${got.length}")
    assert(got.head.sameElements(filled) && got(1).sameElements(f0))
    // decoders skip fill bytes: the filled frame still REALLY decodes
    assert(Multimodal.decodeImage(got.head).exists(im =>
      im.getWidth == 8 && im.getHeight == 8))
    // a LONE trailing FF (no marker after) stays an unterminated frame
    val got3 = Multimodal.splitMjpeg(f0.dropRight(2) :+ 0xff.toByte).toSeq
    assert(got3.isEmpty)
  }

  test("mjpegFixture geometry: walk spans equal the closed forms") {
    // the multimodal_video_geometry oracle re-derives offsets/lengths
    // arithmetically; this pins the ENGINE walk to the same closed
    // forms across ids covering every frame-count residue 1..7
    for (id <- 0L until 32L) {
      val payload = Multimodal.mjpegFixture(id)
      val spans = Multimodal.mjpegFrameSpans(payload).toSeq
      val n = Multimodal.videoFixtureFrames(id)
      assert(spans.length == n, s"id=$id frames=${spans.length} want $n")
      var cursor = 0
      for (i <- 0 until n) {
        val start = cursor + Multimodal.videoFixtureGap(id, i)
        val len = 14 + Multimodal.videoFixtureCom(id, i) +
          Multimodal.videoFixtureScan(id, i)
        assert(spans(i) == ((start, start + len)),
          s"id=$id frame=$i span=${spans(i)} want ($start, ${start + len})")
        cursor = start + len
      }
      // every frame is a structurally valid marker skeleton the split
      // reproduces byte-identically
      val frames = Multimodal.splitMjpeg(payload).toSeq
      assert(frames.length == n &&
        frames.zip(spans).forall { case (f, (s, e)) =>
          java.util.Arrays.equals(f,
            java.util.Arrays.copyOfRange(payload, s, e))
        })
    }
  }

  test("multimodal_audio_real: WAV fixture round-trips the REAL decoder") {
    // the audio sibling of the BMP gate: hand-rolled canonical WAV →
    // REAL javax.sound.sampled decode → integer probe. Pin (a) a full
    // independent recompute per doc straight from audioFixtureSample —
    // not through the WAV bytes or audioDecode — and (b) rows against
    // values computed by DuckDB running multimodalAudioRealSql.
    val out = Multimodal.multimodalAudioReal(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 500)
    assert(out(0L) == ((8000L, 1L, 800L, 1012L)))
    assert(out(123L) == ((8000L, 2L, 1161L, 981L)))
    for ((id, (rate, ch, frames, meanAbs)) <- out) {
      val (ech, efr) = Multimodal.audioFixtureGeo(id)
      assert((rate, ch, frames) == ((8000L, ech.toLong, efr.toLong)),
        s"geometry doc $id")
      val n = math.min(Multimodal.AudioProbeFrames, efr)
      val want = (0 until n)
        .map(i => math.abs(Multimodal.audioFixtureSample(id, i, 0)).toLong)
        .sum / n
      assert(meanAbs == want, s"probe doc $id")
    }
  }

  test("wav16 payload bytes are the documented canonical layout") {
    val b = Multimodal.wav16(8000, 2, 3, (i, c) => 100 * i + c - 50)
    assert(b.length == 44 + 3 * 2 * 2)
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(b, 8, 8, "US-ASCII") == "WAVEfmt ")
    assert(new String(b, 36, 4, "US-ASCII") == "data")
    // frame 1, channel 1 = 51 → little-endian at offset 44 + (1*2+1)*2
    val off = 44 + 3 * 2
    assert(((b(off) & 0xff) | (b(off + 1) << 8)).toShort == 51.toShort)
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

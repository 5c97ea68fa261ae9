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

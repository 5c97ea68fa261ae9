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
}

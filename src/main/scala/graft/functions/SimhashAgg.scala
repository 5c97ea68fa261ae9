package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** 64-bit SimHash fold as ONE typed `Aggregator` over the per-token
  * 64-bit hash column (escalation tier (b): custom typed aggregation —
  * same tier as [[TopKAgg]], no row UDF, no collect).
  *
  * Replaces the round-5 formulation of 64 separate `sum(expr(...))`
  * aggregates — 64 interpreted expression trees, each re-reading a hex
  * nibble of the md5 string PER TOKEN ROW — with a single buffer of 65
  * longs updated by a tight shift/mask loop (driver-measured at sf0.1:
  * `dedup_simhash` 2.28 s → 1.21 s cold including the shared
  * fingerprint-index build that key amortizes for its siblings; the
  * 64-buffer form was the one r5 bench regression). Partial/final
  * aggregation is preserved
  * (ObjectHashAggregate), so shuffle volume stays bounded by distinct
  * doc_ids exactly as before.
  *
  * Semantics are bit-identical to the SQL-oracle form (kept verbatim in
  * `Dedup.simhashCtes`): fingerprint bit k is the sign of
  * Σ_tokens (2·bit_k − 1), where bit_k of a token is bit (3 − k%4) of
  * hex nibble k/4 of md5(token) — i.e. bit (63 − k) of the first 16 hex
  * chars parsed big-endian, which is exactly the `h64` column this
  * aggregator consumes. Σ(2b−1) > 0 ⟺ 2·ones > n, so the buffer keeps
  * ones-counts plus the total instead of signed sums.
  */
final class SimhashAgg extends Aggregator[Long, Array[Long], Long] {

  /** buf(k) = count of tokens voting 1 for fingerprint bit k (k < 64);
    * buf(64) = total token count. In-place mutation is safe: Spark owns
    * the buffer object between serializations.
    */
  override def zero: Array[Long] = new Array[Long](65)

  override def reduce(buf: Array[Long], h64: Long): Array[Long] = {
    var k = 0
    while (k < 64) {
      buf(k) += (h64 >>> (63 - k)) & 1L
      k += 1
    }
    buf(64) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    val n = buf(64)
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (2L * buf(k) > n) fp |= 1L << k
      k += 1
    }
    fp
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimhashAgg {
  private val fn = udaf(new SimhashAgg, Encoders.scalaLong)

  /** `simhash(h64)` — apply the fold to a per-token 64-bit hash column. */
  def apply(h64: Column): Column = fn(h64)
}

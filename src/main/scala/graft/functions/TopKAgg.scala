package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into [[TopKAgg]]. */
final case class ScoredId(cand_id: Long, score: Double)

/** Exact bounded top-k as a typed `Aggregator` — the SURVEY.md §2.9 note's
  * "exact streaming top-k heap" (escalation tier (b): custom typed
  * aggregation, still no UDF row-function and no collect).
  *
  * Semantics match the window form `row_number() OVER (ORDER BY score
  * DESC, cand_id) <= k` exactly: the buffer keeps the k best by
  * (score desc, cand_id asc) and merges associatively/commutatively, so
  * map-side partial aggregation bounds shuffle volume by k·#groups — at
  * 100 TB this replaces a per-group sort of ALL candidates with an O(k)
  * buffer per partition, the same partial/final shape as min/max.
  *
  * Buffer is a sorted Vector, not a heap: k is small (≤ tens), insertion
  * into a k-vector is cheaper than heap bookkeeping at this size, and a
  * Product-typed buffer keeps the Encoder columnar (no kryo blobs).
  */
final class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def insert(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    // skip the sort when a can't displace anything (the common case once
    // the buffer is warm)
    if (buf.size >= k) {
      val worst = buf.last
      if (a.score < worst.score ||
          (a.score == worst.score && a.cand_id >= worst.cand_id)) return buf
    }
    (buf :+ a).sortBy(x => (-x.score, x.cand_id)).take(k)
  }

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    insert(buf, a)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

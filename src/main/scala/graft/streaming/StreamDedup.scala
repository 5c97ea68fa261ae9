package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the streaming form of
  * [[graft.ops.Dedup.dedupExact]] for a continuously-arriving corpus
  * (crawl firehose): each document is tagged `is_first` the moment it
  * arrives, against ALL history, not just its micro-batch.
  *
  * `flatMapGroupsWithState` keyed by the content hash holds one tiny
  * state per distinct hash: the canonical (first-seen, min doc_id
  * within its arrival batch) document id. Within one micro-batch the
  * group's unseen minimum gets `is_first = true` (the same deterministic
  * winner batch dedup picks); every later arrival of that hash — same
  * batch or any later one — is emitted `is_first = false` with the
  * canonical id attached, so a downstream sink can either drop dups or
  * log the lineage.
  *
  * Scale notes (100 TB firehose): state is one (hash-key → long) entry
  * per DISTINCT document ever seen — the minimum any exact dedup must
  * remember — hash-partitioned across executors by the group key;
  * arrivals shuffle once by that key. The key here is the 32-hex md5
  * STRING (~32 B); a production deployment stores `unhex(text_hash)` —
  * 16-byte binary — to halve state and shuffle width, an
  * encoding-only change to [[DocArrival]]. Spark snapshots state in
  * the checkpoint, so the dedup decision is exactly-once across
  * restarts. No timeout: an exact-dedup horizon is a business
  * decision — pass a TTL via
  * [[GroupStateTimeout.ProcessingTimeTimeout]] in a bounded variant.
  */
object StreamDedup {

  /** One arriving document: its id and 32-hex md5 of the text. */
  case class DocArrival(doc_id: Long, text_hash: String)

  /** The dedup decision for one arrival. `canonical_id` is the id that
    * owns this content (itself iff `is_first`).
    */
  case class DedupDecision(doc_id: Long, text_hash: String,
      is_first: Boolean, canonical_id: Long)

  private def decide(
      hash: String,
      arrivals: Iterator[DocArrival],
      state: GroupState[Long]): Iterator[DedupDecision] = {
    if (state.exists) {
      // known hash: every arrival is a dup — stream the (possibly huge,
      // skewed) group one-pass with no buffering and no sort
      val canonical = state.get
      arrivals.map(d => DedupDecision(d.doc_id, hash, false, canonical))
    } else {
      // unseen hash: the smallest id in the batch wins — exactly the
      // min(doc_id) winner the batch operator picks. One O(n) min pass
      // (no sort), and EXACTLY ONE is_first even if an at-least-once
      // source delivered the winning (doc_id, hash) twice in the batch.
      val batch = arrivals.toSeq
      if (batch.isEmpty) return Iterator.empty
      val canonical = batch.iterator.map(_.doc_id).min
      state.update(canonical)
      val iMin = batch.indexWhere(_.doc_id == canonical)
      batch.iterator.zipWithIndex.map { case (d, i) =>
        DedupDecision(d.doc_id, hash, i == iMin, canonical)
      }
    }
  }

  /** Tag every arrival with its dedup decision (Append mode). */
  def dedupStream(docs: Dataset[DocArrival]): Dataset[DedupDecision] = {
    implicit val de = Encoders.product[DedupDecision]
    implicit val le = Encoders.scalaLong
    docs.groupByKey(_.text_hash)(Encoders.STRING)
      .flatMapGroupsWithState[Long, DedupDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (hash, it, st) => decide(hash, it, st))
  }
}

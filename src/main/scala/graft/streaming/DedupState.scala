package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup as custom per-key state (§2.10 pattern over
  * the LLM-pipeline dedup semantics): the stream keeps, per content
  * fingerprint, the smallest doc_id seen so far and the running copy
  * count — the incremental form of [[graft.ops.DedupOps.dedupExact]]'s
  * `groupBy(fp).agg(min(doc_id), count(*))`.
  *
  * Unlike sessionization there is NO ordering contract: min and count
  * are commutative over any batch interleaving, so an upserting sink
  * keyed by fingerprint converges to exactly the batch result under
  * arbitrary arrival order. Emission is per-key-per-batch: only keys
  * whose group actually received rows this batch emit (any arrival
  * changes n_copies, so every invocation IS a change).
  *
  * 100 TB posture: state is one tiny row per DISTINCT fingerprint —
  * the natural floor for exact dedup. For bounded-lateness dedup
  * (duplicates only arrive within a window), swap NoTimeout for
  * event-time timeout on a watermark so state evicts; the update fn
  * is unchanged.
  */
object DedupState {

  final case class Doc(doc_id: Long, fp: String)
  final case class Kept(fp: String, keep_doc_id: Long, n_copies: Long)

  def update(fp: String, docs: Iterator[Doc],
      state: GroupState[Kept]): Iterator[Kept] = {
    var minId = Long.MaxValue
    var n = 0L
    docs.foreach { d => if (d.doc_id < minId) minId = d.doc_id; n += 1 }
    if (n == 0) return Iterator.empty
    val next = state.getOption match {
      case None => Kept(fp, minId, n)
      case Some(k) => Kept(fp, math.min(k.keep_doc_id, minId), k.n_copies + n)
    }
    state.update(next)
    Iterator.single(next)
  }

  /** Works on both streaming and batch Datasets (batch = the
    * one-giant-batch degenerate case). */
  def dedup(docs: Dataset[Doc]): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming corpus intake through the retention funnel (§2.10 over
  * the T28 dataset-card gates): the stateless stages — nonempty,
  * language, quality, token bounds — are the SAME Column expressions
  * the batch funnel uses ([[graft.ops.TextOps.funnelFlags]]), applied
  * per micro-batch; the one stateful stage (exact-unique) runs through
  * [[DedupState]], whose min/count state is commutative over arrival
  * order.
  *
  * Batch ≡ stream: a doc survives the streaming intake iff it survives
  * the batch funnel's stage 5, and the final DedupState holds exactly
  * one keeper per surviving fingerprint with the batch funnel's
  * `min(doc_id)` — asserted in FunnelIntakeSpec under chunked
  * out-of-order arrival.
  *
  * 100 TB posture: the gates are narrow map work on each micro-batch;
  * dedup state is one row per distinct surviving fingerprint (the
  * exact-dedup floor); with a watermark the state evicts under the
  * bounded-lateness contract (see [[DedupState]]).
  */
object FunnelIntake {

  /** Stage-5 survivors of a (micro-)batch, keyed for dedup state. */
  def gate(docs: DataFrame): Dataset[DedupState.Doc] = {
    import docs.sparkSession.implicits._
    graft.ops.TextOps.funnelFlags(docs)
      .filter(col("s5"))
      .select(col("doc_id"), col("fp"))
      .as[DedupState.Doc]
  }

  /** Full intake: gates + stateful exact-unique. Works on a streaming
    * Dataset (micro-batched) and on a batch one (single giant batch). */
  def intake(docs: DataFrame): Dataset[DedupState.Kept] =
    DedupState.dedup(gate(docs))
}

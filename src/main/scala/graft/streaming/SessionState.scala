package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization as custom streaming state (SURVEY §2.10's
  * per-key state pattern applied to the `ev_sessions` semantics): one
  * open session per user carried in `GroupState`, closed when an event
  * arrives more than [[gapUs]] after the previous one.
  *
  * Emitted in Update mode: every batch re-emits the affected session
  * rows keyed by (user_id, session_seq); an upserting sink (DocStore
  * merge semantics) converges to exactly the batch result —
  * batch ≡ stream equivalence is asserted in StreamingSpec against
  * [[graft.ops.EventOps.evSessions]].
  *
  * Ordering contract: events for a user must arrive in nondecreasing
  * event-time order ACROSS batches (within a batch any order is fine —
  * the update fn sorts its slice). A ts-range-partitioned source (or a
  * watermark + sort in a real deployment) provides this; equal-ts ties
  * straddling a batch boundary cannot flip a boundary because a zero
  * gap never closes a session.
  */
object SessionState {

  final case class SessEvent(user_id: Long, event_id: Long, tsu: Long)
  final case class SessRow(user_id: Long, session_seq: Long, n_events: Long,
      first_event: Long, last_event: Long)
  final case class OpenSession(lastTsu: Long, seq: Long, n: Long,
      first: Long, last: Long)

  /** 30 minutes, in microseconds — the `ev_sessions` gap. */
  val gapUs: Long = 30L * 60 * 1000 * 1000

  def update(userId: Long, events: Iterator[SessEvent],
      state: GroupState[OpenSession]): Iterator[SessRow] = {
    val evs = events.toArray.sortBy(e => (e.tsu, e.event_id))
    if (evs.isEmpty) return Iterator.empty
    var cur = state.getOption.orNull
    val out = scala.collection.mutable.ArrayBuffer.empty[SessRow]
    for (e <- evs) {
      if (cur == null) {
        cur = OpenSession(e.tsu, 1, 1, e.event_id, e.event_id)
      } else if (e.tsu - cur.lastTsu > gapUs) {
        out += SessRow(userId, cur.seq, cur.n, cur.first, cur.last)
        cur = OpenSession(e.tsu, cur.seq + 1, 1, e.event_id, e.event_id)
      } else {
        cur = OpenSession(e.tsu, cur.seq, cur.n + 1,
          math.min(cur.first, e.event_id), math.max(cur.last, e.event_id))
      }
    }
    out += SessRow(userId, cur.seq, cur.n, cur.first, cur.last)
    state.update(cur)
    out.iterator
  }

  /** Works on both streaming and batch Datasets (same state function —
    * the batch run is the one-giant-batch degenerate case). */
  def sessionize(events: Dataset[SessEvent]): Dataset[SessRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}

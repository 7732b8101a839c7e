package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key cursor state as a stateful streaming operator (SURVEY
  * §2.10): the reference keeps per-user timeline cursors (min_id /
  * max_id / direction / end) in the user document and flips the
  * backfill direction each run (`twitter_ingest_get_timeline/
  * main.py:40-51,100-111,180-204`). Here the same state machine runs
  * inside `flatMapGroupsWithState` — one state row per user, updated
  * per micro-batch, emitted on change.
  */
object CursorState {

  final case class TweetEvent(user_id: String, tweet_id: Long, end: Boolean)
  final case class Cursor(user_id: String, min_id: Long, max_id: Long,
      direction: String, end: Boolean)

  /** The reference's direction flip: reaching the history end pins
    * "newer"; otherwise alternate older/newer per run. */
  def advance(prev: Option[Cursor], events: Iterator[TweetEvent],
      userId: String): Option[Cursor] = {
    val evs = events.toSeq
    if (evs.isEmpty) return prev
    val batchMin = evs.map(_.tweet_id).min
    val batchMax = evs.map(_.tweet_id).max
    val end = evs.exists(_.end)
    val base = prev.getOrElse(
      Cursor(userId, batchMin, batchMax, "older", end = false))
    val direction =
      if (end) "newer"
      else if (base.direction == "older") "newer"
      else "older"
    Some(Cursor(userId,
      math.min(base.min_id, batchMin),
      math.max(base.max_id, batchMax),
      direction, end || base.end))
  }

  /** Streaming form: one Cursor emitted per user per micro-batch that
    * touched it; state persists across batches via the checkpoint. */
  def track(events: Dataset[TweetEvent]): Dataset[Cursor] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Cursor, Cursor](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: String, batch: Iterator[TweetEvent],
         state: GroupState[Cursor]) =>
          advance(state.getOption, batch, userId) match {
            case Some(next) if !state.getOption.contains(next) =>
              state.update(next)
              Iterator.single(next)
            case _ => Iterator.empty
          }
      }
  }
}

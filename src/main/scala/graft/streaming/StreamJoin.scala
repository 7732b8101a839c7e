package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution shape: each purchase
  * matched to the views by the same user in the preceding 30 minutes.
  *
  * The join logic is ONE set of Column expressions shared by the
  * batch and streaming forms (the repo-wide batch≡stream contract):
  * an equi-join on user_id plus an event-time interval predicate.
  * Batch plans it as a sort-merge join on user_id with the range as a
  * residual filter — user_id is high-cardinality, so no monolithic
  * partition exists at any scale. Streaming REQUIRES watermarks on
  * both sides plus the interval bound so the join state is evictable:
  * a buffered view can be dropped once the watermark passes
  * v_ts + 30 min (without the time bound, stream-stream inner join
  * state grows forever — Spark rejects it in Append mode).
  */
object StreamJoin {

  /** Shared join: views(user_id, event_id, ts) ⋈ purchases within
    * [v_ts, v_ts + 30 min] on the same user. */
  def attributionJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
      col("event_id").as("view_id"), col("ts").as("v_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"),
      col("value"))
    v.join(p, col("v_user") === col("p_user")
        && col("p_ts") >= col("v_ts")
        && col("p_ts") <= col("v_ts") + expr("interval 30 minutes"))
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"), col("p_ts"), col("value"))
  }

  /** Streaming form: both inputs watermarked, state bounded by
    * watermark + interval. `views`/`purchases` must be streaming
    * DataFrames with an event-time `ts` column. */
  def attributionStream(views: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    attributionJoin(
      views.withWatermark("ts", watermark),
      purchases.withWatermark("ts", watermark))
}

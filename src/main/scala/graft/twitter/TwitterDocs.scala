package graft.twitter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.io.DocStore

/** Twitter document envelopes (SURVEY §1.2) — the `twitter_tweets_new`
  * / `twitter_users_new` index shapes the reference bulk-writes
  * (`twitter_ingest_get_timeline/main.py:148-204`).
  *
  *  - tweet doc (`:148-160`): `_op_type index`, id = tweet id,
  *    `obj` = the hydrated {tweet, author, quoted, replied_to,
  *    retweeted} bundle, `context` = {last_indexed, last_updated,
  *    api_version: 2};
  *  - user doc (`:163-179`): `doc_as_upsert` keyed by user id with
  *    `obj` = the API user object and the same context;
  *  - cursor doc (`:188-204`): a PARTIAL update on the user doc
  *    carrying only {cursors:{min_id,max_id,direction,end},
  *    context.last_updated} — the field-wise struct merge of
  *    [[graft.io.DocStore.upsert]] (K2) applies it without clobbering
  *    `obj` or `context.last_indexed`, exactly like the ES partial doc.
  */
object TwitterDocs {

  /** Envelope per hydrated tweet; `runTs` injected for reproducibility
    * (the reference stamps utcnow). */
  def tweetDocs(hydrated: DataFrame, runTs: Column): DataFrame =
    hydrated.select(
      col("tweet.id").as("doc_id"),
      struct(col("tweet"), col("author"), col("quoted"),
        col("replied_to"), col("retweeted")).as("obj"),
      struct(runTs.as("last_indexed"), runTs.as("last_updated"),
        lit(2).as("api_version")).as("context"))

  /** One doc per distinct user in the responses' `includes.users`. */
  def userDocs(responses: DataFrame, runTs: Column): DataFrame =
    responses.select(explode(col("includes.users")).as("user"))
      .select(col("user.id").as("doc_id"), col("user").as("obj"))
      // well-defined: user objects sharing an id are identical in a batch
      .dropDuplicates("doc_id")
      .select(col("doc_id"), col("obj"),
        struct(runTs.as("last_indexed"), runTs.as("last_updated"),
          lit(2).as("api_version")).as("context"))

  /** Partial cursor update on the user doc — input is
    * [[Twitter.updateCursors]] output. */
  def cursorDocs(cursors: DataFrame, runTs: Column): DataFrame =
    cursors.select(
      col("user_id").as("doc_id"),
      struct(col("min_id"), col("max_id"), col("direction"), col("end"))
        .as("cursors"),
      struct(runTs.as("last_updated")).as("context"))

  /** Write the batch the way the reference's single bulk call does:
    * tweets overwrite-by-id (K1), users + cursor partials merge (K2). */
  def writeAll(store: DocStore, hydrated: DataFrame, responses: DataFrame,
      cursors: DataFrame, runTs: Column): Unit = {
    store.index("twitter_tweets_new", "doc_id", tweetDocs(hydrated, runTs))
    store.upsert("twitter_users_new", "doc_id", userDocs(responses, runTs))
    store.upsert("twitter_users_new", "doc_id", cursorDocs(cursors, runTs))
  }
}

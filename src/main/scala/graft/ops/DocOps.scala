package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.twitter.{Twitter, TwitterDocs}

/** Document-envelope catalog entries (SURVEY §1.2): the tweet envelope
  * build + projection and the per-user cursor doc, graded against the
  * DuckDB oracle by driving the REAL [[TwitterDocs]]/[[Twitter]]
  * builders with tweet-shaped rows derived from the `documents` table
  * (doc_id → tweet id, source → author).
  */
object DocOps {

  private val runTs = lit("2026-01-01 00:00:00").cast("timestamp")

  /** Envelope build + projection roundtrip: documents → hydrated-shaped
    * rows → [[TwitterDocs.tweetDocs]] → flatten obj/context fields back
    * out (`twitter_ingest_get_timeline/main.py:148-160`). */
  def docTweetEnv(s: SparkSession, d: String): DataFrame = {
    val tweetish = Tables.documents(s, d).select(
      struct(col("doc_id").cast("string").as("id"), col("text"),
        col("source").as("author_id")).as("tweet"),
      struct(col("source").as("id")).as("author"),
      lit(null).as("quoted"), lit(null).as("replied_to"),
      lit(null).as("retweeted"))
    TwitterDocs.tweetDocs(tweetish, runTs)
      .select(col("doc_id"),
        col("obj.tweet.text").as("text"),
        col("obj.author.id").as("author"),
        col("context.api_version").as("api_version"))
      .orderBy(col("doc_id"))
  }

  /** The cursors struct on the user doc: [[Twitter.updateCursors]] from
    * a cold start (empty prev state), flattened
    * (`twitter_ingest_get_timeline/main.py:188-204`). */
  def docUserCursors(s: SparkSession, d: String): DataFrame = {
    val hydratedish = Tables.documents(s, d).select(
      struct(col("doc_id").cast("string").as("id")).as("tweet"),
      struct(col("source").as("id")).as("author"))
    val prev = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("user_id", org.apache.spark.sql.types.StringType)
        .add("min_id", org.apache.spark.sql.types.LongType)
        .add("max_id", org.apache.spark.sql.types.LongType)
        .add("direction", org.apache.spark.sql.types.StringType)
        .add("end", org.apache.spark.sql.types.BooleanType))
    Twitter.updateCursors(hydratedish, prev)
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_tweet_env"    -> docTweetEnv _,
    "doc_user_cursors" -> docUserCursors _)

  val oracles: Map[String, String] = Map(
    "doc_tweet_env" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, source AS author,
        |  2 AS api_version
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_user_cursors" ->
      """SELECT source AS user_id, MIN(doc_id) AS min_id,
        |  MAX(doc_id) AS max_id, 'older' AS direction, FALSE AS "end"
        |FROM documents GROUP BY source ORDER BY user_id""".stripMargin)
}

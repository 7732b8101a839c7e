package graft.twitter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.graph.GraphStore
import graft.io.DocStore

/** The Twitter DAG (SURVEY §3.2) as one call: API-response fixtures →
  * hydration (J8) → graph MERGE batches (G9) → domain extraction (G12)
  * → referenced-tweet queue + per-user cursor advance (§2.10) → the
  * `twitter_tweets_new`/`twitter_users_new` document envelopes
  * ([[TwitterDocs]]). The reference runs this as six queue-chained
  * functions; each stage here is the individually-spec'd pure function.
  */
object TwitterPipeline {

  final case class Summary(
      tweets: Long,
      tweeters: Long,
      domains: Long,
      queuedRefs: Long,
      cursorRows: Long,
      tweetDocs: Long = 0L,
      userDocs: Long = 0L)

  /** Returns the summary plus the advanced cursor table (the caller
    * persists it as its per-user state, as the reference stores
    * cursors on the user document). When `docs` is given, the tweet /
    * user / cursor-partial envelopes are written to it the way the
    * reference's single bulk call does. */
  def run(spark: SparkSession, responsesPath: String, graph: GraphStore,
      prevCursors: DataFrame, runTs: Column,
      docs: Option[DocStore] = None): (Summary, DataFrame) = {
    val responses = Twitter.readResponses(spark, responsesPath)
    val hydrated = Twitter.hydrate(responses)
    Twitter.loadGraph(graph, hydrated)
    Twitter.extractDomains(graph)
    val queue = Twitter.referencedTweetQueue(hydrated, runTs)
    // materialized so the caller can overwrite its cursor table with
    // the result — the lazy plan would read the files being replaced
    val cursors = Twitter.updateCursors(hydrated, prevCursors)
      .localCheckpoint(true)
    docs.foreach(TwitterDocs.writeAll(_, hydrated, responses, cursors, runTs))
    val summary = Summary(
      tweets = graph.readVertices("Tweet").map(_.count()).getOrElse(0L),
      tweeters = graph.readVertices("Tweeter").map(_.count()).getOrElse(0L),
      domains = graph.readVertices("Domain").map(_.count()).getOrElse(0L),
      queuedRefs = queue.count(),
      cursorRows = cursors.count(),
      tweetDocs = docs.flatMap(_.read("twitter_tweets_new"))
        .map(_.count()).getOrElse(0L),
      userDocs = docs.flatMap(_.read("twitter_users_new"))
        .map(_.count()).getOrElse(0L))
    (summary, cursors)
  }
}

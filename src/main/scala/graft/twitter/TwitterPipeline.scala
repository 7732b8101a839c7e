package graft.twitter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.graph.GraphStore

/** The Twitter DAG (SURVEY §3.2) as one call: API-response fixtures →
  * hydration (J8) → graph MERGE batches (G9) → domain extraction (G12)
  * → referenced-tweet queue + per-user cursor advance (§2.10). The
  * reference runs this as six queue-chained functions; each stage here
  * is the individually-spec'd pure function.
  */
object TwitterPipeline {

  final case class Summary(
      tweets: Long,
      tweeters: Long,
      domains: Long,
      queuedRefs: Long,
      cursorRows: Long)

  /** Returns the summary plus the advanced cursor table (the caller
    * persists it as its per-user state, as the reference stores
    * cursors on the user document). */
  def run(spark: SparkSession, responsesPath: String, graph: GraphStore,
      prevCursors: DataFrame, runTs: Column): (Summary, DataFrame) = {
    val hydrated = Twitter.hydrate(Twitter.readResponses(spark, responsesPath))
    Twitter.loadGraph(graph, hydrated)
    Twitter.extractDomains(graph)
    val queue = Twitter.referencedTweetQueue(hydrated, runTs)
    // materialized so the caller can overwrite its cursor table with
    // the result — the lazy plan would read the files being replaced
    val cursors = Twitter.updateCursors(hydrated, prevCursors)
      .localCheckpoint(true)
    val summary = Summary(
      tweets = graph.readVertices("Tweet").map(_.count()).getOrElse(0L),
      tweeters = graph.readVertices("Tweeter").map(_.count()).getOrElse(0L),
      domains = graph.readVertices("Domain").map(_.count()).getOrElse(0L),
      queuedRefs = queue.count(),
      cursorRows = cursors.count())
    (summary, cursors)
  }
}

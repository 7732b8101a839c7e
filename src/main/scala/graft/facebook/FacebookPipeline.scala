package graft.facebook

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import graft.graph.GraphStore
import graft.io.DocStore

/** The Facebook-ads DAG as one call: ad-archive fixtures → stop-on-seen
  * dedup vs the already-loaded keys (J13) → graph MERGE batches (G10:
  * Ad/Message/Page/Buyer vertices, creation/delivery Day edges,
  * sha512+simhash Message identity) → `facebook_ads` envelopes
  * ([[Facebook.adDocs]]). Completes the single-call runner family
  * (FecPipeline §3.1, TwitterPipeline §3.2, NewsPipeline §3.3).
  */
object FacebookPipeline {

  final case class Summary(
      newAds: Long,
      adVertices: Long,
      messageVertices: Long,
      deliveryEdges: Long,
      adDocs: Long = 0L)

  def run(spark: SparkSession, adsPath: String, graph: GraphStore,
      docs: Option[DocStore] = None,
      runTs: Column = lit(null).cast("timestamp")): Summary = {
    val raw = Facebook.readAds(spark, adsPath)
    val seen = graph.readVertices("Ad")
      .map(_.select("id"))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("id", org.apache.spark.sql.types.StringType)))
    // materialize the delta BEFORE the store rewrite: the anti-join
    // plan reads the very parquet files loadGraph will replace
    val fresh = Facebook.unseenAds(raw, seen).localCheckpoint(true)
    Facebook.loadGraph(graph, fresh)
    // first_indexed stamps only ads the sink has never seen — the
    // `fresh` delta IS that set, so the batch is a first load by
    // construction (`facebook_ingest_get_ads/main.py:96-100`)
    docs.foreach(d => d.upsert("facebook_ads", "doc_id",
      Facebook.adDocs(fresh, runTs, firstLoad = true)))
    Summary(
      newAds = fresh.count(),
      adVertices = graph.readVertices("Ad").map(_.count()).getOrElse(0L),
      messageVertices =
        graph.readVertices("Message").map(_.count()).getOrElse(0L),
      deliveryEdges =
        graph.readEdges("DELIVERED_ON").map(_.count()).getOrElse(0L),
      adDocs = docs.flatMap(_.read("facebook_ads"))
        .map(_.count()).getOrElse(0L))
  }
}

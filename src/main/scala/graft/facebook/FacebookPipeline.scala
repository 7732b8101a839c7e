package graft.facebook

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.graph.GraphStore

/** The Facebook-ads DAG as one call: ad-archive fixtures → stop-on-seen
  * dedup vs the already-loaded keys (J13) → graph MERGE batches (G10:
  * Ad/Message/Page/Buyer vertices, creation/delivery Day edges,
  * sha512+simhash Message identity). Completes the single-call runner
  * family (FecPipeline §3.1, TwitterPipeline §3.2, NewsPipeline §3.3).
  */
object FacebookPipeline {

  final case class Summary(
      newAds: Long,
      adVertices: Long,
      messageVertices: Long,
      deliveryEdges: Long)

  def run(spark: SparkSession, adsPath: String, graph: GraphStore): Summary = {
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
    Summary(
      newAds = fresh.count(),
      adVertices = graph.readVertices("Ad").map(_.count()).getOrElse(0L),
      messageVertices =
        graph.readVertices("Message").map(_.count()).getOrElse(0L),
      deliveryEdges =
        graph.readEdges("DELIVERED_ON").map(_.count()).getOrElse(0L))
  }
}

package graft.news

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.graph.GraphStore

/** The news-sources DAG (SURVEY §3.3) as one call: AllSides + MBFC
  * crawls → clean/score (F14/F15) → full-outer merge (J9) + blacklist
  * (P10) → Source MERGE (G11) → Domain↔Source theta-link (J11) against
  * whatever Domain vertices other pipelines (Twitter G12) have put in
  * the shared graph store.
  */
object NewsPipeline {

  final case class Summary(
      sources: Long,
      sourceVertices: Long,
      domainSourceEdges: Long)

  def run(spark: SparkSession, allsides: DataFrame, mbfc: DataFrame,
      graph: GraphStore): Summary = {
    val merged = News.mergedSources(allsides, mbfc)
    News.loadSourceGraph(graph, merged)
    News.linkDomains(graph)
    Summary(
      sources = merged.count(),
      sourceVertices = graph.readVertices("Source").map(_.count()).getOrElse(0L),
      domainSourceEdges = graph.readEdges("DOMAIN_SOURCE").map(_.count()).getOrElse(0L))
  }
}

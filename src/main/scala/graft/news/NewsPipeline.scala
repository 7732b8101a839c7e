package graft.news

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import graft.graph.GraphStore
import graft.io.DocStore

/** The news-sources DAG (SURVEY §3.3) as one call: AllSides + MBFC
  * crawls → clean/score (F14/F15) → full-outer merge (J9) + blacklist
  * (P10) → Source MERGE (G11) → Domain↔Source theta-link (J11) against
  * whatever Domain vertices other pipelines (Twitter G12) have put in
  * the shared graph store → `news_sources` envelopes
  * ([[News.sourceDocs]]).
  */
object NewsPipeline {

  final case class Summary(
      sources: Long,
      sourceVertices: Long,
      domainSourceEdges: Long,
      sourceDocs: Long = 0L)

  def run(spark: SparkSession, allsides: DataFrame, mbfc: DataFrame,
      graph: GraphStore, docs: Option[DocStore] = None,
      runTs: Column = lit(null).cast("timestamp")): Summary = {
    val merged = News.mergedSources(allsides, mbfc)
    News.loadSourceGraph(graph, merged)
    News.linkDomains(graph)
    docs.foreach(d =>
      d.index("news_sources", "doc_id", News.sourceDocs(merged, runTs)))
    Summary(
      sources = merged.count(),
      sourceVertices = graph.readVertices("Source").map(_.count()).getOrElse(0L),
      domainSourceEdges = graph.readEdges("DOMAIN_SOURCE").map(_.count()).getOrElse(0L),
      sourceDocs = docs.flatMap(_.read("news_sources"))
        .map(_.count()).getOrElse(0L))
  }
}

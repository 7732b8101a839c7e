package graft.news

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.graph.GraphStore
import graft.functions.{Bias, Urls}

/** News-sources pipeline (SURVEY §3.3): crawl cleaning + bias scoring
  * (F14/F15), the AllSides ⟗ MBFC full-outer merge (J9), blacklist
  * filter (P10), article keep-oldest dedup (A2), source graph (G11)
  * and the Domain↔Source theta join (J11).
  */
object News {

  val blacklist = Seq("facebook.com", "instagram.com", "youtube.com",
    "medium.com")

  /** Clean a crawl frame (`news_sources_ingest_get_crawls/
    * main.py:64-90`): trim/lower bias + website, netloc → domain,
    * drop empty domains; AllSides additionally drops bias == mixed
    * (P11). */
  def cleanAllsides(df: DataFrame): DataFrame =
    df.select(
      trim(col("Source")).as("allsides_source"),
      lower(trim(col("Bias"))).as("bias"),
      Urls.normalize_domain(col("Website")).as("Domain"))
      .filter(col("bias") =!= "mixed")
      .filter(col("Domain") =!= "")
      .withColumn("allsides_bias_score", Bias.allsidesScore(col("bias")))
      .drop("bias")

  def cleanMbfc(df: DataFrame): DataFrame =
    df.select(
      trim(col("Source")).as("mbfc_source"),
      lower(trim(col("Bias"))).as("bias"),
      lower(trim(col("Images"))).as("images"),
      lower(col("Tags").cast("string")).as("tags"),
      Urls.normalize_domain(col("Website")).as("Domain"))
      .filter(col("Domain") =!= "")
      .withColumn("mbfc_bias_score",
        Bias.mbfcScore(col("bias"), col("images"), col("tags")))
      .withColumn("mbfc_factually_questionable_flag",
        Bias.questionableFlag(col("bias")))
      .withColumn("mbfc_conspiracy_flag", Bias.conspiracyFlag(col("bias")))
      .withColumn("mbfc_hate_group_flag", Bias.hateFlag(col("tags")))
      .withColumn("mbfc_propaganda_flag", Bias.propagandaFlag(col("tags")))
      .withColumn("mbfc_satire_flag", Bias.satireFlag(col("bias")))
      .drop("bias", "images", "tags")

  /** J9 + P10 + O8: full-outer merge on Domain, blacklist filter,
    * sort by Domain (`main.py:120-139`). */
  def mergedSources(allsides: DataFrame, mbfc: DataFrame): DataFrame =
    cleanAllsides(allsides)
      .join(cleanMbfc(mbfc), Seq("Domain"), "outer")
      .filter(!col("Domain").isin(blacklist: _*))
      .orderBy(col("Domain"))

  /** A4: average bias over the ratings present
    * (`news_sources_compute_load_graph/main.py:43-56`). */
  def withAvgBias(sources: DataFrame): DataFrame =
    sources.withColumn("bias_score",
      Bias.avgPresent(col("allsides_bias_score"), col("mbfc_bias_score")))

  /** G11: Source nodes keyed by domain. */
  def loadSourceGraph(store: GraphStore, sources: DataFrame): Unit =
    store.mergeVertices("Source", Seq("domain"),
      withAvgBias(sources).select(
        col("Domain").as("domain"),
        col("bias_score"),
        col("mbfc_factually_questionable_flag").as("questionable"),
        col("mbfc_conspiracy_flag").as("conspiracy"),
        col("mbfc_hate_group_flag").as("hate_group"),
        col("mbfc_propaganda_flag").as("propaganda"),
        col("mbfc_satire_flag").as("satire")))

  /** J11: the Domain↔Source theta join —
    * `a.host = i.domain OR a.host ENDS WITH '.' + i.domain`
    * (`news_sources_compute_merge_domains/cypher.py:13-20`). The
    * source side broadcasts (it is small); the non-equi predicate
    * forces a broadcast-nested-loop, the only sane plan here. */
  def matchDomains(domains: DataFrame, sources: DataFrame): DataFrame = {
    val s = broadcast(sources.select(col("domain")))
    domains.join(s,
      domains("host") === s("domain")
        || domains("host").endsWith(concat(lit("."), s("domain"))),
      "inner")
      .select(col("host"), col("domain"))
  }

  /** Link matched Domain→Source in the graph store (ASSOCIATED_WITH). */
  def linkDomains(store: GraphStore): Unit = {
    for {
      domains <- store.readVertices("Domain")
      sources <- store.readVertices("Source")
    } store.mergeEdges("DOMAIN_SOURCE", Seq("host", "domain"),
      matchDomains(domains, sources))
  }

  /** A2: article keep-oldest-per-url dedup → the duplicates to DELETE
    * (`news_articles_ingest_queue_duplicates/main.py:36-52`): group by
    * url, keep the doc with the smallest last_indexed, return the rest. */
  def duplicateArticles(articles: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url"))
      .orderBy(col("last_indexed").asc, col("article_id").asc)
    articles.withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .drop("rn")
  }

  /** P12: "article url must contain its domain" guard
    * (`news_articles_ingest_get_articles/main.py:114-116`). */
  def articlesMatchingDomain(articles: DataFrame): DataFrame =
    articles.filter(col("url").contains(col("domain")))

  /** J10: article-registry membership — scrape only urls in neither the
    * scraped nor the 404 registry (`get_articles/main.py:118-127`). */
  def unscrapedUrls(candidates: DataFrame, scraped: DataFrame,
      notFound: DataFrame): DataFrame =
    candidates
      .join(scraped.select(col("url")), Seq("url"), "left_anti")
      .join(notFound.select(col("url")), Seq("url"), "left_anti")

  /** `news_sources` document envelope
    * (`news_sources_ingest_verify_domain/main.py:51-58`): keyed by
    * domain, `extracted` = the merged source row, `context.last_updated`
    * stamped per run. */
  def sourceDocs(merged: DataFrame, runTs: Column): DataFrame =
    merged.select(
      col("Domain").as("doc_id"),
      struct(merged.columns.map(col): _*).as("extracted"),
      struct(runTs.as("last_updated")).as("context"))

  /** F11 as a codegen'd Column: recover the target url from a
    * scraper-proxy wrapper (everything after the first `&url=`).
    * Package-visible: the articles runner must key its registry gate
    * on the SAME de-proxied form the stored registry rows use. */
  private[news] def parseProxyCol(c: Column): Column =
    when(c.contains("&url="), regexp_replace(c, "^.*?&url=", "")).otherwise(c)

  /** `news_articles` document envelope
    * (`news_articles_ingest_get_articles/main.py:158-184`): the
    * scraped-article fields nested as `extracted` (url/source urls
    * de-proxied, F11) with metadata + source sub-structs, and
    * `context` = {scraper, last_indexed}. Input columns mirror the
    * scraper output: url, title, date, authors, text, keywords,
    * description, language, canonical_link, meta_sitename, source_url,
    * scraper. */
  def articleDocs(articles: DataFrame, runTs: Column): DataFrame =
    articles.select(
      // ES autogenerates the _id; key on the de-proxied url (unique
      // post keep-oldest dedup, A2)
      parseProxyCol(col("url")).as("doc_id"),
      struct(
        parseProxyCol(col("url")).as("url"),
        col("title"), col("date"), col("authors"), col("text"),
        struct(col("keywords"), col("description"), col("language"),
          col("canonical_link").as("url")).as("metadata"),
        struct(parseProxyCol(col("source_url")).as("url"),
          col("meta_sitename").as("sitename")).as("source")).as("extracted"),
      struct(col("scraper"), runTs.as("last_indexed")).as("context"))
}

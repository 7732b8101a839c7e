package graft.domains

import graft.SparkFunSuite
import graft.io.DocStore
import graft.news.{ArticlesPipeline, News}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The news-ARTICLES intake runner (§3.3's daily DAG): P12 domain
  * guard → J10 registry gate → envelope + registry writes → A2
  * keep-oldest dedup queue drained as deletes — composed end-to-end
  * over one DocStore, with replay convergence. */
class ArticlesPipelineSpec extends SparkFunSuite {
  import spark.implicits._

  private val cols = Seq("url", "domain", "scraper", "status", "title",
    "date", "authors", "text", "keywords", "description", "language",
    "canonical_link", "meta_sitename", "source_url")

  private def batch(rows: (String, String, String)*): DataFrame =
    rows.map { case (url, domain, status) =>
      (url, domain, "newspaperbasic", status, "Title", "2022-05-01",
        Seq("A. Author"), "Body text.", Seq("k1"), "desc", "en",
        url, "Daily Left", s"https://$domain")
    }.toDF(cols: _*)

  test("intake gates, indexes, registers, and reaps duplicates") {
    val d = Files.createTempDirectory("artpipe").toString
    val docs = new DocStore(spark, s"$d/docs")
    val ts1 = lit("2022-06-01 10:00:00").cast("timestamp")

    // story2 arrives PROXY-WRAPPED: the registry key must be the
    // stripped DE-PROXIED url, or replays would re-scrape it forever
    val proxied =
      "http://api.scraper.example/fetch?key=k&url=https://www.dailyleft.com/story2"
    val run1 = ArticlesPipeline.run(spark, batch(
      ("https://www.dailyleft.com/story1", "dailyleft.com", "ok"),
      (proxied, "dailyleft.com", "ok"),
      ("https://www.dailyleft.com/gone", "dailyleft.com", "404"),
      ("https://www.othersite.com/story", "dailyleft.com", "ok"), // P12 reject
      ("https://www.dailyleft.com/flaky", "dailyleft.com", "error")),
      docs, ts1)
    assert(run1.candidates == 5)
    assert(run1.inDomain == 4)      // otherside.com url not in its domain
    assert(run1.fresh == 4)         // empty registries gate nothing
    assert(run1.indexed == 2)       // the two ok rows
    assert(run1.notFound == 1)      // the 404 row
    assert(run1.duplicatesDeleted == 0)
    assert(run1.articleDocs == 2)
    // registries hold the stripped DE-PROXIED url forms
    assert(docs.read("news_scraped").get.select("url").as[String]
      .collect().toSet ==
      Set("dailyleft.com/story1", "dailyleft.com/story2"))
    assert(docs.read("news_404").get.select("url").as[String]
      .collect().toSeq == Seq("dailyleft.com/gone"))

    // replay the same batch later the same day: the scraped urls (incl.
    // the proxy-wrapped one) and the 404 url are all gated out; only
    // the retryable error row is fresh
    val ts2 = lit("2022-06-01 11:00:00").cast("timestamp")
    val run2 = ArticlesPipeline.run(spark, batch(
      ("https://www.dailyleft.com/story1", "dailyleft.com", "ok"),
      (proxied, "dailyleft.com", "ok"),
      ("https://www.dailyleft.com/gone", "dailyleft.com", "404"),
      ("https://www.dailyleft.com/flaky", "dailyleft.com", "error")),
      docs, ts2)
    assert(run2.fresh == 1 && run2.indexed == 0 && run2.notFound == 0)
    assert(run2.duplicatesDeleted == 0)
    assert(run2.articleDocs == 2) // replay converged: still two docs

    // inject a younger duplicate of story1 (the race the serverless
    // original is exposed to: a second scrape indexed before its
    // registry row landed) — the next run's A2 stage must reap it
    val dupEnv = News.articleDocs(batch(
      ("https://www.dailyleft.com/story1", "dailyleft.com", "ok")), ts2)
      .withColumn("doc_id", md5(concat_ws("|", col("extracted.url"),
        col("context.last_indexed").cast("string"))))
    docs.index("news_articles", "doc_id", dupEnv)
    assert(docs.read("news_articles").get.count() == 3)

    val ts3 = lit("2022-06-01 12:00:00").cast("timestamp")
    val run3 = ArticlesPipeline.run(spark,
      batch().limit(0), docs, ts3)
    assert(run3.duplicatesDeleted == 1)
    assert(run3.articleDocs == 2)
    // the SURVIVOR is the oldest doc (keep-oldest A2 semantics)
    val kept = docs.read("news_articles").get
      .filter(col("extracted.url") === "https://www.dailyleft.com/story1")
      .head()
    val ctx = kept.getStruct(kept.fieldIndex("context"))
    assert(ctx.getAs[java.sql.Timestamp]("last_indexed").toString
      .startsWith("2022-06-01 10:00:00"))
  }
}

package graft.domains

import graft.SparkFunSuite
import graft.io.DocStore
import graft.facebook.Facebook
import graft.news.News
import graft.twitter.{Twitter, TwitterDocs}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** §1.2 document envelopes for the twitter/facebook/news indices —
  * the five index shapes the round-2 verdict flagged missing:
  * `twitter_tweets_new`, `twitter_users_new` (obj + cursors partial),
  * `facebook_ads`, `news_sources`, `news_articles`. */
class DocEnvelopesSpec extends SparkFunSuite {
  import spark.implicits._

  private val runTs = lit("2022-06-01").cast("timestamp")

  private def twitterFixture(dir: String): String = {
    val resp =
      """{"data":[
        |{"id":"100","text":"line one\nline two","author_id":"u1","created_at":"2022-03-01T15:30:00.000Z","referenced_tweets":[{"type":"quoted","id":"200"}]},
        |{"id":"101","text":"plain","author_id":"u2","created_at":"2022-03-02T01:00:00.000Z"}],
        |"includes":{"users":[{"id":"u1","username":"alice","name":"Alice","verified":true},{"id":"u2","username":"bob","name":"Bob","verified":false}],"tweets":[{"id":"200","text":"original","author_id":"u2","created_at":"2022-02-28T10:00:00.000Z"}]}}"""
        .stripMargin.replace("\n", "")
    val p = s"$dir/responses.jsonl"
    Files.writeString(Paths.get(p), resp)
    p
  }

  test("tweet envelope: obj bundles tweet+author+refs, context carries api_version 2") {
    val d = Files.createTempDirectory("tweetenv").toString
    val responses = Twitter.readResponses(spark, twitterFixture(d))
    val docs = TwitterDocs.tweetDocs(Twitter.hydrate(responses), runTs)
    assert(docs.count() == 2)
    val t100 = docs.filter($"doc_id" === "100").head()
    val obj = t100.getStruct(t100.fieldIndex("obj"))
    assert(obj.getStruct(obj.fieldIndex("author"))
      .getAs[String]("username") == "alice")
    assert(obj.getStruct(obj.fieldIndex("quoted")) != null) // hydrated ref
    val ctx = t100.getStruct(t100.fieldIndex("context"))
    assert(ctx.getAs[Int]("api_version") == 2)
    // the un-referenced tweet has null quoted
    val t101 = docs.filter($"doc_id" === "101").head()
    assert(t101.getStruct(t101.fieldIndex("obj"))
      .isNullAt(t101.getStruct(t101.fieldIndex("obj")).fieldIndex("quoted")))
  }

  test("user docs dedup includes.users; cursor partial upsert keeps obj (K2)") {
    val d = Files.createTempDirectory("userenv").toString
    val responses = Twitter.readResponses(spark, twitterFixture(d))
    val hydrated = Twitter.hydrate(responses)
    val store = new DocStore(spark, s"$d/docs")
    val prev = Seq(("u1", 50L, 90L, "older", false))
      .toDF("user_id", "min_id", "max_id", "direction", "end")
    val cursors = Twitter.updateCursors(hydrated, prev)
    TwitterDocs.writeAll(store, hydrated, responses, cursors, runTs)

    val users = store.read("twitter_users_new").get
    assert(users.count() == 2)
    val u1 = users.filter($"doc_id" === "u1").head()
    // the obj written by the user doc survived the cursor partial...
    val obj = u1.getStruct(u1.fieldIndex("obj"))
    assert(obj.getAs[String]("username") == "alice")
    // ...and the cursors struct landed on the same document
    val cur = u1.getStruct(u1.fieldIndex("cursors"))
    assert(cur.getAs[Long]("min_id") == 50L) // least(batch 100, prev 50)
    assert(cur.getAs[Long]("max_id") == 100L) // u1 authored tweet 100
    assert(cur.getAs[String]("direction") == "newer")
    // tweets index: overwrite-by-id, 2 docs
    assert(store.read("twitter_tweets_new").get.count() == 2)
  }

  test("facebook ad envelope: processed.regions lifted, first_indexed only on load") {
    val ads = Seq(
      """{"id":"a1","ad_creative_body":"Vote","currency":"USD","region_distribution":[{"region":"Ohio","percentage":"0.6"},{"region":"Iowa","percentage":"0.4"}]}""",
      """{"id":"a2","ad_creative_body":"Other","currency":"USD"}""")
    val d = Files.createTempDirectory("fbenv").toString
    Files.writeString(Paths.get(s"$d/ads.jsonl"), ads.mkString("\n"))
    val raw = Facebook.readAds(spark, s"$d/ads.jsonl")

    val first = Facebook.adDocs(raw, runTs, firstLoad = true)
    val a1 = first.filter($"doc_id" === "a1").head()
    val proc = a1.getStruct(a1.fieldIndex("processed"))
    assert(proc.getSeq[String](proc.fieldIndex("regions")) == Seq("Ohio", "Iowa"))
    val ctx = a1.getStruct(a1.fieldIndex("context"))
    assert(!ctx.isNullAt(ctx.fieldIndex("first_indexed")))
    // a2 has no region_distribution -> processed.regions null
    val a2 = first.filter($"doc_id" === "a2").head()
    assert(a2.getStruct(a2.fieldIndex("processed"))
      .isNullAt(a2.getStruct(a2.fieldIndex("processed")).fieldIndex("regions")))
    // update batch: first_indexed stays null
    val upd = Facebook.adDocs(raw, runTs, firstLoad = false).head()
    val uctx = upd.getStruct(upd.fieldIndex("context"))
    assert(uctx.isNullAt(uctx.fieldIndex("first_indexed")))
  }

  test("news source + article envelopes: extracted/context nesting, proxy stripped") {
    val allsides = Seq(("Daily Left", "Left", "https://www.dailyleft.com/"))
      .toDF("Source", "Bias", "Website")
    val mbfc = Seq(("Daily Left", "LEFT BIAS", "", "", "dailyleft.com"))
      .toDF("Source", "Bias", "Images", "Tags", "Website")
    val src = News.sourceDocs(News.mergedSources(allsides, mbfc), runTs)
    val s0 = src.head()
    assert(s0.getAs[String]("doc_id") == "dailyleft.com")
    val ext = s0.getStruct(s0.fieldIndex("extracted"))
    assert(ext.getAs[String]("Domain") == "dailyleft.com")

    val articles = Seq(
      ("http://proxy.example/fetch?key=1&url=https://dailyleft.com/story",
        "Story", "2022-05-01", Seq("A. Author"), "Body text.",
        Seq("k1"), "desc", "en", "https://dailyleft.com/story",
        "Daily Left", "https://dailyleft.com", "requests"))
      .toDF("url", "title", "date", "authors", "text", "keywords",
        "description", "language", "canonical_link", "meta_sitename",
        "source_url", "scraper")
    val art = News.articleDocs(articles, runTs).head()
    assert(art.getAs[String]("doc_id") == "https://dailyleft.com/story")
    val aext = art.getStruct(art.fieldIndex("extracted"))
    assert(aext.getAs[String]("url") == "https://dailyleft.com/story")
    assert(aext.getStruct(aext.fieldIndex("source"))
      .getAs[String]("url") == "https://dailyleft.com")
    val actx = art.getStruct(art.fieldIndex("context"))
    assert(actx.getAs[String]("scraper") == "requests")
  }

  test("runners write their envelope stores end-to-end") {
    val d = Files.createTempDirectory("runnerdocs").toString
    val graph = new graft.graph.GraphStore(spark, s"$d/graph")
    val store = new DocStore(spark, s"$d/docs")
    val prev = spark.emptyDataFrame
      .select(lit("").as("user_id"), lit(0L).as("min_id"),
        lit(0L).as("max_id"), lit("").as("direction"), lit(false).as("end"))
      .limit(0)
    val (tw, _) = graft.twitter.TwitterPipeline.run(
      spark, twitterFixture(d), graph, prev, runTs, Some(store))
    assert(tw.tweetDocs == 2 && tw.userDocs == 2)

    val ads = Seq("""{"id":"a1","ad_creative_body":"Vote","currency":"USD"}""")
    Files.writeString(Paths.get(s"$d/ads.jsonl"), ads.mkString("\n"))
    val fb = graft.facebook.FacebookPipeline.run(
      spark, s"$d/ads.jsonl", graph, Some(store), runTs)
    assert(fb.adDocs == 1)

    val allsides = Seq(("Daily Left", "Left", "https://www.dailyleft.com/"))
      .toDF("Source", "Bias", "Website")
    val mbfc = Seq(("Daily Left", "LEFT BIAS", "", "", "dailyleft.com"))
      .toDF("Source", "Bias", "Images", "Tags", "Website")
    val news = graft.news.NewsPipeline.run(
      spark, allsides, mbfc, graph, Some(store), runTs)
    assert(news.sourceDocs == 1)
  }
}

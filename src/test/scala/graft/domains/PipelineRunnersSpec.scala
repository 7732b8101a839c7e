package graft.domains

import graft.SparkFunSuite
import graft.graph.GraphStore
import graft.news.NewsPipeline
import graft.twitter.TwitterPipeline
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** §3.2 + §3.3 DAG runners over one SHARED graph store: Twitter's
  * extracted Domain vertices become the left side of the news
  * Domain↔Source theta-link — the reference's actual cross-pipeline
  * flow (tweets emit links; news sources claim their domains). */
class PipelineRunnersSpec extends SparkFunSuite {
  import spark.implicits._

  test("twitter -> news runners link tweet domains to sources; replay converges") {
    val d = Files.createTempDirectory("runners").toString
    val resp =
      """{"data":[
        |{"id":"100","text":"read this","author_id":"u1","created_at":"2022-03-01T15:30:00.000Z","entities":{"urls":[{"expanded_url":"https://www.dailyleft.com/story?utm=1"}]},"referenced_tweets":[{"type":"quoted","id":"200"}]},
        |{"id":"101","text":"plain","author_id":"u2","created_at":"2022-03-02T01:00:00.000Z"}],
        |"includes":{"users":[{"id":"u1","username":"alice","name":"Alice","verified":true},{"id":"u2","username":"bob","name":"Bob","verified":false}],"tweets":[{"id":"200","text":"original","author_id":"u2","created_at":"2022-02-28T10:00:00.000Z"}]}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(s"$d/responses.jsonl"), resp)

    val graph = new GraphStore(spark, s"$d/graph")
    val prevCursors = Seq(("u1", 50L, 90L, "older", false))
      .toDF("user_id", "min_id", "max_id", "direction", "end")
    val runTs = lit("2022-06-01").cast("timestamp")

    val (tw, cursors) = TwitterPipeline.run(
      spark, s"$d/responses.jsonl", graph, prevCursors, runTs)
    assert(tw.tweets == 2 && tw.tweeters == 2)
    assert(tw.domains == 1) // dailyleft.com from the stripped link
    assert(tw.queuedRefs == 1)
    assert(cursors.filter($"user_id" === "u1").head()
      .getAs[String]("direction") == "newer")

    val allsides = Seq(("Daily Left", "Left", "https://www.dailyleft.com/"))
      .toDF("Source", "Bias", "Website")
    val mbfc = Seq(("Daily Left", "LEFT BIAS", "", "", "dailyleft.com"))
      .toDF("Source", "Bias", "Images", "Tags", "Website")
    val news = NewsPipeline.run(spark, allsides, mbfc, graph)
    assert(news.sources == 1 && news.sourceVertices == 1)
    assert(news.domainSourceEdges == 1) // dailyleft.com linked

    // replay both: MERGE semantics converge to the identical store
    val (tw2, _) = TwitterPipeline.run(
      spark, s"$d/responses.jsonl", graph, prevCursors, runTs)
    val news2 = NewsPipeline.run(spark, allsides, mbfc, graph)
    assert(tw2 == tw && news2 == news)
  }

  test("facebook runner: stop-on-seen skips the whole batch on replay") {
    val d = Files.createTempDirectory("fbrun").toString
    val ads = Seq(
      """{"id":"a1","ad_creation_time":"2022-05-01T10:00:00+0000","ad_creative_body":"Vote for change","ad_delivery_start_time":"2022-05-02","ad_delivery_stop_time":"2022-05-04","currency":"USD","spend":{"lower_bound":"100","upper_bound":"199"},"page_id":"p1","page_name":"Good Page","funding_entity":"Citizens Fund"}""",
      """{"id":"a2","ad_creation_time":"2022-05-03","ad_creative_body":"Different body","ad_delivery_start_time":"2022-05-03T08:00:00+0000","currency":"USD","page_id":"p1","page_name":"Good Page","funding_entity":"Citizens Fund"}""")
    Files.writeString(Paths.get(s"$d/ads.jsonl"), ads.mkString("\n"))
    val graph = new GraphStore(spark, s"$d/graph")
    val fb = graft.facebook.FacebookPipeline.run(spark, s"$d/ads.jsonl", graph)
    assert(fb.newAds == 2 && fb.adVertices == 2 && fb.messageVertices == 2)
    assert(fb.deliveryEdges == 3) // a1 spans 3 EST days; a2 has no stop
    val fb2 = graft.facebook.FacebookPipeline.run(spark, s"$d/ads.jsonl", graph)
    assert(fb2.newAds == 0) // J13: both ads already in the sink
    assert(fb2.adVertices == 2 && fb2.deliveryEdges == 3)
  }
}

package graft.domains

import graft.SparkFunSuite
import graft.graph.GraphStore
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class TwitterSpec extends SparkFunSuite {
  import graft.twitter.Twitter
  import spark.implicits._

  private lazy val fixturePath = {
    val d = Files.createTempDirectory("tw").toString
    val resp =
      """{"data":[
        |{"id":"100","text":"hello world\n\n#Tax cut now","author_id":"u1","created_at":"2022-03-01T15:30:00.000Z","entities":{"hashtags":[{"tag":"Tax"}],"mentions":[{"id":"u2","username":"other"}],"annotations":[{"normalized_text":"tax","type":"Other","probability":0.9}],"urls":[{"expanded_url":"https://www.example.com/story?utm=1"},{"expanded_url":"https://twitter.com/x/status/1"}]},"referenced_tweets":[{"type":"quoted","id":"200"}]},
        |{"id":"101","text":"plain","author_id":"u2","created_at":"2022-03-02T01:00:00.000Z"}],
        |"includes":{"users":[{"id":"u1","username":"alice","name":"Alice","verified":true},{"id":"u2","username":"bob","name":"Bob","verified":false}],"tweets":[{"id":"200","text":"original","author_id":"u2","created_at":"2022-02-28T10:00:00.000Z"}]}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(s"$d/responses.jsonl"), resp)
    d
  }

  private lazy val hydrated =
    Twitter.hydrate(Twitter.readResponses(spark, s"$fixturePath/responses.jsonl"))

  test("J8 hydration joins author and referenced tweets from includes") {
    assert(hydrated.count() == 2)
    val t100 = hydrated.filter($"tweet.id" === "100").head()
    assert(t100.getAs[org.apache.spark.sql.Row]("author")
      .getAs[String]("username") == "alice")
    val quoted = t100.getAs[org.apache.spark.sql.Row]("quoted")
    assert(quoted.getAs[org.apache.spark.sql.Row]("tweet")
      .getAs[String]("id") == "200")
    assert(quoted.getAs[org.apache.spark.sql.Row]("author")
      .getAs[String]("username") == "bob")
  }

  test("F17/F21: parse_tweet flattens text and splits dates incl EST") {
    val p = Twitter.parsedTweets(hydrated).filter($"tweet_id" === "100").head()
    assert(p.getAs[String]("summary") == "hello world #Tax cut now")
    assert(p.getAs[String]("url") == "twitter.com/alice/status/100")
    assert(p.getAs[Int]("hour") == 15)
    assert(p.getAs[Int]("est_day") == 1) // 15:30Z → 10:30 EST same day
    val late = Twitter.parsedTweets(hydrated).filter($"tweet_id" === "101").head()
    assert(late.getAs[Int]("est_day") == 1) // 01:00Z Mar2 → Mar1 EST
  }

  test("G9: graph load builds tweets/hashtags/links, strips tracking args") {
    val store = new GraphStore(spark,
      Files.createTempDirectory("twg").toString)
    Twitter.loadGraph(store, hydrated)
    assert(store.readVertices("Tweet").get.count() == 2)
    assert(store.readVertices("Hashtag").get
      .filter($"text" === "TAX").count() == 1)
    // twitter.com url excluded; tracking args stripped
    val links = store.readVertices("Link").get.as[(String, String)].collect()
    assert(links.map(_._1).toSet == Set("example.com/story"))
    assert(store.readEdges("QUOTED").get.count() == 1)
  }

  test("cursor update flips direction and widens min/max") {
    val prev = Seq(("u1", 50L, 90L, "older", false))
      .toDF("user_id", "min_id", "max_id", "direction", "end")
    val out = Twitter.updateCursors(hydrated, prev)
    val u1 = out.filter($"user_id" === "u1").head()
    assert(u1.getAs[Long]("min_id") == 50L)
    assert(u1.getAs[Long]("max_id") == 100L)
    assert(u1.getAs[String]("direction") == "newer")
  }
}

class FacebookSpec extends SparkFunSuite {
  import graft.facebook.Facebook
  import spark.implicits._

  private lazy val fixturePath = {
    val d = Files.createTempDirectory("fb").toString
    val ads = Seq(
      """{"id":"a1","ad_creation_time":"2022-05-01T10:00:00+0000","ad_creative_body":"Vote for change","ad_delivery_start_time":"2022-05-02","ad_delivery_stop_time":"2022-05-04","currency":"USD","spend":{"lower_bound":"100","upper_bound":"199"},"impressions":{"lower_bound":"1000","upper_bound":"1999"},"page_id":"p1","page_name":"Good Page","funding_entity":"Citizens Fund","region_distribution":[{"region":"California","percentage":"0.7"},{"region":"Texas","percentage":"0.3"}]}""",
      """{"id":"a2","ad_creation_time":"2022-05-03","ad_creative_body":"Vote for change","ad_delivery_start_time":"2022-05-03T08:00:00+0000","currency":"EUR","spend":{"lower_bound":"5","upper_bound":"9"},"page_id":"p1","page_name":"Good Page","funding_entity":"Citizens Fund"}""")
    Files.writeString(Paths.get(s"$d/ads.jsonl"), ads.mkString("\n"))
    d
  }

  private lazy val raw = Facebook.readAds(spark, s"$fixturePath/ads.jsonl")

  test("ads flatten: date ladder, USD-only spend") {
    val a = Facebook.ads(raw)
    val a1 = a.filter($"id" === "a1").head()
    assert(a1.getAs[String]("spend_lower_bound") == "100")
    val a2 = a.filter($"id" === "a2").head()
    assert(a2.getAs[String]("spend_lower_bound") == null) // non-USD dropped
    assert(a2.getAs[java.sql.Timestamp]("creation_time") != null) // date-only parsed
  }

  test("A8: delivery-day explosion spans start..stop in EST") {
    val days = Facebook.deliveryDays(Facebook.ads(raw))
    // a1: May 2..4 UTC dates → EST May 1 20:00 → May 1..3 EST = 3 days
    assert(days.filter($"id" === "a1").count() == 3)
    assert(days.filter($"id" === "a2").count() == 0) // no stop time
  }

  test("F12/G10: message identity pairs dedupe identical bodies") {
    val store = new GraphStore(spark, Files.createTempDirectory("fbg").toString)
    Facebook.loadGraph(store, raw)
    assert(store.readVertices("Message").get.count() == 1) // same body → one node
    assert(store.readEdges("CONTAINS").get.count() == 2)   // both ads point at it
    assert(store.readVertices("State").get.count() == 2)
    assert(store.readVertices("Buyer").get
      .filter($"name" === "CITIZENS FUND").count() == 1)
  }
}

class RedditSpec extends SparkFunSuite {
  import graft.reddit.Reddit

  test("F19: selftext key/value parse with snake keys and date fix") {
    val html = "<p>Ad Buyer Information and Related Data:</p>" +
      "<p>Buyer-Name: Some PAC</p><p>Start Date: 3/5/2022</p>" +
      "<p>Spend/Budget: $100</p><p>not a kv line</p>"
    val m = Reddit.parseSelfText(html)
    assert(m("buyer_name") == "Some PAC")
    assert(m("start_date") == "2022-03-05")
    assert(m("spend_budget") == "$100")
    assert(!m.contains("not_a_kv_line"))
  }

  test("null and plain text are safe") {
    assert(Reddit.parseSelfText(null).isEmpty)
    assert(Reddit.parseSelfText("<p>nothing here</p>").isEmpty)
  }
}

class LobbyingSpec extends SparkFunSuite {
  import graft.lobbying.Lobbying
  import spark.implicits._

  private lazy val path = {
    val d = Files.createTempDirectory("lob").toString
    val filing =
      """{"filing_uuid":"F1","filing_year":2022,"filing_type":"Q1","dt_posted":"3/15/2022 02:30:00 PM","client":{"name":"Acme Co","general_description":"widgets","state":"CA"},"registrant":{"name":"Lobby LLC","description":"firm","state":"DC"},"lobbying_activities":[{"general_issue_code":"TAX","description":"tax reform","lobbyists":[{"lobbyist":{"first_name":"Jane","middle_name":null,"last_name":"Doe","suffix":null},"covered_position":"Hill"},{"lobbyist":{"first_name":"Bob","middle_name":"Q","last_name":"Roe","suffix":"Jr"},"covered_position":null}]},{"general_issue_code":"ENV","description":"clean air","lobbyists":[]}]}"""
    Files.writeString(Paths.get(s"$d/filings.jsonl"), filing)
    d
  }

  test("parent + nested child docs (activity × lobbyist explode)") {
    val filings = Lobbying.readFilings(spark, s"$path/filings.jsonl")
    val parents = Lobbying.parentDocs(filings, lit("2022-06-01").cast("timestamp"))
    assert(parents.count() == 1)
    val p = parents.head()
    val processed = p.getAs[org.apache.spark.sql.Row]("processed")
    assert(processed.getAs[java.sql.Timestamp]("dt_posted").toString
      .startsWith("2022-03-15 14:30"))
    assert(processed.getAs[String]("client_name") == "ACME CO")
    val nested = Lobbying.nestedDocs(filings)
    // activity TAX × 2 lobbyists + activity ENV × outer-null = 3 rows
    assert(nested.count() == 3)
    assert(nested.filter($"lobbyist_name" === "JANE DOE").count() == 1)
    assert(nested.filter($"lobbyist_name" === "BOB Q ROE JR").count() == 1)
  }

  test("F13: amount normalization") {
    val df = Seq("$1,234.56", "500", "").toDF("amt")
      .select(Lobbying.parseAmount(col("amt")).as("v"))
    val vs = df.as[Option[Double]].collect()
    assert(vs(0).contains(1234.56) && vs(1).contains(500.0) && vs(2).isEmpty)
  }
}

class IrsSpec extends SparkFunSuite {
  import graft.irs.Irs
  import spark.implicits._

  test("F8: clean_xml coercion by key suffix with quarantine") {
    val filings = Seq(
      (201412345L, "990", "12-3456789", "Acme Charity", "201412",
        Map("TotalRevenueAmt" -> "50000.5", "VolunteerHrs" -> "120",
          "ReturnDt" -> "2014-06-01", "MissionDesc" -> "helping"))
    ).toDF("object_id", "return_type", "ein", "taxpayer_name", "tax_period",
      "fields")
    val docs = Irs.filingDocs(filings, lit("2022-01-01").cast("timestamp"))
    val r = docs.head()
    val amounts = r.getAs[Map[String, Double]]("amounts")
    assert(amounts("TotalRevenueAmt") == 50000.5 && amounts("VolunteerHrs") == 120.0)
    val dates = r.getAs[Map[String, java.sql.Timestamp]]("dates")
    // EST midnight → 05:00 UTC
    assert(dates("ReturnDt").toString == "2014-06-01 04:00:00.0" ||
      dates("ReturnDt").toString == "2014-06-01 05:00:00.0")
    assert(r.getAs[Map[String, String]]("other") == Map("MissionDesc" -> "helping"))
    assert(r.getAs[String]("index") == "federal_irs_990")
  }

  test("index guard: pre-2014 object ids skipped") {
    val idx = Seq((201312345L, "990"), (201512345L, "990EZ"))
      .toDF("object_id", "return_type")
    assert(Irs.filterIndex(idx).count() == 1)
  }
}

class NewsSpec extends SparkFunSuite {
  import graft.news.News
  import spark.implicits._

  private lazy val allsides = Seq(
    ("Daily Left", "Left", "https://www.dailyleft.com/"),
    ("Center Times", "Center", "http://centertimes.org"),
    ("Mixed Mag", "Mixed", "https://mixedmag.com"),
    ("FB Page", "Right", "https://facebook.com/page"))
    .toDF("Source", "Bias", "Website")
  private lazy val mbfc = Seq(
    ("Daily Left", "LEFT BIAS", "left images", "some,tags", "dailyleft.com"),
    ("Conspiracy Now", "conspiracy-pseudoscience", "right leaning", "propaganda right", "www.consp.net"),
    ("Satire Site", "satire", "", "funny", "satire.io"))
    .toDF("Source", "Bias", "Images", "Tags", "Website")

  test("J9/P10/P11/F14/F15: merged sources with scores and flags") {
    val merged = News.mergedSources(allsides, mbfc)
    val domains = merged.select("Domain").as[String].collect().toSet
    assert(domains == Set("dailyleft.com", "centertimes.org", "consp.net",
      "satire.io")) // mixed dropped, facebook blacklisted
    val dl = merged.filter($"Domain" === "dailyleft.com").head()
    assert(dl.getAs[Double]("allsides_bias_score") == -2.0)
    assert(dl.getAs[Double]("mbfc_bias_score") == -2.0)
    val consp = merged.filter($"Domain" === "consp.net").head()
    assert(consp.getAs[Double]("mbfc_bias_score") == 3.0) // escalated right
    assert(consp.getAs[Int]("mbfc_conspiracy_flag") == 1)
    val sat = merged.filter($"Domain" === "satire.io").head()
    assert(sat.isNullAt(sat.fieldIndex("mbfc_bias_score"))) // satire nulls
  }

  test("A4: average over present ratings only") {
    val avg = News.withAvgBias(News.mergedSources(allsides, mbfc))
    assert(avg.filter($"Domain" === "dailyleft.com").head()
      .getAs[Double]("bias_score") == -2.0)
    assert(avg.filter($"Domain" === "centertimes.org").head()
      .getAs[Double]("bias_score") == 0.0)
  }

  test("J11: theta join matches exact and subdomain hosts") {
    val domains = Seq("dailyleft.com", "blog.dailyleft.com",
      "notdailyleft.com", "other.org").toDF("host")
    val sources = Seq("dailyleft.com").toDF("domain")
    val matched = News.matchDomains(domains, sources)
      .select("host").as[String].collect().toSet
    assert(matched == Set("dailyleft.com", "blog.dailyleft.com"))
  }

  test("A2: duplicate articles = all but oldest per url") {
    val articles = Seq(
      (1L, "u1", "2022-01-01 10:00:00"),
      (2L, "u1", "2022-01-01 09:00:00"),
      (3L, "u2", "2022-01-01 08:00:00"))
      .toDF("article_id", "url", "last_indexed")
      .withColumn("last_indexed", col("last_indexed").cast("timestamp"))
    val dupes = News.duplicateArticles(articles)
      .select("article_id").as[Long].collect().toSet
    assert(dupes == Set(1L)) // keeps 2 (oldest for u1) and 3
  }
}

class LobbyingSingletonSpec extends SparkFunSuite {
  import graft.lobbying.Lobbying
  import org.apache.spark.sql.types._
  import spark.implicits._

  test("F18: singleton object and list both parse to an array") {
    val element = StructType(Seq(
      StructField("general_issue_code", StringType)))
    val df = Seq(
      ("single", """{"general_issue_code":"TAX"}"""),
      ("list", """[{"general_issue_code":"ENV"},{"general_issue_code":"AGR"}]"""))
      .toDF("kind", "raw")
      .select($"kind",
        Lobbying.singletonOrArray($"raw", element).as("arr"))
    val sizes = df.select($"kind", size($"arr").as("n"))
      .as[(String, Int)].collect().toMap
    assert(sizes("single") == 1 && sizes("list") == 2)
    val codes = df.filter($"kind" === "single")
      .select($"arr"(0)("general_issue_code")).as[String].head()
    assert(codes == "TAX")
  }
}

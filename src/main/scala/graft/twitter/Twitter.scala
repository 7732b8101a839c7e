package graft.twitter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.graph.GraphStore
import graft.functions.{Dates, Urls}

/** Twitter pipeline restated in Spark (SURVEY §3.2): API-response
  * fixtures → hydration joins (J8) → envelope docs → graph (G9) +
  * cursor state.
  *
  * Schemas pin the v2 API payload (`twitter_ingest_get_timeline/
  * main.py:54-61` field list); the per-response in-memory lookup joins
  * against `includes.users/tweets` become explode + broadcast joins.
  */
object Twitter {

  val userSchema: StructType = StructType(Seq(
    StructField("id", StringType), StructField("username", StringType),
    StructField("name", StringType), StructField("verified", BooleanType)))

  val entitiesSchema: StructType = StructType(Seq(
    StructField("hashtags", ArrayType(StructType(Seq(
      StructField("tag", StringType))))),
    StructField("mentions", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("username", StringType))))),
    StructField("annotations", ArrayType(StructType(Seq(
      StructField("normalized_text", StringType),
      StructField("type", StringType),
      StructField("probability", DoubleType))))),
    StructField("urls", ArrayType(StructType(Seq(
      StructField("expanded_url", StringType)))))))

  val tweetSchema: StructType = StructType(Seq(
    StructField("id", StringType), StructField("text", StringType),
    StructField("author_id", StringType),
    StructField("created_at", StringType),
    StructField("entities", entitiesSchema),
    StructField("referenced_tweets", ArrayType(StructType(Seq(
      StructField("type", StringType), StructField("id", StringType)))))))

  val responseSchema: StructType = StructType(Seq(
    StructField("data", ArrayType(tweetSchema)),
    StructField("includes", StructType(Seq(
      StructField("users", ArrayType(userSchema)),
      StructField("tweets", ArrayType(tweetSchema)))))))

  def readResponses(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(responseSchema).json(path)

  /** J8: hydrate each tweet with its author and referenced tweets from
    * the response's `includes` (`get_timeline/main.py:117-132`). The
    * reference does per-row linear scans of includes; here the includes
    * explode into keyed sides and join — same result, set-based. */
  def hydrate(responses: DataFrame): DataFrame = {
    val withId = responses.withColumn("resp_id",
      monotonically_increasing_id())
    val tweets = withId.select(col("resp_id"),
      explode(col("data")).as("tweet"))
    val users = withId.select(col("resp_id"),
      explode(col("includes.users")).as("user"))
      .select(col("resp_id"), col("user.id").as("u_id"), col("user"))
    val incTweets = withId.select(col("resp_id"),
      explode(col("includes.tweets")).as("inc_tweet"))
      .select(col("resp_id"), col("inc_tweet.id").as("it_id"), col("inc_tweet"))

    val authored = tweets
      .join(users, tweets("resp_id") === users("resp_id")
        && tweets("tweet.author_id") === users("u_id"), "left")
      .select(tweets("resp_id"), col("tweet"), col("user").as("author"))

    // referenced tweets: quoted / replied_to / retweeted, each with its
    // own hydrated tweet + author (missing includes tolerated → null)
    def refOf(tpe: String): Column =
      get(filter(col("tweet.referenced_tweets"),
        r => r.getField("type") === tpe), lit(0)).getField("id")
    val withRefs = authored
      .withColumn("quoted_id", refOf("quoted"))
      .withColumn("replied_to_id", refOf("replied_to"))
      .withColumn("retweeted_id", refOf("retweeted"))

    def hydrateRef(df: DataFrame, name: String): DataFrame = {
      val it = incTweets.select(col("resp_id").as(s"${name}_rid"),
        col("it_id").as(s"${name}_itid"), col("inc_tweet").as(s"${name}_tweet"))
      val ua = users.select(col("resp_id").as(s"${name}_urid"),
        col("u_id").as(s"${name}_uid"), col("user").as(s"${name}_author"))
      df.join(it, df("resp_id") === col(s"${name}_rid")
          && col(s"${name}_id") === col(s"${name}_itid"), "left")
        .join(ua, df("resp_id") === col(s"${name}_urid")
          && col(s"${name}_tweet.author_id") === col(s"${name}_uid"), "left")
        .withColumn(name, when(col(s"${name}_id").isNotNull,
          struct(col(s"${name}_tweet").as("tweet"),
            col(s"${name}_author").as("author"))))
        .drop(s"${name}_rid", s"${name}_itid", s"${name}_tweet",
          s"${name}_urid", s"${name}_uid", s"${name}_author")
    }

    Seq("quoted", "replied_to", "retweeted").foldLeft(withRefs)(hydrateRef)
      .select(col("tweet"), col("author"), col("quoted"),
        col("replied_to"), col("retweeted"))
  }

  /** Referenced-tweet queue entries (K4: the Firestore tweet queue,
    * `get_timeline/main.py:134`). */
  def referencedTweetQueue(hydrated: DataFrame, runTs: Column): DataFrame =
    hydrated.select(explode(col("tweet.referenced_tweets")).as("r"))
      .select(col("r.id").as("tweet_id"), runTs.as("last_added"))
      .distinct()

  /** F17 + F21: the parsed tweet rows (`parse_tweet`,
    * `twitter_compute_load_graph/main.py:35-105`). */
  def parsedTweets(hydrated: DataFrame): DataFrame = {
    val dt = to_timestamp(col("tweet.created_at"),
      "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    val est = Dates.utc_to_est(dt)
    hydrated.select(
      col("tweet.id").as("tweet_id"),
      year(dt).as("year"), month(dt).as("month"),
      dayofmonth(dt).as("day"), hour(dt).as("hour"), minute(dt).as("minute"),
      year(est).as("est_year"), month(est).as("est_month"),
      dayofmonth(est).as("est_day"),
      // splitlines → drop empties → join " "
      array_join(filter(split(col("tweet.text"), "\\R"),
        s => s =!= ""), " ").as("summary"),
      concat(lit("twitter.com/"), col("author.username"), lit("/status/"),
        col("tweet.id")).as("url"),
      col("author.id").as("user_id"),
      upper(col("author.username")).as("username"))
  }

  def tweeters(hydrated: DataFrame): DataFrame =
    hydrated.select(
      col("author.id").as("user_id"),
      upper(col("author.username")).as("username"),
      col("author.name").as("name"),
      col("author.verified").as("verified"))
      .filter(col("user_id").isNotNull)

  def hashtags(hydrated: DataFrame): DataFrame =
    hydrated.select(col("tweet.id").as("tweet_id"),
      explode(col("tweet.entities.hashtags")).as("h"))
      .select(col("tweet_id"), upper(col("h.tag")).as("text"))

  def mentions(hydrated: DataFrame): DataFrame =
    hydrated.select(col("tweet.id").as("tweet_id"),
      explode(col("tweet.entities.mentions")).as("m"))
      .select(col("tweet_id"), col("m.id").as("user_id"),
        upper(col("m.username")).as("username"))

  def annotations(hydrated: DataFrame): DataFrame =
    hydrated.select(col("tweet.id").as("tweet_id"),
      explode(col("tweet.entities.annotations")).as("a"))
      .select(col("tweet_id"), upper(col("a.normalized_text")).as("text"),
        col("a.type").as("type"), col("a.probability").as("probability"))

  /** Non-twitter links, stripped (F9). */
  def links(hydrated: DataFrame): DataFrame =
    hydrated.select(col("tweet.id").as("tweet_id"),
      explode(col("tweet.entities.urls")).as("u"))
      .filter(!col("u.expanded_url").contains("twitter.com"))
      .select(col("tweet_id"),
        Urls.strip_url(col("u.expanded_url")).as("url"))

  private def refEdges(hydrated: DataFrame, name: String): DataFrame =
    hydrated.filter(col(name).isNotNull)
      .select(col("tweet.id").as("tweet_id"),
        col(s"$name.tweet.id").as(s"${name}_tweet_id"))
      .filter(col(s"${name}_tweet_id").isNotNull)

  /** G9: load the whole tweet batch into the graph store. */
  def loadGraph(store: GraphStore, hydrated: DataFrame): Unit = {
    val parsed = parsedTweets(hydrated).cache()
    store.mergeVertices("Tweet", Seq("tweet_id"),
      parsed.select(col("tweet_id"), col("year"), col("month"), col("day"),
        col("hour"), col("minute"), col("summary"), col("url")))
    store.mergeVertices("Tweeter", Seq("user_id"), tweeters(hydrated))
    store.mergeVertices("Day", Seq("year", "month", "day"),
      parsed.select(col("est_year").as("year"), col("est_month").as("month"),
        col("est_day").as("day")).distinct())
    store.mergeVertices("Hashtag", Seq("text"),
      hashtags(hydrated).select("text").distinct())
    store.mergeVertices("Annotation", Seq("type", "text"),
      annotations(hydrated).select("type", "text").distinct())
    store.mergeVertices("Link", Seq("url"),
      links(hydrated).select("url").distinct())

    store.mergeEdges("PUBLISHED_BY", Seq("tweet_id", "user_id"),
      parsed.select(col("tweet_id"), col("user_id")))
    store.mergeEdges("PUBLISHED_ON", Seq("tweet_id", "year", "month", "day"),
      parsed.select(col("tweet_id"), col("est_year").as("year"),
        col("est_month").as("month"), col("est_day").as("day")))
    store.mergeEdges("MENTIONS_HASHTAG", Seq("tweet_id", "text"),
      hashtags(hydrated))
    store.mergeEdges("MENTIONS_USER", Seq("tweet_id", "user_id"),
      mentions(hydrated))
    store.mergeEdges("MENTIONS_ANNOTATION", Seq("tweet_id", "type", "text"),
      annotations(hydrated))
    store.mergeEdges("MENTIONS_LINK", Seq("tweet_id", "url"),
      links(hydrated))
    store.mergeEdges("QUOTED", Seq("tweet_id", "quoted_tweet_id"),
      refEdges(hydrated, "quoted")
        .withColumnRenamed("quoted_tweet_id", "quoted_tweet_id"))
    store.mergeEdges("REPLIED_TO", Seq("tweet_id", "replied_to_tweet_id"),
      refEdges(hydrated, "replied_to"))
    store.mergeEdges("RETWEETED", Seq("tweet_id", "retweeted_tweet_id"),
      refEdges(hydrated, "retweeted"))
    parsed.unpersist()
  }

  /** Cursor maintenance (A6 + §2.10): per-user min/max tweet id and the
    * bidirectional backfill direction flip (`get_timeline/
    * main.py:100-111,180-204`). */
  def updateCursors(hydrated: DataFrame, prev: DataFrame): DataFrame = {
    val batchCursors = hydrated
      .select(col("author.id").as("user_id"),
        col("tweet.id").cast("long").as("tid"))
      .groupBy(col("user_id"))
      .agg(min(col("tid")).as("batch_min"), max(col("tid")).as("batch_max"))
    prev.join(batchCursors, Seq("user_id"), "outer")
      .select(col("user_id"),
        least(col("batch_min"), col("min_id")).as("min_id"),
        greatest(col("batch_max"), col("max_id")).as("max_id"),
        when(col("end") === true, lit("newer"))
          .when(col("direction") === "older", lit("newer"))
          .otherwise(lit("older")).as("direction"),
        coalesce(col("end"), lit(false)).as("end"))
  }

  /** Twitter domain extraction (G12): Link url → Domain host. */
  def extractDomains(store: GraphStore): Unit = {
    store.readEdges("MENTIONS_LINK").foreach { links =>
      val domains = links.select(Urls.getDomainUdf(col("url")).as("host"))
        .filter(col("host").isNotNull && col("host") =!= "").distinct()
      store.mergeVertices("Domain", Seq("host"), domains)
      store.mergeEdges("LINK_DOMAIN", Seq("url", "host"),
        links.select(col("url"),
          Urls.getDomainUdf(col("url")).as("host"))
          .filter(col("host").isNotNull && col("host") =!= "").distinct())
    }
  }
}

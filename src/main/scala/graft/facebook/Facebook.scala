package graft.facebook

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.graph.GraphStore
import graft.functions.Dates
import graft.functions.expressions.SimHash64

/** Facebook ads pipeline (SURVEY G10, A8, F12): ad docs → graph with
  * message identity (sha512, simhash64), EST day attribution, and the
  * delivery-day range explosion
  * (`facebook_compute_load_graph/main.py:44-200`).
  */
object Facebook {

  val adSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("ad_creation_time", StringType),
    StructField("ad_creative_body", StringType),
    StructField("ad_creative_link_caption", StringType),
    StructField("ad_delivery_start_time", StringType),
    StructField("ad_delivery_stop_time", StringType),
    StructField("currency", StringType),
    StructField("funding_entity", StringType),
    StructField("impressions", StructType(Seq(
      StructField("lower_bound", StringType),
      StructField("upper_bound", StringType)))),
    StructField("page_id", StringType),
    StructField("page_name", StringType),
    StructField("potential_reach", StructType(Seq(
      StructField("lower_bound", StringType),
      StructField("upper_bound", StringType)))),
    StructField("publisher_platforms", ArrayType(StringType)),
    StructField("region_distribution", ArrayType(StructType(Seq(
      StructField("region", StringType),
      StructField("percentage", StringType))))),
    StructField("spend", StructType(Seq(
      StructField("lower_bound", StringType),
      StructField("upper_bound", StringType))))))

  def readAds(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(adSchema).json(path)

  /** F7-style two-format ladder: full timestamp else bare date
    * (`main.py:64-71`). */
  private def parseAdTime(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd")))

  /** The flattened Ad rows: bounds lifted, spend only for USD
    * (`main.py:95-106` drops non-USD spend). */
  def ads(raw: DataFrame): DataFrame = {
    val ct = parseAdTime(col("ad_creation_time"))
    val ds = parseAdTime(col("ad_delivery_start_time"))
    val dstop = parseAdTime(col("ad_delivery_stop_time"))
    raw.select(
      col("id"),
      ct.as("creation_time"), ds.as("delivery_start_time"),
      dstop.as("delivery_stop_time"),
      col("impressions.lower_bound").as("impressions_lower_bound"),
      col("impressions.upper_bound").as("impressions_upper_bound"),
      when(col("currency") === "USD", col("spend.lower_bound"))
        .as("spend_lower_bound"),
      when(col("currency") === "USD", col("spend.upper_bound"))
        .as("spend_upper_bound"),
      col("potential_reach.lower_bound").as("potential_reach_lower_bound"),
      col("potential_reach.upper_bound").as("potential_reach_upper_bound"),
      col("ad_creative_link_caption").as("creative_link_caption"),
      col("ad_creative_body"), col("page_id"), col("page_name"),
      col("funding_entity"), col("region_distribution"))
  }

  /** A8: one row per (ad, EST delivery day) between start and stop
    * (`main.py:138-147`) — explode(sequence(...)) instead of the
    * python while-loop. */
  def deliveryDays(adsDf: DataFrame): DataFrame = {
    val startEst = Dates.utc_to_est(col("delivery_start_time")).cast("date")
    val stopEst = Dates.utc_to_est(col("delivery_stop_time")).cast("date")
    adsDf.filter(col("delivery_stop_time").isNotNull)
      .select(col("id"),
        explode(sequence(startEst, stopEst, expr("interval 1 day"))).as("d"))
      .select(col("id"), year(col("d")).as("year"),
        month(col("d")).as("month"), dayofmonth(col("d")).as("day"))
  }

  def creationDays(adsDf: DataFrame): DataFrame = {
    val est = Dates.utc_to_est(col("creation_time"))
    adsDf.select(col("id"), year(est).as("year"), month(est).as("month"),
      dayofmonth(est).as("day"))
  }

  /** F12: Message identity = (sha512 of body, simhash64 of body)
    * (`main.py:149-154`). */
  def messages(adsDf: DataFrame): DataFrame =
    adsDf.filter(col("ad_creative_body").isNotNull)
      .select(col("id"),
        sha2(col("ad_creative_body"), 512).as("sha512"),
        SimHash64.simhash_native(adsDf.sparkSession, col("ad_creative_body"))
          .cast("string").as("simhash"))

  /** G10: load ads/messages/pages/buyers/days/states into the store
    * (`cypher.py:8-86`, F20 upper-trim entity normalization). */
  def loadGraph(store: GraphStore, raw: DataFrame): Unit = {
    val a = ads(raw).cache()
    store.mergeVertices("Ad", Seq("id"),
      a.select(col("id"), col("creation_time"), col("delivery_start_time"),
        col("delivery_stop_time"), col("impressions_lower_bound"),
        col("impressions_upper_bound"), col("spend_lower_bound"),
        col("spend_upper_bound"), col("potential_reach_lower_bound"),
        col("potential_reach_upper_bound"), col("creative_link_caption")))
    store.mergeVertices("Message", Seq("sha512", "simhash"),
      messages(a).select("sha512", "simhash").distinct())
    store.mergeVertices("Page", Seq("id"),
      a.filter(col("page_id").isNotNull)
        .select(col("page_id").as("id"),
          upper(trim(col("page_name"))).as("name")).distinct())
    store.mergeVertices("Buyer", Seq("name"),
      a.filter(col("funding_entity").isNotNull)
        .select(upper(trim(col("funding_entity"))).as("name")).distinct())
    val allDays = creationDays(a).select("year", "month", "day")
      .unionByName(deliveryDays(a).select("year", "month", "day")).distinct()
    store.mergeVertices("Day", Seq("year", "month", "day"), allDays)
    store.mergeVertices("State", Seq("name"),
      a.select(explode(col("region_distribution")).as("r"))
        .select(upper(trim(col("r.region"))).as("name")).distinct())

    store.mergeEdges("CREATED_ON", Seq("id", "year", "month", "day"),
      creationDays(a))
    store.mergeEdges("DELIVERED_ON", Seq("id", "year", "month", "day"),
      deliveryDays(a))
    store.mergeEdges("CONTAINS", Seq("id", "sha512", "simhash"),
      messages(a))
    store.mergeEdges("PUBLISHED_BY_PAGE", Seq("id", "page_id"),
      a.filter(col("page_id").isNotNull).select(col("id"), col("page_id")))
    store.mergeEdges("PAID_BY", Seq("id", "name"),
      a.filter(col("funding_entity").isNotNull)
        .select(col("id"), upper(trim(col("funding_entity"))).as("name")))
    store.mergeEdges("TARGETS_STATE", Seq("id", "name"),
      a.select(col("id"), explode(col("region_distribution")).as("r"))
        .select(col("id"), upper(trim(col("r.region"))).as("name"),
          col("r.percentage").cast("double").as("percentage")))
    a.unpersist()
  }

  /** J13: weekday stop-on-seen — the cursor sweep stops when both the
    * page's first and last ad ids are already in the sink. Batch form:
    * which ads of the batch are new (left_anti vs sink keys). */
  def unseenAds(batch: DataFrame, sinkKeys: DataFrame): DataFrame =
    batch.join(sinkKeys.select(col("id")), Seq("id"), "left_anti")

  /** `facebook_ads` document envelope
    * (`facebook_ingest_get_ads/main.py:90-111`): doc_as_upsert keyed by
    * ad id with `obj` = the raw API ad, `processed.regions` = the
    * region names lifted out of region_distribution (`:92-95`), and
    * `context.last_indexed` always / `first_indexed` only when the ad
    * batch is a first load (`:96-100`). */
  def adDocs(raw: DataFrame, runTs: Column, firstLoad: Boolean): DataFrame =
    raw.select(
      col("id").as("doc_id"),
      struct(raw.columns.map(col): _*).as("obj"),
      struct(
        when(col("region_distribution").isNotNull,
          transform(col("region_distribution"), r => r.getField("region")))
          .as("regions")).as("processed"),
      struct(
        runTs.as("last_indexed"),
        (if (firstLoad) runTs else lit(null).cast("timestamp"))
          .as("first_indexed")).as("context"))
}

package graft.lobbying

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Dates

/** Lobbying-disclosure processing (SURVEY §1.2, S9/S10, F7/F16/F18):
  * Senate LDA filings with nested activities/lobbyists, the parent +
  * `_nested` child-doc explode, the multi-format date ladder, and the
  * first/middle/last/suffix name join.
  *
  * F18 (singleton→array XML quirk) is handled at the schema level: the
  * fixture reader pins ArrayType so a single activity parses as a
  * one-element array — no imperative coercion needed.
  */
object Lobbying {

  val lobbyistSchema: StructType = StructType(Seq(
    StructField("lobbyist", StructType(Seq(
      StructField("first_name", StringType),
      StructField("middle_name", StringType),
      StructField("last_name", StringType),
      StructField("suffix", StringType)))),
    StructField("covered_position", StringType)))

  val activitySchema: StructType = StructType(Seq(
    StructField("general_issue_code", StringType),
    StructField("description", StringType),
    StructField("lobbyists", ArrayType(lobbyistSchema))))

  val filingSchema: StructType = StructType(Seq(
    StructField("filing_uuid", StringType),
    StructField("filing_year", LongType),
    StructField("filing_type", StringType),
    StructField("dt_posted", StringType),
    StructField("client", StructType(Seq(
      StructField("name", StringType),
      StructField("general_description", StringType),
      StructField("state", StringType)))),
    StructField("registrant", StructType(Seq(
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("state", StringType)))),
    StructField("lobbying_activities", ArrayType(activitySchema))))

  def readFilings(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(filingSchema).json(path)

  /** F18: singleton→array coercion for XML-derived payloads
    * (`house..._disclosures/main.py:310-312`): xmltodict emits a bare
    * object when an element occurs once and a list when repeated. Given
    * the raw JSON string of such a field, parse as array first, else
    * wrap the single-object parse — the pinned ArrayType alone would
    * silently null the singleton case. */
  def singletonOrArray(rawJson: Column, element: DataType): Column =
    coalesce(
      from_json(rawJson, ArrayType(element)),
      array(from_json(rawJson, element)))

  /** F16: UPPER(concat_ws of non-null name parts)
    * (`federal_senate_lobbying_ingest_get_contributions/main.py:62-68`). */
  def joinName(first: Column, middle: Column, last: Column,
      suffix: Column): Column =
    upper(concat_ws(" ", first, middle, last, suffix))

  /** Parent docs: the filing envelope with the parsed posted date
    * (F7 ladder: the house variants try up to 10 formats). */
  def parentDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings.select(
      col("filing_uuid").as("doc_id"),
      struct(filings.columns.map(col): _*).as("row"),
      struct(
        Dates.parse_date_ladder(col("dt_posted"), Dates.lobbyingFormats)
          .as("dt_posted"),
        upper(trim(col("client.name"))).as("client_name"),
        upper(trim(col("registrant.name"))).as("registrant_name"))
        .as("processed"),
      struct(runTs.as("last_indexed")).as("context"))

  /** `_nested` child docs: one row per (filing, activity, lobbyist) —
    * the posexplode chain that the reference emits as separate child
    * documents (`federal_senate_lobbying_ingest_get_disclosures/
    * main.py:34-111`). */
  def nestedDocs(filings: DataFrame): DataFrame =
    filings
      .select(col("filing_uuid"), col("filing_year"),
        col("client.name").as("client_name"),
        col("registrant.name").as("registrant_name"),
        posexplode(col("lobbying_activities")).as(Seq("activity_no", "activity")))
      .select(col("filing_uuid"), col("filing_year"), col("client_name"),
        col("registrant_name"), col("activity_no"),
        col("activity.general_issue_code").as("general_issue_code"),
        col("activity.description").as("description"),
        posexplode_outer(col("activity.lobbyists"))
          .as(Seq("lobbyist_no", "lob")))
      .select(col("filing_uuid"), col("filing_year"), col("client_name"),
        col("registrant_name"), col("activity_no"),
        col("general_issue_code"), col("description"), col("lobbyist_no"),
        joinName(col("lob.lobbyist.first_name"),
          col("lob.lobbyist.middle_name"),
          col("lob.lobbyist.last_name"),
          col("lob.lobbyist.suffix")).as("lobbyist_name"),
        col("lob.covered_position").as("covered_position"))

  /** F13: contribution amount normalization `$1,234.56` → 1234.56
    * (`house..._contributions/main.py:293`). */
  def parseAmount(c: Column): Column = Dates.parse_amount(c)
}

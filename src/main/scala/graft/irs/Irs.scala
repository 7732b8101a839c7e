package graft.irs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Dates

/** IRS 990 processing (SURVEY S11, F8): the index CSV and the typed
  * coercion of parsed-XML leaf fields.
  *
  * The reference's `clean_xml` (`federal_irs_ingest_get_990s/
  * utilities.py:187-204`) recursively walks a dict and coerces by key
  * suffix: `Amt`/`Hrs` → float, `Dt` → EST-localized timestamp. With
  * a MapType column of leaf values the same rule is one map_entries
  * transform — the recursion disappears into the schema. Unknown
  * fields stay in the map (the quarantine escape hatch for dynamic
  * payloads, hard part #3).
  */
object Irs {

  /** Index CSV: 9 cols with header (`main.py:60-66`). */
  val indexSchema: StructType = StructType(Seq(
    StructField("return_id", StringType), StructField("filing_type", StringType),
    StructField("ein", StringType), StructField("tax_period", StringType),
    StructField("sub_date", StringType), StructField("taxpayer_name", StringType),
    StructField("return_type", StringType), StructField("dln", StringType),
    StructField("object_id", LongType)))

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(indexSchema).option("header", "true").csv(path)

  /** The reference skips filings whose object_id predates 2014
    * (`main.py:72-74` known-bad-data guard). */
  def filterIndex(index: DataFrame): DataFrame =
    index.filter(substring(col("object_id").cast("string"), 1, 4)
      .cast("int") >= 2014)

  /** F8 applied to a MapType(String,String) of XML leaves: returns
    * three typed maps — amounts (Amt/Hrs → double), dates (Dt → EST
    * midnight as UTC timestamp), and the untouched remainder. */
  def cleanXmlColumns(fields: Column): (Column, Column, Column) = {
    val entries = map_entries(fields)
    val amounts = map_from_entries(
      filter(entries, e => e.getField("key").endsWith("Amt")
        || e.getField("key").endsWith("Hrs")))
    val dates = map_from_entries(
      filter(entries, e => e.getField("key").endsWith("Dt")))
    val rest = map_from_entries(
      filter(entries, e => !(e.getField("key").endsWith("Amt")
        || e.getField("key").endsWith("Hrs")
        || e.getField("key").endsWith("Dt"))))
    val typedAmounts = transform_values(amounts,
      (_, v) => v.cast("double"))
    val typedDates = transform_values(dates,
      (_, v) => Dates.est_to_utc(v.cast("timestamp")))
    (typedAmounts, typedDates, rest)
  }

  /** 990 / 990EZ / 990PF routing (`main.py:103-108`): the filing's
    * return_type selects its index. */
  def routeByReturnType(docs: DataFrame): Column =
    when(col("return_type").startsWith("990PF"), lit("federal_irs_990pf"))
      .when(col("return_type").startsWith("990EZ"), lit("federal_irs_990ez"))
      .otherwise(lit("federal_irs_990"))

  /** Full-fidelity 990 envelope (`main.py:98-130`): the IRSx schedules
    * array runs the `get_xml_parts` whitelist ladder and the deep
    * `clean_xml` coercion, and the filing routes to its per-form
    * index off the pruned keys (`main.py:103-108` checks the PARSED
    * xml, not return_type — a ScheduleB-only oddity preserved here). */
  def filing990Docs(filings: DataFrame, runTs: Column): DataFrame = {
    val xml = IrsXmlParts.cleanXmlDeep(
      IrsXmlParts.getXmlParts(col("schedules")))
    filings.select(
      col("object_id").as("doc_id"),
      xml.as("obj"),
      struct(col("ein"), col("taxpayer_name"), col("tax_period")).as("row"),
      struct(runTs.as("last_indexed")).as("context"))
      .withColumn("index",
        when(map_contains_key(col("obj"), "IRS990EZ"), lit("federal_irs_990ez"))
          .when(map_contains_key(col("obj"), "IRS990PF"), lit("federal_irs_990pf"))
          .otherwise(lit("federal_irs_990")))
  }

  /** Filing envelope: typed maps + quarantined remainder + context. */
  def filingDocs(filings: DataFrame, runTs: Column): DataFrame = {
    val (amounts, dates, rest) = cleanXmlColumns(col("fields"))
    filings.select(
      col("object_id").as("doc_id"),
      col("return_type"),
      struct(col("ein"), col("taxpayer_name"), col("tax_period")).as("row"),
      amounts.as("amounts"), dates.as("dates"), rest.as("other"),
      struct(runTs.as("last_indexed")).as("context"))
      .withColumn("index", routeByReturnType(filings))
  }
}

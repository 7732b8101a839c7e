package graft.lobbying

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Dates

/** Per-chamber lobbying-disclosure envelopes (SURVEY S9/S10 split —
  * round-2 verdict "What's missing" #2). The two chambers share the
  * parent + `_nested` child-doc layout but differ materially:
  *
  *  - Senate (`federal_senate_lobbying_ingest_get_disclosures/
  *    main.py:34-116`): LDA API JSON; lobbyist name = plain
  *    `" ".join(first, middle, last, suffix)` (no upper-casing);
  *    per-activity issue code/description; client/registrant senate
  *    ids lifted from the nested API objects.
  *  - House (`federal_house_lobbying_ingest_get_disclosures/
  *    main.py:238-413`): XML→dict payloads; signedDate parses via a
  *    2-format ladder, effective/termination via the 9-format ladder
  *    (`:248-308`) then are EST-localized; lobbyist name = UPPER-cased
  *    first/last/suffix (no middle); senate_id derives from splitting
  *    `senateID` on '-'; a fallback activity path reads the TOP-LEVEL
  *    lobbyist list with the `alis.ali_Code` array when `ali_info` is
  *    absent (`:363-380`).
  *
  * Both chambers store the parent's `processed` WITHOUT the activities
  * array: the reference appends the parent action and then `pop`s
  * `activities` from the same dict before the bulk call runs
  * (`senate main.py:95-99`), so the mutation is visible in the bulked
  * parent too — the children are the only place activities land.
  *
  * Typed-column deviations from the reference's loose JSON, by design:
  * ids render as null (not python's `str(None)`), and the house
  * fallback's array-valued issue codes get their own
  * `issue_area_codes` field (a Spark struct field cannot be a
  * string/array union).
  */
object LobbyingChambers {

  // ------------------------------------------------------------ senate

  val senateLobbyistSchema: StructType = StructType(Seq(
    StructField("lobbyist", StructType(Seq(
      StructField("id", LongType),
      StructField("first_name", StringType),
      StructField("middle_name", StringType),
      StructField("last_name", StringType),
      StructField("suffix", StringType)))),
    StructField("covered_position", StringType)))

  val senateFilingSchema: StructType = StructType(Seq(
    StructField("filing_uuid", StringType),
    StructField("filing_year", LongType),
    StructField("filing_type", StringType),
    StructField("dt_posted", StringType),
    StructField("termination_date", StringType),
    StructField("filing_document_url", StringType),
    StructField("client", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("general_description", StringType),
      StructField("country", StringType),
      StructField("state", StringType),
      StructField("effective_date", StringType)))),
    StructField("registrant", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("country", StringType),
      StructField("state", StringType),
      StructField("house_registrant_id", LongType),
      StructField("contact_name", StringType)))),
    StructField("lobbying_activities", ArrayType(StructType(Seq(
      StructField("general_issue_code", StringType),
      StructField("description", StringType),
      StructField("lobbyists", ArrayType(senateLobbyistSchema))))))))

  def readSenateFilings(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(senateFilingSchema).json(path)

  /** `processed` minus activities (senate `main.py:34-57`). */
  private def senateProcessed: Column = struct(
    col("dt_posted").as("date_submitted"),
    col("client.effective_date").as("effective_date"),
    col("termination_date").as("termination_date"),
    col("filing_year").as("filing_year"),
    col("filing_type").as("filing_type"),
    struct(
      col("client.name").as("name"),
      col("client.general_description").as("description"),
      col("client.country").as("country"),
      col("client.state").as("state"),
      col("client.id").cast("string").as("senate_id")).as("client"),
    struct(
      col("registrant.name").as("name"),
      col("registrant.description").as("description"),
      col("registrant.country").as("country"),
      col("registrant.state").as("state"),
      col("registrant.id").cast("string").as("senate_id"),
      col("registrant.house_registrant_id").cast("string").as("house_id"),
      col("registrant.contact_name").as("contact")).as("registrant"),
    col("filing_document_url").as("url"))

  /** Activity rows (senate `main.py:58-80`): one per (activity,
    * lobbyist) with a non-empty joined name; covered_position only
    * when present and not "N/A"; plain-case name join. */
  private def senateActivities: Column = {
    val rows = flatten(transform(
      coalesce(col("lobbying_activities"),
        array().cast(senateFilingSchema("lobbying_activities").dataType)),
      act => transform(
        filter(coalesce(act.getField("lobbyists"),
          array().cast(ArrayType(senateLobbyistSchema))),
          l => l.getField("lobbyist").isNotNull),
        l => {
          val lb = l.getField("lobbyist")
          struct(
            struct(
              lb.getField("id").as("id"),
              concat_ws(" ", lb.getField("first_name"),
                lb.getField("middle_name"), lb.getField("last_name"),
                lb.getField("suffix")).as("name")).as("lobbyist"),
            when(l.getField("covered_position").isNotNull &&
              l.getField("covered_position") =!= "N/A",
              l.getField("covered_position")).as("covered_position"),
            act.getField("general_issue_code").as("issue_area_code"),
            act.getField("description").as("specific_issues"))
        })))
    filter(rows, r => length(r.getField("lobbyist").getField("name")) > 0)
  }

  /** Parent docs for `federal_senate_lobbying_disclosures`. */
  def senateParentDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings.select(
      col("filing_uuid").as("doc_id"),
      struct(filings.columns.map(col): _*).as("obj"),
      senateProcessed.as("processed"),
      struct(runTs.as("last_indexed")).as("context"))

  /** `_nested` child docs: {context{last_indexed, parent_id}, parent,
    * child} — one per activity row. */
  def senateChildDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings
      .select(col("filing_uuid"), senateProcessed.as("parent"),
        explode(senateActivities).as("child"))
      .select(
        struct(runTs.as("last_indexed"),
          col("filing_uuid").as("parent_id")).as("context"),
        col("parent"), col("child"))

  // ------------------------------------------------------------- house

  val houseLobbyistSchema: StructType = StructType(Seq(
    StructField("lobbyistFirstName", StringType),
    StructField("lobbyistLastName", StringType),
    StructField("lobbyistSuffix", StringType),
    StructField("coveredPosition", StringType)))

  val houseFilingSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("signedDate", StringType),
    StructField("effectiveDate", StringType),
    StructField("terminationDate", StringType),
    StructField("reportYear", StringType),
    StructField("reportType", StringType),
    StructField("clientName", StringType),
    StructField("clientGeneralDescription", StringType),
    StructField("clientCountry", StringType),
    StructField("clientState", StringType),
    StructField("senateID", StringType),
    StructField("houseID", StringType),
    StructField("organizationName", StringType),
    StructField("registrantGeneralDescription", StringType),
    StructField("country", StringType),
    StructField("state", StringType),
    StructField("printedName", StringType),
    StructField("specific_issues", StringType),
    StructField("alis", StructType(Seq(
      StructField("ali_Code", ArrayType(StringType)),
      StructField("ali_info", ArrayType(StructType(Seq(
        StructField("issueAreaCode", StringType),
        StructField("specific_issues", StructType(Seq(
          StructField("description", StringType)))),
        StructField("federal_agencies", StringType),
        StructField("lobbyists", StructType(Seq(
          StructField("lobbyist", ArrayType(houseLobbyistSchema)))))))))))),
    StructField("lobbyists", StructType(Seq(
      StructField("lobbyist", ArrayType(houseLobbyistSchema)))))))

  def readHouseFilings(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(houseFilingSchema).json(path)

  /** signedDate: 2-format ladder (house `main.py:239-246`). */
  val houseSignedFormats: Seq[String] =
    Seq("M/d/yyyy h:mm:ss a", "M/d/yyyy")

  /** effective/termination: the 9-format ladder (`:248-308`). */
  val houseDateFormats: Seq[String] = Seq(
    "M/d/yyyy h:mm:ss a", "M/d/yyyy", "M/d/yy",
    "M-d-yyyy", "M-d-yy", "M.d.yyyy", "M.d.yy",
    "MMddyyyy", "MMddyy")

  /** Parse a house date string and localize the naive EST wall-clock
    * to its UTC instant (the reference's pytz `US/Eastern`.localize).
    * Java's `yy` pivots 2000-2099 while python's %y pivots at 69 —
    * re-pivot 2069+ back a century, as parse_date_dby does, but ONLY
    * for strings that matched a 2-digit-year format: a genuine 4-digit
    * year like 12/31/2099 must stay 2099. The two format classes are
    * disjoint on input (strict `yyyy` needs 4 digits, `yy` exactly 2),
    * so trying the 4-digit ladder first preserves the original order. */
  def houseDate(c: Column, formats: Seq[String]): Column = {
    val (two, four) = formats.partition(isTwoDigitYear)
    val nullTs = lit(null).cast("timestamp")
    val parsed4 =
      if (four.isEmpty) nullTs else Dates.parse_date_ladder(c, four)
    val parsed2 =
      if (two.isEmpty) nullTs else Dates.parse_date_ladder(c, two)
    val pivoted2 = when(year(parsed2) >= 2069,
      parsed2 - expr("INTERVAL 100 YEARS")).otherwise(parsed2)
    Dates.est_to_utc(coalesce(parsed4, pivoted2))
  }

  private[lobbying] def isTwoDigitYear(f: String): Boolean =
    f.contains("yy") && !f.contains("yyyy")

  private def houseSenateIdPart(idx: Int): Column =
    when(col("senateID").contains("-"),
      split(col("senateID"), "-").getItem(idx)).otherwise(col("senateID"))

  /** `processed` minus activities (house `main.py:317-339`). */
  private def houseProcessed: Column = struct(
    houseDate(col("signedDate"), houseSignedFormats).as("date_submitted"),
    houseDate(col("effectiveDate"), houseDateFormats).as("effective_date"),
    houseDate(col("terminationDate"), houseDateFormats).as("termination_date"),
    col("reportYear").cast("int").as("filing_year"),
    col("reportType").as("filing_type"),
    struct(
      col("clientName").as("name"),
      col("clientGeneralDescription").as("description"),
      col("clientCountry").as("country"),
      col("clientState").as("state"),
      houseSenateIdPart(1).as("senate_id")).as("client"),
    struct(
      col("organizationName").as("name"),
      col("registrantGeneralDescription").as("description"),
      col("country").as("country"),
      col("state").as("state"),
      houseSenateIdPart(0).as("senate_id"),
      col("houseID").as("house_id"),
      col("printedName").as("contact")).as("registrant"),
    concat(lit("https://disclosurespreview.house.gov/ld/ldxmlrelease/"),
      col("reportYear"), lit("/"), col("reportType"), lit("/"),
      col("id"), lit(".xml")).as("url"))

  private def houseActivityRow(lob: Column, issueCode: Column,
      issueCodes: Column, issues: Column): Column =
    struct(
      struct(upper(concat_ws(" ",
        lob.getField("lobbyistFirstName"),
        lob.getField("lobbyistLastName"),
        lob.getField("lobbyistSuffix"))).as("name")).as("lobbyist"),
      when(lob.getField("coveredPosition").isNotNull &&
        lob.getField("coveredPosition") =!= "N/A",
        lob.getField("coveredPosition")).as("covered_position"),
      issueCode.as("issue_area_code"),
      issueCodes.as("issue_area_codes"),
      issues.as("specific_issues"))

  /** Activity rows (house `main.py:341-380`): per-ali lobbyists with
    * the ali's issue code/description; else the top-level lobbyist
    * list with the `ali_Code` array. */
  private def houseActivities: Column = {
    val emptyLobs = array().cast(ArrayType(houseLobbyistSchema))
    val aliPath = flatten(transform(col("alis.ali_info"), i =>
      transform(coalesce(i.getField("lobbyists").getField("lobbyist"), emptyLobs),
        lob => houseActivityRow(lob,
          i.getField("issueAreaCode"),
          lit(null).cast(ArrayType(StringType)),
          i.getField("specific_issues").getField("description")))))
    val fallbackPath = transform(
      coalesce(col("lobbyists.lobbyist"), emptyLobs),
      lob => houseActivityRow(lob,
        lit(null).cast(StringType),
        filter(col("alis.ali_Code"), c => c.isNotNull),
        col("specific_issues")))
    val rows = when(col("alis.ali_info").isNotNull, aliPath)
      .otherwise(fallbackPath)
    filter(rows, r => length(r.getField("lobbyist").getField("name")) > 0)
  }

  /** Parent docs for `federal_house_lobbying_disclosures`. */
  def houseParentDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings.select(
      col("id").as("doc_id"),
      struct(filings.columns.map(col): _*).as("obj"),
      houseProcessed.as("processed"),
      struct(runTs.as("last_indexed")).as("context"))

  /** `_nested` child docs, same layout as the senate's. */
  def houseChildDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings
      .select(col("id"), houseProcessed.as("parent"),
        explode(houseActivities).as("child"))
      .select(
        struct(runTs.as("last_indexed"), col("id").as("parent_id"))
          .as("context"),
        col("parent"), col("child"))
}

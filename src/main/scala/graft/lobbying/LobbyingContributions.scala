package graft.lobbying

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Dates

/** Per-chamber lobbying-CONTRIBUTION envelopes (SURVEY §1.2's
  * `federal_{senate,house}_lobbying_contributions` + `_nested`),
  * completing the lobbying doc layer next to
  * [[LobbyingChambers]]' disclosures.
  *
  *  - Senate (`federal_senate_lobbying_ingest_get_contributions/
  *    main.py:35-116`): LDA JSON; plain-case lobbyist name join over
  *    first/middle/last/suffix; contribution dates are strict
  *    `%Y-%m-%d` → EST-localized `%z` strings; amount strips commas.
  *  - House (`federal_house_lobbying_ingest_get_contributions/
  *    main.py:220-330`): XML payloads; the literal `02/31/2008` →
  *    `02/29/2008` repair then a 9-format ladder — an item whose
  *    non-null date survives NO format is dropped entirely
  *    (`:287 continue`); an item with every display field null is
  *    dropped (`:289`); UPPER-cased name WITH middle; pacs collapse to
  *    one comma-joined string; amount strips `$`, commas, spaces.
  *
  * Parent-doc mutation semantics preserved from the reference: the
  * parent is bulked with a REFERENCE to `processed`, then
  * `contributions` (and `pacs`, only on that same branch) are popped
  * before the bulk flushes — so when a filing HAS contributions its
  * parent doc carries neither, and when it has none the parent keeps
  * its pacs. Children land in `_nested` as {context{last_indexed,
  * parent_id}, parent, child}.
  *
  * Typed deviations (documented, same family as [[LobbyingChambers]]):
  * absent ids are nulls, not python `str(None)`; the "omit empty
  * lobbyist dict" rule becomes a null struct.
  */
object LobbyingContributions {

  // ------------------------------------------------------------ senate

  val senateContribItemSchema: StructType = StructType(Seq(
    StructField("contribution_type_display", StringType),
    StructField("contributor_name", StringType),
    StructField("payee_name", StringType),
    StructField("honoree_name", StringType),
    StructField("amount", StringType),
    StructField("date", StringType)))

  val senateContribFilingSchema: StructType = StructType(Seq(
    StructField("filing_uuid", StringType),
    StructField("filing_year", LongType),
    StructField("filing_type", StringType),
    StructField("dt_posted", StringType),
    StructField("filing_document_url", StringType),
    StructField("no_contributions", BooleanType),
    StructField("registrant", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("country", StringType),
      StructField("state", StringType),
      StructField("house_registrant_id", LongType),
      StructField("contact_name", StringType)))),
    StructField("lobbyist", StructType(Seq(
      StructField("id", LongType),
      StructField("first_name", StringType),
      StructField("middle_name", StringType),
      StructField("last_name", StringType),
      StructField("suffix", StringType)))),
    StructField("pacs", ArrayType(StringType)),
    StructField("contribution_items", ArrayType(senateContribItemSchema))))

  def readSenateFilings(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(senateContribFilingSchema).json(path)

  /** {id?, name?} — null struct when both empty (the reference's
    * omit-empty-dict; senate `main.py:54-63`: plain-case join incl.
    * middle). */
  private def senateLobbyist: Column = {
    val name = concat_ws(" ", col("lobbyist.first_name"),
      col("lobbyist.middle_name"), col("lobbyist.last_name"),
      col("lobbyist.suffix"))
    when(col("lobbyist.id").isNotNull || length(name) > 0,
      struct(col("lobbyist.id").as("id"),
        when(length(name) > 0, name).as("name")))
  }

  private def senateItems: Column =
    transform(col("contribution_items"), c => struct(
      senateLobbyist.as("lobbyist"),
      c.getField("contribution_type_display").as("contribution_type"),
      c.getField("contributor_name").as("contributor_name"),
      c.getField("payee_name").as("payee_name"),
      c.getField("honoree_name").as("recipient_name"),
      regexp_replace(c.getField("amount"), ",", "")
        .try_cast(DoubleType).as("amount"),
      when(c.getField("date").isNotNull, Dates.est_offset_string(
        try_to_timestamp(c.getField("date"), lit("yyyy-M-d")))).as("date")))

  /** processed minus contributions/pacs — the post-pop parent shape
    * when children exist. `withPacs` adds the keep-pacs-when-no-
    * contributions branch. */
  private def senateParent(withPacs: Boolean): Column = {
    val base = Seq(
      col("dt_posted").as("date_submitted"),
      col("filing_year").as("filing_year"),
      col("filing_type").as("filing_type"),
      struct(
        col("registrant.name").as("name"),
        col("registrant.description").as("description"),
        col("registrant.country").as("country"),
        col("registrant.state").as("state"),
        col("registrant.id").cast("string").as("senate_id"),
        col("registrant.house_registrant_id").cast("string").as("house_id"),
        col("registrant.contact_name").as("contact")).as("registrant"),
      col("no_contributions").as("no_contributions"),
      senateLobbyist.as("lobbyist"),
      col("filing_document_url").as("url"))
    val pacs =
      when(coalesce(size(col("contribution_items")), lit(0)) <= 0 &&
          coalesce(size(col("pacs")), lit(0)) > 0,
        col("pacs")).as("pacs")
    struct((if (withPacs) base :+ pacs else base): _*)
  }

  /** Parent docs for `federal_senate_lobbying_contributions`. */
  def senateParentDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings.select(
      col("filing_uuid").as("doc_id"),
      struct(filings.columns.map(col): _*).as("obj"),
      senateParent(withPacs = true).as("processed"),
      struct(runTs.as("last_indexed")).as("context"))

  /** `_nested` child docs — one per contribution item. */
  def senateChildDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings
      .select(col("filing_uuid"), senateParent(withPacs = false).as("parent"),
        explode(senateItems).as("child"))
      .select(
        struct(runTs.as("last_indexed"),
          col("filing_uuid").as("parent_id")).as("context"),
        col("parent"), col("child"))

  // ------------------------------------------------------------- house

  val houseContribItemSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("contributorName", StringType),
    StructField("payeeName", StringType),
    StructField("recipientName", StringType),
    StructField("amount", StringType),
    StructField("date", StringType)))

  val houseContribFilingSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("signedDate", StringType),
    StructField("reportYear", StringType),
    StructField("reportType", StringType),
    StructField("organizationName", StringType),
    StructField("country", StringType),
    StructField("state", StringType),
    StructField("senateRegID", StringType),
    StructField("houseRegID", StringType),
    StructField("contactName", StringType),
    StructField("noContributions", StringType),
    StructField("lobbyistID", StringType),
    StructField("lobbyistFirstName", StringType),
    StructField("lobbyistMiddleName", StringType),
    StructField("lobbyistLastName", StringType),
    StructField("lobbyistSuffix", StringType),
    StructField("pacs", StructType(Seq(
      StructField("pac", ArrayType(StructType(Seq(
        StructField("name", StringType)))))))),
    StructField("contributions", StructType(Seq(
      StructField("contribution", ArrayType(houseContribItemSchema)))))))

  def readHouseFilings(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(houseContribFilingSchema).json(path)

  /** The contribution-date ladder (house `main.py:252-287`) — NO
    * first-position timestamp format, ends with the odd `%m/%d %Y`. */
  val houseContribDateFormats: Seq[String] = Seq(
    "M/d/yyyy", "M/d/yy", "M-d-yyyy", "M-d-yy",
    "M.d.yyyy", "M.d.yy", "MMddyyyy", "MMddyy", "M/d yyyy")

  /** Parse with the literal 02/31/2008 repair (`main.py:249-250` —
    * string equality ONLY; no general day-clamp here, any other
    * overflowed date must fail and drop its item) and python's %y
    * century pivot; null in, null out; unparseable non-null stays null
    * HERE — the item-drop rule is applied where items are built. */
  private def houseItemDate(c: Column): Column = {
    val repaired = when(c === "02/31/2008", lit("02/29/2008")).otherwise(c)
    // pivot only 2-digit-year matches — a genuine 4-digit 2099 stays
    // (see LobbyingChambers.houseDate); no general day-clamp here
    val (two, four) =
      houseContribDateFormats.partition(LobbyingChambers.isTwoDigitYear)
    val nullTs = lit(null).cast("timestamp")
    val parsed4 = if (four.isEmpty) nullTs
      else coalesce(four.map(f => try_to_timestamp(repaired, lit(f))): _*)
    val parsed2 = if (two.isEmpty) nullTs
      else coalesce(two.map(f => try_to_timestamp(repaired, lit(f))): _*)
    val pivoted2 = when(year(parsed2) >= 2069,
      parsed2 - expr("INTERVAL 100 YEARS")).otherwise(parsed2)
    when(c.isNotNull, Dates.est_offset_string(coalesce(parsed4, pivoted2)))
  }

  private def houseLobbyist: Column = {
    val name = upper(concat_ws(" ", col("lobbyistFirstName"),
      col("lobbyistMiddleName"), col("lobbyistLastName"),
      col("lobbyistSuffix")))
    when(col("lobbyistID").isNotNull || length(name) > 0,
      struct(col("lobbyistID").as("id"),
        when(length(name) > 0, name).as("name")))
  }

  /** Items with the reference's two drop rules: a non-null date that
    * survives no format drops the item (`continue`); an item with all
    * six display fields null is skipped. */
  private def houseItems: Column = {
    val raw = coalesce(col("contributions.contribution"),
      array().cast(ArrayType(houseContribItemSchema)))
    val items = transform(raw, c => struct(
      houseLobbyist.as("lobbyist"),
      c.getField("type").as("contribution_type"),
      c.getField("contributorName").as("contributor_name"),
      c.getField("payeeName").as("payee_name"),
      c.getField("recipientName").as("recipient_name"),
      regexp_replace(c.getField("amount"), "[,$ ]", "")
        .try_cast(DoubleType).as("amount"),
      houseItemDate(c.getField("date")).as("date"),
      // drop flags, stripped before emission
      (c.getField("date").isNotNull &&
        houseItemDate(c.getField("date")).isNull).as("__badDate"),
      (c.getField("type").isNull && c.getField("contributorName").isNull &&
        c.getField("payeeName").isNull && c.getField("recipientName").isNull &&
        c.getField("amount").isNull && c.getField("date").isNull)
        .as("__allNull")))
    transform(
      filter(items, i => !i.getField("__badDate") && !i.getField("__allNull")),
      i => i.dropFields("__badDate", "__allNull"))
  }

  private def housePacs: Column = {
    val names = filter(
      transform(coalesce(col("pacs.pac"),
          array().cast(ArrayType(StructType(Seq(
            StructField("name", StringType)))))),
        p => p.getField("name")),
      n => n.isNotNull)
    when(size(names) > 0, array_join(names, ", "))
  }

  private def houseParent(withPacs: Boolean): Column = {
    val base = Seq(
      col("signedDate").as("date_submitted"),
      col("reportYear").cast("int").as("filing_year"),
      col("reportType").as("filing_type"),
      struct(
        col("organizationName").as("name"),
        col("country").as("country"),
        col("state").as("state"),
        col("senateRegID").as("senate_id"),
        col("houseRegID").as("house_id"),
        col("contactName").as("contact")).as("registrant"),
      col("noContributions").as("no_contributions"),
      houseLobbyist.as("lobbyist"),
      concat(lit("https://disclosurespreview.house.gov/lc/lcxmlrelease/"),
        col("reportYear"), lit("/"), col("reportType"), lit("/"),
        col("id"), lit(".xml")).as("url"))
    val pacs = when(coalesce(size(houseItems), lit(0)) <= 0, housePacs).as("pacs")
    struct((if (withPacs) base :+ pacs else base): _*)
  }

  /** Parent docs for `federal_house_lobbying_contributions`. */
  def houseParentDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings.select(
      col("id").as("doc_id"),
      struct(filings.columns.map(col): _*).as("obj"),
      houseParent(withPacs = true).as("processed"),
      struct(runTs.as("last_indexed")).as("context"))

  /** `_nested` child docs — one per surviving contribution item. */
  def houseChildDocs(filings: DataFrame, runTs: Column): DataFrame =
    filings
      .select(col("id"), houseParent(withPacs = false).as("parent"),
        explode(houseItems).as("child"))
      .select(
        struct(runTs.as("last_indexed"), col("id").as("parent_id"))
          .as("context"),
        col("parent"), col("child"))
}

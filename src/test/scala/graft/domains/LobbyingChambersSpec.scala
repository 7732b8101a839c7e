package graft.domains

import graft.SparkFunSuite
import graft.lobbying.LobbyingChambers
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S9/S10 chamber split: senate vs house envelope shapes (parent +
  * `_nested` child docs), the per-chamber name joins, senate-id
  * derivation, the house date ladder with EST localization, and the
  * house top-level-lobbyist fallback path. */
class LobbyingChambersSpec extends SparkFunSuite {
  import spark.implicits._

  private val runTs = lit("2022-06-01").cast("timestamp")

  test("senate: plain-case name join, N/A covered dropped, parent sans activities") {
    val d = Files.createTempDirectory("senlob").toString
    val filing =
      """{"filing_uuid":"F1","filing_year":2021,"filing_type":"Q1","dt_posted":"2021-04-15T10:00:00+00:00",
        |"filing_document_url":"https://lda.senate.gov/f1.pdf",
        |"client":{"id":77,"name":"Acme Corp","general_description":"widgets","country":"US","state":"OH","effective_date":"2021-01-01"},
        |"registrant":{"id":55,"name":"Lobby LLC","description":"advocacy","country":"US","state":"DC","house_registrant_id":99,"contact_name":"Jane Doe"},
        |"lobbying_activities":[
        |  {"general_issue_code":"TAX","description":"tax reform","lobbyists":[
        |    {"lobbyist":{"id":1,"first_name":"John","middle_name":null,"last_name":"Smith","suffix":"Jr."},"covered_position":"N/A"},
        |    {"lobbyist":{"id":2,"first_name":null,"middle_name":null,"last_name":null,"suffix":null},"covered_position":"Senate aide"}]},
        |  {"general_issue_code":"ENV","description":null,"lobbyists":[
        |    {"lobbyist":{"id":3,"first_name":"Ann","middle_name":"B","last_name":"Lee","suffix":null},"covered_position":"Hill staffer"}]}]}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(s"$d/senate.jsonl"), filing)
    val filings = LobbyingChambers.readSenateFilings(spark, s"$d/senate.jsonl")

    val parent = LobbyingChambers.senateParentDocs(filings, runTs).head()
    assert(parent.getAs[String]("doc_id") == "F1")
    val proc = parent.getStruct(parent.fieldIndex("processed"))
    assert(proc.getStruct(proc.fieldIndex("client"))
      .getAs[String]("senate_id") == "77")
    assert(proc.getStruct(proc.fieldIndex("registrant"))
      .getAs[String]("house_id") == "99")
    // the pop quirk: parent processed carries no activities field
    assert(!proc.schema.fieldNames.contains("activities"))

    val children = LobbyingChambers.senateChildDocs(filings, runTs)
    // lobbyist 2 has an all-null name -> dropped; 1 and 3 remain
    assert(children.count() == 2)
    val c1 = children.filter(col("child.lobbyist.id") === 1).head()
    val ch1 = c1.getStruct(c1.fieldIndex("child"))
    val lb1 = ch1.getStruct(ch1.fieldIndex("lobbyist"))
    assert(lb1.getAs[String]("name") == "John Smith Jr.") // NOT upper-cased
    assert(ch1.isNullAt(ch1.fieldIndex("covered_position"))) // N/A dropped
    assert(ch1.getAs[String]("issue_area_code") == "TAX")
    val ctx = c1.getStruct(c1.fieldIndex("context"))
    assert(ctx.getAs[String]("parent_id") == "F1")
  }

  test("house: upper name, senateID split, date ladder + EST, ali path") {
    val d = Files.createTempDirectory("houselob").toString
    val filing =
      """{"id":"H9","signedDate":"1/5/2021 2:30:00 PM","effectiveDate":"02.01.21","terminationDate":null,
        |"reportYear":"2021","reportType":"Q1","clientName":"Acme Corp","clientGeneralDescription":"widgets",
        |"clientCountry":"USA","clientState":"OH","senateID":"55-77","houseID":"H123",
        |"organizationName":"Lobby LLC","registrantGeneralDescription":"advocacy","country":"USA","state":"DC",
        |"printedName":"Jane Doe",
        |"alis":{"ali_info":[{"issueAreaCode":"TAX","specific_issues":{"description":"tax reform"},
        |  "lobbyists":{"lobbyist":[{"lobbyistFirstName":"John","lobbyistLastName":"Smith","lobbyistSuffix":"Jr.","coveredPosition":"N/A"}]}}]}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(s"$d/house.jsonl"), filing)
    val filings = LobbyingChambers.readHouseFilings(spark, s"$d/house.jsonl")

    val parent = LobbyingChambers.houseParentDocs(filings, runTs).head()
    assert(parent.getAs[String]("doc_id") == "H9")
    val proc = parent.getStruct(parent.fieldIndex("processed"))
    assert(proc.getStruct(proc.fieldIndex("client"))
      .getAs[String]("senate_id") == "77")  // right of '-'
    assert(proc.getStruct(proc.fieldIndex("registrant"))
      .getAs[String]("senate_id") == "55")  // left of '-'
    assert(proc.getAs[Int]("filing_year") == 2021)
    // 1/5/2021 14:30 EST == 19:30 UTC
    assert(proc.getAs[java.sql.Timestamp]("date_submitted").toInstant.toString
      == "2021-01-05T19:30:00Z")
    // '02.01.21' -> 2021-02-01 00:00 EST == 05:00 UTC (yy pivot stays 20xx)
    assert(proc.getAs[java.sql.Timestamp]("effective_date").toInstant.toString
      == "2021-02-01T05:00:00Z")
    assert(proc.getAs[String]("url")
      == "https://disclosurespreview.house.gov/ld/ldxmlrelease/2021/Q1/H9.xml")

    val children = LobbyingChambers.houseChildDocs(filings, runTs)
    assert(children.count() == 1)
    val c = children.head()
    val ch = c.getStruct(c.fieldIndex("child"))
    assert(ch.getStruct(ch.fieldIndex("lobbyist"))
      .getAs[String]("name") == "JOHN SMITH JR.") // upper-cased, no middle
    assert(ch.getAs[String]("issue_area_code") == "TAX")
    assert(ch.getAs[String]("specific_issues") == "tax reform")
  }

  test("house fallback path: top-level lobbyists with ali_Code array") {
    val d = Files.createTempDirectory("houselob2").toString
    val filing =
      """{"id":"H10","signedDate":"3/1/2021","reportYear":"2021","reportType":"Q1",
        |"clientName":"Acme","senateID":"55-77","organizationName":"Lobby LLC",
        |"specific_issues":"general advocacy",
        |"alis":{"ali_Code":["TAX",null,"ENV"]},
        |"lobbyists":{"lobbyist":[{"lobbyistFirstName":"Ann","lobbyistLastName":"Lee"}]}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(s"$d/house.jsonl"), filing)
    val filings = LobbyingChambers.readHouseFilings(spark, s"$d/house.jsonl")
    val children = LobbyingChambers.houseChildDocs(filings, runTs)
    assert(children.count() == 1)
    val c = children.head()
    val ch = c.getStruct(c.fieldIndex("child"))
    assert(ch.getStruct(ch.fieldIndex("lobbyist")).getAs[String]("name") == "ANN LEE")
    assert(ch.isNullAt(ch.fieldIndex("issue_area_code")))
    assert(ch.getSeq[String](ch.fieldIndex("issue_area_codes")) == Seq("TAX", "ENV"))
    assert(ch.getAs[String]("specific_issues") == "general advocacy")
  }
}

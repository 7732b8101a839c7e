package graft.domains

import graft.SparkFunSuite
import graft.lobbying.LobbyingContributions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Per-chamber lobbying-contribution envelopes: parent pop semantics
  * (contributions AND pacs leave the parent only when children exist),
  * per-chamber name casing, the house date repair/drop ladder, and the
  * all-null item guard. */
class LobbyingContributionsSpec extends SparkFunSuite {
  import spark.implicits._

  test("senate: items, amounts, dates; pacs kept only without contributions") {
    val json = Seq(
      """{"filing_uuid":"S1","filing_year":2022,"filing_type":"MM",
        |"dt_posted":"2022-03-15","filing_document_url":"http://x/1",
        |"no_contributions":false,
        |"registrant":{"id":77,"name":"ACME LLP","house_registrant_id":88},
        |"lobbyist":{"id":5,"first_name":"Jane","middle_name":"Q",
        |  "last_name":"Doe","suffix":"Jr"},
        |"pacs":["GOOD PAC"],
        |"contribution_items":[
        |  {"contribution_type_display":"FECA","contributor_name":"Jane Q Doe Jr",
        |   "payee_name":"Com A","honoree_name":"Hon B","amount":"1,500.00",
        |   "date":"2022-01-15"}]}""".stripMargin.replaceAll("\n", ""),
      """{"filing_uuid":"S2","filing_year":2022,"filing_type":"MM",
        |"no_contributions":true,"pacs":["OTHER PAC"]}"""
        .stripMargin.replaceAll("\n", "")).toDS
    val filings = LobbyingContributions.readSenateFilings(
      spark, { val d = java.nio.file.Files.createTempDirectory("slc")
        val p = d.resolve("f.jsonl")
        java.nio.file.Files.writeString(p, json.collect().mkString("\n"))
        p.toString })
    val ts = lit("2022-07-01").cast("timestamp")

    val parents = LobbyingContributions.senateParentDocs(filings, ts)
      .collect().map(r => r.getString(0) -> r).toMap
    val p1 = parents("S1").getAs[Row]("processed")
    // with contributions: pacs popped from the parent
    assert(p1.isNullAt(p1.fieldIndex("pacs")))
    assert(p1.getAs[Row]("lobbyist").getAs[String]("name") == "Jane Q Doe Jr")
    assert(p1.getAs[Row]("registrant").getAs[String]("senate_id") == "77")
    // without contributions: pacs stay
    val p2 = parents("S2").getAs[Row]("processed")
    assert(p2.getSeq[String](p2.fieldIndex("pacs")).toList == List("OTHER PAC"))

    val kids = LobbyingContributions.senateChildDocs(filings, ts).collect()
    assert(kids.length == 1)
    val child = kids.head.getAs[Row]("child")
    assert(child.getAs[Double]("amount") == 1500.0)
    assert(child.getAs[String]("date") == "2022-01-15T00:00:00-0500")
    assert(child.getAs[String]("recipient_name") == "Hon B")
    // the child's parent shape never carries pacs
    assert(!kids.head.getAs[Row]("parent").schema.fieldNames.contains("pacs"))
  }

  test("house: upper name with middle, date repair + drop rules, pac join") {
    val json = Seq(
      """{"id":"H1","signedDate":"4/7/2022","reportYear":"2022",
        |"reportType":"MM","organizationName":"Firm","senateRegID":"400-12",
        |"houseRegID":"H9","lobbyistID":"L1","lobbyistFirstName":"Jane",
        |"lobbyistMiddleName":"Q","lobbyistLastName":"Doe",
        |"pacs":{"pac":[{"name":"PAC ONE"},{"name":null},{"name":"PAC TWO"}]},
        |"contributions":{"contribution":[
        |  {"type":"FECA","contributorName":"X","amount":"$2,000.50",
        |   "date":"02/31/2008"},
        |  {"type":"FECA","contributorName":"Y","date":"13/45/2020"},
        |  {"type":null,"contributorName":null,"payeeName":null,
        |   "recipientName":null,"amount":null,"date":null},
        |  {"type":"FECA","contributorName":"Z","date":"7/4/99"}]}}"""
        .stripMargin.replaceAll("\n", ""),
      """{"id":"H2","reportYear":"2022","reportType":"MM",
        |"pacs":{"pac":[{"name":"SOLO PAC"}]}}"""
        .stripMargin.replaceAll("\n", "")).toDS
    val filings = LobbyingContributions.readHouseFilings(
      spark, { val d = java.nio.file.Files.createTempDirectory("hlc")
        val p = d.resolve("f.jsonl")
        java.nio.file.Files.writeString(p, json.collect().mkString("\n"))
        p.toString })
    val ts = lit("2022-07-01").cast("timestamp")

    val kids = LobbyingContributions.houseChildDocs(filings, ts).collect()
    // item 2 (unparseable 13/45/2020) and item 3 (all-null) dropped
    assert(kids.length == 2)
    val byContrib = kids.map(_.getAs[Row]("child"))
      .map(c => c.getAs[String]("contributor_name") -> c).toMap
    val cx = byContrib("X")
    assert(cx.getAs[String]("date") == "2008-02-29T00:00:00-0500")
    assert(cx.getAs[Double]("amount") == 2000.5)
    assert(cx.getAs[Row]("lobbyist").getAs[String]("name") == "JANE Q DOE")
    // %y century pivot: 99 → 1999, EDT in July
    assert(byContrib("Z").getAs[String]("date") == "1999-07-04T00:00:00-0400")

    val parents = LobbyingContributions.houseParentDocs(filings, ts)
      .collect().map(r => r.getString(0) -> r).toMap
    val p1 = parents("H1").getAs[Row]("processed")
    assert(p1.isNullAt(p1.fieldIndex("pacs"))) // popped with children
    // senateRegID passes through UNSPLIT (unlike disclosures)
    assert(p1.getAs[Row]("registrant").getAs[String]("senate_id") == "400-12")
    assert(p1.getAs[String]("url") ==
      "https://disclosurespreview.house.gov/lc/lcxmlrelease/2022/MM/H1.xml")
    val p2 = parents("H2").getAs[Row]("processed")
    assert(p2.getAs[String]("pacs") == "SOLO PAC")
  }
}

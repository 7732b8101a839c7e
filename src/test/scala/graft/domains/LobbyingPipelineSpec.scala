package graft.domains

import graft.SparkFunSuite
import graft.io.DocStore
import graft.lobbying.{LobbyingContributions, LobbyingChambers, LobbyingPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The lobbying DAG runner: four index families fill from per-chamber
  * filings, both parents and children dedupe against their own index,
  * and a replay (plus an overlapping second batch) inserts exactly the
  * novel filings — the reference's es.exists guard as a set op. */
class LobbyingPipelineSpec extends SparkFunSuite {

  private val runTs = lit("2022-06-01").cast("timestamp")

  private def writeJsonl(name: String, rows: String*): String = {
    val d = Files.createTempDirectory(name).toString
    Files.writeString(Paths.get(s"$d/f.jsonl"), rows.mkString("\n"))
    s"$d/f.jsonl"
  }

  private def senateDisc(uuid: String): String =
    s"""{"filing_uuid":"$uuid","filing_year":2021,"filing_type":"Q1",
       |"lobbying_activities":[{"general_issue_code":"TAX","lobbyists":[
       |  {"lobbyist":{"id":1,"first_name":"Jo","last_name":"Smith"}}]}]}"""
      .stripMargin.replace("\n", "")

  private def houseDisc(id: String): String =
    s"""{"id":"$id","reportYear":"2021","reportType":"Q1",
       |"signedDate":"4/7/2021","senateID":"400-12",
       |"alis":{"ali_info":[{"issueAreaCode":"TAX","lobbyists":{"lobbyist":[
       |  {"lobbyistFirstName":"Jo","lobbyistLastName":"Smith"}]}}]}}"""
      .stripMargin.replace("\n", "")

  private def senateContrib(uuid: String): String =
    s"""{"filing_uuid":"$uuid","filing_year":2022,"filing_type":"MM",
       |"contribution_items":[{"contributor_name":"X","amount":"10.00",
       |  "date":"2022-01-15"}]}""".stripMargin.replace("\n", "")

  private def houseContrib(id: String): String =
    s"""{"id":"$id","reportYear":"2022","reportType":"MM",
       |"contributions":{"contribution":[{"type":"FECA",
       |  "contributorName":"Y","date":"1/15/2022"}]}}"""
      .stripMargin.replace("\n", "")

  private def load(
      sd: Seq[String], hd: Seq[String],
      sc: Seq[String], hc: Seq[String]): Seq[DataFrame] = Seq(
    LobbyingChambers.readSenateFilings(spark, writeJsonl("sd", sd: _*)),
    LobbyingChambers.readHouseFilings(spark, writeJsonl("hd", hd: _*)),
    LobbyingContributions.readSenateFilings(spark, writeJsonl("sc", sc: _*)),
    LobbyingContributions.readHouseFilings(spark, writeJsonl("hc", hc: _*)))

  test("four families fill; replay no-ops; overlap inserts only novel filings") {
    val store = new DocStore(spark,
      Files.createTempDirectory("lobdocs").toString)
    val batch1 = load(
      Seq(senateDisc("S1")), Seq(houseDisc("H1")),
      Seq(senateContrib("SC1")), Seq(houseContrib("HC1")))

    val s1 = LobbyingPipeline.run(spark,
      batch1(0), batch1(1), batch1(2), batch1(3), store, runTs)
    assert(s1 == LobbyingPipeline.Summary(1, 1, 1, 1, 4))
    assert(store.read("federal_senate_lobbying_disclosures_nested")
      .get.count() == 1)

    // exact replay: nothing inserted anywhere
    val s2 = LobbyingPipeline.run(spark,
      batch1(0), batch1(1), batch1(2), batch1(3), store, runTs)
    assert(s2 == LobbyingPipeline.Summary(0, 0, 0, 0, 0))

    // overlapping second pull: one seen + one new filing per family
    val batch2 = load(
      Seq(senateDisc("S1"), senateDisc("S2")),
      Seq(houseDisc("H1"), houseDisc("H2")),
      Seq(senateContrib("SC1"), senateContrib("SC2")),
      Seq(houseContrib("HC1"), houseContrib("HC2")))
    val s3 = LobbyingPipeline.run(spark,
      batch2(0), batch2(1), batch2(2), batch2(3), store, runTs)
    assert(s3 == LobbyingPipeline.Summary(1, 1, 1, 1, 4))
    assert(store.read("federal_house_lobbying_contributions").get.count() == 2)
    assert(store.read("federal_house_lobbying_contributions_nested")
      .get.count() == 2)
  }

  test("replay heals the crash window: children committed, parent absent") {
    val store = new DocStore(spark,
      Files.createTempDirectory("lobcrash").toString)
    val empty = Seq.empty[String]
    val batch = load(Seq(senateDisc("S9")), empty, empty, empty)
    // children insert FIRST, so the only state a crash between the two
    // swaps can leave is children committed + parent missing (each
    // swap itself is journal-atomic); simulate it, then replay
    store.insertNew("federal_senate_lobbying_disclosures_nested", "doc_id",
      LobbyingPipeline.keyedChildren(
        LobbyingChambers.senateChildDocs(batch(0), runTs)))
    assert(store.read("federal_senate_lobbying_disclosures").isEmpty)
    val s = LobbyingPipeline.run(spark,
      batch(0), batch(1), batch(2), batch(3), store, runTs)
    assert(s.senateDisclosures == 1) // parent lands on replay
    assert(s.childDocs == 0)         // children dedupe against the index
    assert(store.read("federal_senate_lobbying_disclosures_nested")
      .get.count() == 1)             // exactly one generation
  }

  test("a re-fetch with drifted child content adds no second generation") {
    val store = new DocStore(spark,
      Files.createTempDirectory("lobdrift").toString)
    val empty = Seq.empty[String]
    val batch = load(Seq(senateDisc("S9")), empty, empty, empty)
    LobbyingPipeline.run(spark,
      batch(0), batch(1), batch(2), batch(3), store, runTs)
    // upstream amends the child's content under the SAME filing id:
    // the parent is already indexed, so per the es.exists skip
    // semantics the drifted children must be ignored, not inserted as
    // a second generation with new content keys
    val drifted = load(Seq(senateDisc("S9").replace(
      "\"general_issue_code\":\"TAX\"", "\"general_issue_code\":\"HCR\"")),
      empty, empty, empty)
    val s = LobbyingPipeline.run(spark,
      drifted(0), drifted(1), drifted(2), drifted(3), store, runTs)
    assert(s.senateDisclosures == 0 && s.childDocs == 0)
    assert(store.read("federal_senate_lobbying_disclosures_nested")
      .get.count() == 1)
  }

  test("replay at a different runTs inserts nothing (keys are ts-independent)") {
    val store = new DocStore(spark,
      Files.createTempDirectory("lobreplay").toString)
    val batch = load(
      Seq(senateDisc("S1")), Seq(houseDisc("H1")),
      Seq(senateContrib("SC1")), Seq(houseContrib("HC1")))
    val s1 = LobbyingPipeline.run(spark,
      batch(0), batch(1), batch(2), batch(3), store, runTs)
    assert(s1 == LobbyingPipeline.Summary(1, 1, 1, 1, 4))
    // the periodic re-fetch case: same filings, later ingest timestamp
    val later = lit("2023-01-15").cast("timestamp")
    val s2 = LobbyingPipeline.run(spark,
      batch(0), batch(1), batch(2), batch(3), store, later)
    assert(s2 == LobbyingPipeline.Summary(0, 0, 0, 0, 0))
    assert(store.read("federal_senate_lobbying_disclosures_nested")
      .get.count() == 1)
  }

  test("identical duplicate items in one filing keep BOTH child docs") {
    val store = new DocStore(spark,
      Files.createTempDirectory("lobdup").toString)
    // the same contribution listed twice — the reference's ES auto-ids
    // store both; the content-derived keys must too
    val twice =
      s"""{"filing_uuid":"SD1","filing_year":2022,"filing_type":"MM",
         |"contribution_items":[
         |  {"contributor_name":"X","amount":"10.00","date":"2022-01-15"},
         |  {"contributor_name":"X","amount":"10.00","date":"2022-01-15"}]}"""
        .stripMargin.replace("\n", "")
    val empty = Seq.empty[String]
    val batch = load(empty, empty, Seq(twice), empty)
    val s = LobbyingPipeline.run(spark,
      batch(0), batch(1), batch(2), batch(3), store, runTs)
    assert(s.childDocs == 2)
    assert(store.read("federal_senate_lobbying_contributions_nested")
      .get.count() == 2)
  }
}

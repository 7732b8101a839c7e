package graft.fec

import graft.SparkFunSuite
import graft.graph.GraphStore
import graft.io.StagedSwapWriter
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end FEC slice (SURVEY §7.3) over synthesized pipe-delimited
  * fixtures: bulk read → master tables → classification views →
  * enrichment → graph, plus MERGE idempotency and amendment replay. */
class FecPipelineSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("fec_fixtures").toString
    // cn22: 3 candidates (one with LAST, FIRST name + title)
    write(s"$d/cn22.txt", Seq(
      "H001|SMITH, JOHN JR|DEM|2022|CA|H|01|C|C|C001|||LOS ANGELES|CA|90001",
      "S001|DOE, JANE DR|REP|2022|TX|S|00|I|C|C002|||AUSTIN|TX|78701",
      "P001|ACME PERSON|IND|2022|NY|P|00|O|C|C003|||NYC|NY|10001"))
    // cm22: 3 committees
    write(s"$d/cm22.txt", Seq(
      "C001|FRIENDS OF SMITH|T ONE||||LA|CA|90001|A|H|DEM|Q||H001",
      "C002|JANE PAC|T TWO||||AUSTIN|TX|78701|B|S|REP|Q|C|ACME CORP|S001",
      "C003|BIG ORG PAC|T THREE||||NYC|NY|10001|U|Q|IND|M||"))
    // ccl22: linkages (two per candidate H001)
    write(s"$d/ccl22.txt", Seq(
      "H001|2022|2022|C001|H|A|1001",
      "H001|2022|2022|C003|Q|U|1002",
      "S001|2022|2022|C002|S|B|1003"))
    // indiv22: individual contributions — memo rows, dup rows, 9-digit
    // and zero zips, MMDDYYYY dates, IND/ORG entity types
    write(s"$d/indiv22.txt", Seq(
      "C001|N|Q1|P|IMG1|15|IND|BROWN, ALICE|SF|CA|941101234|ACME|ENGINEER|01152022|500.0||T1|101||_|9001",
      "C001|N|Q1|P|IMG1|15|IND|BROWN, ALICE|SF|CA|941101234|ACME|ENGINEER|01152022|500.0||T1|101||_|9001", // exact dup
      "C002|N|Q1|P|IMG2|15|IND|GREEN, BOB MR|DALLAS|TX|0|WIDGETS|SALES|02012022|250.0||T2|102||_|9002",
      "C002|N|Q1|P|IMG3|15|ORG|MEGA CORP, LLC|NYC|NY|10001||  |03012022|1000.0||T3|103||_|9003",
      "C003|N|Q1|P|IMG4|24T|IND|WHITE, CAROL|LA|CA|90001|SELF|DOCTOR||750.0||T4|104||_|9004", // no date
      "C003|N|Q1|P|IMG5|22Y|IND|MEMO PERSON|LA|CA|90001|X|Y|04012022|10.0||T5|105|X|memo|9005")) // memo → excluded
    // oth22: committee-to-committee rows (one receipt, one disbursement)
    write(s"$d/oth22.txt", Seq(
      "C001|N|Q1|P|IMG6|18K|COM|JANE PAC|AUSTIN|TX|78701|||05012022|2000.0|C002|T6|106||_|9006",
      "C002|N|Q1|P|IMG7|24A|COM|FRIENDS|LA|CA|90001|||05022022|300.0|C001|T7|107||_|9007",
      "C003|N|Q1|P|IMG8|15|CAN|SMITH JOHN|LA|CA|90001|||06012022|900.0|H001|T8|108||_|9008"))
    // oppexp22 + independent expenditures (with an amendment chain)
    write(s"$d/oppexp22.txt", Seq(
      "C001|N|2022|Q1|IMGA|17|F3|SB|STAPLES INC|LA|CA|90001|01/20/2022|99.5|P|OFFICE SUPPLIES|ADM|Admin||_|ORG|8001|501|TA||x",
      "C002|N|2022|Q1|IMGB|17|F3|SB|AIRLINE LLC|DALLAS|TX|75001|02/20/2022|450.0|P|TRAVEL|TRV|Travel|X|memo|ORG|8002|502|TB||x")) // memo → excluded
    Files.writeString(Paths.get(s"$d/independent_expenditure_2022.csv"),
      Seq(
        "can_id,can_nam,spe_id,spe_nam,ele_typ,can_off_sta,can_off_dis,can_off,can_par_aff,exp_amo,exp_dat,agg_amo,sup_opp,pur,pay,file_num,amn_ind,tra_id,ima_num,rec_dt,fec_election_yr,prev_file_num,dissem_dt",
        "H001,JOHN SMITH,C003,BIG ORG PAC,G,CA,01,H,DEM,5000.0,03-JAN-22,5000.0,S,TV ADS,MEDIA BUYERS,7001,N,TRX1,IM1,04-JAN-22,2022,,",
        "S001,JANE DOE,C003,BIG ORG PAC,G,TX,00,S,REP,800.0,05-JAN-22,800.0,O,RADIO,AD CO,7002,N,TRX2,IM2,06-JAN-22,2022,,",
        "H001,JOHN SMITH,C003,BIG ORG PAC,G,CA,01,H,DEM,6000.0,07-JAN-22,6000.0,S,TV ADS MORE,MEDIA BUYERS,7003,A,TRX1,IM3,08-JAN-22,2022,7001,")
        .mkString("\n"))
    d
  }

  private def write(path: String, lines: Seq[String]): Unit =
    Files.writeString(Paths.get(path), lines.mkString("\n"))

  private lazy val cn = FecSchemas.readBulkFile(spark, "cn22", s"$dir/cn22.txt")
  private lazy val cm = FecSchemas.readBulkFile(spark, "cm22", s"$dir/cm22.txt")
  private lazy val ccl = FecSchemas.readBulkFile(spark, "ccl22", s"$dir/ccl22.txt")
  private lazy val indiv = FecSchemas.readBulkFile(spark, "indiv22", s"$dir/indiv22.txt")
  private lazy val oth = FecSchemas.readBulkFile(spark, "oth22", s"$dir/oth22.txt")
  private lazy val oppexp = FecSchemas.readBulkFile(spark, "oppexp22", s"$dir/oppexp22.txt")
  private lazy val indExp = FecSchemas.readBulkFile(spark,
    "independent_expenditure_2022", s"$dir/independent_expenditure_2022.csv")
  private lazy val contributions = MasterTables.contributions(oth, indiv)
  private lazy val elastic = ContributionViews.elastic(contributions, cn, cm)
  private[fec] def elasticPublic = elastic
  private[fec] def bulkDirPublic = dir

  test("S3/S5: pipe text scan with declared schemas") {
    assert(cn.count() == 3 && cn.schema("cand_election_yr").dataType.typeName == "long")
    assert(indiv.count() == 6)
    assert(indExp.count() == 3) // header skipped
  }

  test("S5: webl22 is declared from its own reference definition") {
    // the reference declares weball22 (main.py:44-76) and webl22
    // (main.py:105-137) SEPARATELY; their column lists coincide today,
    // but the registry must hold independent declarations so a
    // reference-side divergence surfaces as a schema diff instead of
    // being silently absorbed by a shared object
    assert(!(FecSchemas.webl eq FecSchemas.weball),
      "webl22 must not alias the weball22 StructType object")
    assert(FecSchemas.webl == FecSchemas.weball,
      "today the two declarations' fields coincide (per the reference)")
    assert(FecSchemas.registry("webl22") eq FecSchemas.webl)
    assert(FecSchemas.registry("weball22") eq FecSchemas.weball)
  }

  test("master contributions22: dedup + memo exclusion + transforms") {
    val rows = contributions.collect()
    // 6 indiv (1 memo, 1 dup) + 3 oth = 9 → minus memo, minus dup = 7
    assert(rows.length == 7)
    val alice = contributions.filter($"sub_id" === 9001).head()
    assert(alice.getAs[String]("transaction_dt") == "2022-01-15")
    assert(alice.getAs[String]("zip_code") == "94110")
    assert(!contributions.filter($"sub_id" === 9005).isEmpty == false) // memo gone
  }

  test("classification views partition the filtered fact rows") {
    val c = contributions
    val classes = Seq(
      ContributionViews.fromCandidates(c).count(),
      ContributionViews.fromIndDonors(c).count(),
      ContributionViews.fromOrgDonors(c).count(),
      ContributionViews.comReceipts(c).count(),
      ContributionViews.comDisbursements(c).count(),
      ContributionViews.canDisbursements(c).count(),
      ContributionViews.orgReceipts(c).count(),
      ContributionViews.orgDisbursements(c).count())
    // IND receipts: 9001, 9002, 9004 (24T stays receipt) = 3
    assert(classes(1) == 3)
    // ORG donors (other_id null): 9003
    assert(classes(2) == 1)
    // COM receipts: 9006 (18K); COM disbursements: 9007 (24A)
    assert(classes(3) == 1 && classes(4) == 1)
    // CAN receipts: 9008
    assert(classes(0) == 1)
  }

  test("elastic enrichment: tagged union with broadcast dims") {
    assert(elastic.count() == 7)
    val ind = elastic.filter($"classification" === "individual")
    assert(ind.count() == 3)
    val e = elastic.filter($"sub_id" === 9006).head()
    assert(e.getAs[String]("classification") === "committee")
    assert(e.getAs[String]("source_cmte_nm") === "JANE PAC")
    assert(e.getAs[String]("target_cmte_nm") === "FRIENDS OF SMITH")
    val can = elastic.filter($"sub_id" === 9008).head()
    assert(can.getAs[String]("source_cand_name") === "SMITH, JOHN JR")
  }

  test("expenditures22 master: operating + independent union, parse dates") {
    val exp = MasterTables.expenditures(oppexp, indExp, cm, cn)
    assert(exp.count() == 1 + 3) // one oppexp row memo-excluded
    val op = exp.filter($"type" === "operating").head()
    assert(op.getAs[String]("transaction_dt") == "2022-01-20")
    assert(op.getAs[String]("cmte_nm") == "FRIENDS OF SMITH")
    val ie = exp.filter($"id" === "7001-TRX1").head()
    assert(ie.getAs[String]("transaction_dt") == "2022-01-03")
    assert(ie.getAs[String]("cand_name") == "SMITH, JOHN JR") // cn22 wins over can_nam
    assert(ie.getAs[String]("rec_dt") == "2022-01-04")
  }

  test("graph: contributions load is idempotent (MERGE replay)") {
    val gdir = Files.createTempDirectory("graph1").toString
    val store = new GraphStore(spark, gdir)
    FecGraph.loadCandidates(store, cn)
    FecGraph.loadCommittees(store, cm, ccl)
    FecGraph.loadContributions(store, elastic)
    def snapshot() = Map(
      "cand" -> store.readVertices("Candidate").get.collect().toSet,
      "donor" -> store.readVertices("Donor").get.collect().toSet,
      "contrib" -> store.readVertices("Contribution").get.collect().toSet,
      "cto" -> store.readEdges("CONTRIBUTED_TO").get.collect().toSet,
      "lives" -> store.readEdges("LIVES_IN_STATE").get.collect().toSet)
    val s1 = snapshot()
    FecGraph.loadContributions(store, elastic) // replay
    val s2 = snapshot()
    assert(s1 == s2)
    // donor identity via process_name: "BROWN, ALICE" → "ALICE BROWN"
    assert(store.readVertices("Donor").get
      .filter($"name" === "ALICE BROWN" && $"zip_code" === "94110")
      .count() == 1)
    // GREEN, BOB MR → BOB GREEN (title stripped), zero zip → ""
    assert(store.readVertices("Donor").get
      .filter($"name" === "BOB GREEN" && $"zip_code" === "").count() == 1)
  }

  test("graph: amendment replay tombstones the amended expenditure") {
    val gdir = Files.createTempDirectory("graph2").toString
    val store = new GraphStore(spark, gdir)
    val exp = MasterTables.expenditures(oppexp, indExp, cm, cn)
    FecGraph.loadExpenditures(store, exp)
    val nodes = store.readVertices("Expenditure").get
    // 7001-TRX1 amended by 7003-TRX1 → only 7003 and 7002 remain
    assert(nodes.count() == 2)
    assert(nodes.filter($"file_num" === 7001).count() == 0)
    assert(nodes.filter($"file_num" === 7003).count() == 1)
    // replay converges identically
    FecGraph.loadExpenditures(store, exp)
    assert(store.readVertices("Expenditure").get.count() == 2)
    val spent = store.readEdges("SPENT").get
    assert(spent.filter($"file_num" === 7001).count() == 0)
  }

  test("graph: uuid stable across merges (ON CREATE only)") {
    val gdir = Files.createTempDirectory("graph3").toString
    val store = new GraphStore(spark, gdir)
    FecGraph.loadCandidates(store, cn)
    val u1 = store.readVertices("Candidate").get
      .select($"cand_id", $"uuid").as[(String, String)].collect().toMap
    // second merge with changed props must keep uuids
    FecGraph.loadCandidates(store,
      cn.withColumn("cand_ici", lit("X")))
    val v2 = store.readVertices("Candidate").get
    val u2 = v2.select($"cand_id", $"uuid").as[(String, String)].collect().toMap
    assert(u1 == u2)
    assert(v2.filter($"cand_ici" === "X").count() == 3) // SET applied
  }

  test("S6: staged swap rolls back on shrinking rowcount") {
    val tdir = Files.createTempDirectory("swap").toString + "/t"
    val r1 = StagedSwapWriter.truncateLoad(spark, cn, tdir)
    assert(r1.swapped && r1.newCount == 3)
    val r2 = StagedSwapWriter.truncateLoad(spark, cn.limit(1), tdir)
    assert(!r2.swapped) // shrank: rolled back
    assert(spark.read.parquet(tdir).count() == 3)
    val r3 = StagedSwapWriter.truncateLoad(spark, cn.unionAll(cn), tdir)
    assert(r3.swapped && spark.read.parquet(tdir).count() == 6)
  }
}

/** §7.3 capstone: the minimum end-to-end slice as one assertion chain —
  * "all contributions received by committee C001, classified, enriched,
  * as nested documents and as graph edges". */
class FlagshipSliceSpec extends graft.SparkFunSuite {
  import org.apache.spark.sql.functions._
  import graft.io.DocStore
  import graft.graph.GraphStore
  import java.nio.file.Files

  test("committee C001 receipts: views -> envelope docs -> graph edges agree") {
    val fx = new FecPipelineSpec // reuse the fixture corpus
    val elastic = fx.elasticPublic
    val toC001 = elastic.filter(col("target") === "C001")
    // classified: 9001 (individual), 9006 (committee receipt) and
    // 9007 (committee disbursement into C001)
    val classes = toC001.select("classification").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq
    assert(classes == Seq("committee", "committee", "individual"))

    // document layer: envelope per receipt, tagged union populated
    val store = new DocStore(spark, Files.createTempDirectory("cap").toString)
    val docs = FecDocs.contributionDocs(toC001,
      lit("2022-06-01").cast("timestamp"))
    FecDocs.loadIncremental(store, "contributions", docs)
    val stored = store.read("contributions").get
    assert(stored.count() == 3)
    val ind = stored.filter(col("row.source.classification") === "individual")
    assert(ind.select("processed.donor.name").as[String](
      org.apache.spark.sql.Encoders.STRING).head() == "ALICE BROWN")

    // graph layer: both receipts end as edges into C001
    val gstore = new GraphStore(spark,
      Files.createTempDirectory("capg").toString)
    FecGraph.loadContributions(gstore, toC001)
    val into = gstore.readEdges("CONTRIBUTED_TO_OUT").get
      .filter(col("target") === "C001")
    assert(into.count() == 3)
    // shortcut edges dedup by (source, target): both committee receipts
    // come from C002 -> one Committee edge + one Donor edge
    val shortcut = gstore.readEdges("CONTRIBUTED_TO").get
      .filter(col("target") === "C001")
    assert(shortcut.select("src_label").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq ==
      Seq("Committee", "Donor"))
  }
}

/** §3.1 flagship DAG as one call: FecPipeline.run over the fixture
  * corpus, asserted end-to-end and idempotent under replay. */
class FecPipelineRunnerSpec extends graft.SparkFunSuite {
  import org.apache.spark.sql.functions._

  test("FecPipeline.run: bulk -> masters -> views -> docs -> graph, replay-idempotent") {
    val fx = new FecPipelineSpec
    val out = java.nio.file.Files.createTempDirectory("fecrun").toString
    val ts = lit("2022-06-01").cast("timestamp")
    val s = FecPipeline.run(spark, fx.bulkDirPublic, out, ts)
    assert(s.masterContributions == 7)
    assert(s.elasticRows == 7)
    // 1 non-memo operating + 3 independent expenditures
    assert(s.masterExpenditures == 4)
    assert(s.docIndexes("federal_fec_candidates") == 3)
    assert(s.docIndexes("federal_fec_committees") == 3)
    assert(s.docIndexes("federal_fec_contributions") == 7)
    assert(s.graphVertices("Candidate") == 3)
    assert(s.graphVertices("Committee") == 3)
    assert(s.graphVertices("Contribution") == 7)
    assert(s.graphEdges("CONTRIBUTED_TO") > 0)
    assert(s.graphEdges("HAPPENED_ON") > 0)
    // MERGE semantics: a full second run converges to the same store
    val s2 = FecPipeline.run(spark, fx.bulkDirPublic, out, ts)
    assert(s2 == s)
  }
}

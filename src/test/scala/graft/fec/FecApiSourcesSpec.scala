package graft.fec

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class FecApiSourcesSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("fecapi").toString
    Files.writeString(Paths.get(s"$d/receipts.jsonl"), Seq(
      """{"sub_id":"r1","is_individual":true,"contributor_first_name":"Jane","contributor_middle_name":null,"contributor_last_name":"Doe","contribution_receipt_date":"2022-02-01","contribution_receipt_amount":500.0,"committee_id":"C1","two_year_transaction_period":2022}""",
      """{"sub_id":"r2","is_individual":false,"contributor_name":"MEGA CORP","contribution_receipt_date":null,"contribution_receipt_amount":90.0,"committee_id":"C2","two_year_transaction_period":2022}""",
      """{"sub_id":"r3","is_individual":true,"contributor_first_name":"Ann","contributor_middle_name":"B","contributor_last_name":"Smith","contribution_receipt_date":"2022-02-03","contribution_receipt_amount":250.0,"committee_id":"C1","two_year_transaction_period":2022}""")
      .mkString("\n"))
    Files.writeString(Paths.get(s"$d/financials.jsonl"),
      """{"beginning_image_number":"IMG9","committee_id":"C1","report_type":"Q1","coverage_start_date":"2022-01-01","coverage_end_date":"2022-03-31","total_receipts":10000.0,"total_disbursements":8000.0}""")
    d
  }

  test("S8: receipt docs with processed contributor name for individuals") {
    val receipts = FecApiSources.readReceipts(spark, s"$dir/receipts.jsonl")
    val docs = FecApiSources.receiptDocs(receipts,
      lit("2022-06-01").cast("timestamp"))
    assert(docs.count() == 3)
    def name(id: String): Option[String] = {
      val r = docs.filter($"doc_id" === id)
        .select($"processed.contributor.individual.name").head()
      Option(r.getString(0))
    }
    assert(name("r1").contains("Jane Doe"))
    assert(name("r3").contains("Ann B Smith"))
    assert(name("r2").isEmpty) // non-individual: no processed name
  }

  test("S8: keyset cursor is the min-amount key pair") {
    val receipts = FecApiSources.readReceipts(spark, s"$dir/receipts.jsonl")
    val c = FecApiSources.keysetCursor(receipts).head()
    assert(c.getAs[String]("last_index") == "r2")
    assert(c.getAs[Double]("last_contribution_receipt_amount") == 90.0)
  }

  test("S7: financial docs keyed by image number") {
    val fin = FecApiSources.readFinancials(spark, s"$dir/financials.jsonl")
    val docs = FecApiSources.financialDocs(fin,
      lit("2022-06-01").cast("timestamp"))
    assert(docs.head().getAs[String]("doc_id") == "IMG9")
  }
}

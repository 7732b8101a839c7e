package graft.ops

import graft.SparkFunSuite
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** PII scan/redaction on injected fixtures (the synthetic corpus holds
  * no PII, so the catalog row proves the zero case; this proves
  * detection). */
class PiiSpec extends SparkFunSuite {
  import spark.implicits._

  private def pii(text: String) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextAnalysis.piiColumns(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .withColumn("has_pii", TextAnalysis.pii_flag)
    out.head()
  }

  test("emails, phones, ssns detected and redacted") {
    val r = pii("mail jane.doe+x@corp.example.org or call 415-555-1234; " +
      "ssn 123-45-6789 on file, backup 650.555.9876")
    assert(r.getAs[Int]("n_emails") == 1)
    assert(r.getAs[Int]("n_phones") == 2)
    assert(r.getAs[Int]("n_ssns") == 1)
    assert(r.getAs[Int]("has_pii") == 1)
    assert(r.getAs[String]("redacted") ==
      "mail [EMAIL] or call [PHONE]; ssn [SSN] on file, backup [PHONE]")
  }

  test("an SSN is never double-counted as a phone") {
    val r = pii("just 123-45-6789 here")
    assert(r.getAs[Int]("n_phones") == 0)
    assert(r.getAs[Int]("n_ssns") == 1)
    assert(r.getAs[String]("redacted") == "just [SSN] here")
  }

  test("clean text passes through untouched") {
    val r = pii("the quick brown fox runs 42 times")
    assert(r.getAs[Int]("has_pii") == 0)
    assert(r.getAs[String]("redacted") == "the quick brown fox runs 42 times")
  }
}

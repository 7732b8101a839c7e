package graft.fec

import graft.SparkFunSuite
import graft.io.DocStore
import graft.functions.Dates
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY §5 item 5 / hard part #4: incremental anti-join loads over N
  * arbitrary batches converge to the same sink as one batch-over-all
  * run — the property that lets the 520-second scheduler loops of the
  * reference collapse into whatever batching the cluster prefers. */
class IncrementalEquivalenceSpec extends SparkFunSuite {
  import spark.implicits._

  test("N incremental deltas == one batch load (same sink, any split)") {
    val docs = (1L to 300L).map(i => (i, s"payload_$i"))
      .toDF("doc_id", "v")

    val oneShot = new DocStore(spark,
      Files.createTempDirectory("eq1").toString)
    FecDocs.loadIncremental(oneShot, "idx", docs)

    val incremental = new DocStore(spark,
      Files.createTempDirectory("eq2").toString)
    // overlapping, out-of-order, duplicated batches
    val batches = Seq(
      docs.filter($"doc_id" % 3 === 0),
      docs.filter($"doc_id" <= 150),
      docs.filter($"doc_id" % 3 === 0), // replayed batch
      docs)                              // catch-all
    val loaded = batches.map(b =>
      FecDocs.loadIncremental(incremental, "idx", b))
    assert(loaded.sum == 300) // every doc loaded exactly once overall

    val a = oneShot.read("idx").get.orderBy("doc_id").collect().toSeq
    val b = incremental.read("idx").get.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("date-ladder repairs the known day-overflow (02/31/2008 case)") {
    // `house..._contributions/main.py:254-255` hardwires the repair for
    // a known-bad filing date; the ladder clamps the day and re-parses
    val df = Seq("02/31/2008", "2/30/2010", "04/31/1999", "02/29/2020")
      .toDF("raw")
      .select(col("raw"), date_format(
        Dates.parse_date_ladder(col("raw"), Seq("M/d/yyyy")),
        "yyyy-MM-dd").as("parsed"))
    val out = df.as[(String, String)].collect().toMap
    assert(out("02/31/2008") == "2008-02-28")
    assert(out("2/30/2010") == "2010-02-28")
    assert(out("04/31/1999") == "1999-04-28")
    assert(out("02/29/2020") == "2020-02-29") // real leap day untouched
  }
}

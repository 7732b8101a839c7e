package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced pins for T216 (code-vs-prose) and T217 (NPV LTV). */
class Round8eOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00") // Monday
  private def day(n: Int) = new java.sql.Timestamp(t0.getTime + n * 86400000L)

  test("text_code_frac: symbol/camel/digit densities split code from prose") {
    val d = Files.createTempDirectory("codefrac").toString
    // code doc: 17 chars, 6 symbol chars, 1 digit →
    //   score = (4·6 + 1)/17 = 25/17 = 1.470588235 > 0.05
    Seq((1L, "if (x) { y = 1; }", "en", "code", 17L),
      (2L, "the cat sat on the mat", "en", "prose", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.textCodeFrac(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("code") == ((1L, 1L, 1.0, 1.470588)))
    assert(got("prose") == ((1L, 1L - 1L, 0.0, 0.0)))
  }

  test("ev_ltv_npv: one week-1 repeat buyer discounts at exactly 0.9") {
    val d = Files.createTempDirectory("npv").toString
    // u1: $100 in week 1 + $100 in week 2 → npv 100 + 90 = 190 of 200
    // u2: first (and only) $50 in week 2 → its own cohort, share 1.0
    Seq((1L, day(0), 1L, "purchase", 100.0),
      (2L, day(7), 1L, "purchase", 100.0),
      (3L, day(8), 2L, "purchase", 50.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evLtvNpv(spark, d).collect()
    assert(got.length == 2)
    val w1 = got(0)
    assert(w1.getString(0) == "2024-01-01" && w1.getLong(1) == 1L)
    assert(w1.getDouble(2) == 200.0 && w1.getDouble(3) == 190.0)
    assert(w1.getDouble(4) == 0.95)
    val w2 = got(1)
    assert(w2.getString(0) == "2024-01-08" && w2.getLong(1) == 1L)
    assert(w2.getDouble(2) == 50.0 && w2.getDouble(3) == 50.0)
    assert(w2.getDouble(4) == 1.0)
  }

  test("ev_intervention: level shift over a perfect pre-trend, traced") {
    val d = Files.createTempDirectory("interv").toString
    // daily counts 1,2,3 | 10,11,12; mid = 3. Pre OLS: x = t + 1 →
    // counterfactual 4,5,6 (Σ 15); actual 33 → effect 18, rel 1.2
    val counts = Seq(1, 2, 3, 10, 11, 12)
    val rows = for {
      (c, dd) <- counts.zipWithIndex
      i <- 0 until c
    } yield (dd * 100L + i,
      new java.sql.Timestamp(t0.getTime + dd * 86400000L + i * 1000L),
      1L, "click", 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = StatsOps.evIntervention(spark, d).collect().head
    assert(r.getString(0) == "click")
    assert(r.getInt(1) == 3 && r.getInt(2) == 3)
    assert(r.getDouble(3) == 1.0)
    assert(r.getLong(4) == 33L)
    assert(r.getDouble(5) == 15.0)
    assert(r.getDouble(6) == 18.0 && r.getDouble(7) == 1.2)
  }
}

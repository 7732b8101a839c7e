package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced semantic pins for the statistics panel: every expected
  * value below is computed by hand from the operator's published
  * formula, so a regression in expression shape (not just in result
  * plumbing) fails loudly. */
class StatsOpsSpec extends SparkFunSuite {
  import spark.implicits._

  // 2024-01-01 is a Monday — keeps ISO-week / ISO-dow traces aligned
  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def day(n: Int, m: Int = 0) =
    new java.sql.Timestamp(t0.getTime + n * 86400000L + m * 1000L)

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    val d = Files.createTempDirectory("stats").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("ev_acf: alternating 2,0,2,0,2 series — hand-traced lags, gap days zero-filled") {
    // events only on days 0/2/4; days 1/3 exist solely via the spine
    val rows = for (dd <- Seq(0, 2, 4); i <- 0 until 2)
      yield (dd * 10L + i, day(dd, i), 1L, "blink", 1.0)
    val got = StatsOps.evAcf(spark, writeEvents(rows)).collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // xs=[2,0,2,0,2], μ=1.2, den=12−5·1.44=4.8
    // lag1: sab=0,sa=4,sb=4,m=4 → (0−1.2·8+4·1.44)/4.8 = −0.8
    // lag2: sab=8,sa=4,sb=4,m=3 → (8−9.6+4.32)/4.8 = 0.566667
    // lag3: sab=0,sa=2,sb=2,m=2 → (0−4.8+2.88)/4.8 = −0.4
    assert(got === Map(1 -> -0.8, 2 -> 0.566667, 3 -> -0.4))
    // lag 7 has no pairs in a 5-day series → no row, not a NULL row
  }

  test("ev_regression: exact line count=t+1 → slope 1, intercept 1, R²=1") {
    val rows = for (dd <- 0 until 3; i <- 0 to dd)
      yield (dd * 10L + i, day(dd, i), 1L, "grow", 1.0)
    val r = StatsOps.evRegression(spark, writeEvents(rows)).collect().head
    assert(r.getString(0) == "grow" && r.getInt(1) == 3 &&
      r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("ev_forecast_eval: single scored day with a 1→3 jump") {
    // days 0..6 have 1 event, day 7 has 3 → one (t,t−7) pair: x=3, f=1
    val rows =
      (for (dd <- 0 until 7) yield (dd.toLong, day(dd), 1L, "spike", 1.0)) ++
      (for (i <- 0 until 3) yield (100L + i, day(7, i), 1L, "spike", 1.0))
    val r = StatsOps.evForecastEval(spark, writeEvents(rows)).collect().head
    // mae=|3−1|=2, rmse=√4=2, smape=2·2/(3+1)=1.0
    assert(r.getString(0) == "spike" && r.getInt(1) == 1 &&
      r.getDouble(2) == 2.0 && r.getDouble(3) == 2.0 && r.getDouble(4) == 1.0)
  }

  test("ev_seasonality: one event per ISO weekday → uniform shares, χ²=0") {
    val rows = for (dd <- 0 until 7)
      yield (dd.toLong, day(dd), 1L, "flat", 1.0)
    val got = StatsOps.evSeasonality(spark, writeEvents(rows)).collect()
    assert(got.length == 7)
    got.foreach { r =>
      assert(r.getLong(2) == 1L && r.getDouble(3) == 0.142857 &&
        r.getDouble(4) == 0.0)
    }
    // day(0) = 2024-01-01 = Monday → isodow of the first row is 1
    assert(got.map(_.getInt(1)).sorted.toSeq == (1 to 7))
  }

  test("ev_survival: hand-traced 3-user Kaplan–Meier life table") {
    // A: days 0–2 (dur 2, died), B: day 0 (dur 0, died),
    // C: days 0–3 (dur 3, last = corpus max day → censored)
    val rows = Seq(
      (1L, day(0), 1L, "a", 1.0), (2L, day(2), 1L, "a", 1.0),
      (3L, day(0), 2L, "a", 1.0),
      (4L, day(0), 3L, "a", 1.0), (5L, day(3), 3L, "a", 1.0))
    val got = StatsOps.evSurvival(spark, writeEvents(rows)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // t=0: risk 3, 1 death → S=2/3; t=2: risk 2, 1 death → S=1/3;
    // C's censored exit adds no step row
    assert(got.toSeq == Seq((0, 3L, 1L, 0.666667), (2, 2L, 1L, 0.333333)))
  }

  test("ev_survival: total extinction step pins S to exactly 0") {
    // both users die at dur 0 → d=n at the only step
    val rows = Seq((1L, day(0), 1L, "a", 1.0), (2L, day(0), 2L, "a", 1.0),
      (3L, day(5), 99L, "a", 1.0)) // a later loner keeps maxd ahead
    val got = StatsOps.evSurvival(spark, writeEvents(rows)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // t=0: risk 3 incl. the loner, 2 deaths → S=1/3... loner exits at
    // dur 0 too (single-day span) but is censored (last = maxd)
    assert(got.toSeq == Seq((0, 3L, 2L, 0.333333)))
  }

  test("ev_cohort_ltv: one user, two weeks → cumulative per-user value") {
    val rows = Seq((1L, day(0), 7L, "buy", 10.0), (2L, day(7), 7L, "buy", 5.0))
    val got = StatsOps.evCohortLtv(spark, writeEvents(rows)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 1L, 1L, 10.0, 10.0),
      ("2024-01-01", 1, 1L, 1L, 15.0, 15.0)))
  }

  private def writeLineitem(d: String,
      rows: Seq[(Long, Long, Long, Double, Double)]): Unit =
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .write.parquet(s"$d/lineitem.parquet")

  test("o12_pareto: 80/15/5 revenue split classes A/B/C on the boundaries") {
    val d = Files.createTempDirectory("pareto").toString
    writeLineitem(d, Seq(
      (1L, 1L, 1L, 80.0, 0.0), (2L, 1L, 2L, 15.0, 0.0),
      (3L, 1L, 3L, 5.0, 0.0)))
    val got = StatsOps.paretoAbc(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // cum shares: 0.80 (≤0.80 → A), 0.95 (≤0.95 → B), 1.00 (→ C)
    assert(got.toSeq == Seq(("A", 1L, 80.0, 0.8), ("B", 1L, 15.0, 0.15),
      ("C", 1L, 5.0, 0.05)))
  }

  test("o13_rankfusion: symmetric rank swap ties the fused score") {
    val d = Files.createTempDirectory("rrf").toString
    // s1: more revenue, fewer orders; s2: the reverse → both rrf =
    // 1/61 + 1/62, suppkey breaks the tie
    writeLineitem(d, Seq(
      (1L, 1L, 1L, 100.0, 0.0),
      (2L, 1L, 2L, 25.0, 0.0), (3L, 1L, 2L, 25.0, 0.0)))
    val got = StatsOps.rankFusion(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val rrf = BigDecimal(1.0 / 61.0 + 1.0 / 62.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((1L, 1L, 2L, rrf), (2L, 2L, 1L, rrf)))
  }

  test("basket_rules: {X,Y},{X,Y},{X} baskets by hand") {
    val d = Files.createTempDirectory("basket").toString
    Seq((10L, "X"), (20L, "Y")).toDF("p_partkey", "p_brand")
      .write.parquet(s"$d/part.parquet")
    writeLineitem(d, Seq(
      (1L, 10L, 1L, 1.0, 0.0), (1L, 20L, 1L, 1.0, 0.0),
      (2L, 10L, 1L, 1.0, 0.0), (2L, 20L, 1L, 1.0, 0.0),
      (3L, 10L, 1L, 1.0, 0.0)))
    val r = StatsOps.basketRules(spark, d).collect().head
    // pair n=2 of N=3; nX=3, nY=2 → support 2/3, conf X→Y 2/3,
    // conf Y→X 1, lift 2·3/(3·2)=1
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("X", "Y", 2L)))
    assert(r.getDouble(3) == 0.666667 && r.getDouble(4) == 0.666667 &&
      r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
  }

  test("a18_cube: two-row fact expands to the full 4-combo lattice") {
    val d = Files.createTempDirectory("cube").toString
    Seq(("A", "F", 1.0), ("N", "O", 2.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    val got = StatsOps.cubeQty(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.size == 7) // 2 leaves + 2 flag-rollups + 2 status-rollups + grand
    assert(got(("ALL", "ALL")) == ((2L, 3.0)))
    assert(got(("A", "ALL")) == ((1L, 1.0)) && got(("ALL", "O")) == ((1L, 2.0)))
  }

  test("sample_balanced: every language keeps exactly the min stratum size") {
    val d = Files.createTempDirectory("bal").toString
    (Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "de"))
      : Seq[(Long, String)]).toDF("doc_id", "lang")
      .write.parquet(s"$d/documents.parquet")
    val got = StatsOps.sampleBalanced(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.length == 2 && got.forall(_._3 == 1))
    assert(got.map(_._2).toSet == Set("en", "de"))
    // the kept en-doc is the md5-minimal one — pin it explicitly
    val keptEn = got.find(_._2 == "en").get._1
    val md5s = Seq(1L, 2L, 3L).map(i =>
      i -> java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString)
    assert(keptEn == md5s.minBy(_._2)._1)
  }
}

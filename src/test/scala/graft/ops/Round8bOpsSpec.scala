package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced semantic pins for the T201–T206 additions: the
  * nonparametric A/B panel (rank-sum, KS, SPRT), the Poisson
  * bootstrap, the Qini uplift curve and the χ² mix monitor. */
class Round8bOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000L)

  private def writeEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    val d = Files.createTempDirectory("r8b").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    d
  }

  // 6 paying users, one purchase each; odd ids are the treat arm.
  // cents ascending: 1000(u1 t), 2000×3(u2 c,u3 t,u6 c), 3000(u4 c),
  // 4000(u5 t) → avg ranks 1, 3,3,3, 5, 6
  private def twoSampleFixture(): String = writeEvents(Seq(
    (1L, ts(0), 1L, "purchase", 10.0), (2L, ts(1), 2L, "purchase", 20.0),
    (3L, ts(2), 3L, "purchase", 20.0), (4L, ts(3), 4L, "purchase", 30.0),
    (5L, ts(4), 5L, "purchase", 40.0), (6L, ts(5), 6L, "purchase", 20.0)))

  test("ev_ranksum: tied-rank algebra on 6 users, hand-traced U and z") {
    // R_treat = 1 + 3 + 6 = 10 → U = 10 − 3·4/2 = 4; ties Σ(c³−c)=24
    // var = (9/12)(7 − 24/30) = 4.65; z = −0.5/√4.65 = −0.231869
    val r = StatsOps.evRankSum(spark, twoSampleFixture()).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 4.0)
    assert(r.getDouble(3) == -0.231869)
    assert(r.getInt(4) == 0)
  }

  test("ev_kstest: max ECDF gap on the same fixture is 1/3") {
    // cum (t,c) over 1000/2000/3000/4000: (1,0)(2,2)(2,3)(3,3)
    // |cumt·3 − cumc·3| = 3,0,3,0 → D = 3/9; K = √1.5·D = 0.408248
    val r = StatsOps.evKsTest(spark, twoSampleFixture()).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.333333)
    assert(r.getDouble(3) == 0.408248)
    assert(r.getInt(4) == 0)
  }

  test("ev_sprt: 8 straight conversions cross ln19 at t=8; sparse arm continues") {
    // treat arm (odd ids 1..15): all convert → llr(t)=t·0.405465…e12,
    // first ≥ 2.944439e12 at t=8 → accept_h1, llr_final 3.243721.
    // control arm: u2 converts, u4 does not → llr = a+b = 0.348307,
    // never crosses → continue, decision_t −1.
    val conv = for (u <- Seq(1L, 3L, 5L, 7L, 9L, 11L, 13L, 15L, 2L); i <- 0 until 14)
      yield (u * 100 + i, ts(u * 100 + i), u, "purchase", 1.0)
    val d = writeEvents(conv :+ ((9999L, ts(9999), 4L, "view", 1.0)))
    val rows = StatsOps.evSprt(spark, d).collect()
    val v0 = rows.find(_.getInt(0) == 0).get
    assert(v0.getLong(1) == 2L && v0.getLong(2) == 1L)
    assert(v0.getDouble(3) == 0.348307)
    assert(v0.getLong(4) == -1L && v0.getString(5) == "continue")
    val v1 = rows.find(_.getInt(0) == 1).get
    assert(v1.getLong(1) == 8L && v1.getLong(2) == 8L)
    assert(v1.getDouble(3) == 3.243721)
    assert(v1.getLong(4) == 8L && v1.getString(5) == "accept_h1")
  }

  test("ev_bootstrap: constant-revenue corpus pins every replicate to the mean") {
    // 40 users × $10: every replicate mean is exactly 10.0 regardless
    // of the Poisson weights (all-zero replicates are impossible at
    // P≈0.37⁴⁰), so SE = 0 and both order-statistic CI ends = 10.0
    val d = writeEvents((1L to 40L).map(u =>
      (u, ts(u), u, "purchase", 10.0)))
    val r = StatsOps.evBootstrap(spark, d).collect().head
    assert(r.getLong(0) == 40L && r.getLong(1) == 32L)
    assert(r.getDouble(2) == 10.0)
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 10.0)
  }

  test("ev_qini: 20-user staircase — one treat/control pair per decile") {
    // user i has i events, purchases iff i ≥ 14 → conv for 14..20;
    // cuts q(p) = 1+19p put exactly {2k−1, 2k} in decile 11−k; only
    // decile 4 ({13 t, 14 c}) has a conversion imbalance → uplift −1,
    // Qini inc −1 there, 0 elsewhere → cum 0,0,0,−1,…,−1
    val rows = for (u <- 1L to 20L; i <- 0 until u.toInt) yield
      (u * 1000 + i, ts(u * 1000 + i),
        u, if (u >= 14) "purchase" else "view", 1.0)
    val got = TrainOpsSpecHelper.collectOrdered(
      StatsOps.evQini(spark, writeEvents(rows)))
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(3) == 1L) // n_t, n_c
    }
    val uplifts = got.map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(uplifts(1) == 0.0 && uplifts(3) == 0.0 && uplifts(4) == -1.0
      && uplifts(10) == 0.0)
    val qini = got.map(r => r.getInt(0) -> r.getDouble(6)).toMap
    assert(qini(3) == 0.0 && qini(4) == -1.0 && qini(10) == -1.0)
  }

  test("dq_chisq: 2×2 grid with a structural zero cell, hand-traced χ²") {
    // counts (A,en)=2 (A,fr)=0 (B,en)=1 (B,fr)=1; e = 1.5/.5/1.5/.5
    // terms .166666667/.5/.166666667/.5 → χ² 1.333333, V = 0.57735
    val d = Files.createTempDirectory("chisq").toString
    Seq((1L, "aa", "en", "A", 2L), (2L, "bb", "en", "A", 2L),
      (3L, "cc", "en", "B", 2L), (4L, "dd", "fr", "B", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val r = Profiling.dqChisq(spark, d).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getInt(1) == 2 && r.getInt(2) == 2 && r.getInt(3) == 1)
    assert(r.getDouble(4) == 1.333333)
    assert(r.getDouble(5) == 0.57735)
  }
}

/** Tiny shared helper: collect with the query's own ORDER BY retained. */
object TrainOpsSpecHelper {
  def collectOrdered(df: org.apache.spark.sql.DataFrame) = df.collect()
}

package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced pins for T229 (session-timeout sweep) and T230
  * (referential-integrity audit). The sweep trace puts one user's
  * three events at gaps of exactly 10 and 30 minutes, so the strict
  * `>` threshold semantics (a 30-min gap does NOT split at the
  * 30-min threshold) is pinned explicitly. */
class Round8iOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("ev_session_sweep: strict-gt thresholds over 10/30-min gaps") {
    val d = Files.createTempDirectory("sweep").toString
    // gaps: NULL (first event), 10 min, 30 min. Session starts:
    // theta=5 -> 3 (both gaps split); theta=15 -> 2 (only the 30-min
    // gap); theta=30 -> 1 (30 min is NOT > 30 min); theta=60 -> 1.
    Seq((1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
      (2L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0),
      (3L, ts("2024-01-01 00:40:00"), 7L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evSessionSweep(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((5, 1L, 3L, 1.0), (15, 1L, 2L, 1.5),
      (30, 1L, 1L, 3.0), (60, 1L, 1L, 3.0)))
  }

  test("dq_freshness: per-type lag in whole minutes behind the newest") {
    val d = Files.createTempDirectory("fresh").toString
    // 'click' newest at 00:40:30, 'view' newest at 00:10:00 -> the
    // 30.5-min lag floors to 30 whole minutes
    Seq((1L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:40:30"), 1L, "click", 1.0),
      (3L, ts("2024-01-01 00:10:00"), 2L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = Profiling.dqFreshness(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("click", 2L, "2024-01-01 00:40:30.000000", 0L),
      ("view", 1L, "2024-01-01 00:10:00.000000", 30L)))
  }

  test("mm_near_dup: the single-pixel-perturbed PNG pair decodes to a " +
    "near-1-but-not-1 cosine and passes the 0.99 gate") {
    val d = Files.createTempDirectory("mmnd").toString
    // ids 10 and 15 share base 1 (the constructed near-dup pair: 15's
    // first-row red is shifted one full bin); id 40 is base 4 with no
    // partner — the corpus-construction contract the production row
    // relies on
    Seq((10L, "x", "en", "s", 1L), (15L, "x", "en", "s", 1L),
      (40L, "x", "en", "s", 1L), (3L, "skipped", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = MultimodalOps.mmNearDup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pair = got.find(p => p._1 == 10L && p._2 == 15L)
    assert(pair.isDefined, s"constructed near-dup pair missing: ${got.toSeq}")
    // strictly below 1.0 proves the decoded perturbation reached the
    // histogram (a stand-in or a dropped perturbation would give 1.0);
    // above the gate proves it still reads as a near-dup
    assert(pair.get._3 >= 0.99 && pair.get._3 < 1.0,
      s"pair cosine ${pair.get._3} outside the near-dup band")
    assert(got.forall(_._3 >= 0.99), "the 0.99 gate leaked")
  }

  test("dq_referential: one orphan per foreign key") {
    val d = Files.createTempDirectory("refint").toString
    Seq((1L, 100L), (3L, 999L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, 10L, 5.0), (2L, 20L, 5.0))
      .toDF("l_orderkey", "l_suppkey", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    Seq((100L, "c")).toDF("c_custkey", "c_name")
      .write.parquet(s"$d/customer.parquet")
    Seq((10L, "s")).toDF("s_suppkey", "s_name")
      .write.parquet(s"$d/supplier.parquet")
    val got = Profiling.dqReferential(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // lineitem 2 -> no order 2; suppkey 20 -> no supplier; order 3 ->
    // no customer 999: every FK has exactly one orphan of two rows
    assert(got.toSeq == Seq(("lineitem.l_orderkey", 2L, 1L, 0.5),
      ("lineitem.l_suppkey", 2L, 1L, 0.5),
      ("orders.o_custkey", 2L, 1L, 0.5)))
  }
}

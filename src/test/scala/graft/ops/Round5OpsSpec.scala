package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Semantic properties of the round-5 analytics additions (streaks,
  * concurrency sweep, EWMA, RFM ntile reconstruction, skyline, Benford,
  * Adamic–Adar, diversified top-k) on injected fixtures — each
  * assertion is hand-computable from the fixture rows. */
class Round5OpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def writeEvents(d: String,
      rows: Seq[(Long, String, Long, String, Double)]): Unit =
    rows.map { case (id, day, u, t, v) =>
      (id, Timestamp.valueOf(s"$day 10:00:00"), u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")

  // u1: 3-day run + an isolated day; u2: isolated day + 2-day run;
  // u3: TWO 2-day runs (the tie — earliest start must win)
  private lazy val dirStreak: String = {
    val d = Files.createTempDirectory("r5streak").toString
    val days = Seq(
      1L -> "2024-03-01", 1L -> "2024-03-02", 1L -> "2024-03-03",
      1L -> "2024-03-05",
      2L -> "2024-03-01", 2L -> "2024-03-03", 2L -> "2024-03-04",
      3L -> "2024-03-01", 3L -> "2024-03-02", 3L -> "2024-03-04",
      3L -> "2024-03-05")
    writeEvents(d, days.zipWithIndex.map { case ((u, day), i) =>
      (i.toLong, day, u, "click", 1.0) })
    d
  }

  test("ev_streaks: island detection, gap reset, earliest-start tie-break") {
    val got = EventOps.evStreaks(spark, dirStreak).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === Map(
      1L -> ((3L, "2024-03-01")),
      2L -> ((2L, "2024-03-03")),
      3L -> ((2L, "2024-03-01")))) // tie between two 2-day runs
  }

  test("ev_ewma: left-fold recurrence seeded with day one's count") {
    // click daily counts from dirStreak: 3, 2, 2, 2, 2
    // e = 3 -> 2.7 -> 2.49 -> 2.343 -> 2.2401
    val row = EventOps.evEwma(spark, dirStreak)
      .filter($"event_type" === "click").collect().head
    assert(row.getAs[Int]("n_days") === 5)
    assert(row.getAs[String]("last_day") === "2024-03-05")
    assert(math.abs(row.getAs[Double]("ewma") - 2.2401) < 1e-9)
  }

  // orders open 03-01/03-02; closes (max shipdate + 1 day) spread so
  // the running concurrency is 2, 3, 2, 1, 0 over five days
  private lazy val dirOrd: String = {
    val d = Files.createTempDirectory("r5ord").toString
    Seq(
      (1L, 10L, 100.0, Timestamp.valueOf("2024-03-01 00:00:00")),
      (2L, 10L, 90.0, Timestamp.valueOf("2024-03-02 00:00:00")),
      (3L, 10L, 80.0, Timestamp.valueOf("2024-03-01 00:00:00")),
      (4L, 20L, 70.0, Timestamp.valueOf("2024-03-02 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    Seq(
      (1L, 101L, 1.23, Timestamp.valueOf("2024-03-03 00:00:00")),
      (2L, 102L, 19.99, Timestamp.valueOf("2024-03-02 00:00:00")),
      (3L, 101L, 2.50, Timestamp.valueOf("2024-03-01 00:00:00")),
      (4L, 103L, 9.01, Timestamp.valueOf("2024-03-04 00:00:00")))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("ev_concurrency: +1/-1 sweep counts simultaneously-open orders") {
    val got = EventOps.evConcurrency(spark, dirOrd).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(
      ("2024-03-02", 3L), ("2024-03-01", 2L), ("2024-03-03", 2L),
      ("2024-03-04", 1L), ("2024-03-05", 0L)))
  }

  test("dq_benford: decimal-string digit binning and exact shares") {
    // prices 1.23, 19.99, 2.50, 9.01 -> digits 1,1,2,9
    val got = Profiling.dqBenford(spark, dirOrd).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set(1, 2, 9))
    assert(got(1) === ((2L, 0.5)) && got(2)._1 === 1L && got(9)._1 === 1L)
    assert(got(2)._2 === 0.25 && got(9)._2 === 0.25)
  }

  test("o11_diversify: at most two rows per customer survive the cap") {
    val got = LayoutOlap.o11Diversify(spark, dirOrd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(got === Seq((1L, 10L, 1), (2L, 10L, 2), (4L, 20L, 1)))
  }

  test("graph_linkpred: 1/ln(deg) weight over the shared customer") {
    // c10 trades with {s101, s102} (via orders 1-3), c20 only s103
    // -> single pair (101, 102), weight 1/ln(2)
    val got = GraphOps.graphLinkpred(spark, dirOrd).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((101L, 102L, 1L)))
    assert(math.abs(r.getDouble(3) - 1.442695) < 1e-9)
  }

  private lazy val dirPart: String = {
    val d = Files.createTempDirectory("r5part").toString
    // (150,10) is dominated ONLY via the cross-bucket carry-in (50,10);
    // (50,10) occurs twice -> one skyline row with n_parts = 2
    Seq((1L, 40.0, 5), (2L, 50.0, 10), (3L, 50.0, 10),
        (4L, 150.0, 10), (5L, 150.0, 12))
      .toDF("p_partkey", "p_retailprice", "p_size")
      .write.parquet(s"$d/part.parquet")
    d
  }

  test("o10_skyline: cross-bucket carry-in domination and point counts") {
    val got = LayoutOlap.o10Skyline(spark, dirPart).collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === Seq((40.0, 5, 1L), (50.0, 10, 2L), (150.0, 12, 1L)))
  }

  // five users, user u: u events on day 2024-03-0u valued u*10 —
  // recency/frequency/monetary all rank identically, so every
  // quintile score equals u (n=5, one user per tile)
  private lazy val dirRfm5: String = {
    val d = Files.createTempDirectory("r5rfm5").toString
    var id = 0L
    writeEvents(d, (1 to 5).flatMap { u =>
      (1 to u).map { _ => id += 1; (id, s"2024-03-0$u", u.toLong,
        "purchase", u * 10.0) }
    })
    d
  }

  test("ev_rfm: aligned metrics give r = f = m = user quintile") {
    val got = EventOps.evRfm(spark, dirRfm5).collect()
      .map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5), r.getInt(6),
        r.getInt(7)))).toMap
    (1 to 5).foreach { u =>
      assert(got(u.toLong) === ((u, u, u, u * 111)), s"user $u")
    }
  }

  // seven users, one day, frequency = user id: n=7 -> ntile sizes
  // (2,2,1,1,1); checks the closed form's remainder branch, which the
  // sf0.01 oracle (150 users, rem=0) never exercises
  private lazy val dirRfm7: String = {
    val d = Files.createTempDirectory("r5rfm7").toString
    var id = 0L
    writeEvents(d, (1 to 7).flatMap { u =>
      (1 to u).map { _ => id += 1; (id, "2024-03-01", u.toLong,
        "purchase", u * 1.0) }
    })
    d
  }

  test("ev_rfm: ntile remainder branch (n=7 -> tile sizes 2,2,1,1,1)") {
    val got = EventOps.evRfm(spark, dirRfm7).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(got === Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3,
      6L -> 4, 7L -> 5))
  }
}

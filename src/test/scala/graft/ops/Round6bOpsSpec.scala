package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Semantic pins for the second round-6 batch: Holt trend smoothing,
  * changepoint argmax, KMV set-algebra overlap, HITS mutual
  * reinforcement, and Flesch readability — each on a hand-traceable
  * fixture with exact expected values. */
class Round6bOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def day(n: Int, m: Int = 0) =
    new java.sql.Timestamp(t0.getTime + n * 86400000L + m * 1000L)

  test("ev_holt: constant series → zero trend; 2-day ramp by hand") {
    val d = Files.createTempDirectory("holt").toString
    // "flat": 5 events/day over 3 days → level 5, trend 0
    // "ramp": 4 then 8 → l = .5·8+.5·4 = 6, b = .3·(6−4) = 0.6
    val rows =
      (for (dd <- 0 until 3; i <- 0 until 5)
        yield (dd * 10L + i, day(dd, i), 1L, "flat", 1.0)) ++
      (for (i <- 0 until 4) yield (100L + i, day(0, i), 1L, "ramp", 1.0)) ++
      (for (i <- 0 until 8) yield (200L + i, day(1, i), 1L, "ramp", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evHolt(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("flat") === ((3, 5.0, 0.0, 5.0)))
    assert(got("ramp") === ((2, 6.0, 0.6, 7.8)))
  }

  test("ev_changepoint finds the step day in a 1,1,5,5 series") {
    val d = Files.createTempDirectory("chg").toString
    val counts = Seq(1, 1, 5, 5)
    val rows = for {
      (n, dd) <- counts.zipWithIndex
      i <- 0 until n
    } yield (dd * 10L + i, day(dd, i), 1L, "click", 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = EventOps.evChangepoint(spark, d).collect().head
    // split after day 2: mean 1 vs mean 5 → gap 4 (beats 2.667, 3.667)
    assert(r.getString(0) == "click" && r.getString(1) == "2024-01-02" &&
      r.getDouble(2) == 4.0 && r.getLong(3) == 4L)
  }

  test("ev_overlap_kmv: below-k sets give exact inclusion-exclusion") {
    val d = Files.createTempDirectory("kmvo").toString
    // viewers 1..10, purchasers 6..15 → union 15, intersection 5;
    // all sets < k=64 so every KMV estimate is the exact count
    val rows =
      (1 to 10).map(u => (u.toLong, t0, u.toLong, "view", 1.0)) ++
      (6 to 15).map(u => (100L + u, t0, u.toLong, "purchase", 1.0)) ++
      Seq((999L, t0, 99L, "click", 1.0)) // other types are filtered out
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = EventOps.evOverlapKmv(spark, d).collect().head
    assert(r.getDouble(0) == 10.0 && r.getDouble(1) == 10.0 &&
      r.getDouble(2) == 15.0 && r.getDouble(3) == 5.0 &&
      r.getLong(4) == 5L)
  }

  test("graph_hits: 2 rounds on the c1-{s1,s2}, c2-s1 star by hand") {
    val d = Files.createTempDirectory("hits").toString
    Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((1L, 1L), (2L, 2L), (3L, 1L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    // r1: a(s1)=2,a(s2)=1 → 1,.5 | h(c1)=1.5,h(c2)=1 → 1,2/3
    // r2: a(s1)=5/3,a(s2)=1 → 1,.6 | h(c1)=1.6,h(c2)=1 → 1,.625
    // (a 3rd round would give .615385/.619048 — same RANKS as round 2,
    // the rank-stability argument for the 2-round contract)
    val got = GraphOps.graphHits(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("auth", "s1")) == 1.0 && got(("auth", "s2")) == 0.6)
    assert(got(("hub", "c1")) == 1.0 && got(("hub", "c2")) == 0.625)
    // rank stability r2 vs r3: s1 ≻ s2 and c1 ≻ c2 under both
    assert(got(("auth", "s1")) > got(("auth", "s2")))
    assert(got(("hub", "c1")) > got(("hub", "c2")))
  }

  test("ev_rolling: the RANGE frame does not reach across a day gap") {
    val d = Files.createTempDirectory("roll").toString
    // days 0,1,2 then a jump to day 9: the calendar RANGE frame sees
    // only day 9 itself there (ROWS would wrongly reach back 6 rows)
    val rows = for {
      (dd, n) <- Seq((0, 2), (1, 3), (2, 1), (9, 4))
      i <- 0 until n
    } yield (dd * 100L + i, day(dd, i), 1L, "click", 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evRolling(spark, d).collect()
      .map(r => r.getString(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got("2024-01-01") === ((2L, 1L)))   // first day: itself
    assert(got("2024-01-03") === ((6L, 3L)))   // 2+3+1 over 3 days
    assert(got("2024-01-10") === ((4L, 1L)))   // gap: alone in frame
  }

  test("sample_poisson: deterministic replicas, draw mass near n") {
    val d = Files.createTempDirectory("poisson").toString
    (1L to 400L).map(i => (i, "s1", s"doc $i"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$d/documents.parquet")
    val run1 = TrainOps.samplePoisson(spark, d).collect()
    val run2 = TrainOps.samplePoisson(spark, d).collect()
    assert(run1.toSeq == run2.toSeq)           // no RNG anywhere
    assert(run1.length == 3)
    run1.foreach { r =>
      val (n, drawn, draws, maxK) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(n == 400L && maxK <= 4)
      // Poisson(1): E[draws] = n, sd = sqrt(n) = 20 → 5-sigma band;
      // E[drawn] = (1 − e^-1)·n ≈ 253
      assert(math.abs(draws - 400L) < 100, s"draws $draws")
      assert(math.abs(drawn - 253L) < 100, s"drawn $drawn")
    }
  }

  test("graph_modularity: K(2,2) LPA partition scores exactly -0.5") {
    val d = Files.createTempDirectory("modul").toString
    // complete bipartite 2x2: LPA converges to {c1,c2} and {s1,s2},
    // every edge crosses -> E_in = 0, d_c = 4 per community, S = 32,
    // n_dir = 8 -> Q = 0 - 32/64 = -0.5 (anti-community, as expected
    // for a bipartite clique)
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val r = GraphOps.graphModularity(spark, d).collect().head
    assert(r.getLong(0) == 4L)      // m_edges
    assert(r.getLong(1) == 0L)      // e_in
    assert(r.getLong(2) == 2L)      // n_communities
    assert(r.getDouble(3) == -0.5)  // modularity
  }

  test("dim_asof_lookup resolves history; same-day collision flagged") {
    val d = Files.createTempDirectory("dal").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq(
      (1L, 10L, "1-URGENT", ts("2024-01-01")),  // change: URGENT
      (2L, 10L, "5-LOW", ts("2024-02-01")),     // change: LOW
      (3L, 10L, "5-LOW", ts("2024-03-01")),     // inherits LOW
      (4L, 20L, "2-HIGH", ts("2024-01-05")),    // same-day pair:
      (5L, 20L, "3-MEDIUM", ts("2024-01-05")))  //  last change (5) wins
      .map { case (k, c, p, t) => (k, c, p, t, 1.0) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate",
        "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    val got = CoreRelational.dimAsofLookup(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getInt(5)))).toMap
    assert(got(1L) === (("1-URGENT", 1)))
    assert(got(2L) === (("5-LOW", 1)))
    assert(got(3L) === (("5-LOW", 1)))   // resolved from the Feb change
    assert(got(4L) === (("3-MEDIUM", 0))) // collision: dim says MEDIUM
    assert(got(5L) === (("3-MEDIUM", 1)))
  }

  test("text_rake: deg/freq scoring on a hand corpus") {
    val d = Files.createTempDirectory("rake").toString
    // "deep learning" appears twice, "deep sea" once -> freq(deep)=3,
    // deg(deep)=6; freq(learning)=2, deg=4; freq(sea)=1, deg=2.
    // wscores all 2.0 -> both phrases score 4.0; singleton "fish"
    // scores 1.0 (deg=freq=1)
    Seq((1L, "s1", "deep learning of deep sea in deep learning"),
        (2L, "s1", "fish"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.textRake(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("deep learning") === ((2L, 4.0)))
    assert(got("deep sea") === ((1L, 4.0)))
    assert(got("fish") === ((1L, 1.0)))
  }

  test("text_readability: hand-counted Flesch; empty text is guarded") {
    val d = Files.createTempDirectory("flesch").toString
    Seq((1L, "s1", "Hello world. This is fine!"), (2L, "s1", "!!!"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = GraphOpsSpecHelpers.rows(TextOps.textReadability(spark, d))
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    // 5 words, 2 sentences, 7 vowel groups:
    // 206.835 − 1.015·(5/2) − 84.6·(7/5) = 85.8575
    assert(got(1L) === ((5, 2, 7, 85.8575)))
    // zero words/sentences clamp to 1: flesch = 206.835
    assert(got(2L) === ((0, 1, 0, 206.835)))
  }
}

/** Tiny helper so specs read `rows(df)` without importing DataFrame. */
private[ops] object GraphOpsSpecHelpers {
  def rows(df: org.apache.spark.sql.DataFrame)
      : Array[org.apache.spark.sql.Row] = df.collect()
}

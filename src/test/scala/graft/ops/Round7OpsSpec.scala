package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Semantic pins for the round-7 catalog additions. */
class Round7OpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("bpe_train: five hand-traced merge rounds on banana/bandana") {
    val d = Files.createTempDirectory("bpetrain").toString
    Seq((1L, "banana banana"), (2L, "bandana"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    // round 1: pairs an:6 na:5 ba:3 nd:1 da:1            → an (6)
    // round 2 (an=␁): b␁:3 ␁a:3 ␁␁:2 ␁d:1 d␁:1; tie b␁/␁a
    //   breaks to the byte-smaller ␁a                     → <an>a (3)
    // round 3 (␁a=␂): b␁:3 ␁␂:2 ␁d:1 d␂:1               → b<an> (3)
    // round 4 (b␁=␃): ␃␂:2 ␃d:1 d␂:1                     → ␃␂ (2)
    // round 5 (␃␂=␄): words ␄ ␄ ␃d␂ → ␃d:1 d␂:1; tie
    //   breaks to ␃d (chr 3 < 'd')                        → ␃d (1)
    val got = TrainOps.bpeTrain(spark, d).collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got == Seq(
      (1, "an", 6L),
      (2, "<an>a", 3L),
      (3, "b<an>", 3L),
      (4, "<b<an>><<an>a>", 2L),
      (5, "<b<an>>d", 1L)))
  }

  test("graph_betweenness: Brandes hand trace on the 4-node chain") {
    val d = Files.createTempDirectory("btwn").toString
    // bipartite chain c1—s1—c2—s2 (the closeness spec's graph).
    // From seed c1: levels c1/s1/c2/s2, all sigma 1; deltas backward:
    //   d(c2)=1*(1+0)=1, d(s1)=1*(1+1)=2  (d(c1) excluded: own seed)
    // From seed c2: levels c2/{s1,s2}/{c1}; d(s1)=1*(1+0)=1, d(s2)=0
    // Seeds c3..c5 are isolated -> contribute nothing.
    // Totals: s1=3, c2=1, c1=0 (reached from c2), s2=0.
    Seq((10L, 1L), (20L, 2L), (21L, 2L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((10L, 1L), (20L, 1L), (21L, 2L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val got = GraphOps.graphBetweenness(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got == Seq(("s1", 3.0), ("c2", 1.0), ("c1", 0.0),
      ("s2", 0.0)))
  }

  test("ev_window_funnel: per-step 30-min windows gate each level") {
    val d = Files.createTempDirectory("wfunnel").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // u1: view, click +10m (in), purchase +35m (25m after click, in)
    // u2: view, click +40m (outside the view's 30-min window)
    // u3: view, click +5m (in), purchase +50m (45m after click, out)
    // u4: click only — never enters the funnel
    Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(10), 1L, "click"),
      (3L, ts(35), 1L, "purchase"),
      (4L, ts(0), 2L, "view"), (5L, ts(40), 2L, "click"),
      (6L, ts(0), 3L, "view"), (7L, ts(5), 3L, "click"),
      (8L, ts(50), 3L, "purchase"),
      (9L, ts(0), 4L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evWindowFunnel(spark, d).collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got == Seq(
      (1, "view", 3L, None),
      (2, "view>click", 2L, Some(0.666667)),
      (3, "click>purchase", 1L, Some(0.5))))
  }

  test("ev_gains: deciles over 20 distinct scores, positives on top") {
    val d = Files.createTempDirectory("gains").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // scores 1..20, purchases at 19 and 20 → decile k crosses at
    // cumN = 2k; cum_pos saturates at 2 immediately
    (1 to 20).map(i => (i.toLong, t0, 1L,
        if (i >= 19) "purchase" else "view", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evGains(spark, d).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got == (1 to 10).map(k =>
      (k, 2L * k, 2L, 1.0,
        math.rint(10.0 / k * 1e6) / 1e6)))
  }

  test("sample_neyman: zero-variance stratum gets zero budget") {
    val d = Files.createTempDirectory("neyman").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // A: constant (std 0); B: {0,50,100} (std 50, weight 150e6);
    // C: {0,100} (std 70.710678, weight ~141.42e6)
    val rows =
      Seq((1L, "A", 7.0), (2L, "A", 7.0), (3L, "A", 7.0),
        (4L, "B", 0.0), (5L, "B", 50.0), (6L, "B", 100.0),
        (7L, "C", 0.0), (8L, "C", 100.0))
    rows.map { case (id, et, v) => (id, t0, 1L, et, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.sampleNeyman(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getLong(5)))
    val byType = got.map(t => t._1 -> t).toMap
    assert(byType("A")._3 == 0.0 && byType("A")._4 == 0L)
    assert(byType("B")._3 == 50.0)
    assert(byType("C")._3 == 70.710678)
    assert(got.map(_._4).sum == 1000L)
    assert(byType("B")._4 >= byType("C")._4)
  }

  test("text_cdc_chunks: identical docs share every chunk") {
    val d = Files.createTempDirectory("cdc").toString
    val para = "the quick brown fox jumps over the lazy dog while " +
      "seventeen zebras quietly audit the parquet files nearby"
    Seq((1L, para), (2L, para), (3L, "short"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = TextOps.textCdcChunks(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    // the doc-3 singleton: one whole-doc chunk (len < 8 → no cuts)
    val shortMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("short".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got.exists(_ == ((shortMd5, 1L, 1L, 5))))
    // every other surfaced chunk is the shared-paragraph boilerplate
    got.filter(_._1 != shortMd5).foreach { case (_, nd, no, _) =>
      assert(nd == 2L && no == 2L)
    }
  }

  test("text_boilerplate: duplicated docs score 1.0, singleton 0.0") {
    val d = Files.createTempDirectory("boiler").toString
    val para = "the quick brown fox jumps over the lazy dog while " +
      "seventeen zebras quietly audit the parquet files nearby"
    Seq((1L, para), (2L, para), (3L, "completely unique text here"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = TextOps.textBoilerplateFrac(spark, d).collect().toSeq
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 1.0 && got(2L) == 1.0 && got(3L) == 0.0)
  }

  test("ann_knn_graph: panel invariants on the corpus cells") {
    val d = Files.createTempDirectory("knng").toString
    // 40 vectors in two well-separated directions → each vector's
    // top-5 live in its own half, mutuality high by construction
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.1f * (i % 5))
        else Array(0.0f, 1.0f, 0.1f * (i % 5))
      (i.toLong, base)
    }
    vecs.toDF("vec_id", "embedding")
      .write.parquet(s"$d/embeddings.parquet")
    val r = SimOps.annKnnGraph(spark, d).collect().head
    val (nodes, edges, mutual) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    // invariants: every scored node keeps <=5 edges; mutual edges are
    // a subset; the fraction column is exactly mutual/edges
    assert(nodes > 0L && nodes <= 40L)
    assert(edges > 0L && edges <= nodes * 5)
    assert(mutual >= 0L && mutual <= edges)
    assert(r.getDouble(3) ==
      math.rint(mutual.toDouble / edges.toDouble * 1e6) / 1e6)
    assert(r.getDouble(4) >= -1.0 && r.getDouble(4) <= 1.0)
    val r2 = SimOps.annKnnGraph(spark, d).collect().head
    assert(r.toSeq == r2.toSeq) // md5-deterministic end to end
  }

  test("graph_walks: md5-driven walks are edge-valid and repeatable") {
    val d = Files.createTempDirectory("walks").toString
    // chain c1—s1—c2—s2; c3..c20 isolated (step-0 rows only)
    Seq((10L, 1L), (20L, 2L), (21L, 2L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((10L, 1L), (20L, 1L), (21L, 2L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val run1 = GraphOps.graphWalks(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // 20 step-0 rows + full 4-step walks from the 2 connected starts
    assert(run1.count(_._3 == 0) == 20)
    assert(run1.size == 20 + 2 * 4)
    // every consecutive hop is a real edge of the symmetrized graph
    val edges = Set("c1" -> "s1", "s1" -> "c1", "s1" -> "c2",
      "c2" -> "s1", "c2" -> "s2", "s2" -> "c2")
    for (start <- Seq("c1", "c2"); k <- 1 to 4) {
      val prev = run1.find(r => r._1 == start && r._3 == k - 1).get._2
      val cur = run1.find(r => r._1 == start && r._3 == k).get._2
      assert(edges.contains(prev -> cur), s"$start step $k")
    }
    val run2 = GraphOps.graphWalks(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(run1 == run2)
  }

  test("ev_cuped: hand-computed theta, adjusted means, var reduction") {
    val d = Files.createTempDirectory("cuped").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // span midpoint = +15m; pre event at +0, post at +30 per user.
    // x = (10,20,30,40), y = (20,30,40,60) for users 1..4 →
    // theta = 1.3, xbar = 25; adj = (39.5, 36.5, 33.5, 40.5)
    val rows = Seq((1L, 10.0, 20.0), (2L, 20.0, 30.0),
      (3L, 30.0, 40.0), (4L, 40.0, 60.0))
    rows.zipWithIndex.flatMap { case ((u, x, y), i) =>
      Seq((i * 2 + 1L, ts(0), u, "view", x),
        (i * 2 + 2L, ts(30), u, "view", y))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evCuped(spark, d).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got == Seq(
      (0, 2L, 45.0, 38.5, 1.3, 0.982222),
      (1, 2L, 30.0, 36.5, 1.3, 0.91)))
  }

  test("dq_reconcile: cents-exact mismatch classes") {
    val d = Files.createTempDirectory("reconcile").toString
    Seq((1L, 100.00), (2L, 100.50), (3L, 105.00), (4L, 50.00))
      .toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, 100.00, 0.0, 0.0), (2L, 100.00, 0.0, 0.0),
      (3L, 100.00, 0.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .write.parquet(s"$d/lineitem.parquet")
    val got = Profiling.dqReconcile(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got == Seq(("exact", 1L, 0.0), ("major", 1L, 5.0),
      ("minor", 1L, 0.5), ("missing_lines", 1L, 0.0)))
  }

  test("ev_qte: shifted arm distributions give a constant -1 QTE") {
    val d = Files.createTempDirectory("qte").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // user i has value i → control arm (even ids) holds 2,4..20 and
    // treat (odd) holds 1,3..19: treat = control shifted by -1 at
    // every quantile; interpolated values hand-checked
    (1 to 20).map(i => (i.toLong, t0, i.toLong, "view", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evQte(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got == Seq(
      ("0.10", 3.8, 2.8, -1.0), ("0.25", 6.5, 5.5, -1.0),
      ("0.50", 11.0, 10.0, -1.0), ("0.75", 15.5, 14.5, -1.0),
      ("0.90", 18.2, 17.2, -1.0)))
  }

  test("bpe_encode: banana corpus compresses 19 chars to 5 tokens") {
    val d = Files.createTempDirectory("bpeenc").toString
    Seq((1L, "banana banana"), (2L, "bandana"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    // after the 5 traced merges: banana → 1 sentinel token (x2),
    // bandana → "(b<an>)d"-sentinel + "<an>a"-sentinel = 2 tokens;
    // sentinels on the wire: 1+1+2 = 4; 19 chars / 4 tokens = 4.75
    val r = TrainOps.bpeEncode(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((3L, 19L, 4L, 4L, 4.75)))
  }

  test("graph_walk_pairs: window-2 skip-grams from the chain walks") {
    val d = Files.createTempDirectory("walkpairs").toString
    Seq((10L, 1L), (20L, 2L), (21L, 2L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((10L, 1L), (20L, 1L), (21L, 2L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val got = GraphOps.graphWalkPairs(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // two full 5-node walks (c1, c2), each contributing
    // 2*4 distance-1 + 2*3 distance-2 = 14 directed pairs
    assert(got.map(_._3).sum == 28L)
    val nodes = Set("c1", "c2", "s1", "s2")
    got.foreach { case (c, x, _) =>
      assert(nodes.contains(c) && nodes.contains(x))
    }
  }
}

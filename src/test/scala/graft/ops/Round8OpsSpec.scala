package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Semantic pins for the round-8 catalog additions. */
class Round8OpsSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000L)

  test("ev_gini: hand-computed rank formula on 4 users") {
    val d = Files.createTempDirectory("gini").toString
    // revenues 10, 10, 20, 40 -> cents 1000,1000,2000,4000
    // ascending ranks: sum i*x = 1000 + 2000 + 6000 + 16000 = 25000
    // G = 2*25000/(4*8000) - 5/4 = 1.5625 - 1.25 = 0.3125
    Seq((1L, ts(0), 1L, "view", 10.0), (2L, ts(1), 2L, "view", 10.0),
      (3L, ts(2), 3L, "view", 20.0), (4L, ts(3), 4L, "view", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = EventOps.evGini(spark, d).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 80.0)
    assert(r.getDouble(2) == 0.3125)
  }

  test("ev_gini: equal revenues give the exact minimum (n-1)/... 0-ish") {
    val d = Files.createTempDirectory("gini0").toString
    // equal x: G = 2*(T(n+1)/2)/(nT) - (n+1)/n = 0 exactly
    Seq((1L, ts(0), 1L, "view", 5.0), (2L, ts(1), 2L, "view", 5.0),
      (3L, ts(2), 3L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    assert(EventOps.evGini(spark, d).collect().head.getDouble(2) == 0.0)
  }

  test("ev_cusum: running-min restatement matches the recursive form") {
    val d = Files.createTempDirectory("cusum").toString
    // daily counts [1,1,5,5]; mu=3; P=(−2,−4,−2,0)·... num=4·px−(t+1)·12
    //  = −8,−16,−8,0 ; running min −8,−16,−16,−16 → S = 0,0,2,4
    // (classic recursion: S=max(0,S+x−3) → 0,0,2,4 — identical)
    val rows =
      Seq((1L, ts(0))) ++ Seq((2L, ts(86400))) ++
      (0 until 5).map(i => (10L + i, ts(2 * 86400 + i))) ++
      (0 until 5).map(i => (20L + i, ts(3 * 86400 + i)))
    rows.map { case (id, t) => (id, t, 1L, "click", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = StatsOps.evCusum(spark, d).collect().head
    assert(r.getString(0) == "click")
    assert(r.getDouble(1) == 4.0)
    assert(r.getInt(2) == 3)
  }

  test("graph_katz: 512-scaled integer rounds on the 4-node chain") {
    val d = Files.createTempDirectory("katz").toString
    // chain c1—s1—c2—s2; X1 = 512+64·deg; X2/X3 traced by hand:
    //   X3(s1)=X3(c2)=669 → 669/512 = 1.306641 (round 6)
    //   X3(c1)=X3(s2)=595 → 595/512 = 1.162109
    Seq((10L, 1L), (20L, 2L), (21L, 2L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((10L, 1L), (20L, 1L), (21L, 2L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val got = GraphOps.graphKatz(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got == Seq(("c2", 1.306641), ("s1", 1.306641),
      ("c1", 1.162109), ("s2", 1.162109)))
  }

  test("ev_did: 2x2 cell means and the interaction contrast") {
    val d = Files.createTempDirectory("did").toString
    // u2 control: 10 pre / 20 post; u1 treat: 10 pre / 40 post
    // DiD = (40-10) - (20-10) = 20
    Seq((1L, ts(0), 2L, "view", 10.0), (2L, ts(100), 2L, "view", 20.0),
      (3L, ts(0), 1L, "view", 10.0), (4L, ts(100), 1L, "view", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = StatsOps.evDiffInDiff(spark, d).collect().head
    assert((4 to 7).map(r.getDouble) ==
      Seq(10.0, 20.0, 10.0, 40.0)) // ctrl_pre, ctrl_post, t_pre, t_post
    assert(r.getDouble(8) == 20.0)
  }

  test("ev_winsorized: fences clamp the whale, trim drops it") {
    val d = Files.createTempDirectory("winsor").toString
    // one arm (even user ids): values 1..20 plus outlier 1000
    // p05 of 21 sorted values = idx 1 → 2; p95 = idx 19 → 20
    // winsorized mean = (2 + 2..20 + 20)/21 = 231/21 = 11
    // trimmed keeps [2,20]: 19 values, mean 209/19 = 11
    val rows = (1 to 20).map(i => (i.toLong, ts(i), 2L, "view", i.toDouble)) :+
      (99L, ts(99), 2L, "view", 1000.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = StatsOps.evWinsorized(spark, d).collect().head
    assert(r.getInt(0) == 0 && r.getLong(1) == 21L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 20.0) // fences
    assert(r.getDouble(5) == 11.0)                          // winsor
    assert(r.getLong(6) == 19L && r.getDouble(7) == 11.0)   // trimmed
  }

  test("ev_jackknife: exact rate, positive SE, CI brackets the rate") {
    val d = Files.createTempDirectory("jack").toString
    // 40 users; 10 convert (14 purchases each), 30 don't (1 view)
    val rows = (0 until 10).flatMap(u =>
      (0 until 14).map(k => (u * 100L + k, ts(k), u.toLong, "purchase", 1.0))) ++
      (10 until 40).map(u => (9000L + u, ts(u), u.toLong, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r1 = StatsOps.evJackknife(spark, d).collect().head
    val r2 = StatsOps.evJackknife(spark, d).collect().head
    assert(r1 == r2) // md5 buckets: no RNG anywhere
    assert(r1.getLong(0) == 40L && r1.getLong(1) == 10L)
    assert(r1.getDouble(2) == 0.25)
    assert(r1.getDouble(3) > 0.0)
    assert(r1.getDouble(4) < 0.25 && r1.getDouble(5) > 0.25)
  }

  test("ev_stratified_effect: single stratum degenerates to ev_abtest") {
    val d = Files.createTempDirectory("strat").toString
    // all users have ne=14 → one 'low' stratum; ctrl 0/2, treat 1/2
    val rows =
      (0 until 14).map(k => (k.toLong, ts(k), 0L, "view", 1.0)) ++
      (0 until 14).map(k => (100L + k, ts(k), 2L, "view", 1.0)) ++
      (0 until 14).map(k => (200L + k, ts(k), 1L, "purchase", 1.0)) ++
      (0 until 14).map(k => (300L + k, ts(k), 3L, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evStratifiedEffect(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    assert(got == Seq(("low", 4L, 0.5), ("pooled", 4L, 0.5)))
  }

  test("text_kn_bigram: discount + continuation back-off by hand") {
    val d = Files.createTempDirectory("kn").toString
    // bigrams: (a,b) c=2, (a,c) c=1; c(a·)=3, N1+(a·)=2,
    // N1+(·b)=N1+(·c)=1, N1+(··)=2, D=0.75
    // P(b|a) = (1.25 + 0.75·2·0.5)/3 = 2/3  → −ln = 0.405465
    // P(c|a) = (0.25 + 0.75·2·0.5)/3 = 1/3  → −ln = 1.098612
    Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = TrainOps.textKnBigram(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == Seq((1L, 1L, 0.405465), (2L, 1L, 0.405465),
      (3L, 1L, 1.098612)))
  }

  test("mix_dedup_weights: within-source dup discount, weights sum to 1") {
    val d = Files.createTempDirectory("mixdw").toString
    Seq((1L, "srcA", "same text here"), (2L, "srcA", "same text here"),
      (3L, "srcA", "other text"), (4L, "srcB", "unique stuff"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = TrainOps.mixDedupWeights(spark, d).collect().toSeq
    val bySrc = got.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (nA, uA, rawA, uniqA) = bySrc("srcA")
    assert(nA == 3L && uA == 2L && rawA > uniqA)
    val (nB, uB, rawB, uniqB) = bySrc("srcB")
    assert(nB == 1L && uB == 1L && rawB == uniqB)
    val wsum = got.map(_.getDouble(6)).sum
    assert(math.abs(wsum - 1.0) < 1e-5)
  }

  test("text_hash_features: fixed width, zero row kept, counts add up") {
    val d = Files.createTempDirectory("hashf").toString
    Seq((1L, "aa aa bb"), (2L, "!!!"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = EventOpsSpecHelpers.rowsByDocId(
      TextOps.textHashingFeatures(spark, d).collect())
    val r1 = got(1L)
    assert(r1.getLong(1) == 3L)
    assert((2 until 18).map(r1.getLong).sum == 3L) // features sum to n_toks
    assert((2 until 18).map(r1.getLong).max >= 2L) // 'aa' bucket holds 2
    val r2 = got(2L)
    assert(r2.getLong(1) == 0L)
    assert((2 until 18).map(r2.getLong).forall(_ == 0L))
  }

  test("ann_range + emb_triplets: constructed cosines") {
    val d = Files.createTempDirectory("annrange").toString
    Seq(
      (0L, Array(1.0f, 0.0f), 0),   // the query
      (1L, Array(1.0f, 0.0f), 1),   // cos 1.0, label A
      (2L, Array(0.0f, 1.0f), 1),   // cos 0.0, label A
      (3L, Array(1.0f, 0.1f), 2),   // cos 0.995037, label B
      (4L, Array(-1.0f, 0.0f), 2))  // cos -1.0, label B
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val rng = SimOps.annRange(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rng == Seq((1L, 1.0), (3L, 0.995037)))
    val tri = SimOps.embTripletMining(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // anchor 1 (A): hardest positive = v2 (cos 0), hardest negative =
    // v0 (the query row, label 0, cos 1.0 — anchors exclude only
    // THEMSELVES); anchor 2 (A): pos v1, neg v3 (.0995 beats v0's 0);
    // anchor 3 (B): pos v4, neg = v1 (ties v0 at .995, higher id wins
    // the max-struct tie)
    assert(tri.take(3) == Seq((1L, 2L, 0L), (2L, 1L, 3L), (3L, 4L, 1L)))
  }

  test("emb_centroid_drift: orthogonal halves drift 1, equal halves 0") {
    val d = Files.createTempDirectory("cdrift").toString
    Seq(
      (0L, Array(1.0f, 0.0f), 1), (2L, Array(1.0f, 0.0f), 1), // even, A
      (3L, Array(0.0f, 1.0f), 1),                             // odd, A
      (6L, Array(1.0f, 0.0f), 2),                             // even, B
      (5L, Array(1.0f, 0.0f), 2))                             // odd, B
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SimOps.embCentroidDrift(spark, d).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    assert(got == Seq((1, 2L, 1L, 1.0), (2, 1L, 1L, 0.0)))
  }

  test("ann_prefilter: full recall when post-filter covers the label") {
    val d = Files.createTempDirectory("annpre").toString
    Seq(
      (0L, Array(1.0f, 0.0f), 9),  // query
      (1L, Array(1.0f, 0.0f), 1),  // target label A, cos 1
      (2L, Array(0.0f, 1.0f), 1),  // A, cos 0
      (3L, Array(1.0f, 0.1f), 2),  // B
      (4L, Array(-1.0f, 0.0f), 2)) // B
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val r = SimOps.annPrefilter(spark, d).collect().head
    assert(r.getInt(0) == 1)                    // target label
    assert(r.getLong(1) == 2L)                  // n_in_label
    assert(r.getLong(3) == 2L)                  // postfilter hits
    assert(r.getDouble(4) == 1.0)               // recall vs min(5, 2)
  }

  test("profile_topk: top-3 values per column with the asc tiebreak") {
    val d = Files.createTempDirectory("ptopk").toString
    val langs = Seq("en", "en", "en", "fr", "fr", "es", "de")
    langs.zipWithIndex.map { case (l, i) =>
      (i.toLong, s"text $i", l, "src0")
    }.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = Profiling.profileTopk(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3)))
    assert(got == Seq(
      ("lang", 1, "en", 3L), ("lang", 2, "fr", 2L),
      ("lang", 3, "de", 1L), // ties n=1: 'de' < 'es' asc
      ("source", 1, "src0", 7L)))
  }

  test("dq_iqr: constructed quartiles and one planted outlier") {
    val d = Files.createTempDirectory("iqr").toString
    // o_totalprice 1..100 plus 10000: q1/q3 of 101 values = 26/76,
    // iqr 50 → fences [-49, 151]: one point above, none below
    val prices = (1 to 100).map(_.toDouble) :+ 10000.0
    prices.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, 5.0)).toDF("l_orderkey", "l_extendedprice")
      .write.parquet(s"$d/lineitem.parquet")
    val got = StatsOpsSpecHelpers.rowsByCol(
      Profiling.dqIqrOutliers(spark, d).collect())
    val o = got("o_totalprice")
    assert(o.getLong(1) == 101L)
    assert(o.getDouble(2) == 26.0 && o.getDouble(3) == 76.0)
    assert(o.getDouble(4) == -49.0 && o.getDouble(5) == 151.0)
    assert(o.getLong(6) == 0L && o.getLong(7) == 1L)
  }

  test("ev_retention_halflife: geometric decay recovers the true rate") {
    val d = Files.createTempDirectory("hl").toString
    // one cohort week; 8 users active week 0; weeks 1..3 keep
    // 4, 2, 1 users -> r_k = 1/2^k, ln r = -k ln2, slope = -ln2,
    // half-life exactly 1 week
    val rows =
      (0 until 8).map(u => (u.toLong, ts(u), u.toLong, "view", 1.0)) ++
      (0 until 4).map(u => (100L + u, ts(7 * 86400 + u), u.toLong, "view", 1.0)) ++
      (0 until 2).map(u => (200L + u, ts(14 * 86400 + u), u.toLong, "view", 1.0)) ++
      (0 until 1).map(u => (300L + u, ts(21 * 86400 + u), u.toLong, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = EventOps.evRetentionHalflife(spark, d).collect().head
    assert(r.getLong(1) == 8L && r.getInt(2) == 3)
    assert(math.abs(r.getDouble(3) + math.log(2.0)) < 1e-6)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-6)
  }
}

/** Row-index helpers shared by the round-8 pins. */
private object EventOpsSpecHelpers {
  def rowsByDocId(rows: Array[org.apache.spark.sql.Row])
      : Map[Long, org.apache.spark.sql.Row] =
    rows.map(r => r.getLong(0) -> r).toMap
}

private object StatsOpsSpecHelpers {
  def rowsByCol(rows: Array[org.apache.spark.sql.Row])
      : Map[String, org.apache.spark.sql.Row] =
    rows.map(r => r.getString(0) -> r).toMap
}

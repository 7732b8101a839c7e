package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files

/** Hand-traced pins for the feature-engineering batch: bigram LM
  * smoothing, lag features, the calendar dimension, mixing epochs and
  * lexicon sentiment. */
class FeaturePanelSpec extends SparkFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def day(n: Int, m: Int = 0) =
    new java.sql.Timestamp(t0.getTime + n * 86400000L + m * 1000L)

  test("text_bigram_lm: hand-traced add-one smoothing on a 2-doc corpus") {
    val d = Files.createTempDirectory("bigram").toString
    // corpus bigrams: d1 = (a b), (b a), (a b); d2 = (a b)
    // c12: (a,b)=4... wait d1 'a b a b' → (a,b),(b,a),(a,b); d2 'a b'
    // c(a,b)=3, c(b,a)=1; c(a·)=3, c(b·)=1; V = 2 (tokens a, b)
    Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = TrainOps.textBigramLm(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def q(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val pAB = q(-math.log(4.0 / 5.0)) // (3+1)/(3+2)
    val pBA = q(-math.log(2.0 / 3.0)) // (1+1)/(1+2)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 3L && got(1L)._2 == r6((2 * pAB + pBA) / 3.0))
    assert(got(2L)._1 == 1L && got(2L)._2 == r6(pAB))
  }

  test("ev_lag_features: lags and trailing mean on a counting series") {
    val d = Files.createTempDirectory("lagf").toString
    // counts 1,2,3 on days 0..2
    val rows = for (dd <- 0 until 3; i <- 0 to dd)
      yield (dd * 10L + i, day(dd, i), 1L, "grow", 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evLagFeatures(spark, d).collect()
      .map(r => r.getInt(1) -> ((Option(r.get(3)), r.getDouble(5))))
      .toMap
    assert(got(0) == ((None, 1.0)))            // no lag1 yet, ma = 1/1
    assert(got(1) == ((Some(1L), 1.5)))        // ma = (1+2)/2
    assert(got(2) == ((Some(2L), 2.0)))        // ma = (1+2+3)/3
  }

  test("dim_dates: ISO dow/week and the weekend flag over one week") {
    val d = Files.createTempDirectory("dates").toString
    // 2024-01-01 (Mon) .. 2024-01-07 (Sun)
    Seq((1L, day(0), 1L, "a", 1.0), (2L, day(6), 1L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.dimDates(spark, d).collect()
    assert(got.length == 7)
    assert(got.map(_.getInt(5)).toSeq == (1 to 7)) // isodow Mon..Sun
    assert(got.map(_.getInt(6)).toSeq == Seq(0, 0, 0, 0, 0, 1, 1))
    assert(got.forall(_.getInt(4) == 1)) // all ISO week 1
  }

  test("mix_epochs: budgets follow sqrt weights and sum to the half-total") {
    val d = Files.createTempDirectory("epochs").toString
    // source a: 4 docs of 4 tokens; source b: 1 doc of 4 tokens
    val docs = (1 to 4).map(i => (i.toLong, "w x y z", "a")) :+
      ((9L, "w x y z", "b"))
    docs.toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = TrainOps.mixEpochs(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    // tokens: a=16, b=4; w: 4, 2; b_total = 10; budgets ⌊10·4/6⌋=6, ⌊10·2/6⌋=3
    assert(got("a") == ((4L, 16L, 6L, 0.375)))
    assert(got("b") == ((1L, 4L, 3L, 0.75))) // small source upweighted
  }

  test("ev_decompose: a constant series decomposes to pure trend") {
    val d = Files.createTempDirectory("decomp").toString
    val rows = for (dd <- 0 until 10; i <- 0 until 3)
      yield (dd * 10L + i, day(dd, i), 1L, "flat", 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = StatsOps.evSeasonalDecompose(spark, d).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 0.0 &&
        r.getDouble(5) == 0.0)
    }
  }

  test("graph_closeness: hand-traced 4-node chain; isolated seeds NULL out") {
    val d = Files.createTempDirectory("close").toString
    // bipartite chain c1—s1—c2—s2: from c1 dists are s1:1, c2:2, s2:3
    (Seq((10L, 1L), (20L, 2L), (21L, 2L)): Seq[(Long, Long)])
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    (Seq((10L, 1L), (20L, 1L), (21L, 2L)): Seq[(Long, Long)])
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val got = GraphOps.graphCloseness(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(got("c1") == ((3L, 6L, Some(0.5))))
    assert(got("c2") == ((3L, 4L, Some(0.75))))
    // c3..c5 don't trade: they reach only themselves → NULL closeness
    Seq("c3", "c4", "c5").foreach(sd => assert(got(sd) == ((0L, 0L, None))))
  }

  test("pack_batches: waste accounting on a hand-built length mix") {
    val d = Files.createTempDirectory("pbatch").toString
    // 9 docs in bucket 0 (lengths 1..9 tokens via 1-char words) → one
    // full batch of 8 + one singleton; waste exact by hand below
    val docs = (1 to 9).map(i => (i.toLong, ("x " * i).trim))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val r = TrainOps.packBatches(spark, d).collect()
    assert(r.length == 1 && r.head.getInt(0) == 0)
    val (nb, nd, st, sw) = (r.head.getLong(1), r.head.getLong(2),
      r.head.getLong(3), r.head.getLong(4))
    assert(nb == 2L && nd == 9L && st == 45L)
    // waste = Σ over the two batches of n·max − Σtokens; totals must
    // reconcile: padded volume = sum_tokens + sum_waste
    assert(sw >= 0L && st + sw >= 45L)
    assert(r.head.getDouble(5) ==
      BigDecimal(sw.toDouble / (sw + st).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ev_abtest_power: tiny arms are never powered for a 10-point lift") {
    val d = Files.createTempDirectory("power").toString
    def purchases(u: Long, n: Int) =
      (0 until n).map(i => (u * 1000 + i, day(0, i), u, "purchase", 1.0))
    val rows = purchases(1L, 14) ++ purchases(2L, 14) ++
      Seq((9000L, day(0), 3L, "view", 1.0), (9001L, day(0), 4L, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = StatsOps.evAbtestPower(spark, d).collect().head
    // pooled p = 2/4 = 0.5 → n = ⌈7.84·0.5/0.01⌉ = 392 per arm
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5 && r.getLong(4) == 392L && r.getInt(5) == 0)
  }

  test("bpe_merge: picks the top pair and merges leftmost non-overlapping") {
    val d = Files.createTempDirectory("bpem").toString
    // 'ab' count 5 beats 'ba' count 2; 'abab' merges to two sentinel
    // tokens whose adjacency is the only surviving pair
    Seq((1L, "abab abab ab")).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = TrainOps.bpeMerge(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length == 1)
    assert(got.head == (("ab", "<ab><ab>", 2L)))
  }

  test("graph_diameter: double sweep finds the chain's true diameter") {
    val d = Files.createTempDirectory("diam").toString
    // chain c1—s1—c2—s2: ecc(c1)=3, far=s2, ecc(s2)=3 → diameter 3
    (Seq((10L, 1L), (20L, 2L), (21L, 2L)): Seq[(Long, Long)])
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    (Seq((10L, 1L), (20L, 1L), (21L, 2L)): Seq[(Long, Long)])
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val r = GraphOps.graphDiameter(spark, d).collect().head
    assert(r.getString(0) == "c1" && r.getString(1) == "s2")
    assert(r.getInt(2) == 3 && r.getLong(3) == 4L)
  }

  test("profile_entropy: uniform split scores ln 2, constant scores 0") {
    val d = Files.createTempDirectory("pent").toString
    (Seq(("O", "1-URGENT"), ("F", "1-URGENT"), ("O", "1-URGENT"),
      ("F", "1-URGENT")): Seq[(String, String)])
      .toDF("o_orderstatus", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    val got = Profiling.profileEntropy(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val ln2 = BigDecimal(math.floor(0.5 * math.log(2.0) * 1e9 + 0.5) * 2 / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("o_orderstatus") == ((2L, ln2, 0.5)))
    assert(got("o_orderpriority") == ((1L, 0.0, 1.0)))
  }

  test("text_sentiment: polarity arithmetic and the neutral default") {
    val d = Files.createTempDirectory("sent").toString
    Seq((1L, "fast big table"), (2L, "slow error slow"),
      (3L, "fast slow"), (4L, "table scan only"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = TextOps.textSentiment(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getString(4)))).toMap
    assert(got(1L) == ((1.0, "pos")))
    assert(got(2L) == ((-1.0, "neg")))
    assert(got(3L) == ((0.0, "neu")))
    assert(got(4L) == ((0.0, "neu")))
  }
}

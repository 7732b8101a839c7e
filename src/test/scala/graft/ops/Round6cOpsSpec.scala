package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Hand-checkable semantics for the round-6c additions: the Gopher
  * rule panel, deterministic HLL, Markov stationary distribution, and
  * local clustering coefficient (the catalog rows prove
  * engine-vs-oracle agreement; these prove the operators mean what
  * they claim on fixtures small enough to verify by hand). */
class Round6cOpsSpec extends SparkFunSuite {
  import spark.implicits._

  // ------------------------------------------------------- gopher rules

  private lazy val gopherDir: String = {
    val d = Files.createTempDirectory("gopher").toString
    val good = Array.fill(5)(
      "the quick brown foxes jumped over those lazy dogs with").mkString(" ")
    val short = "short text"
    val bullets = "- item one\n- item two\n- item three"
    Seq((1L, good), (2L, short), (3L, bullets))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  test("gopher rules: per-rule pass counts on a hand-built corpus") {
    val rows = TextOps.textGopherRules(spark, gopherDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.size == 8)
    // only the 50-word doc passes word_count
    assert(rows("word_count") == ((1L, 2L)))
    // the bullet doc: 3/3 lines start with '-' => >= 90% => fail
    assert(rows("bullet_lines") == ((2L, 1L)))
    // stop words: good doc has the/with x5; others have none
    assert(rows("stop_words") == ((1L, 2L)))
    // the bullet doc's '-' tokens carry no letter: 6/9 < 0.8 => fail
    assert(rows("alpha_words") == ((2L, 1L)))
    // conjunction: exactly the good doc
    assert(rows("all") == ((1L, 2L)))
    // pass + fail always partitions the corpus
    rows.values.foreach { case (p, f) => assert(p + f == 3L) }
  }

  // ---------------------------------------------------------------- hll

  private lazy val hllDir: String = {
    val d = Files.createTempDirectory("hll").toString
    // type "a": 30 distinct users (each seen twice — duplicates must
    // not move the sketch); type "b": 500 distinct users
    val a = (1L to 30L).flatMap(u => Seq(("a", u), ("a", u)))
    val b = (1000L to 1499L).map(u => ("b", u))
    (a ++ b).map { case (t, u) =>
      (t, u, new Timestamp(1700000000000L))
    }.toDF("event_type", "user_id", "ts")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("hll: linear-counting branch is exact-formula, estimate tracks exact") {
    val rows = LayoutOlap.a20Hll(spark, hllDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val (zerosA, estA, exactA) = rows("a")
    assert(exactA == 30L)
    // 30 hashed users cannot fill 256 registers; small-range branch
    // must fire and equal the linear-counting formula exactly
    assert(zerosA >= 226L)
    val lin = 256.0 * math.log(256.0 / zerosA)
    assert(math.abs(estA - lin) < 1e-4)
    // linear counting at n<<m is tight
    assert(math.abs(estA - 30.0) / 30.0 < 0.15)
    val (_, estB, exactB) = rows("b")
    assert(exactB == 500L)
    // standard HLL error at m=256 is ~6.5%; allow 3 sigma
    assert(math.abs(estB - 500.0) / 500.0 < 0.20)
  }

  test("hll: duplicate-insensitive (union of duplicates = set)") {
    val d2 = Files.createTempDirectory("hll2").toString
    (1L to 30L).map(u => ("a", u, new Timestamp(1700000000000L)))
      .toDF("event_type", "user_id", "ts")
      .write.parquet(s"$d2/events.parquet")
    val once = LayoutOlap.a20Hll(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val twice = LayoutOlap.a20Hll(spark, hllDir).collect()
      .filter(_.getString(0) == "a")
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(once == twice)
  }

  test("hll merge: parity-half registers max-merge to the full estimate") {
    val rows = LayoutOlap.a22HllMerge(spark, hllDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5)))).toMap
    val (ev, od, mg, fl, eq) = rows("a")
    assert(eq == 1 && mg == fl)
    // halves see ~15 users each; the merge sees all 30
    assert(math.abs(mg - 30.0) / 30.0 < 0.15)
    assert(ev < mg && od < mg)
  }

  // --------------------------------------------------------- stationary

  private def eventsDf(rows: Seq[(Long, Long, String)]) =
    rows.zipWithIndex.map { case ((eid, uid, tp), i) =>
      (eid, uid, tp, new Timestamp(1700000000000L + i * 1000L))
    }.toDF("event_id", "user_id", "event_type", "ts")

  test("markov stationary: alternating two-state chain settles at 1/2, 1/2") {
    val d = Files.createTempDirectory("mkv").toString
    eventsDf(Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "a"), (4L, 1L, "b"),
      (5L, 2L, "b"), (6L, 2L, "a"), (7L, 2L, "b"), (8L, 2L, "a")))
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evMarkovStationary(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got("a") == ((0.5, 0.5)))
    assert(got("b") == ((0.5, 0.5)))
  }

  test("markov stationary: absorbing state takes the mass; self-loop added") {
    val d = Files.createTempDirectory("mkv2").toString
    // one user: a, a, c — P(a,a)=1/2, P(a,c)=1/2, c gets a self-loop.
    // From uniform (1/2, 1/2): pi_a halves each round => 0.5^9 after 8.
    eventsDf(Seq((1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "c")))
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evMarkovStationary(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 0.001953) // round(0.5^9, 6)
    assert(got("c") == 0.998047)
  }

  test("markov attribution: removal effects on a hand-solvable funnel") {
    val d = Files.createTempDirectory("attr").toString
    // u1/u3: click->purchase; u2: view only; u4: view->purchase;
    // u5: immediate purchase (START->CONV direct edge)
    eventsDf(Seq(
      (1L, 1L, "click"), (2L, 1L, "purchase"),
      (3L, 2L, "view"),
      (4L, 3L, "click"), (5L, 3L, "purchase"),
      (6L, 4L, "view"), (7L, 4L, "purchase"),
      (8L, 5L, "purchase")))
      .write.parquet(s"$d/events.parquet")
    // P(START): click .4, view .4, CONV .2; click->CONV 1;
    // view -> CONV .5 / NULL .5  =>  base = .4 + .2 + .2 = 0.8
    // remove click: .4*0 + .4*.5 + .2 = 0.4  => effect 0.5
    // remove view:  .4*1 + .4*0  + .2 = 0.6  => effect 0.25
    val got = EventOps.evAttribMarkov(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "click" -> ((0.8, 0.4, 0.5)),
      "view" -> ((0.8, 0.6, 0.25))))
  }

  test("auc: separable, random, and tied score sets hit exact values") {
    def dirFor(rows: Seq[(String, Double)]): String = {
      val d = Files.createTempDirectory("auc").toString
      rows.zipWithIndex.map { case ((tp, v), i) =>
        (i.toLong + 1, tp, v, new Timestamp(1700000000000L))
      }.toDF("event_id", "event_type", "value", "ts")
        .write.parquet(s"$d/events.parquet")
      d
    }
    def auc(rows: Seq[(String, Double)]): Double =
      EventOps.evAuc(spark, dirFor(rows)).head().getDouble(2)
    // perfectly separated
    assert(auc(Seq(("view", 1.0), ("view", 2.0),
      ("purchase", 3.0), ("purchase", 4.0))) == 1.0)
    // fully tied: the 1/2 correction lands exactly on chance
    assert(auc(Seq(("view", 1.0), ("view", 2.0),
      ("purchase", 1.0), ("purchase", 2.0))) == 0.5)
    // interleaved: 3 of 4 pairs won
    assert(auc(Seq(("view", 1.0), ("purchase", 2.0),
      ("view", 3.0), ("purchase", 4.0))) == 0.75)
  }

  test("calibration: per-decile mean prediction vs observed rate") {
    val d = Files.createTempDirectory("cal").toString
    // bucket 1 (pred .10/.15): 1 purchase of 2 -> obs .5, mean .125
    // bucket 9 (pred clamped 1.0): pure purchases -> gap 0
    Seq(("view", 10.0), ("purchase", 15.0),
      ("purchase", 150.0), ("purchase", 100.0))
      .zipWithIndex.map { case ((tp, v), i) =>
        (i.toLong + 1, tp, v, new Timestamp(1700000000000L))
      }.toDF("event_id", "event_type", "value", "ts")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evCalibration(spark, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(1) == ((2L, 1L, 0.125, 0.5, -0.375)))
    assert(got(9) == ((2L, 2L, 1.0, 1.0, 0.0)))
  }

  test("fd audit: holding and violating dependencies both reported") {
    val d = Files.createTempDirectory("fd").toString
    Seq((1L, 1L), (2L, 1L)).toDF("n_nationkey", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
      .write.parquet(s"$d/part.parquet")
    Seq((1L, 1L, "AUTO"), (2L, 1L, "BIKE"), (3L, 2L, "AUTO"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    Seq((1L, "R"), (1L, "N"), (2L, "N"))
      .toDF("l_orderkey", "l_returnflag")
      .write.parquet(s"$d/lineitem.parquet")
    val got = Profiling.dqFd(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got("nation_to_region") == ((2L, 0L, 1L)))
    assert(got("partkey_to_brand") == ((2L, 0L, 1L)))
    // nation 1 has two segments -> 1 of 2 groups violates
    assert(got("custnation_to_segment") == ((2L, 1L, 2L)))
    assert(got("order_to_returnflag") == ((2L, 1L, 2L)))
  }

  test("equi-depth histogram: boundary values at exact ceil-rank cuts") {
    val d = Files.createTempDirectory("eqh").toString
    ((1 to 8).map(i => ("a", i.toDouble)) ++
      Seq(10, 20, 30, 40).map(v => ("b", v.toDouble)))
      .zipWithIndex.map { case ((tp, v), i) =>
        (i.toLong + 1, tp, v, new Timestamp(1700000000000L))
      }.toDF("event_id", "event_type", "value", "ts")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evHistogramEq(spark, d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // type a: n=8, boundary k sits at rank k; type b: n=4, each value
    // serves two buckets (rank ceil(k/2))
    assert(got.filter(_._1 == "a").map(x => (x._2, x._3)).toList ==
      (1 to 8).map(k => (k, k.toDouble)).toList)
    assert(got.filter(_._1 == "b").map(x => (x._2, x._3)).toList ==
      List((1, 10.0), (2, 10.0), (3, 20.0), (4, 20.0),
        (5, 30.0), (6, 30.0), (7, 40.0), (8, 40.0)))
  }

  // ---------------------------------------------------------------- lcc

  private lazy val triDir: String = {
    val d = Files.createTempDirectory("lcc").toString
    // co-occurrence edges (each needs 2 shared bulk customers):
    // s1-s2, s1-s3, s2-s3 (a triangle), s3-s4 (a pendant edge)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val rows = edges.zipWithIndex.flatMap { case ((sa, sb), e) =>
      Seq(0, 1).flatMap { k =>
        val cust = (e * 2 + k + 1).toLong // dedicated customer per copy
        val ord = cust * 10
        Seq((ord, cust, sa), (ord, cust, sb))
      }
    }
    rows.map { case (o, c, _) => (o, c) }.distinct
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    rows.map { case (o, _, sk) => (o, sk, java.math.BigDecimal.valueOf(50)) }
      .toDF("l_orderkey", "l_suppkey", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("clustcoeff: triangle corners 1.0, hub 1/3, pendant NULL") {
    val got = GraphOps.graphClustCoeff(spark, triDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toList
    assert(got == List(
      (1L, 2L, 1L, 1.0),
      (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.333333),
      (4L, 1L, 0L, null)))
  }

  test("triangles and clustcoeff agree on the shared memoized artifact") {
    val tri = GraphOps.graphTriangles(spark, triDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ----------------------------------------------------- weighted median

  private def wmedianDir(rows: Seq[(Long, java.math.BigDecimal, Long)])
      : String = {
    val d = Files.createTempDirectory("wmed").toString
    Seq((0L, "ALPHA")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$d/supplier.parquet")
    rows.zipWithIndex.map { case ((ok, price, qty), i) =>
      (ok, i + 1, 1L, price, java.math.BigDecimal.valueOf(qty))
    }.toDF("l_orderkey", "l_linenumber", "l_suppkey",
      "l_extendedprice", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("wmedian: crossing rule on a hand-built weight ladder") {
    def bd(v: Long) = java.math.BigDecimal.valueOf(v)
    // weights 1,1,2 over prices 10,20,30: cum 1,2,4; 2*2 >= 4 at 20
    val d1 = wmedianDir(Seq((1L, bd(10)), (2L, bd(20)), (3L, bd(30)))
      .zip(Seq(1L, 1L, 2L)).map { case ((o, p), w) => (o, p, w) })
    val r1 = LayoutOlap.o15Wmedian(spark, d1).collect()
    assert(r1.length == 1)
    assert(r1.head.getLong(1) == 4L)       // total_weight
    assert(r1.head.getDouble(2) == 20.0)   // w_median_price
    // a heavy tail row drags the median to it: weights 1,1,6 -> 30
    val d2 = wmedianDir(Seq((1L, bd(10)), (2L, bd(20)), (3L, bd(30)))
      .zip(Seq(1L, 1L, 6L)).map { case ((o, p), w) => (o, p, w) })
    val r2 = LayoutOlap.o15Wmedian(spark, d2).collect()
    assert(r2.head.getLong(1) == 8L)
    assert(r2.head.getDouble(2) == 30.0)
  }

  // -------------------------------------------------------- jsd sources

  test("jsd: identical sources diverge 0, disjoint sources hit ln 2") {
    val d = Files.createTempDirectory("jsd").toString
    Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "alpha beta gamma", "s2"),
      (3L, "delta epsilon", "s3"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.textJsdSources(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("s1", "s2")) == ((3L, 0.0)))
    // no shared tokens: JSD = ln 2 exactly (round 6)
    assert(got(("s1", "s3")) == ((0L, 0.693147)))
    assert(got(("s2", "s3")) == ((0L, 0.693147)))
  }

  test("theil-sen: median pairwise slope on a hand-built series") {
    val d = Files.createTempDirectory("ts").toString
    // daily counts 1, 2, 4 -> slopes {1, 1.5, 2} -> median 1.5
    val day = 86400000L
    val rows = Seq.fill(1)(0L) ++ Seq.fill(2)(1L) ++ Seq.fill(4)(2L)
    rows.zipWithIndex.map { case (dd, i) =>
      (i.toLong + 1, "a", 1.0, new Timestamp(1700000000000L + dd * day))
    }.toDF("event_id", "event_type", "value", "ts")
      .write.parquet(s"$d/events.parquet")
    val r = StatsOps.evTheilSen(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getInt(1) == 3 && r.head.getLong(2) == 3L)
    assert(r.head.getDouble(3) == 1.5)
  }

  test("holt-winters: a perfectly periodic series is a fixpoint") {
    val d = Files.createTempDirectory("hw").toString
    val day = 86400000L
    val pattern = Seq(3, 1, 4, 1, 5, 9, 2)
    val rows = for {
      t <- 0 until 14
      k <- 0 until pattern(t % 7)
    } yield (t.toLong * 100 + k, "a", 1.0,
      new Timestamp(1700000000000L + t * day))
    rows.toDF("event_id", "event_type", "value", "ts")
      .write.parquet(s"$d/events.parquet")
    val r = StatsOps.evHoltWinters(spark, d).collect().head
    // level settles at the weekly mean, trend at 0; next-day forecast
    // reproduces the pattern value for day 14 (= day 0's count)
    assert(r.getInt(1) == 14)
    assert(r.getDouble(2) == math.rint(25.0 / 7.0 * 1e6) / 1e6)
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 3.0)
  }

  test("negative sampling: reproducible, positive-free, capped at k") {
    val d = Files.createTempDirectory("negs").toString
    // customer 20 (passes % 20) trades with suppliers 1 and 2 of 1..5
    Seq((100L, 20L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$d/orders.parquet")
    Seq((100L, 1L), (100L, 2L)).toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$d/lineitem.parquet")
    (1L to 5L).map(Tuple1(_)).toDF("s_suppkey")
      .write.parquet(s"$d/supplier.parquet")
    // replicate the draw: rank = md5-52-bit("20#i") % 5 + 1, ranks are
    // suppkeys here; keep non-positives, earliest attempt, first 3
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(i: Int): Long = {
      val hex = md.digest(s"20#$i".getBytes)
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16) % 5 + 1
    }
    val expected = (1 to 6).map(i => (draw(i), i))
      .filterNot { case (sk, _) => sk == 1L || sk == 2L }
      .groupBy(_._1).map { case (sk, xs) => (sk, xs.map(_._2).min) }
      .toSeq.sortBy { case (sk, i) => (i, sk) }.take(3)
      .zipWithIndex.map { case ((sk, i), r) => (20L, sk, i, r + 1) }
    val got = TrainOps.sampleNegatives(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toList == expected.toList)
    assert(got.forall(r => r._2 != 1L && r._2 != 2L))
    assert(got.length <= 3)
  }

  test("lateness: running-arrival max clamps on-time events to zero") {
    val d = Files.createTempDirectory("late").toString
    // arrival order ts seconds: 10, 5, 20, 15 -> lateness 0, 5, 0, 5
    Seq(10L, 5L, 20L, 15L).zipWithIndex.map { case (sec, i) =>
      (i.toLong + 1, "a", 1.0, new Timestamp(1700000000000L + sec * 1000))
    }.toDF("event_id", "event_type", "value", "ts")
      .write.parquet(s"$d/events.parquet")
    val r = EventOps.evLateness(spark, d).collect().head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5)) == ((4L, 2L, 0.5, 2.5, 5.0)))
  }

  test("layout skipping: clustered layouts prune, natural does not") {
    val rows = LayoutOlap.layoutSkipping(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val matching = rows.values.map(_.getLong(6)).toSet
    assert(matching.size == 1) // the answer is layout-independent
    assert(rows("natural").getLong(5) ==
      rows("natural").getLong(4)) // scans everything
    assert(rows("bydate").getLong(5) < rows("bydate").getLong(4))
    assert(rows("zorder").getLong(5) < rows("zorder").getLong(4))
    rows.values.foreach(r => assert(r.getLong(5) >= r.getLong(6)))
  }

  test("flow: step-indexed transition counts for the first actions") {
    val d = Files.createTempDirectory("flow").toString
    eventsDf(Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"),
      (4L, 2L, "a"), (5L, 2L, "b")))
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evFlow(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toList == List((1, "a", "b", 2L), (2, "b", "c", 1L)))
  }

  test("lang confusion: detected vs labeled with row shares") {
    val d = Files.createTempDirectory("conf").toString
    Seq(
      (1L, "the cat and the dog is in the house", "en"),
      (2L, "zzz qqq xxx", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.textLangConfusion(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toList == List(
      ("en", "en", 1L, 0.5), ("en", "und", 1L, 0.5)))
  }

  test("medoid: summed-similarity argmax with min-id tie break") {
    val d = Files.createTempDirectory("medoid").toString
    Seq(
      (1L, "a b c d e"), // grams {abc,bcd,cde}
      (2L, "a b c d e"), // identical twin: j(1,2)=1.0
      (3L, "a b c d e f"), // {abc,bcd,cde,def}: j=0.75 to both
      (4L, "p q r s t"), (5L, "p q r s t")) // a clean pair cluster
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = DedupOps.dedupMedoid(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // cluster 1: docs 1 and 2 tie at 1.0+0.75 -> min id 1 wins
    assert(got.toList == List((1L, 1L, 1.75), (4L, 4L, 1.0)))
  }

  test("srm: balanced split passes, broken assignment flags") {
    def dirFor(users: Seq[Long]): String = {
      val d = Files.createTempDirectory("srm").toString
      users.zipWithIndex.map { case (u, i) =>
        (i.toLong + 1, u, "view", new Timestamp(1700000000000L))
      }.toDF("event_id", "user_id", "event_type", "ts")
        .write.parquet(s"$d/events.parquet")
      d
    }
    // 3 even vs 1 odd: chi2 = 1/2 + 1/2 = 1.0 -> below critical
    val ok = StatsOps.evAbSrm(spark, dirFor(Seq(2L, 4L, 6L, 1L))).head()
    assert((ok.getLong(0), ok.getLong(1), ok.getDouble(2),
      ok.getInt(3)) == ((3L, 1L, 1.0, 0)))
    // all 10 users even: chi2 = 5 + 5 = 10 -> mismatch flagged
    val bad = StatsOps.evAbSrm(spark,
      dirFor((1L to 10L).map(_ * 2))).head()
    assert(bad.getDouble(2) == 10.0 && bad.getInt(3) == 1)
  }

  test("nprobe sweep: recall climbs monotonically to 1.0 at full probe") {
    val rows = SimOps.annNprobeSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toList == List(1, 2, 4, 8, 16))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 })
    val full = rows.last
    assert(full._3 == 1.0) // all cells probed == brute force
  }

  test("rbo: matches the direct definition on the engine's own lists") {
    val brute = SimOps.annBrute(spark, sfDir).collect()
      .map(_.getLong(0)).toList
    val ivf = SimOps.annIvf(spark, sfDir).collect()
      .map(_.getLong(0)).toList
    val wm = (1 to 20).map(m =>
      (m to 20).map(dd => math.pow(0.9, dd - 1) / dd).sum)
    val ms = for {
      (a, i) <- brute.zipWithIndex
      j = ivf.indexOf(a) if j >= 0
    } yield math.max(i + 1, j + 1)
    val sq = ms.map(m => math.floor(wm(m - 1) * 1e12 + 0.5).toLong).sum
    val exp = java.math.BigDecimal.valueOf(0.1 * (sq.toDouble / 1e12))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val r = SimOps.annRbo(spark, sfDir).head()
    assert(r.getLong(1) == ms.size.toLong)
    assert(r.getDouble(2) == exp)
  }

  test("burstiness: concentrated tokens score high, even spread scores 0") {
    val d = Files.createTempDirectory("burst").toString
    // "zz" all in one doc of 10; "qq" spread 6 per doc
    val docs = (1L to 10L).map { i =>
      val zz = if (i == 1) Array.fill(60)("zz") else Array.empty[String]
      (i, (zz ++ Array.fill(6)("qq")).mkString(" "))
    }
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = TextOps.textBurstiness(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // zz: mean 6, E[c^2] 360 -> var 324 -> vmr 54; qq: zero variance
    assert(got("zz") == ((60L, 1L, 54.0)))
    assert(got("qq") == ((60L, 10L, 0.0)))
  }

  test("rich club: hubs-only subgraph density at rising thresholds") {
    val d = Files.createTempDirectory("rich").toString
    // c1 trades with s1,s2,s3; c2,c3 trade with s1 only
    val rows = Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L),
      (4L, 2L, 1L), (5L, 3L, 1L))
    rows.map { case (o, c, _) => (o, c) }.distinct
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    rows.map { case (o, _, sk) => (o, sk) }
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val got = GraphOps.graphRichClub(spark, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    // deg > 2 keeps exactly the two hubs c1 and s1, who are linked
    assert(got(2) == ((2L, 1L, 1.0)))
    // nobody clears 32: empty club, phi undefined
    assert(got(32) == ((0L, 0L, null)))
  }

  test("growth accounting: new/retained/resurrected/churned ledger") {
    val d = Files.createTempDirectory("growth").toString
    def ts(month: Int) = Timestamp.valueOf(f"2023-$month%02d-15 00:00:00")
    // u1 every month; u2 month 1 only; u3 skips month 2; u4 starts m2
    val rows = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(3)),
      (2L, ts(1)),
      (3L, ts(1)), (3L, ts(3)),
      (4L, ts(2)))
    rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong + 1, u, "view", t)
    }.toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evGrowthAccounting(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) null else r.getDouble(6)))).toMap
    assert(got("2023-01") == ((3L, 3L, 0L, 0L, 0L, null)))
    assert(got("2023-02") == ((2L, 1L, 1L, 0L, 2L, 0.5)))
    assert(got("2023-03") == ((2L, 0L, 1L, 1L, 1L, 1.0)))
  }

  test("threshold sweep: pair and doc counts drop as the bar rises") {
    val d = Files.createTempDirectory("tsweep").toString
    Seq( // (1,2) and (4,5) at j=1.0; (1,3)/(2,3) at j=0.75
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e f"),
      (4L, "p q r s t"), (5L, "p q r s t"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = DedupOps.dedupThresholdSweep(spark, d).collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq(0.5, 0.6, 0.7).foreach(t => assert(got(t) == ((4L, 5L))))
    Seq(0.8, 0.9).foreach(t => assert(got(t) == ((2L, 4L))))
  }

  test("vocab growth: one new type per decile accumulates exactly") {
    val d = Files.createTempDirectory("heaps").toString
    // doc i holds words w1..wi: each decile introduces exactly one type
    (1 to 10).map(i => (i.toLong, (1 to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = TextOps.textVocabGrowth(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toList == (1 to 10).map(i =>
      (i, 1L, i.toLong * (i + 1) / 2, 1L, i.toLong)).toList)
  }

  // --------------------------------------------------------- curriculum

  test("allocate: largest-remainder cents sum back to the total exactly") {
    val d = Files.createTempDirectory("alloc").toString
    def bd(v: Double) = java.math.BigDecimal.valueOf(v)
    Seq((50L, bd(1.00)), (100L, bd(0.10)), (51L, bd(9.99)))
      .toDF("o_orderkey", "o_totalprice").write.parquet(s"$d/orders.parquet")
    Seq( // order 50: three equal lines fight over 100 cents
      (50L, 1, bd(1)), (50L, 2, bd(1)), (50L, 3, bd(1)),
      // order 100: 3:7 split of 10 cents lands exactly
      (100L, 1, bd(3)), (100L, 2, bd(7)),
      // order 51 is filtered out by the % 50 sample
      (51L, 1, bd(2)))
      .toDF("l_orderkey", "l_linenumber", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    val got = LayoutOlap.a21Allocate(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(got == Map(
      (50L, 1) -> 34L, (50L, 2) -> 33L, (50L, 3) -> 33L,
      (100L, 1) -> 3L, (100L, 2) -> 7L))
  }

  test("novelty: first occurrence owns the shingle, re-treads score low") {
    val d = Files.createTempDirectory("novel").toString
    Seq(
      (1L, "a b c d"), // shingles {abc, bcd}: both novel
      (2L, "a b c d"), // exact re-tread: 0 novel
      (3L, "b c d e")) // {bcd (seen), cde (new)}: half novel
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = TextOps.textNovelty(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got(3L) == ((2L, 1L, 0.5)))
  }

  test("cluster quality: orthogonal clusters give the exact margin panel") {
    val d = Files.createTempDirectory("cq").toString
    // odd ids on the x-axis, even ids on the y-axis (cos = 1 within a
    // cluster, 0 across), magnitudes vary so only direction matters
    (1L to 6L).map { i =>
      val v = if (i % 2 == 1) Array(i.toFloat, 0f) else Array(0f, i.toFloat)
      (i, v)
    }.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes)
      .map("%02x".format(_)).mkString
    // replicate the sampled-seed pick: the 2 smallest md5(vec_id)
    val seeds = (1L to 6L).sortBy(i => (h(i.toString), i)).take(2)
    val sameCluster = (seeds(0) % 2) == (seeds(1) % 2)
    spark.conf.set("spark.graft.ann.nlist", "2")
    try {
      val rows = SimOps.embClusterQuality(spark, d).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
      if (sameCluster) {
        // both centroids point the same way: every vector ties at
        // cos 1 (own cluster) or 0 and lands on centroid 0; the empty
        // cell vanishes and the nearest centroid is an exact twin
        assert(rows.toList == List((0, 6L, 0.5, 1.0, -0.5)))
      } else {
        // one centroid per cluster: perfect cohesion, zero overlap
        assert(rows.toList ==
          List((0, 3L, 1.0, 0.0, 1.0), (1, 3L, 1.0, 0.0, 1.0)))
      }
    } finally spark.conf.set("spark.graft.ann.nlist", "16")
  }

  test("curriculum: 8 docs cut into 4 equal phases by length") {
    val d = Files.createTempDirectory("curr").toString
    (1 to 8).map(i => (i.toLong, "x" * i, i.toLong))
      .toDF("doc_id", "text", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TrainOps.packCurriculum(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toList == List(
      (1, 2L, 1L, 2L), (2, 2L, 3L, 4L), (3, 2L, 5L, 6L), (4, 2L, 7L, 8L)))
  }
}

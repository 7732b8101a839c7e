package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files
import scala.util.Random

/** Randomized equivalence properties for the round-8 combinatorial
  * primitives: the degree-oriented triangle census against a naive
  * O(n³) enumeration, the 8-term adstock window against the true
  * geometric recursion, and the group-k-fold user-conservation law
  * (a user straddling folds would double-count in the fold panel).
  * Seeds are fixed, so the cases are reproducible. */
class Round8PropertySpec extends SparkFunSuite {
  import spark.implicits._

  test("graph_triangles: oriented census equals naive enumeration") {
    val rnd = new Random(42)
    for (round <- 1 to 3) {
      val d = Files.createTempDirectory(s"triprop$round").toString
      val nCust = 6 + rnd.nextInt(4)
      val nSupp = 6 + rnd.nextInt(5)
      // each customer buys a random supplier subset at quantity 50
      val baskets = (1 to nCust).map { c =>
        c.toLong -> (1 to nSupp).filter(_ => rnd.nextDouble() < 0.45)
          .map(_.toLong).toSet
      }
      val orders = baskets.map { case (c, _) => (c, c) } // orderkey = cust
      val li = baskets.flatMap { case (c, ss) => ss.map(sk => (c, sk, 50.0)) }
      orders.toDF("o_orderkey", "o_custkey")
        .write.parquet(s"$d/orders.parquet")
      li.toDF("l_orderkey", "l_suppkey", "l_quantity")
        .write.parquet(s"$d/lineitem.parquet")
      // naive: undirected edges = supplier pairs sharing >= 2 baskets;
      // triangles enumerated cubically; per-node membership counts
      val supps = (1L to nSupp.toLong).toSeq
      def co(a: Long, b: Long) =
        baskets.count { case (_, ss) => ss(a) && ss(b) }
      val edge = (for {
        a <- supps; b <- supps if a < b && co(a, b) >= 2
      } yield (a, b)).toSet
      def adj(a: Long, b: Long) =
        edge(if (a < b) (a, b) else (b, a))
      val naive = scala.collection.mutable.Map.empty[Long, Long]
      for {
        a <- supps; b <- supps if a < b && adj(a, b)
        c <- supps if b < c && adj(b, c) && adj(a, c)
      } Seq(a, b, c).foreach(n => naive(n) = naive.getOrElse(n, 0L) + 1)
      val got = GraphOps.graphTriangles(spark, d).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive.toMap, s"round $round: $got vs $naive")
    }
  }

  test("ev_adstock: window form equals the truncated recursion") {
    val rnd = new Random(7)
    val d = Files.createTempDirectory("adprop").toString
    val days = 14
    val counts = Array.fill(days)(rnd.nextInt(5)) // some zero days
    val rows = for {
      t <- 0 until days; i <- 0 until counts(t)
    } yield ((t * 100 + i).toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${t + 1}%02d 12:00:00"),
      1L, "view", 1.0)
    // guarantee a nonempty spine end-to-end
    val all = rows ++ Seq((9990L,
      java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2L, "view", 1.0),
      (9991L, java.sql.Timestamp.valueOf(f"2024-01-$days%02d 01:00:00"),
        2L, "view", 1.0))
    all.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val perDay = Array.tabulate(days)(t =>
      counts(t).toLong + (if (t == 0 || t == days - 1) 1L else 0L))
    val expected = Array.tabulate(days) { t =>
      (0 to 7).map(k => if (t - k >= 0)
        perDay(t - k) * math.pow(0.5, k) else 0.0).sum
    }
    val got = StatsOps.evAdstock(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == days)
    got.foreach { case (t, n, ad) =>
      assert(n == perDay(t.toInt))
      assert(math.abs(ad - expected(t.toInt)) < 1e-6,
        s"t=$t got $ad expected ${expected(t.toInt)}")
    }
  }

  test("dq_sequence_gaps: bucket decomposition equals the naive lag") {
    val rnd = new Random(23)
    for (round <- 1 to 3) {
      val d = Files.createTempDirectory(s"gapprop$round").toString
      // sparse random ids spanning several 1000-buckets, some empty
      val ids = (1 to 60).map(_ => rnd.nextInt(7000).toLong)
        .distinct.sorted
      ids.map(i => (i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          1L, "purchase", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$d/events.parquet")
      val missing = ids.max - ids.min + 1 - ids.length
      val naive = ids.zip(ids.tail)
        .filter { case (a, b) => b - a > 1 }
        .map { case (a, b) => (a + 1, b - 1, b - a - 1, missing) }
        .sortBy { case (s0, _, l, _) => (-l, s0) }
        .take(10)
      val got = Profiling.dqSequenceGaps(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == naive, s"round $round")
    }
  }

  test("dedup_blocking_eval: closed-form candidates equal naive pairs") {
    val rnd = new Random(31)
    val d = Files.createTempDirectory("blockprop").toString
    val langs = Seq("en", "fr", "de")
    val docs = (1 to 40).map { i =>
      (i.toLong, s"text $i ${rnd.nextInt(3)}", langs(rnd.nextInt(3)),
        s"src${rnd.nextInt(4)}", (rnd.nextInt(5) * 100 + 50).toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    def naivePairs(key: ((Long, String, String, String, Long)) => String) =
      docs.groupBy(key).values.map(g =>
        g.size.toLong * (g.size - 1) / 2).sum
    val expect = Map(
      "lang" -> naivePairs(_._3),
      "len_band" -> naivePairs(t => (t._5 / 100).toString),
      "source" -> naivePairs(_._4))
    val got = DedupOps.dedupBlockingEval(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  test("sample_group_kfold: fold panel conserves users and events") {
    val rnd = new Random(11)
    val d = Files.createTempDirectory("kfprop").toString
    val rows = (1 to 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        rnd.nextInt(40).toLong + 1,
        if (rnd.nextBoolean()) "purchase" else "view", 1.0)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = TrainOps.sampleGroupKfold(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val users = rows.map(_._3).distinct.size
    // a user leaking across folds would be counted in BOTH folds'
    // n_users, breaking the conservation identity
    assert(got.map(_._2).sum == users.toLong)
    assert(got.map(_._3).sum == rows.size.toLong)
    assert(got.map(_._4).sum == rows.count(_._4 == "purchase").toLong)
    assert(got.map(_._1).distinct.length == got.length)
  }
}

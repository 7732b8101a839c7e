package graft.ops

import graft.SparkFunSuite
import graft.functions.expressions.JaroWinkler
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Semantic pins for the round-6 catalog additions: the native
  * Jaro–Winkler expression (values pinned to DuckDB 1.0 outputs), LPA
  * community detection on a hand-traceable graph, event-sequence
  * pattern counts, and the exact-decimal correlation panel. */
class Round6OpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("jaro-winkler matches DuckDB on the canonical pairs") {
    // expected values are DuckDB 1.0 jaro_winkler_similarity outputs
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // transposition
      ("dixon", "dicksonx", 0.8133333333333332),  // prefix boost
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("a", "", 0.0), ("", "", 0.0),              // either-empty → 0
      ("ab", "ba", 0.0),                          // window 0: no match
      ("crate", "trace", 0.7333333333333334),     // no common prefix
      ("dwayne", "duane", 0.8400000000000001),
      ("abcdefgh", "abcdzzzz", 0.6666666666666666), // jaro ≤ .7: no boost
      ("ab", "abcdefghij", 0.7866666666666667),
      ("Customer#000000001", "Customer#000000010", 0.9888888888888889))
    cases.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"jw('$a','$b') = $got, want $want")
    }
    // symmetric, and null propagates through the Column form
    val row = Seq(("martha", "marhta", null: String)).toDF("a", "b", "n")
      .select(JaroWinkler.jaro_winkler(spark, $"b", $"a").as("s"),
        JaroWinkler.jaro_winkler(spark, $"a", $"n").as("nn"))
      .head()
    assert(row.getDouble(0) == 0.9611111111111111 && row.isNullAt(1))
  }

  test("graph_communities: deterministic 4-round LPA on the star") {
    val d = Files.createTempDirectory("lpa").toString
    Seq((1L, 1L), (2L, 2L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((1L, 1L), (2L, 1L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    // hand trace (labels after each sync round; ties break to min):
    // r1: c1→s1 c2→s1 s1→c1 | r2: c1→c1 c2→c1 s1→s1
    // r3: c1→s1 c2→s1 s1→c1 | r4: c1→c1 c2→c1 s1→s1
    val got = GraphOps.graphCommunities(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("c1" -> ((2L, 2L)), "s1" -> ((1L, 0L))))
  }

  test("ev_seqmatch counts strict and browse-loop motifs in ts order") {
    val d = Files.createTempDirectory("seqmatch").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // user 1: v v c p v c p  → 'vcp' at offsets 1 and 4, 'vv+c' once
    // user 2: p c v          → nothing matches
    // user 3: v v v c v c    → ONE browse match: the greedy 'vv+c'
    //   consumes the whole 3-v run (counted at its last v), and the
    //   trailing single 'vc' has no second v
    Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "view"),
      (3L, ts(2), 1L, "click"), (4L, ts(3), 1L, "purchase"),
      (5L, ts(4), 1L, "view"), (6L, ts(5), 1L, "click"),
      (7L, ts(6), 1L, "purchase"),
      (8L, ts(0), 2L, "purchase"), (9L, ts(1), 2L, "click"),
      (10L, ts(2), 2L, "view"),
      (11L, ts(0), 3L, "view"), (12L, ts(1), 3L, "view"),
      (13L, ts(2), 3L, "view"), (14L, ts(3), 3L, "click"),
      (15L, ts(4), 3L, "view"), (16L, ts(5), 3L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evSeqmatch(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got === Map(1L -> ((7, 2, 1)), 2L -> ((3, 0, 0)),
      3L -> ((6, 0, 1))))
  }

  test("graph_kcore peels pendants, keeps the 4-cycle at degree 2") {
    val d = Files.createTempDirectory("kcore").toString
    // bipartite 4-cycle c1-s1-c2-s2-c1 (every node deg 2) + pendant
    // c3-s1 (deg 1, must peel; s1 drops 3→2 and survives)
    Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L), (5L, 3L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((1L, 1L, 50.0, 0.10), (2L, 1L, 50.0, 0.10), (3L, 2L, 50.0, 0.10),
      (4L, 2L, 50.0, 0.10), (5L, 1L, 50.0, 0.10))
      .toDF("l_orderkey", "l_suppkey", "l_quantity", "l_discount")
      .write.parquet(s"$d/lineitem.parquet")
    val got = GraphOps.graphKcore(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("c1" -> 2L, "c2" -> 2L, "s1" -> 2L, "s2" -> 2L))
  }

  test("ev_drift: identical parity splits give PSI exactly 0") {
    val d = Files.createTempDirectory("drift").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // every value appears once at an even id and once at an odd id →
    // p == q in every bucket → each PSI term is exactly 0.0
    (0 until 40).map(i =>
        (i.toLong, t0, 1L, if (i % 4 < 2) "click" else "view",
          (i / 2 * 30).toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.evDrift(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet === Set("click", "view"))
    assert(got.values.forall(_ == 0.0))
  }

  test("ev_mad: robust stats on a hand set with one extreme value") {
    val d = Files.createTempDirectory("mad").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // values 1,2,3,4,100 → med 3, |dev| = 2,1,0,1,97 → mad 1,
    // fence 3·1.4826 → only the 97 deviation is an outlier
    Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
        (i.toLong, t0, 1L, "click", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = EventOps.evMad(spark, d).collect().head
    assert(r.getString(0) == "click" && r.getDouble(1) == 3.0 &&
      r.getDouble(2) == 1.0 && r.getLong(3) == 1L)
  }

  test("text_zipf recovers slope −1 / intercept ln 12 on an exact power law") {
    val d = Files.createTempDirectory("zipf").toString
    // counts 12, 6, 4, 3 at ranks 1..4: ln c = ln 12 − ln r exactly
    val words = Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")
    Seq((1L, "s1", words.mkString(" ")))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$d/documents.parquet")
    val r = TextOps.textZipf(spark, d).collect().head
    assert(r.getString(0) == "s1" && r.getLong(1) == 4L)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - math.log(12.0)) < 1e-6)
  }

  test("dedup_containment flags a sub-document that Jaccard misses") {
    val d = Files.createTempDirectory("containment").toString
    val core = (1 to 12).map(i => s"tok$i").mkString(" ")   // 10 shingles
    val filler = (1 to 200).map(i => s"w$i").mkString(" ")  // disjoint bulk
    Seq((1L, "s1", core),                    // small doc
        (2L, "s1", s"$core $filler"),        // contains doc 1 verbatim
        (3L, "s1", filler))                  // big doc, no core
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = DedupOps.dedupContainment(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // (1,2): every core shingle of doc 1 appears in doc 2 → 1.0;
    // (2,3) share only filler — containment ≈ 198/210 < 0.8? no:
    // doc 3's whole shingle set is inside doc 2 → also flagged 1.0
    assert(got((1L, 2L)) == 1.0)
    assert(got.contains((2L, 3L)))
    assert(!got.contains((1L, 3L)))   // disjoint docs never pair
    // the Jaccard path at its 0.4 threshold must NOT see (1,2):
    // 10 shared shingles over a ~210-shingle union is J ≈ 0.05
    val jac = DedupOps.dedupNgram(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("profile_corr: exact ±1 on constructed colinear groups") {
    val d = Files.createTempDirectory("corr").toString
    // group A: price = 100·quantity (r=+1); discount constant → r NaN
    // group B: price = 1000 − 10·quantity (r=−1)
    (Seq.tabulate(5)(i =>
        ("A", (i + 1).toDouble, (i + 1) * 100.0, 0.05)) ++
      Seq.tabulate(5)(i =>
        ("B", (i + 1).toDouble, 1000.0 - (i + 1) * 10.0, 0.01 * i)))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .write.parquet(s"$d/lineitem.parquet")
    val got = Profiling.profileCorr(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got(("A", "quantity")) == 1.0)
    assert(got(("B", "quantity")) == -1.0)
    // zero variance → try_divide yields NULL (SQL corr() convention)
    assert(got(("A", "discount")) == null)
    val bv = got(("B", "discount")).asInstanceOf[Double]
    assert(bv == -1.0 || math.abs(bv + 1.0) < 1e-6)
  }
}

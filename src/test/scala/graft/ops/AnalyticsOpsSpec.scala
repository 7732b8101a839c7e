package graft.ops

import graft.SparkFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Semantic properties of the crosstab/histogram/collocation operators
  * (a13_pivot, ev_histogram, text_pmi) on injected fixtures. */
class AnalyticsOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("analyticsops").toString
    // day 1: 2 clicks + 1 view; day 2: 1 purchase only (other cells 0);
    // values chosen to land in buckets -25, 0, 25, 50
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, "click", -5.0),
      (2L, Timestamp.valueOf("2024-03-01 11:00:00"), 1L, "click", 10.0),
      (3L, Timestamp.valueOf("2024-03-01 12:00:00"), 2L, "view", 30.0),
      (4L, Timestamp.valueOf("2024-03-02 09:00:00"), 2L, "purchase", 55.0))
    ev.map { case (id, ts, u, t, v) => (id, ts, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    // 25 docs "alpha beta" (the collocation), 15 filler docs whose
    // token stays under the df>=25 vocab floor
    val docs = (1 to 25).map(i => (i.toLong, "alpha beta")) ++
      (26 to 40).map(i => (i.toLong, "delta"))
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("a13_pivot: explicit-value crosstab with absent cells pinned to 0") {
    val rows = LayoutOlap.a13Pivot(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("2024-03-01", "2024-03-02"))
    val d1 = rows(0)
    assert(d1.getAs[Long]("click") == 2L && d1.getAs[Long]("view") == 1L
      && d1.getAs[Long]("purchase") == 0L)
    val d2 = rows(1)
    assert(d2.getAs[Long]("purchase") == 1L && d2.getAs[Long]("click") == 0L)
  }

  test("ev_histogram: floor bucketing incl. the negative bucket") {
    val got = EventOps.evHistogram(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("click", -25L) -> 1L, ("click", 0L) -> 1L,
      ("view", 25L) -> 1L, ("purchase", 50L) -> 1L))
  }

  test("ev_gapfill: full type×day grid with the absent cells zero-filled") {
    val rows = EventOps.evGapfill(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // 3 types × 2 days — every combination present exactly once
    assert(rows.size == 6)
    assert(rows(("click", "2024-03-01")) == 2L)
    assert(rows(("click", "2024-03-02")) == 0L) // filled gap
    assert(rows(("purchase", "2024-03-01")) == 0L)
    assert(rows(("purchase", "2024-03-02")) == 1L)
  }

  test("set ops: intersect ∪ except partition the first half's key set") {
    val h1h2 = CoreRelational.u04Intersect(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val h1only = CoreRelational.u05Except(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert((h1h2 & h1only).isEmpty)
    assert(h1h2.nonEmpty && h1only.nonEmpty)
  }

  test("profile_table: null counts exact, sub-k distincts exact, strings normalized") {
    val d2 = Files.createTempDirectory("profile").toString
    Seq(
      (1L, 10L, Option("O"), 10.0, Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (2L, 11L, Option("F"), 20.0, Timestamp.valueOf("2024-01-02 00:00:00"), "2-HIGH"),
      (3L, 12L, None, 30.0, Timestamp.valueOf("2024-01-03 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d2/orders.parquet")
    val rows = Profiling.profileTable(spark, d2).collect()
      .map(r => r.getString(0) -> r).toMap
    val st = rows("o_orderstatus")
    assert(st.getAs[Long]("n_rows") == 3L && st.getAs[Long]("n_null") == 1L)
    assert(st.getAs[Double]("n_distinct_est") == 2.0) // below k → exact
    assert(st.getAs[String]("min_s") == "F" && st.getAs[String]("max_s") == "O")
    val ck = rows("o_custkey")
    assert(ck.getAs[Long]("n_null") == 0L
      && ck.getAs[Double]("n_distinct_est") == 3.0)
    assert(ck.getAs[String]("min_s") == "10") // string-normalized min
  }

  test("profile_checksum: digest is layout-invariant and flips on a 1-row change") {
    def write(d: String, price3: Double, parts: Int): Unit =
      Seq(
        (1L, 10L, "O", 10.0, Timestamp.valueOf("2024-01-01 00:00:00")),
        (2L, 11L, "F", 20.0, Timestamp.valueOf("2024-01-15 00:00:00")),
        (3L, 12L, "O", price3, Timestamp.valueOf("2024-02-03 00:00:00")))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate")
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val d1 = Files.createTempDirectory("cksum1").toString
    val d2 = Files.createTempDirectory("cksum2").toString
    val d3 = Files.createTempDirectory("cksum3").toString
    write(d1, 30.0, parts = 1)
    write(d2, 30.0, parts = 3) // same content, different file layout
    write(d3, 30.5, parts = 1) // one row's price changed
    def panel(d: String) = Profiling.profileChecksum(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(panel(d1).toSeq == panel(d2).toSeq) // layout/order independent
    val (a, b) = (panel(d1).map { case (m, n, g) => m -> (n, g) }.toMap,
      panel(d3).map { case (m, n, g) => m -> (n, g) }.toMap)
    assert(a("2024-01") == b("2024-01")) // untouched partition identical
    assert(a("2024-02")._1 == b("2024-02")._1
      && a("2024-02")._2 != b("2024-02")._2) // mismatch localizes
  }

  test("layout_zorder: every tile spans <= 1/16 of EACH dimension (the pruning bound)") {
    val d = Files.createTempDirectory("zorder").toString
    // keys and dates spread over the full grid so many tiles populate
    val rows = for (k <- 1 to 400) yield
      (k.toLong, (k * 7 % 1000 + 1).toLong, "O", 1.0,
        Timestamp.valueOf(f"2024-${k % 12 + 1}%02d-${k % 28 + 1}%02d 00:00:00"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate").write.parquet(s"$d/orders.parquet")
    val tiles = LayoutOlap.layoutZorder(spark, d).collect()
    assert(tiles.length > 30) // genuinely 2-D spread, not one stripe
    tiles.foreach { t =>
      // top-4 bits of each dim are fixed within a tile -> span <= 15
      assert(t.getAs[Int]("max_x") - t.getAs[Int]("min_x") <= 15)
      assert(t.getAs[Int]("max_y") - t.getAs[Int]("min_y") <= 15)
    }
    // a single-dim sort cannot give this: total y range is wide
    assert(tiles.map(_.getAs[Int]("max_y")).max
      - tiles.map(_.getAs[Int]("min_y")).min > 200)
  }

  test("text_pmi: the injected collocation is the only pair, pmi = ln(n·co/df²)") {
    val rows = TextOps.textPmi(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1)) == ("alpha", "beta"))
    assert(r.getLong(2) == 25L)
    // df(alpha)=df(beta)=co=25, n=40 → pmi = ln(25·40/625) = ln(1.6)
    assert(math.abs(r.getDouble(3) - math.log(1.6)) < 1e-6)
  }

  test("dim_scd2: consecutive duplicates collapse, intervals chain, last is current") {
    val d = Files.createTempDirectory("scd2").toString
    // customer 1: URGENT, URGENT, LOW, URGENT → 3 intervals (the
    // second URGENT is no change); customer 2: one LOW forever
    Seq(
      (10L, 1L, Timestamp.valueOf("2024-01-01 00:00:00"), "URGENT"),
      (11L, 1L, Timestamp.valueOf("2024-02-01 00:00:00"), "URGENT"),
      (12L, 1L, Timestamp.valueOf("2024-03-01 00:00:00"), "LOW"),
      (13L, 1L, Timestamp.valueOf("2024-04-01 00:00:00"), "URGENT"),
      (20L, 2L, Timestamp.valueOf("2024-01-15 00:00:00"), "LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    val got = CoreRelational.dimScd2(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, "URGENT", "2024-01-01", "2024-03-01", 0),
      (1L, "LOW", "2024-03-01", "2024-04-01", 0),
      (1L, "URGENT", "2024-04-01", "9999-12-31", 1),
      (2L, "LOW", "2024-01-15", "9999-12-31", 1)))
  }

  test("dq_expectations: nulls violate ranges, orphans and dup keys are counted") {
    val d = Files.createTempDirectory("dq").toString
    Seq(1L, 2L).toDF("o_orderkey").write.parquet(s"$d/orders.parquet")
    // row 1 clean; row 2 NULL quantity (r2) + 8% discount (r3);
    // row 3 orphan orderkey 9 (r6); row 4 duplicates row 1's PK (r7)
    Seq(
      (Some(1L), 1, Some(10.0), 0.02, "A",
        Timestamp.valueOf("1995-06-01 00:00:00")),
      (Some(2L), 1, None, 0.08, "N",
        Timestamp.valueOf("1995-06-01 00:00:00")),
      (Some(9L), 1, Some(5.0), 0.00, "R",
        Timestamp.valueOf("1995-06-01 00:00:00")),
      (Some(1L), 1, Some(7.0), 0.01, "A",
        Timestamp.valueOf("1995-06-01 00:00:00")))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = Profiling.dqExpectations(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getInt(3)))).toMap
    assert(got == Map(
      "r1_orderkey_not_null"  -> ((4L, 0L, 1)),
      "r2_quantity_in_1_50"   -> ((4L, 1L, 0)),
      "r3_discount_le_5pct"   -> ((4L, 1L, 0)),
      "r4_returnflag_domain"  -> ((4L, 0L, 1)),
      "r5_shipdate_in_range"  -> ((4L, 0L, 1)),
      "r6_orderkey_in_orders" -> ((4L, 1L, 0)),
      "r7_line_pk_unique"     -> ((4L, 1L, 0))))
  }
}

package graft.plans

import graft.{SparkFunSuite, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** The native as-of join operator: semantics (backward match, NULL
  * padding, null keys/times, duplicate left times), plan shape (the
  * custom exec node, key-hash exchanges, (key, time) sorts — no union,
  * no window), and equivalence with the compositional as-of
  * ([[graft.ops.EventOps.evAsof]]) on the real events table. */
class AsofJoinSpec extends SparkFunSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
    (2L, 7L, "t3"), (3L, 100L, "t4"))
    .toDF("sym", "t", "trade")

  private def quotes = Seq(
    (1L, 8L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0),
    (2L, 9L, 4.0), (4L, 1L, 5.0))
    .toDF("sym", "qt", "quote")

  test("backward semantics: latest right time <= left time, per key") {
    val out = Asof.join(trades, quotes.withColumnRenamed("sym", "qsym"),
        Seq("sym"), Seq("qsym"), "t", "qt")
      .select("sym", "t", "qt", "quote").orderBy("sym", "t")
    assert(out.collect().toSeq === Seq(
      Row(1L, 5L, null, null),      // before any quote
      Row(1L, 10L, 10L, 2.0),       // tie: qt == t matches
      Row(1L, 20L, 15L, 3.0),       // latest of the three
      Row(2L, 7L, null, null),      // key exists, all quotes later
      Row(3L, 100L, null, null)))   // key has no quotes at all
  }

  test("null keys and null times never match; right nulls are skipped") {
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(5L), "a"), (None, Some(1L), "n"),
        (Some(1L), None, "x"))
      .toDF("rk", "rt", "v")
    val out = Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "v").collect().toSet
    assert(out === Set(
      Row(1L, 10L, "a"),   // real match
      Row(null, 10L, null), // null left key
      Row(1L, null, null))) // null left time
  }

  test("duplicate left times each get the same match; match resets per key") {
    val l = Seq((1L, 10L), (1L, 10L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 9L, "a"), (2L, 3L, "b")).toDF("rk", "rt", "v")
    val out = Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "v").collect().toSeq.sortBy(_.getLong(0))
    assert(out === Seq(Row(1L, "a"), Row(1L, "a"), Row(2L, "b")))
  }

  test("tolerance gates emission without changing the best match") {
    val l = Seq((1L, 21L, "in"), (1L, 25L, "edge"), (1L, 26L, "out"),
        (1L, 12L, "near"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, "early"), (1L, 20L, "late")).toDF("rk", "rt", "v")
    val out = Asof.joinTolerant(l, r, Seq("k"), Seq("rk"), "t", "rt", 5L)
      .select("tag", "v").collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    // gap 1 and the exact-tolerance gap 5 keep the BEST match ("late",
    // never the in-tolerance-but-older "early"); gap 6 nulls out;
    // t=12 matches "early" at gap 2
    assert(out === Map("in" -> "late", "edge" -> "late",
      "out" -> null, "near" -> "early"))
    // tolerance=None is the plain backward join (regression)
    val plain = Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("tag", "v").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(plain === Map("in" -> "late", "edge" -> "late",
      "out" -> "late", "near" -> "early"))
  }

  test("forward and nearest directions complete the merge_asof surface") {
    val l = Seq((1L, 10L, "a"), (1L, 14L, "b"), (1L, 30L, "c"),
        (1L, 16L, "mid"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 12L, "r12"), (1L, 20L, "r20")).toDF("rk", "rt", "v")
    def run(dir: String, tol: Option[Long] = None) =
      Asof.joinDirected(l, r, Seq("k"), Seq("rk"), "t", "rt", dir, tol)
        .select("tag", "v").collect().map(x => x.getString(0) ->
          (if (x.isNullAt(1)) null else x.getString(1))).toMap
    // forward: first right time >= left time
    assert(run("forward") === Map("a" -> "r12", "b" -> "r20",
      "mid" -> "r20", "c" -> null))
    // nearest: closer side wins; t=16 is equidistant (4 vs 4) -> the
    // documented backward preference picks r12
    assert(run("nearest") === Map("a" -> "r12", "b" -> "r12",
      "mid" -> "r12", "c" -> "r20"))
    // tolerance composes with both: forward within 3, nearest within 2
    assert(run("forward", Some(3L)) === Map("a" -> "r12", "b" -> null,
      "mid" -> null, "c" -> null))
    assert(run("nearest", Some(2L)) === Map("a" -> "r12", "b" -> "r12",
      "mid" -> null, "c" -> null))
  }

  test("plan: custom exec node, two key-hash exchanges, no window/union") {
    val df = Asof.join(trades, quotes.withColumnRenamed("sym", "qsym"),
      Seq("sym"), Seq("qsym"), "t", "qt")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: AsofJoinExec => e }.size === 1)
    val shuffles = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e }
    assert(shuffles.size === 2, s"expected 2 key shuffles, got:\n$plan")
    val s = plan.toString
    assert(!s.contains("Window") && !s.contains("Union"),
      s"compositional shapes leaked into the native plan:\n$s")
  }

  test("matches the compositional window as-of on the events table") {
    val ev = Tables.events(spark, sfDir).withColumn("tsu", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsu"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("tsu").as("c_tsu"))
      .agg(max(col("event_id")).as("click_id"))
    val native = Asof.join(purchases, clicks,
        Seq("user_id"), Seq("c_user"), "tsu", "c_tsu")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("tsu").as("purchase_tsu"), col("click_id"),
        col("c_tsu").as("click_tsu"))
    val comp = graft.ops.EventOps.evAsof(spark, sfDir)
      .select("purchase_id", "user_id", "purchase_tsu", "click_id",
        "click_tsu")
    assert(native.count() === comp.count())
    assert(native.exceptAll(comp).isEmpty && comp.exceptAll(native).isEmpty)
  }

  test("pruning rule: select(few cols) above the join prunes both child scans") {
    val li = Tables.lineitem(spark, sfDir)      // 16-column fact scan
    val ordr = Tables.orders(spark, sfDir)      // 9-column scan
    val out = Asof.join(li, ordr,
        Seq("l_orderkey"), Seq("o_orderkey"), "l_shipdate", "o_orderdate")
      .select("l_orderkey", "l_extendedprice", "o_totalprice")
    out.collect() // finalize AQE
    val scans = collectWithSubqueries(out.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.size === 2, s"expected 2 parquet scans:\n${out.queryExecution.executedPlan}")
    val byCols = scans.map(_.output.map(_.name).toSet)
    val lScan = byCols.find(_.contains("l_orderkey")).get
    val rScan = byCols.find(_.contains("o_orderkey")).get
    // each ReadSchema = referenced cols + join key/time, nothing else
    assert(lScan === Set("l_orderkey", "l_shipdate", "l_extendedprice"),
      s"left scan not pruned: $lScan")
    assert(rScan === Set("o_orderkey", "o_orderdate", "o_totalprice"),
      s"right scan not pruned: $rScan")
  }

  test("pruning rule: left-only deterministic filter pushes below the join") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate", "l_quantity")
    val ordr = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Asof.join(li, ordr,
        Seq("l_orderkey"), Seq("o_orderkey"), "l_shipdate", "o_orderdate")
      .filter(col("l_quantity") > 30)
    val optimized = out.queryExecution.optimizedPlan
    // the AsofJoinPlan must not sit under a Filter on left-only attrs;
    // instead its left child carries the predicate → parquet pushdown
    val asof = optimized.collect { case a: AsofJoinPlan => a }.head
    assert(asof.left.toString.contains("l_quantity"),
      s"left filter not pushed into child:\n$optimized")
    out.collect()
    val scans = collectWithSubqueries(out.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    val lScan = scans.find(_.output.exists(_.name == "l_quantity")).get
    assert(lScan.dataFilters.nonEmpty,
      s"expected pushed data filter on the left scan:\n$lScan")
  }

  test("AQE hardening: skewed keys + coalesced partitions keep children aligned") {
    // one hub key with ~50k rows and a long tail — under AQE with
    // skew-join and partition coalescing forced, the two shuffles
    // feeding the merge must still be coalesced IDENTICALLY
    // (zipPartitions requires aligned partition counts); this pins the
    // operator's cluster posture under runtime re-planning.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      "spark.sql.shuffle.partitions" -> "17")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 20000).select(
        when(col("id") < 15000, lit(1L)).otherwise(col("id") % 97).as("k"),
        (col("id") * 7 % 100000).as("t"), col("id").as("lv"))
      val right = spark.range(0, 2000).select(
        when(col("id") < 500, lit(1L)).otherwise(col("id") % 97).as("rk"),
        (col("id") * 13 % 100000).as("rt"), col("id").as("rv"))
      val out = Asof.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      // correctness oracle: plain SQL restatement of backward as-of
      left.createOrReplaceTempView("aqel")
      right.createOrReplaceTempView("aqer")
      val expect = spark.sql(
        """SELECT l.k, l.t, l.lv,
          |  max_by(struct(r.rt, r.rv), r.rt).rv AS rv
          |FROM aqel l LEFT JOIN aqer r ON l.k = r.rk AND r.rt <= l.t
          |GROUP BY l.k, l.t, l.lv""".stripMargin)
      assert(out.count() === 20000)
      assert(out.select("k", "t", "lv", "rv").exceptAll(expect).isEmpty &&
        expect.exceptAll(out.select("k", "t", "lv", "rv")).isEmpty)
      val plan = out.queryExecution.executedPlan
      assert(collectWithSubqueries(plan) {
        case e: AsofJoinExec => e }.size === 1, s"native node lost:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("self-join: both sides from the same Dataset resolve cleanly") {
    val ev = Seq((1L, 5L, "a"), (1L, 9L, "b")).toDF("k", "t", "v")
    val out = Asof.join(
      ev.select(col("k"), col("t"), col("v")),
      ev.select(col("k").as("rk"), col("t").as("rt"), col("v").as("rv")),
      Seq("k"), Seq("rk"), "t", "rt")
    // each row matches itself (rt == t is a tie-match)
    assert(out.filter(col("v") === col("rv")).count() === 2)
  }
}

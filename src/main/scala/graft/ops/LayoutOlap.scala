package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Storage-layout modeling and OLAP/sketch catalog rows (split from
  * CoreRelational, round 13): the layout_* clustering/skipping/
  * bucketing/file-sizing models and the sketch-family aggregates
  * (KMV, HLL, pivot, skyline, diversified top-k, weighted median,
  * allocation, exact-vs-sketch quantile panels).
  */
object LayoutOlap {

  /** T245: BUCKETED-LAYOUT join census — the co-located-join mechanism
    * itself, pinned as a hash-checked row. Writes orders⋈lineitem's
    * two sides as 8-bucket tables (bucketed + sorted by the join key),
    * then compares the SAME merge-join plan over plain parquet vs the
    * bucketed layout: plain pays one shuffle exchange per side, the
    * bucketed scan pays ZERO (bucketing hands the join co-partitioned
    * input; the per-side sort remains because multi-file buckets are
    * only sorted within each file) — at 100 TB that is the difference
    * between re-shuffling the fact table on every join and never
    * shuffling it at all. The row carries the exchange census
    * (literal-pinned, a Spark plan fact) AND the joined row count
    * (data fact, replayed by the oracle), so a layout regression and a
    * data regression are both visible. The merge hint forces the
    * sort-merge strategy on both variants — without it the sf0.01 dim
    * side broadcasts and the contrast would be vacuous; at scale SMJ
    * is the strategy bucketing exists to serve. Bucketed tables write
    * ONCE per (session, dataset) — a [[graft.SessionCache]] memo (the
    * bpeArtifacts precedent) holds the catalog table names, so
    * re-entry does ZERO filesystem writes — into a (dataset, JVM)-
    * keyed dir under java.io.tmpdir that a shutdown hook removes
    * (round-10: the old fresh-temp-dir-per-call leaked orphaned
    * parquet copies, because DROP TABLE on a path-based external
    * table keeps its files; the pid key keeps two concurrent JVMs
    * from overwriting each other's files mid-scan). */
  private val bucketedTablesCache = new graft.SessionCache[(String, String)]

  /** Z-order (Morton) clustering key + tile evidence — the
    * multi-dimensional data-skipping layout (the published idea
    * behind Delta/Iceberg OPTIMIZE ZORDER): normalize two query
    * dimensions to 8-bit grids, interleave their bits into one
    * 16-bit z key, and the table clustered by z gets parquet
    * min/max file stats that are TIGHT IN BOTH dimensions — a
    * predicate on either column prunes files, where a single-column
    * sort only serves its own column. At 100 TB the write is
    * `repartitionByRange($"z").sortWithinPartitions($"z")` — a range
    * shuffle, no window anywhere; this query computes the key and
    * PROVES the pruning bound: grouped by z's top byte (a 16×16
    * tile), every tile spans ≤ 1/16 of EACH dimension's range
    * (asserted in the spec, hash-pinned in the oracle — pure integer
    * bit arithmetic, replayed with `>>`/`&` in SQL).
    *
    * Normalization uses the dimensions' min/max from a 1-row
    * broadcast stats subquery (exact integer-in-double scaling, no
    * rank/ntile window). */
  def layoutZorder(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
    val stats = o.agg(
      min(col("o_custkey")).as("ck0"), max(col("o_custkey")).as("ck1"),
      min(col("od")).as("d0"), max(col("od")).as("d1"))
    val b = o.crossJoin(broadcast(stats))
      .withColumn("x", floor((col("o_custkey") - col("ck0")) * lit(256.0)
        / (col("ck1") - col("ck0") + lit(1))).cast("int"))
      .withColumn("y", floor(datediff(col("od"), col("d0")) * lit(256.0)
        / (datediff(col("d1"), col("d0")) + lit(1))).cast("int"))
    val z = (0 until 8).map { i =>
      shiftright(col("x"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i + 1)) +
        shiftright(col("y"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i))
    }.reduce(_ + _)
    b.withColumn("z", z)
      .groupBy(shiftright(col("z"), 8).as("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("tile"))
  }

  /** Hilbert-curve layout key over the same (custkey, orderdate) grid
    * as [[layoutZorder]] — the strictly-better-locality alternative
    * (consecutive indexes are always grid-neighbors; Z-order jumps at
    * tile seams). The index is the native codegen
    * [[graft.functions.expressions.HilbertIndex]] expression (a Column
    * composition of the 8 rotate/flip rounds would blow up the
    * expression tree multiplicatively); the oracle replays the xy2d
    * walk as 8 chained CTE rounds in exact integer arithmetic.
    * HilbertSpec proves bijectivity and the unit-step adjacency
    * property over the full 65536-cell grid. */
  def layoutHilbert(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
    val stats = o.agg(
      min(col("o_custkey")).as("ck0"), max(col("o_custkey")).as("ck1"),
      min(col("od")).as("d0"), max(col("od")).as("d1"))
    val b = o.crossJoin(broadcast(stats))
      .withColumn("x", floor((col("o_custkey") - col("ck0")) * lit(256.0)
        / (col("ck1") - col("ck0") + lit(1))).cast("int"))
      .withColumn("y", floor(datediff(col("od"), col("d0")) * lit(256.0)
        / (datediff(col("d1"), col("d0")) + lit(1))).cast("int"))
    b.withColumn("h", graft.functions.expressions.HilbertIndex.hilbert(
        s, col("x"), col("y")))
      .groupBy(shiftright(col("h"), 8).as("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("tile"))
  }

  /** A: pivot — per-day event counts spread across one column per
    * event type (the dashboard "crosstab" shape). The value list is
    * explicit, so this is ONE hash aggregate (no value-discovery job
    * and no second shuffle — `pivot` without values runs a distinct
    * scan first) with fixed output width; missing (day, type) cells
    * surface as NULL from the pivot and are pinned to 0 to match the
    * oracle's conditional counts. */
  def a13Pivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("day"))
  }

  /** 2-D skyline (Pareto front) of distinct (price, size) part points:
    * minimize price, maximize size. Rather than the naive O(n²)
    * dominance self-join (the oracle), the engine uses the sort-sweep
    * property — sorted by (price ASC, size DESC), a point survives iff
    * its size strictly exceeds every earlier size — restated at scale
    * with the TWO-LEVEL prefix idiom: price-bucketed intra-group
    * running max plus a buckets-count-sized carry-in table (broadcast),
    * so there is no single global window partition and no quadratic
    * pair generation anywhere. Bucket boundaries are sound because
    * every earlier bucket's price is strictly lower (floor(price/100)),
    * making carry-in dominance strict in price by construction. */
  def o10Skyline(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.part(s, d)
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("gid", floor(col("price") / 100).cast("long"))
    val wIn = Window.partitionBy("gid")
      .orderBy(col("price").asc, col("size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy("gid").rowsBetween(Window.unboundedPreceding, -1)
    val offs = pts.groupBy("gid").agg(max(col("size")).as("g_max"))
      .withColumn("g_prev", max(col("g_max")).over(wOff))
      .select("gid", "g_prev")
    pts.join(broadcast(offs), "gid")
      .withColumn("best_before",
        greatest(coalesce(max(col("size")).over(wIn), lit(Int.MinValue)),
          coalesce(col("g_prev"), lit(Int.MinValue))))
      .filter(col("size") > col("best_before"))
      .select(col("price"), col("size"), col("n_parts"))
      .orderBy(col("price"))
  }

  /** Diversified top-k: the 20 highest-value orders with AT MOST TWO
    * per customer — the result-diversification shape search/feed
    * ranking uses so one heavy key can't monopolize the page. The
    * per-customer cap is a KEYED row_number (scale-safe window), which
    * Catalyst rewrites to a WindowGroupLimit (rank-limit pushdown: each
    * partition keeps ≤2 rows per key BEFORE the full sort — Spark
    * 3.5+'s InferWindowGroupLimit); the final cut is a
    * TakeOrderedAndProject, never a global sort of the survivors. */
  def o11Diversify(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("rn").as("cust_rank"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** O: EXACT distributed weighted median — per supplier nation, the
    * price at which half the shipped quantity lies below (the
    * robust "typical price point" a mean can't give on skewed money
    * data; `percentile_approx` trades exactness away, this doesn't).
    *
    * Lower weighted median: the smallest price p with
    * 2·cumweight(≤p) ≥ totalweight. The cumulative weight is the
    * TWO-LEVEL bucketed prefix sum (the ev_concurrency /
    * sourceCumTokens idiom, keyed here by fixed-width PRICE buckets —
    * the bucket id is a prefix of the value sort order, so intra-
    * bucket windows + a per-nation bucket-offset table compose to the
    * exact global order): no nation — however dominant — is ever one
    * monolithic window partition; at 100 TB each (nation, bucket)
    * window partition is a bounded value slice, and the offset window
    * runs over ≤ ~100 bucket rows per nation. Crossing-row selection
    * is a min_by-style aggregate, not a second sort. All weights are
    * exact integers (quantity), so the threshold compare 2·cum ≥ tot
    * has no FP at all; the median price itself is one decimal cast. */
  def o15Wmedian(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_suppkey"),
      col("l_extendedprice").as("price"),
      col("l_quantity").cast("bigint").as("w"),
      col("l_orderkey"), col("l_linenumber"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val fact = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("price"), col("w"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("__b", floor(col("price") / 1000).cast("int"))
    val wIn = Window.partitionBy("n_name", "__b")
      .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy("n_name").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val groups = fact.groupBy(col("n_name"), col("__b"))
      .agg(sum(col("w")).as("__g_tot"))
    val offs = groups
      .withColumn("__g_off", coalesce(sum(col("__g_tot")).over(wOff), lit(0L)))
      .select("n_name", "__b", "__g_off")
    val tots = groups.groupBy("n_name").agg(sum(col("__g_tot")).as("tot_w"))
    fact
      .withColumn("__run", sum(col("w")).over(wIn))
      .join(offs, Seq("n_name", "__b"))
      .withColumn("cum", col("__g_off") + col("__run"))
      .join(broadcast(tots), Seq("n_name")) // |nations| rows
      .filter(col("cum") * 2 >= col("tot_w"))
      .groupBy(col("n_name"))
      .agg(min(col("price")).as("mp"), max(col("tot_w")).as("total_weight"))
      .select(col("n_name"), col("total_weight"),
        col("mp").cast("double").as("w_median_price"))
      .orderBy(col("n_name"))
  }

  /** Layout EVALUATION: how much row-group skipping does each physical
    * layout actually buy for a 2-D predicate (one month of order dates
    * × the lowest 10% of customer keys)? Models parquet row-group
    * pruning exactly as engines do it — per group, keep [min, max] of
    * each filter column; a group is SCANNED iff both ranges intersect
    * the predicate. Three layouts of the same table:
    * `natural` (orderkey prefix — the as-loaded order), `bydate`
    * (orderdate-clustered) and `zorder` (the [[layoutZorder]] bit
    * interleave). The expected story IS the result: natural skips
    * nothing, bydate skips the date dimension only, zorder skips on
    * both — the panel that justifies paying for a re-layout before a
    * 100 TB rewrite.
    *
    * One scan derives the sort keys; each layout is one hash agg on
    * its group key + a group-count-sized reduce. Exact ints/dates;
    * rates are single divisions, round 6. */
  def layoutSkipping(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("od"))
    val stats = o.agg(
      min(col("o_custkey")).as("ck0"), max(col("o_custkey")).as("ck1"),
      min(col("od")).as("d0"), max(col("od")).as("d1"))
    val base = o.crossJoin(broadcast(stats))
      .withColumn("x", floor((col("o_custkey") - col("ck0")) * lit(256.0)
        / (col("ck1") - col("ck0") + lit(1))).cast("int"))
      .withColumn("y", floor(datediff(col("od"), col("d0")) * lit(256.0)
        / (datediff(col("d1"), col("d0")) + lit(1))).cast("int"))
      .withColumn("z", (0 until 8).map { i =>
        shiftright(col("x"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i + 1)) +
          shiftright(col("y"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i))
      }.reduce(_ + _))
      // predicate: one month x bottom-decile customers
      .withColumn("ckHi", expr("ck0 + (ck1 - ck0) div 10"))
      .withColumn("m", col("od") >= lit("1997-03-01").cast("date") &&
        col("od") <= lit("1997-03-31").cast("date") &&
        col("o_custkey") <= col("ckHi"))
    def layout(name: String, grp: Column): DataFrame =
      base.groupBy(grp.as("g"))
        .agg(count(lit(1)).as("rows"),
          sum(col("m").cast("long")).as("hits"),
          min(col("od")).as("odMin"), max(col("od")).as("odMax"),
          min(col("o_custkey")).as("ckMin"),
          max(col("o_custkey")).as("ckMax"),
          max(col("ckHi")).as("ckHi"))
        .withColumn("scanned",
          (col("odMax") >= lit("1997-03-01").cast("date") &&
            col("odMin") <= lit("1997-03-31").cast("date") &&
            col("ckMin") <= col("ckHi")).cast("long"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("scanned")).as("n_scanned"),
          sum(col("rows")).as("rows_total"),
          sum(col("scanned") * col("rows")).as("rows_scanned"),
          sum(col("hits")).as("n_matching"))
        .select(lit(name).as("layout"), col("n_groups"), col("n_scanned"),
          round(lit(1.0) - col("n_scanned").cast("double")
            / col("n_groups").cast("double"), 6).as("skip_rate"),
          col("rows_total"), col("rows_scanned"), col("n_matching"))
    layout("natural", expr("o_orderkey div 512"))
      .unionAll(layout("bydate", expr("datediff(od, '1994-01-01') div 30")))
      .unionAll(layout("zorder", expr("z div 256")))
      .orderBy(col("layout"))
  }

  /** A: EXACT money allocation by the largest-remainder method — split
    * each order's total price (in integer cents) across its line items
    * proportional to quantity, with the allocation GUARANTEED to sum
    * back to the total: base share = ⌊total·qty/sumqty⌋, and the
    * leftover cents go one each to the lines with the largest
    * remainder (deterministic tie-break on line number). The standard
    * finance-ETL primitive (prorating revenue, tax, discounts) that a
    * naive `total · qty / sumqty` double multiply gets wrong — FP
    * shares neither sum to the total nor reproduce across engines.
    *
    * 100 TB posture: one fact join + one order-keyed agg + one
    * order-keyed window (o_orderkey is the high-cardinality balanced
    * key — never a monolithic partition); everything is exact 64-bit
    * integer arithmetic (cents·qty ≤ ~10¹⁰), no FP anywhere. The
    * deterministic `% 50` order sample keeps the audit output bounded
    * and pushes down to the scan. */
  def a21Allocate(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"),
        // money → exact cents through decimal(18,2) (the repo's money
        // convention): a double×100 truncation would drop a cent
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("total_cents"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("bigint").as("qty"))
    val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("o_orderkey"), col("l_linenumber"), col("qty"),
        col("total_cents"))
    val sq = j.groupBy("o_orderkey").agg(sum(col("qty")).as("sumqty"))
    val wOrd = Window.partitionBy("o_orderkey")
    // tie-break includes qty: the testdata's l_linenumber is not
    // unique per order; rows identical in (line, qty) have equal fr
    // and base, so whichever gets the leftover cent, the output
    // multiset is the same
    val wr = Window.partitionBy("o_orderkey")
      .orderBy(col("fr").desc, col("l_linenumber").asc, col("qty").asc)
    j.join(sq, Seq("o_orderkey"))
      .withColumn("base", expr("total_cents * qty div sumqty"))
      .withColumn("fr", expr("(total_cents * qty) % sumqty"))
      .withColumn("rsum", sum(col("fr")).over(wOrd))
      .withColumn("r", expr("rsum div sumqty")) // exact: sumqty | Σfr
      .withColumn("rn", row_number().over(wr))
      .select(col("o_orderkey"), col("l_linenumber"), col("qty"),
        col("total_cents"),
        (col("base") + when(col("rn") <= col("r"), 1L).otherwise(0L))
          .as("alloc_cents"))
      .orderBy(col("o_orderkey"), col("l_linenumber"))
  }

  /** A: approximate distinct via the KMV sketch aggregate
    * ([[graft.functions.expressions.KmvDistinct]], a custom
    * TypedImperativeAggregate): per-group buffer is O(k)=64 doubles at
    * EVERY stage — partial agg, shuffle, merge — where countDistinct
    * pays a full dedup shuffle of the group's members. The md5-based
    * sketch is deterministic, so the oracle replays the estimate
    * bit-for-bit (unlike HLL-based approx_count_distinct); the exact
    * count rides along as the accuracy reference. */
  def a15Kmv(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(graft.functions.expressions.KmvDistinct.kmv_native(s,
          col("user_id").cast("string")), 6).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))

  /** A: deterministic per-group mode — the most frequent order
    * priority per customer, ties to the lexicographically smallest
    * (native `mode()` breaks ties by encounter order in both engines
    * — nondeterministic under parallelism, so it can never
    * hash-match). Two hash aggs + a row_number window partitioned by
    * the HIGH-cardinality customer key (safe at any scale, unlike the
    * low-cardinality windows PlanAuditSpec forbids). */
  def a16Mode(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("n").desc, col("o_orderpriority").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("o_custkey"), col("o_orderpriority").as("mode_priority"),
        col("n").as("n_mode"))
      .orderBy(col("o_custkey"))
  }

  private def hllRanks(ev: DataFrame): DataFrame =
    hllRanksWith(ev)

  /** [[hllRanks]] plus caller-supplied pass-through columns (e.g. a
    * parity flag), so a single scan can feed several register sets. */
  private def hllRanksWith(ev: DataFrame, extra: Column*): DataFrame = {
    val hex = md5(col("user_id").cast("string"))
    val reg = conv(substring(hex, 1, 2), 16, 10).cast("int")
    val h13 = substring(hex, 3, 13)
    val lz = length(regexp_extract(h13, "^0*", 0))
    val d1 = h13.substr(lz + lit(1), lit(1))
    val clz4 = when(d1 === "1", 3).when(d1.isin("2", "3"), 2)
      .when(d1.isin("4", "5", "6", "7"), 1).otherwise(0)
    val rank = when(lz === 13, lit(53)).otherwise(lz * 4 + clz4 + 1)
    ev.select(col("event_type") +: reg.as("reg") +: rank.as("rk")
      +: extra: _*)
  }

  /** (keys..., reg, mr) register table → per-keys HLL estimate. */
  private def hllEstimateKeys(regs: DataFrame, estCol: String,
      keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    regs.groupBy(kc: _*).agg(
        count(lit(1)).as("n_used"),
        sum(expr("shiftleft(cast(1 as bigint), 53 - mr)")).as("zp"))
      .select(kc :+ (lit(256L) - col("n_used")).as("n_zero_regs") :+
        (col("zp") + (lit(256L) - col("n_used"))
          * lit(9007199254740992L)).as("zs"): _*)
      .withColumn("raw",
        expr("(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0" +
          " / (cast(zs as double) / 9007199254740992.0)"))
      .select(kc :+ col("n_zero_regs") :+
        round(expr("case when n_zero_regs > 0 and raw <= 640.0" +
          " then 256.0 * ln(256.0 / cast(n_zero_regs as double))" +
          " else raw end"), 4).as(estCol): _*)
  }

  /** (event_type, reg, mr) register table → per-type HLL estimate. */
  private def hllEstimate(regs: DataFrame, estCol: String): DataFrame =
    hllEstimateKeys(regs, estCol, Seq("event_type"))

  def a20Hll(s: SparkSession, d: String): DataFrame = {
    val regs = hllRanks(Tables.events(s, d))
      .groupBy("event_type", "reg").agg(max(col("rk")).as("mr"))
    val sketch = hllEstimate(regs, "est_users")
    val exact = Tables.events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    sketch.join(exact, Seq("event_type")).orderBy(col("event_type"))
  }

  /** A: HLL MERGEABILITY as a hash-checked row — the property that
    * makes a sketch a DISTRIBUTED sketch: registers built on two
    * disjoint halves of the corpus (user-id parity), merged by
    * element-wise max, must reproduce the whole-corpus estimate
    * exactly, while the half estimates visibly DON'T add (distinct
    * count is not a sum). The algebraic re-aggregation contract (the
    * ev_merge_partials idiom applied to a sketch): at 100 TB this is
    * why per-partition/per-day register blocks roll up later without
    * touching raw data.
    *
    * ONE corpus scan (round-6 fix; the ev_overlap_kmv idiom): the
    * per-(type, reg) aggregate computes both parity-half maxima as
    * conditional aggregates plus the unconditional full max, then the
    * four register SETS (even, odd, merged = greatest of the halves —
    * derived, never re-scanned — and full) explode from that one
    * 256-registers-per-type table into a `which`-keyed long panel for
    * a single shared estimate aggregate. */
  def a22HllMerge(s: SparkSession, d: String): DataFrame = {
    val regs = hllRanksWith(Tables.events(s, d),
        (col("user_id") % 2 === 0).as("even"))
      .groupBy("event_type", "reg")
      .agg(max(when(col("even"), col("rk"))).as("mra"),
        max(when(!col("even"), col("rk"))).as("mrb"),
        max(col("rk")).as("mrf"))
    val longRegs = regs.select(col("event_type"), col("reg"),
        explode(array(
          struct(lit("est_even").as("which"), col("mra").as("mr")),
          struct(lit("est_odd").as("which"), col("mrb").as("mr")),
          struct(lit("est_merged").as("which"),
            greatest(col("mra"), col("mrb")).as("mr")),
          struct(lit("est_full").as("which"), col("mrf").as("mr"))))
          .as("e"))
      .filter(col("e.mr").isNotNull)
      .select(col("event_type"), col("e.which").as("which"),
        col("reg"), col("e.mr").as("mr"))
    hllEstimateKeys(longRegs, "est", Seq("event_type", "which"))
      .groupBy("event_type")
      .agg(
        max(when(col("which") === "est_even", col("est")))
          .as("est_even"),
        max(when(col("which") === "est_odd", col("est"))).as("est_odd"),
        max(when(col("which") === "est_merged", col("est")))
          .as("est_merged"),
        max(when(col("which") === "est_full", col("est")))
          .as("est_full"))
      // a type whose users are all one parity has no half estimate;
      // the panel drops it (the oracle's inner joins do the same)
      .filter(col("est_even").isNotNull && col("est_odd").isNotNull)
      .withColumn("merged_equals_full",
        (col("est_merged") === col("est_full")).cast("int"))
      .orderBy(col("event_type"))
  }

  /** T267: approximate-quantile cross-check — the mergeable quantile
    * sketch every 100 TB profiler actually runs (Spark's
    * approx_percentile, a Greenwald–Khanna variant with rank error
    * ≤ 1/accuracy), verified against EXACT quantiles cross-engine:
    * the row emits the exact interpolated p50/p90 (DuckDB replays
    * them with quantile_cont — both engines use the p·(n−1) linear
    * interpolation) and pins the sketch's RANK guarantee as a
    * boolean: at accuracy 10000 the approx p must land between the
    * exact p∓0.05 quantiles (1e-4 rank error, checked against a 500×
    * looser band — a broken sketch fails it, FP noise cannot). One
    * aggregate computes all six exact percentiles AND both sketches
    * in a single pass.
    *
    * Scale posture: the SKETCH is the production path (mergeable,
    * bounded memory — the reason it exists at 100 TB); the exact
    * `percentile` side buffers values and is the VERIFIER, run at
    * gate SF only — the same exact-vs-approx asymmetry as
    * ann_recall's brute-force side. */
  def a23ApproxQuantile(s: SparkSession, d: String): DataFrame = {
    // r13 optimization (guide §2.5/§5): the original single aggregate
    // ran Spark's exact `percentile` — which BUFFERS every value and
    // merges + sorts them in ONE final reduce task (profiled: a 2 s
    // single-threaded stage at sf0.1; at 100 TB it would OOM the
    // reducer, exactly the anti-pattern the row's own sketch side
    // exists to avoid). The exact side is restated as the o15_wmedian
    // two-level rank lookup: per-bucket counts (bounded by the
    // domain's value range / bucket width), driver-side prefix
    // offsets over that bounded panel, then a row_number window over
    // ONLY the ≤12 rank-carrying buckets (broadcast-joined, each a
    // bounded value slice). The interpolated quantile is computed
    // from the two exact order statistics with the same
    // lower·(hi−pos) + higher·(pos−lo) double expression `percentile`
    // evaluates, so the emitted values (and the sketch-vs-band
    // booleans) are unchanged — verified bit-identical against the
    // unchanged DuckDB oracle at all three test SFs.
    import s.implicits._
    val ps = Seq(0.45, 0.5, 0.55, 0.85, 0.9, 0.95)
    // r14 (item 8 + r13 ADVICE): NO corpus-wide localCheckpoint — each
    // pass re-reads the column-pruned parquet scan (one double column
    // per pass; cheaper than pinning a sixth of the corpus in executor
    // storage at scale). Per-column row counts come from the bucket
    // panel itself (no separate count job) and exclude NULLs, matching
    // `percentile`'s null handling (TPC-H lineitem is null-free, so the
    // emitted values are unchanged — the old shared count was a latent
    // divergence on null-bearing data).
    val li = Tables.lineitem(s, d)
      .select(col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("e"))
    // Per-partition work in the rank-lookup window is bounded by ROW
    // COUNT, not value width (r13 ADVICE: a wide-SF bucket single-task-
    // sorts ~2% of the corpus): buckets holding a target rank refine
    // recursively — constant-value buckets resolve driver-side with no
    // executor work at all; buckets over the row threshold re-bucket
    // their [min,max] range 1024-ways (one bounded panel job per
    // oversized bucket per level, converging in O(log_1024 range)
    // levels); only row-bounded, multi-valued buckets reach the final
    // single window pass.
    val maxBucketRows = s.conf.getOption("spark.graft.a23.maxBucketRows")
      .map(_.toLong).getOrElse(4194304L)

    // one terminal rank-lookup segment: a row predicate, the (0-based
    // local rank → global rank) targets inside it, and its stats
    final case class Seg(pred: org.apache.spark.sql.Column,
        targets: Seq[(Long, Long)], cnt: Long, mn: Double, mx: Double)

    // route local ranks into a sorted (key, cnt, mn, mx) panel
    def walk(panel: Seq[(Long, Long, Double, Double)],
        targets: Seq[(Long, Long)],
        mkPred: Long => org.apache.spark.sql.Column): Seq[Seg] = {
      var off = 0L
      val out = scala.collection.mutable.ArrayBuffer[Seg]()
      panel.foreach { case (k, cnt, mn, mx) =>
        val here = targets.collect {
          case (lr, gr) if lr >= off && lr < off + cnt => (lr - off, gr)
        }
        if (here.nonEmpty) out += Seg(mkPred(k), here, cnt, mn, mx)
        off += cnt
      }
      out.toSeq
    }

    def orderStats(c: String, width: Double): (Long, Map[Long, Double]) = {
      val vc = li.select(col(c).as("v")).filter(col("v").isNotNull)
      def panelOf(df: org.apache.spark.sql.DataFrame,
          bkt: org.apache.spark.sql.Column): Seq[(Long, Long, Double, Double)] =
        df.groupBy(bkt.as("b"))
          .agg(count(lit(1)).as("cnt"), min("v").as("mn"), max("v").as("mx"))
          .orderBy("b").collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3)))
      val b0 = floor(col("v") / width).cast("long")
      val p0 = panelOf(vc, b0)
      val n = p0.map(_._2).sum
      val need = ps.map(p => p * (n - 1)).flatMap(x =>
        Seq(math.floor(x).toLong, math.ceil(x).toLong)).distinct
      val resolved = scala.collection.mutable.Map[Long, Double]()
      val windowSegs = scala.collection.mutable.ArrayBuffer[Seg]()
      var segs = walk(p0, need.map(r => (r, r)), k => b0 === k)
      while (segs.nonEmpty) {
        segs = segs.flatMap { sg =>
          if (sg.mn == sg.mx) { // constant bucket: v(rank) IS the value
            sg.targets.foreach { case (_, gr) => resolved(gr) = sg.mn }
            Nil
          } else if (sg.cnt <= maxBucketRows) { windowSegs += sg; Nil }
          else {
            val w2 = (sg.mx - sg.mn) / 1024.0
            if (!(w2 > 0)) { windowSegs += sg; Nil } // subnormal range
            else {
              val sb = floor((col("v") - sg.mn) / w2).cast("long")
              walk(panelOf(vc.filter(sg.pred), sb), sg.targets,
                k => sg.pred && sb === k)
            }
          }
        }
      }
      if (windowSegs.nonEmpty) {
        // ONE window pass over only the surviving segments: rows tag
        // their segment id (predicates are disjoint by construction),
        // row_number within segment, broadcast rank-target join — the
        // o15 idiom with row-bounded partitions
        val segId = windowSegs.zipWithIndex.foldLeft(
          lit(null).cast("int")) { case (acc, (sg, i)) =>
          when(sg.pred, lit(i)).otherwise(acc)
        }
        val tdf = windowSegs.zipWithIndex.flatMap { case (sg, i) =>
          sg.targets.map { case (lr, gr) => (i, lr + 1L, gr) }
        }.toSeq.toDF("tseg", "trn", "rank")
        val w = Window.partitionBy("seg").orderBy("v")
        vc.withColumn("seg", segId).filter(col("seg").isNotNull)
          .withColumn("rn", row_number().over(w))
          .join(broadcast(tdf),
            col("seg") === col("tseg") && col("rn") === col("trn"))
          .select(col("rank"), col("v"))
          .collect().foreach(r => resolved(r.getLong(0)) = r.getDouble(1))
      }
      (n, resolved.toMap)
    }
    // Spark `percentile`'s own interpolation expression, reproduced on
    // the same doubles: position = p·(n−1) over 0-based ranks
    def interp(nvs: (Long, Map[Long, Double]))(p: Double): Double = {
      val (n, vs) = nvs
      val position = p * (n - 1)
      val lo = math.floor(position).toLong
      val hi = math.ceil(position).toLong
      if (lo == hi) vs(lo)
      else vs(lo) * (hi - position) + vs(hi) * (position - lo)
    }
    val eq = interp(orderStats("q", 1.0)) _
    val ep = interp(orderStats("e", 1000.0)) _

    // the sketch side is untouched — mergeable, bounded memory, the
    // production path this row exists to certify
    val ax = li.agg(
      expr("approx_percentile(q, array(0.5, 0.9), 10000)").as("aq"),
      expr("approx_percentile(e, array(0.5, 0.9), 10000)").as("ap"))
      .collect().head
    val (aq, ap) = (ax.getSeq[Double](0), ax.getSeq[Double](1))

    Seq(
      ("l_extendedprice", 0.5, ep(0.5),
        ap(0) >= ep(0.45) && ap(0) <= ep(0.55)),
      ("l_extendedprice", 0.9, ep(0.9),
        ap(1) >= ep(0.85) && ap(1) <= ep(0.95)),
      ("l_quantity", 0.5, eq(0.5),
        aq(0) >= eq(0.45) && aq(0) <= eq(0.55)),
      ("l_quantity", 0.9, eq(0.9),
        aq(1) >= eq(0.85) && aq(1) <= eq(0.95)))
      .toDF("col_name", "p", "exact0", "rank_bounded")
      .select(col("col_name"), col("p"),
        round(col("exact0"), 4).as("exact"), col("rank_bounded"))
      .orderBy(col("col_name"), col("p"))
  }

  def layoutBucketing(s: SparkSession, d: String): DataFrame = {
    PlanCensus.assertCensusConfig(s)
    import s.implicits._
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
    def census(o: DataFrame, l: DataFrame): (Long, Long, Long) = {
      val j = o.hint("merge")
        .join(l, o("o_orderkey") === l("l_orderkey"))
      val n = j.count()
      val p = j.queryExecution.executedPlan.toString
      val sh = "Exchange (hashpartitioning|rangepartitioning)"
        .r.findAllIn(p).length.toLong
      val srt = "Sort \\[".r.findAllIn(p).length.toLong
      (sh, srt, n)
    }
    val (shP, srtP, nP) = census(ord, li)
    val (tOrd, tLi) = bucketedTablesCache.getOrCompute(s, "bkt|" + d) {
      // dataset-keyed table names: two datasets in one session (the
      // warm-up pass runs sf0.001 before the bench sf) must not fight
      // over one catalog name. The on-disk path is (dataset, JVM)-
      // keyed: dataset hash for stability within a process, pid so
      // two CONCURRENT JVMs (a bench next to a test suite) never
      // overwrite each other's files mid-scan; a shutdown hook
      // deletes this JVM's dir so repeated runs don't accumulate
      // (the round-10 ADVICE leak, closed without the shared-path
      // race the first fix traded it for)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(12)
      val pid = ProcessHandle.current().pid()
      val dirF = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_bucketed_${h}_$pid")
      val dir = dirF.getAbsolutePath
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        try rm(dirF) catch { case _: Throwable => () }
      }))
      val (to, tl) = (s"graft_bkt_orders_$h", s"graft_bkt_lineitem_$h")
      s.sql(s"DROP TABLE IF EXISTS $to")
      s.sql(s"DROP TABLE IF EXISTS $tl")
      ord.write.format("parquet").option("path", s"$dir/o")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(to)
      li.write.format("parquet").option("path", s"$dir/l")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(tl)
      (to, tl)
    }
    val (shB, srtB, nB) = census(s.table(tOrd), s.table(tLi))
    Seq(("bucketed", shB, srtB, nB), ("plain", shP, srtP, nP))
      .toDF("variant", "n_shuffle_exchange", "n_sort", "n_rows")
      .orderBy("variant")
  }

  def layoutFilesizing(s: SparkSession, d: String): DataFrame = {
    val target = 4096L
    val per = Tables.documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_bytes"))
    val tot = broadcast(per.agg(sum(col("n_bytes")).as("tb"),
      count(lit(1)).as("ns")))
    per.crossJoin(tot)
      .select(col("source"), col("n_docs"), col("n_bytes"),
        expr(s"cast((n_bytes + $target - 1) div $target as bigint)")
          .as("n_files"),
        expr("cast(10 * n_bytes * ns > 11 * tb as int)").as("hot"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_bucketing" -> layoutBucketing _,
    "layout_filesizing" -> layoutFilesizing _,
    "layout_skipping" -> layoutSkipping _,
    "a21_allocate" -> a21Allocate _,
    "o15_wmedian" -> o15Wmedian _,
    "o11_diversify" -> o11Diversify _,
    "o10_skyline" -> o10Skyline _,
    "layout_zorder" -> layoutZorder _,
    "layout_hilbert" -> layoutHilbert _,
    "a16_mode" -> a16Mode _,
    "a15_kmv" -> a15Kmv _,
    "a20_hll" -> a20Hll _,
    "a22_hll_merge" -> a22HllMerge _,
    "a13_pivot" -> a13Pivot _,
    "a23_approx_quantile" -> a23ApproxQuantile _)

  val oracles: Map[String, String] = Map(
    // exchange census literal-pinned (Spark plan facts); the joined
    // row count is the replayed data fact shared by both variants
    "layout_bucketing" ->
      """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT v.variant, v.n_shuffle_exchange, v.n_sort, n.n_rows
        |FROM (VALUES
        |  ('bucketed', CAST(0 AS BIGINT), CAST(2 AS BIGINT)),
        |  ('plain',    CAST(2 AS BIGINT), CAST(2 AS BIGINT))
        |) AS v(variant, n_shuffle_exchange, n_sort), n
        |ORDER BY v.variant""".stripMargin,
    // same integer file-count ceiling + cross-multiplied hot flag
    "layout_filesizing" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_bytes
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_bytes) AS BIGINT) AS tb,
        |    CAST(COUNT(*) AS BIGINT) AS ns
        |  FROM per)
        |SELECT p.source, p.n_docs, p.n_bytes,
        |  CAST((p.n_bytes + 4095) // 4096 AS BIGINT) AS n_files,
        |  CAST(10 * p.n_bytes * t.ns > 11 * t.tb AS INTEGER) AS hot
        |FROM per p, tot t
        |ORDER BY p.source""".stripMargin,
    // replays the KMV sketch exactly: frac = first 52 md5 bits / 2^52
    // (every Σ digit·16^(12-i) term and the sum are exact doubles),
    // k smallest DISTINCT fracs, est = 63/h_64 (exact size below 64)
    // identical min/max-range pruning model per layout; same z bits
    "layout_skipping" -> {
      def lay(name: String, grp: String) =
        s"""SELECT '$name' AS layout,
           |  COUNT(*) AS n_groups,
           |  CAST(SUM(scanned) AS BIGINT) AS n_scanned,
           |  round(1.0 - CAST(SUM(scanned) AS DOUBLE)
           |    / CAST(COUNT(*) AS DOUBLE), 6) AS skip_rate,
           |  CAST(SUM(rows) AS BIGINT) AS rows_total,
           |  CAST(SUM(scanned * rows) AS BIGINT) AS rows_scanned,
           |  CAST(SUM(hits) AS BIGINT) AS n_matching
           |FROM (
           |  SELECT $grp AS g, COUNT(*) AS rows,
           |    CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS hits,
           |    CASE WHEN MAX(od) >= DATE '1997-03-01'
           |          AND MIN(od) <= DATE '1997-03-31'
           |          AND MIN(o_custkey) <= MAX(ckHi)
           |         THEN 1 ELSE 0 END AS scanned
           |  FROM base GROUP BY 1)""".stripMargin
      s"""WITH o AS (
         |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
         |  FROM orders),
         |st AS (
         |  SELECT MIN(o_custkey) AS ck0, MAX(o_custkey) AS ck1,
         |    MIN(od) AS d0, MAX(od) AS d1
         |  FROM o),
         |bx AS (
         |  SELECT o.*, st.ck0, st.ck1, st.d0, st.d1,
         |    CAST(floor((o_custkey - ck0) * 256.0 / (ck1 - ck0 + 1))
         |      AS INTEGER) AS x,
         |    CAST(floor(date_diff('day', d0, od) * 256.0
         |      / (date_diff('day', d0, d1) + 1)) AS INTEGER) AS y
         |  FROM o, st),
         |base AS (
         |  SELECT *,
         |    (((x >> 0) & 1) * 2 + ((y >> 0) & 1) * 1
         |     + ((x >> 1) & 1) * 8 + ((y >> 1) & 1) * 4
         |     + ((x >> 2) & 1) * 32 + ((y >> 2) & 1) * 16
         |     + ((x >> 3) & 1) * 128 + ((y >> 3) & 1) * 64
         |     + ((x >> 4) & 1) * 512 + ((y >> 4) & 1) * 256
         |     + ((x >> 5) & 1) * 2048 + ((y >> 5) & 1) * 1024
         |     + ((x >> 6) & 1) * 8192 + ((y >> 6) & 1) * 4096
         |     + ((x >> 7) & 1) * 32768 + ((y >> 7) & 1) * 16384) AS z,
         |    ck0 + (ck1 - ck0) // 10 AS ckHi,
         |    (od >= DATE '1997-03-01' AND od <= DATE '1997-03-31'
         |     AND o_custkey <= ck0 + (ck1 - ck0) // 10) AS m
         |  FROM bx)
         |SELECT * FROM (
         |${lay("natural", "o_orderkey // 512")}
         |UNION ALL
         |${lay("bydate", "date_diff('day', DATE '1994-01-01', od) // 30")}
         |UNION ALL
         |${lay("zorder", "z // 256")}
         |) ORDER BY layout""".stripMargin
    },
    // identical integer largest-remainder replay: base = floor-div,
    // leftover cents by (remainder DESC, linenumber) row_number
    "a21_allocate" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS total_cents
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |l AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |j AS (
        |  SELECT o.o_orderkey, l.l_linenumber, l.qty, o.total_cents
        |  FROM l JOIN o ON l.l_orderkey = o.o_orderkey),
        |sq AS (
        |  SELECT o_orderkey, CAST(SUM(qty) AS BIGINT) AS sumqty
        |  FROM j GROUP BY 1),
        |b AS (
        |  SELECT j.o_orderkey, j.l_linenumber, j.qty, j.total_cents,
        |    j.total_cents * j.qty // s.sumqty AS base,
        |    (j.total_cents * j.qty) % s.sumqty AS fr,
        |    s.sumqty
        |  FROM j JOIN sq s USING (o_orderkey)),
        |w AS (
        |  SELECT *,
        |    CAST(SUM(fr) OVER (PARTITION BY o_orderkey) AS BIGINT)
        |      // sumqty AS r,
        |    row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY fr DESC, l_linenumber ASC, qty ASC) AS rn
        |  FROM b)
        |SELECT o_orderkey, l_linenumber, qty, total_cents,
        |  base + CASE WHEN rn <= r THEN 1 ELSE 0 END AS alloc_cents
        |FROM w ORDER BY o_orderkey, l_linenumber""".stripMargin,
    // the oracle's monolithic per-nation window computes the same
    // cumulative weight the engine's two-level bucketed prefix sum
    // does; identical crossing rule, exact integers throughout
    "o15_wmedian" ->
      """WITH f AS (
        |  SELECT n.n_name, l.l_extendedprice AS price,
        |    CAST(l.l_quantity AS BIGINT) AS w,
        |    l.l_orderkey, l.l_linenumber
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |c AS (
        |  SELECT n_name, price,
        |    SUM(w) OVER (PARTITION BY n_name
        |      ORDER BY price, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(w) OVER (PARTITION BY n_name) AS tot_w
        |  FROM f)
        |SELECT n_name, CAST(MAX(tot_w) AS BIGINT) AS total_weight,
        |  CAST(MIN(price) AS DOUBLE) AS w_median_price
        |FROM c WHERE cum * 2 >= tot_w
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // DuckDB row_number is BIGINT → cast to match Spark's INT
    "o11_diversify" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(rn AS INTEGER) AS cust_rank
        |FROM r WHERE rn <= 2
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    // the definitional NOT EXISTS dominance check over distinct points
    // (quadratic is fine at oracle scale; the engine's sweep must
    // reproduce it exactly)
    "o10_skyline" ->
      """WITH p AS (
        |  SELECT p_retailprice AS price, p_size AS size, COUNT(*) AS n_parts
        |  FROM part GROUP BY 1, 2)
        |SELECT price, size, n_parts FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price <= a.price AND b.size >= a.size
        |    AND (b.price < a.price OR b.size > a.size))
        |ORDER BY price""".stripMargin,
    "layout_zorder" -> {
      val weave = (0 until 8).map(i =>
        s"(((x >> $i) & 1) * ${1 << (2 * i + 1)} + " +
          s"((y >> $i) & 1) * ${1 << (2 * i)})").mkString(" + ")
      s"""WITH o AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
         |s AS (
         |  SELECT MIN(o_custkey) AS ck0, MAX(o_custkey) AS ck1,
         |    MIN(od) AS d0, MAX(od) AS d1 FROM o),
         |b AS (
         |  SELECT
         |    CAST(floor((o_custkey - s.ck0) * 256.0
         |      / (s.ck1 - s.ck0 + 1)) AS INT) AS x,
         |    CAST(floor(date_diff('day', s.d0, od) * 256.0
         |      / (date_diff('day', s.d0, s.d1) + 1)) AS INT) AS y
         |  FROM o, s),
         |zt AS (SELECT x, y, ($weave) AS z FROM b)
         |SELECT (z >> 8) AS tile, COUNT(*) AS n_rows,
         |  MIN(x) AS min_x, MAX(x) AS max_x,
         |  MIN(y) AS min_y, MAX(y) AS max_y
         |FROM zt GROUP BY 1 ORDER BY tile""".stripMargin
    },
    // per-column KMV replay (same 52-bit md5 fraction as a15_kmv) +
    // exact null/min/max, one SELECT per profiled column
    // pure integer bit interleave replayed with >>/&; scaling is
    // exact integer-in-double arithmetic, identical on both engines
    // the xy2d walk unrolled as 8 chained integer-CTE rounds — exact
    // integers end to end, so the tile panel hash-matches the native
    // codegen expression
    "layout_hilbert" -> {
      val rounds = (7 to 0 by -1).map { k =>
        val s = 1 << k
        s"""h${7 - k + 1} AS (
           |  SELECT x, y,
           |    CASE WHEN ((hy >> $k) & 1) = 0 THEN
           |      (CASE WHEN ((hx >> $k) & 1) = 1
           |         THEN ${s - 1} - hy ELSE hy END)
           |    ELSE hx END AS hx,
           |    CASE WHEN ((hy >> $k) & 1) = 0 THEN
           |      (CASE WHEN ((hx >> $k) & 1) = 1
           |         THEN ${s - 1} - hx ELSE hx END)
           |    ELSE hy END AS hy,
           |    hd + ${s * s} * xor(3 * ((hx >> $k) & 1), (hy >> $k) & 1)
           |      AS hd
           |  FROM h${7 - k})""".stripMargin
      }.mkString(",\n")
      s"""WITH o AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
         |s AS (
         |  SELECT MIN(o_custkey) AS ck0, MAX(o_custkey) AS ck1,
         |    MIN(od) AS d0, MAX(od) AS d1 FROM o),
         |b AS (
         |  SELECT
         |    CAST(floor((o_custkey - s.ck0) * 256.0
         |      / (s.ck1 - s.ck0 + 1)) AS INT) AS x,
         |    CAST(floor(date_diff('day', s.d0, od) * 256.0
         |      / (date_diff('day', s.d0, s.d1) + 1)) AS INT) AS y
         |  FROM o, s),
         |h0 AS (SELECT x, y, x AS hx, y AS hy, 0 AS hd FROM b),
         |$rounds
         |SELECT (hd >> 8) AS tile, COUNT(*) AS n_rows,
         |  MIN(x) AS min_x, MAX(x) AS max_x,
         |  MIN(y) AS min_y, MAX(y) AS max_y
         |FROM h8 GROUP BY 1 ORDER BY tile""".stripMargin
    },
    "a16_mode" ->
      """WITH counts AS (
        |  SELECT o_custkey, o_orderpriority, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |ranked AS (
        |  SELECT o_custkey, o_orderpriority, n, row_number() OVER
        |    (PARTITION BY o_custkey ORDER BY n DESC, o_orderpriority ASC)
        |    AS rk
        |  FROM counts)
        |SELECT o_custkey, o_orderpriority AS mode_priority, n AS n_mode
        |FROM ranked WHERE rk = 1 ORDER BY o_custkey""".stripMargin,
    "a15_kmv" ->
      """WITH vals AS (
        |  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u
        |  FROM events),
        |fr AS (
        |  SELECT event_type,
        |    list_sum(list_transform(range(13), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(md5(u), CAST(i AS INTEGER) + 1, 1)) - 1 AS DOUBLE)
        |      * power(16.0, CAST(12 - i AS DOUBLE))))
        |      / 4503599627370496.0 AS frac
        |  FROM vals),
        |ks AS (
        |  SELECT event_type, list_sort(list(DISTINCT frac)) AS arr
        |  FROM fr GROUP BY 1),
        |ex AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |  FROM events GROUP BY 1)
        |SELECT ks.event_type,
        |  round(CASE WHEN len(arr) < 64 THEN CAST(len(arr) AS DOUBLE)
        |        ELSE 63.0 / arr[64] END, 6) AS approx_users,
        |  ex.exact_users
        |FROM ks JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // full HLL replay: same md5 register/rank derivation by string
    // ops, exact scaled-integer harmonic sum, same one-expression
    // estimate + linear-counting branch
    "a20_hll" ->
      """WITH h AS (
        |  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
        |  FROM events),
        |r AS (
        |  SELECT event_type,
        |    (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS reg,
        |    substr(hx, 3, 13) AS h13
        |  FROM h),
        |rk AS (
        |  SELECT event_type, reg,
        |    length(regexp_extract(h13, '^0*')) AS lz,
        |    substr(h13, length(regexp_extract(h13, '^0*')) + 1, 1) AS d1
        |  FROM r),
        |rr AS (
        |  SELECT event_type, reg,
        |    CASE WHEN lz = 13 THEN 53
        |         ELSE lz * 4 + (CASE WHEN d1 = '1' THEN 3
        |                             WHEN d1 IN ('2', '3') THEN 2
        |                             WHEN d1 IN ('4', '5', '6', '7') THEN 1
        |                             ELSE 0 END) + 1 END AS rk
        |  FROM rk),
        |mm AS (
        |  SELECT event_type, reg, MAX(rk) AS mr FROM rr GROUP BY 1, 2),
        |sk AS (
        |  SELECT event_type,
        |    CAST(256 - COUNT(*) AS BIGINT) AS n_zero_regs,
        |    CAST(SUM(CAST(1 AS BIGINT) << (53 - mr)) AS BIGINT)
        |      + CAST(256 - COUNT(*) AS BIGINT) * 9007199254740992 AS zs
        |  FROM mm GROUP BY 1),
        |e AS (
        |  SELECT event_type, n_zero_regs,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |      / (CAST(zs AS DOUBLE) / 9007199254740992.0) AS raw
        |  FROM sk),
        |ex AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, n_zero_regs,
        |  round(CASE WHEN n_zero_regs > 0 AND raw <= 640.0
        |        THEN 256.0 * ln(256.0 / CAST(n_zero_regs AS DOUBLE))
        |        ELSE raw END, 4) AS est_users,
        |  ex.exact_users
        |FROM e JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // parity-split register tables, element-wise-max merge, and the
    // four estimates from the identical a20 pipeline
    "a22_hll_merge" -> {
      def est(src: String, alias: String) =
        s"""${alias}sk AS (
           |  SELECT event_type,
           |    CAST(256 - COUNT(*) AS BIGINT) AS nz,
           |    CAST(SUM(CAST(1 AS BIGINT) << (53 - mr)) AS BIGINT)
           |      + CAST(256 - COUNT(*) AS BIGINT) * 9007199254740992 AS zs
           |  FROM $src GROUP BY 1),
           |$alias AS (
           |  SELECT event_type,
           |    round(CASE WHEN nz > 0
           |        AND (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
           |          / (CAST(zs AS DOUBLE) / 9007199254740992.0) <= 640.0
           |      THEN 256.0 * ln(256.0 / CAST(nz AS DOUBLE))
           |      ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
           |        / (CAST(zs AS DOUBLE) / 9007199254740992.0) END, 4)
           |      AS est
           |  FROM ${alias}sk)""".stripMargin
      s"""WITH h AS (
         |  SELECT event_type, user_id % 2 = 0 AS even,
         |    md5(CAST(user_id AS VARCHAR)) AS hx
         |  FROM events),
         |r AS (
         |  SELECT event_type, even,
         |    (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
         |      + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS reg,
         |    substr(hx, 3, 13) AS h13
         |  FROM h),
         |rr AS (
         |  SELECT event_type, even, reg,
         |    CASE WHEN lz = 13 THEN 53
         |         ELSE lz * 4 + (CASE WHEN d1 = '1' THEN 3
         |                             WHEN d1 IN ('2', '3') THEN 2
         |                             WHEN d1 IN ('4', '5', '6', '7') THEN 1
         |                             ELSE 0 END) + 1 END AS rk
         |  FROM (
         |    SELECT event_type, even, reg,
         |      length(regexp_extract(h13, '^0*')) AS lz,
         |      substr(h13, length(regexp_extract(h13, '^0*')) + 1, 1) AS d1
         |    FROM r)),
         |regsE AS (SELECT event_type, reg, MAX(rk) AS mr
         |          FROM rr WHERE even GROUP BY 1, 2),
         |regsO AS (SELECT event_type, reg, MAX(rk) AS mr
         |          FROM rr WHERE NOT even GROUP BY 1, 2),
         |regsM AS (
         |  SELECT event_type, reg, MAX(mr) AS mr FROM (
         |    SELECT * FROM regsE UNION ALL SELECT * FROM regsO)
         |  GROUP BY 1, 2),
         |regsF AS (SELECT event_type, reg, MAX(rk) AS mr
         |          FROM rr GROUP BY 1, 2),
         |${est("regsE", "ee")},
         |${est("regsO", "eo")},
         |${est("regsM", "em")},
         |${est("regsF", "ef")}
         |SELECT ee.event_type, ee.est AS est_even, eo.est AS est_odd,
         |  em.est AS est_merged, ef.est AS est_full,
         |  CAST(CASE WHEN em.est = ef.est THEN 1 ELSE 0 END AS INTEGER)
         |    AS merged_equals_full
         |FROM ee JOIN eo USING (event_type) JOIN em USING (event_type)
         |JOIN ef USING (event_type)
         |ORDER BY event_type""".stripMargin
    },
    "a13_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    // exact interpolated quantiles replay with quantile_cont (both
    // engines interpolate at p*(n-1)); rank_bounded pins the GK
    // sketch's guarantee against a 500x looser band than its 1e-4
    // rank error, so a broken sketch fails but FP noise cannot
    "a23_approx_quantile" ->
      """SELECT col_name, p, exact, TRUE AS rank_bounded FROM (
        |  SELECT 'l_extendedprice' AS col_name, 0.5 AS p,
        |    round(quantile_cont(l_extendedprice, 0.5), 4) AS exact
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 0.9,
        |    round(quantile_cont(l_extendedprice, 0.9), 4) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', 0.5,
        |    round(quantile_cont(l_quantity, 0.5), 4) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', 0.9,
        |    round(quantile_cont(l_quantity, 0.9), 4) FROM lineitem)
        |ORDER BY col_name, p""".stripMargin)

}

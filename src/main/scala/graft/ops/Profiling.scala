package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Data-profiling and data-quality catalog rows (split from
  * CoreRelational, round 13): the dq_* expectation/constraint
  * checks and the profile_* column statistics — every row the same
  * one-pass aggregate discipline and DuckDB-oracle parity rules as
  * the relational catalog.
  */
object Profiling {

  def profileEntropy(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val panels = Seq("o_orderstatus", "o_orderpriority").map { c =>
      val vc = ord.groupBy(col(c).as("v")).agg(count(lit(1)).as("n"))
      val tot = vc.agg(sum("n").as("tot"), count(lit(1)).as("nd"),
        max("n").as("mx"))
      vc.crossJoin(broadcast(tot))
        .withColumn("q", expr(
          "cast(floor(-(cast(n as double) / cast(tot as double))" +
            " * ln(cast(n as double) / cast(tot as double))" +
            " * 1000000000.0 + 0.5) as bigint)"))
        .groupBy()
        .agg(max("nd").as("n_distinct"), max("tot").as("tot"),
          max("mx").as("mx"), sum("q").as("sq"))
        .select(lit(c).as("column_name"), col("n_distinct"),
          expr("round(cast(sq as double) / 1000000000.0, 6)").as("entropy"),
          expr("round(cast(mx as double) / cast(tot as double), 6)")
            .as("top_share"))
    }
    panels.reduce(_ unionAll _).orderBy("column_name")
  }

  def profileTable(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
    val aggs = cols.flatMap { c => Seq(
      sum(col(c).isNull.cast("long")).as(s"${c}__nn"),
      round(graft.functions.expressions.KmvDistinct.kmv_native(s,
        col(c).cast("string")), 6).as(s"${c}__kd"),
      min(col(c).cast("string")).as(s"${c}__mn"),
      max(col(c).cast("string")).as(s"${c}__mx"))
    } :+ count(lit(1)).as("n_rows")
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', ${c}__nn, ${c}__kd, ${c}__mn, ${c}__mx").mkString(", ") +
      ") as (col_name, n_null, n_distinct_est, min_s, max_s)"
    ord.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows", stackExpr)
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct_est"), col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }

  /** One-pass Pearson correlation panel over the fact table — the
    * numeric-profiling companion to [[profileTable]]: for each
    * l_returnflag group, r(quantity, extendedprice) and r(discount,
    * extendedprice) from a SINGLE scan of sufficient statistics
    * (n, Σx, Σy, Σx², Σy², Σxy).
    *
    * Cross-engine FP without sorted folds: every input is cast to
    * DECIMAL(18,2) first, so all six sums are EXACT decimal arithmetic
    * — commutative, partition-order-free, bit-identical in any engine
    * — and the floating-point work is a fixed expression tree over six
    * exact scalars per group (then a 1e-6 round as belt-and-braces).
    * This is the same exactness trick as ev_window_agg's decimal sum,
    * extended to second moments: the ONLY way a distributed corr can
    * hash-match a single-threaded oracle without pinning partition
    * order (Spark's built-in `corr` accumulates doubles in shuffle
    * order — unusable for a bit-exact compare).
    *
    * 100 TB posture: one narrow scan + one map-side-combined hash agg
    * on a low-cardinality key; the panel explode is per-group in-row.
    */
  def profileCorr(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity").cast("decimal(18,2)").as("q"),
      col("l_extendedprice").cast("decimal(18,2)").as("p"),
      col("l_discount").cast("decimal(18,2)").as("disc"))
    val a = li.groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("q")).cast("double").as("sq"),
      sum(col("p")).cast("double").as("sp"),
      sum(col("disc")).cast("double").as("sd"),
      sum(col("q") * col("q")).cast("double").as("sqq"),
      sum(col("p") * col("p")).cast("double").as("spp"),
      sum(col("disc") * col("disc")).cast("double").as("sdd"),
      sum(col("q") * col("p")).cast("double").as("sqp"),
      sum(col("disc") * col("p")).cast("double").as("sdp"))
    // try_divide: a zero-variance column yields NULL (SQL corr()'s
    // convention), not an ANSI divide-by-zero error; oracle CASEs the
    // same zero-denominator check
    def r(sxy: Column, sx: Column, sy: Column,
        sxx: Column, syy: Column): Column =
      round(try_divide(col("n") * sxy - sx * sy,
        sqrt(col("n") * sxx - sx * sx) *
          sqrt(col("n") * syy - sy * sy)), 6)
    a.select(col("l_returnflag"), explode(array(
        struct(lit("quantity").as("x_col"),
          lit("extendedprice").as("y_col"),
          r(col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp"))
            .as("r")),
        struct(lit("discount").as("x_col"),
          lit("extendedprice").as("y_col"),
          r(col("sdp"), col("sd"), col("sp"), col("sdd"), col("spp"))
            .as("r")))).as("c"))
      .select(col("l_returnflag"), col("c.x_col"), col("c.y_col"),
        col("c.r"))
      .orderBy(col("l_returnflag"), col("c.x_col"))
  }

  /** Data-quality expectation suite — the Deequ-style constraint
    * check that gates every load the reference performs with ad-hoc
    * rowcount asserts (import_bigquery/main.py's validate step): each
    * rule yields (rule, n_checked, n_violations, pass). ALL row-level
    * rules (null, range, domain) fold into ONE full-scan aggregate —
    * adding a rule adds a conditional-sum column, not a pass; the two
    * rules that genuinely need other shapes (referential integrity =
    * one anti-join count, key uniqueness = one distinct count) ride
    * the same scan family. The three 1-row aggregates cross-join
    * (trivially broadcast) and unpivot via an in-row array explode —
    * no collect, no per-rule jobs.
    *
    * NULL discipline: a NULL checked value COUNTS AS A VIOLATION for
    * range/domain rules (explicit `isNull ||` guard) — mirrored by
    * `IS NULL OR` in the oracle's CASE, so the engines can never
    * diverge on three-valued logic (the corpusKeep lesson). r3 is
    * deliberately tight (discount ≤ 5%) so real violation counts flow
    * through the hash compare — an all-green panel would be vacuous. */
  def dqExpectations(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    def viol(c: Column): Column = sum(when(c, 1).otherwise(0)).cast("bigint")
    val base = li.agg(
      count(lit(1)).as("n"),
      viol(col("l_orderkey").isNull).as("v1"),
      viol(col("l_quantity").isNull ||
        col("l_quantity") < 1 || col("l_quantity") > 50).as("v2"),
      viol(col("l_discount").isNull || col("l_discount") > 0.05).as("v3"),
      viol(col("l_returnflag").isNull ||
        !col("l_returnflag").isin("A", "N", "R")).as("v4"),
      viol(col("l_shipdate").isNull ||
        col("l_shipdate") < lit("1992-01-01").cast("timestamp") ||
        col("l_shipdate") >= lit("1999-01-01").cast("timestamp")).as("v5"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd"))
    val ri = li.select(col("l_orderkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v6"))
    base.crossJoin(ri)
      .select(explode(array(
        struct(lit("r1_orderkey_not_null").as("rule"),
          col("n").as("n_checked"), col("v1").as("n_violations")),
        struct(lit("r2_quantity_in_1_50").as("rule"),
          col("n").as("n_checked"), col("v2").as("n_violations")),
        struct(lit("r3_discount_le_5pct").as("rule"),
          col("n").as("n_checked"), col("v3").as("n_violations")),
        struct(lit("r4_returnflag_domain").as("rule"),
          col("n").as("n_checked"), col("v4").as("n_violations")),
        struct(lit("r5_shipdate_in_range").as("rule"),
          col("n").as("n_checked"), col("v5").as("n_violations")),
        struct(lit("r6_orderkey_in_orders").as("rule"),
          col("n").as("n_checked"), col("v6").as("n_violations")),
        struct(lit("r7_line_pk_unique").as("rule"),
          col("n").as("n_checked"),
          (col("n") - col("nd")).as("n_violations")))).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_checked"),
        col("r.n_violations"),
        when(col("r.n_violations") === 0, 1).otherwise(0).as("pass"))
      .orderBy(col("rule"))
  }

  /** Order-independent per-partition table digest — the anti-entropy
    * primitive for verifying a replica/migration copy of a 100 TB
    * table WITHOUT sorting it (the relational restatement of the
    * reference's transactional-load rowcount validation,
    * import_bigquery/main.py:367-403, upgraded from "same count" to
    * "same content"): each row canonicalizes to one pipe-joined
    * string, hashes to the 52-bit md5 integer (the a15_kmv nibble
    * fraction's integer form — exact in double arithmetic, so the
    * oracle replays it), and per-month digests combine with
    * `bit_xor`, which is commutative/associative — identical under
    * any partitioning, shuffle order, or file layout. Compare
    * (month, n_rows, digest) panels on both sides; a mismatch
    * localizes to one partition, which alone gets re-read.
    *
    * 100 TB posture: one narrow scan + one map-side-combined hash agg
    * on the partition key; no sort, no window, no collect. */
  def profileChecksum(s: SparkSession, d: String): DataFrame = {
    val canon = concat_ws("|",
      col("o_orderkey").cast("string"),
      col("o_custkey").cast("string"),
      col("o_orderstatus"),
      col("o_totalprice").cast("decimal(18,2)").cast("string"),
      date_format(col("o_orderdate"), "yyyy-MM-dd"))
    Tables.orders(s, d)
      .withColumn("cs", canon)
      .withColumn("h",
        expr("cast(conv(substring(md5(cs), 1, 13), 16, 10) as bigint)"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("digest"))
      .orderBy(col("month"))
  }

  /** Benford first-digit audit over line-item amounts — the
    * fraud-screening pass an ingest pipeline runs on reported financial
    * figures (first-significant-digit frequencies against Benford's
    * log₁₀(1+1/d) law). The digit is extracted from the DECIMAL(18,2)
    * string rendering (no FP log in the classifier, so binning is
    * exact in any engine); observed shares are exact-integer divisions
    * via a 9-row window; only the irrational expected-share and the
    * excess are rounded. ONE map-side-combined scan; everything after
    * is digit-cardinality (≤9 rows). */
  def dqBenford(s: SparkSession, d: String): DataFrame = {
    val digits = Tables.lineitem(s, d)
      .filter(col("l_extendedprice") > 0)
      .groupBy(substring(col("l_extendedprice").cast("decimal(18,2)")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
    val pObs = col("n").cast("double") /
      sum(col("n")).over(Window.partitionBy()).cast("double")
    val pExp = log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
    digits.select(col("digit"), col("n"),
        round(pObs, 6).as("p_obs"),
        round(pExp, 6).as("p_benford"),
        round(pObs - pExp, 6).as("excess"))
      .orderBy(col("digit"))
  }

  /** DQ: functional-dependency audit — test candidate "X determines Y"
    * rules and report how badly each is violated (the schema-
    * inference / normalization prerequisite: a HOLDING fd is a
    * candidate for dimension extraction, a nearly-holding one is
    * usually a data bug). Four candidates spanning both outcomes:
    * nation→region holds by construction, partkey→brand is the
    * key-uniqueness flavor;
    * customer nation→mktsegment and order→returnflag should fail
    * loudly.
    *
    * 100 TB posture: each rule is one (lhs, rhs) dedup + lhs-keyed
    * count-distinct aggregate (map-side combinable) collapsed to a
    * 1-row panel — no joins, no windows; the union stacks four 1-row
    * panels. Exact integers; the rate is one division, round 6. */
  def dqFd(s: SparkSession, d: String): DataFrame = {
    def panel(name: String, df: DataFrame, lhs: String, rhs: String) =
      df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("ndv"))
        .agg(count(lit(1)).as("n_groups"),
          sum((col("ndv") > 1).cast("long")).as("n_violating"),
          max(col("ndv")).as("max_rhs_distinct"))
        .select(lit(name).as("fd"), col("n_groups"), col("n_violating"),
          round(col("n_violating").cast("double")
            / col("n_groups").cast("double"), 6).as("violation_rate"),
          col("max_rhs_distinct"))
    panel("nation_to_region", Tables.nation(s, d),
        "n_nationkey", "n_regionkey")
      .unionAll(panel("partkey_to_brand", Tables.part(s, d),
        "p_partkey", "p_brand"))
      .unionAll(panel("custnation_to_segment", Tables.customer(s, d),
        "c_nationkey", "c_mktsegment"))
      .unionAll(panel("order_to_returnflag", Tables.lineitem(s, d),
        "l_orderkey", "l_returnflag"))
      .orderBy(col("fd"))
  }

  /** T174: two-table financial RECONCILIATION report — does the order
    * header's `o_totalprice` equal the recomputed sum of its line
    * amounts (extprice·(1−disc)·(1+tax))? The close-the-books query
    * every warehouse runs between a fact table and its rollup, with
    * mismatches CLASSED, not just counted: exact (0¢), minor (<$1),
    * major (≥$1), and headers with no lines at all. All comparisons
    * happen in exact integer CENTS (money through decimal(18,2), the
    * repo convention — a double recompute would misclassify
    * penny-level drift, the very thing the report exists to catch).
    *
    * One fact aggregate keyed on order + one broadcast-ineligible but
    * key-colocated header join + one 4-row class aggregate; nothing
    * wider than (orderkey, cents) ever shuffles. */
  def dqReconcile(s: SparkSession, d: String): DataFrame = {
    // per-line amount in EXACT INTEGER units (cents × 1e4): the
    // decimal-product route rounds differently per engine at decimal-
    // precision limits; extc·(100−disc%)·(100+tax%) is overflow-free
    // and bit-identical everywhere, and the final half-up to cents is
    // one integer expression
    val lines = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(expr(
        "(sum(cast(cast(l_extendedprice as decimal(18,2)) * 100" +
          " as bigint)" +
          " * (100 - cast(cast(l_discount as decimal(18,2)) * 100" +
          " as bigint))" +
          " * (100 + cast(cast(l_tax as decimal(18,2)) * 100" +
          " as bigint))) + 5000) div 10000")
        .as("ltot_cents"))
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100" +
          " as bigint)").as("otot_cents"))
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("diff_cents", expr(
        "case when ltot_cents is null then null" +
          " else abs(otot_cents - ltot_cents) end"))
      .withColumn("class", expr(
        "case when diff_cents is null then 'missing_lines'" +
          " when diff_cents = 0 then 'exact'" +
          " when diff_cents < 100 then 'minor'" +
          " else 'major' end"))
      .groupBy("class")
      .agg(count(lit(1)).as("n_orders"),
        sum(coalesce(col("diff_cents"), lit(0L))).as("cents"))
      .select(col("class"), col("n_orders"),
        expr("round(cast(cents as double) / 100.0, 2)")
          .as("sum_abs_diff"))
      .orderBy("class")
  }

  /** T191: IQR OUTLIER FENCES (the Tukey boxplot rule, the DQ
    * monitor's robust complement to z-scores): per profiled money
    * column, exact q1/q3 (Spark `percentile` ≡ DuckDB
    * `quantile_cont`), fences at ±1.5·IQR, and the row counts outside
    * each fence. Per column: ONE quartile aggregate (1-row broadcast)
    * + one conditional-count rescan; fences are rounded to the 1e-6
    * grid before the comparison so both engines cut at the identical
    * boundary. Panel = one row per profiled column. */
  def dqIqrOutliers(s: SparkSession, d: String): DataFrame = {
    def panel(df: DataFrame, colName: String, label: String): DataFrame = {
      val v = df.select(col(colName).cast("double").as("v"))
      val qs = v.agg(
        round(expr("percentile(v, 0.25)"), 6).as("q1"),
        round(expr("percentile(v, 0.75)"), 6).as("q3"))
        .withColumn("lo", round(col("q1")
          - lit(1.5) * (col("q3") - col("q1")), 6))
        .withColumn("hi", round(col("q3")
          + lit(1.5) * (col("q3") - col("q1")), 6))
      v.crossJoin(broadcast(qs))
        .groupBy()
        .agg(count(lit(1)).as("n"),
          max("q1").as("q1"), max("q3").as("q3"),
          max("lo").as("fence_lo"), max("hi").as("fence_hi"),
          sum(when(col("v") < col("lo"), 1L).otherwise(0L))
            .as("n_below"),
          sum(when(col("v") > col("hi"), 1L).otherwise(0L))
            .as("n_above"))
        .select(lit(label).as("column"), col("n"), col("q1"),
          col("q3"), col("fence_lo"), col("fence_hi"),
          col("n_below"), col("n_above"))
    }
    panel(Tables.orders(s, d), "o_totalprice", "o_totalprice")
      .unionAll(panel(Tables.lineitem(s, d), "l_extendedprice",
        "l_extendedprice"))
      .orderBy("column")
  }

  /** T244: JOIN-KEY SKEW CENSUS — the "needs salting?" pre-flight a
    * 100 TB join plan runs before choosing its shuffle strategy. For
    * the five join/grouping keys the catalog actually shuffles on
    * (fact FKs, the event user key, and the low-cardinality event
    * type as the known-pathological contrast) it reports exact
    * per-key-distribution facts: row/key counts, the heaviest key and
    * its share, and the max/avg skew ratio with a >10× salting flag —
    * the number that decides between a plain hash join, AQE's skew
    * split, and an explicit salt.
    *
    * Scale posture: per key ONE map-side-combinable hash agg folds the
    * corpus to its key-count table, and the census is a second
    * aggregate OVER THAT (key-table-sized) — no windows, no sorts; the
    * heaviest key rides a struct-argmin (min of (-count, key), the q02
    * idiom) so the tie-break (smallest key among equal counts) is
    * engine-agnostic. The salting flag compares the ROUNDED ratio on
    * both sides, so the boolean is as cross-engine-stable as the
    * double it derives from. */
  def profileSkew(s: SparkSession, d: String): DataFrame = {
    def census(table: String, key: String, df: DataFrame): DataFrame =
      df.select(col(key).cast("string").as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          min(struct((-col("c")).as("nc"), col("k").as("k"))).as("m"))
        .select(lit(table).as("table_name"), lit(key).as("key_col"),
          col("n_rows"), col("n_keys"),
          (-col("m.nc")).as("max_count"), col("m.k").as("top_key"),
          round(expr("cast(-m.nc as double) / cast(n_rows as double)"),
            6).as("max_share"),
          round(expr("(cast(-m.nc as double) * cast(n_keys as double))" +
            " / cast(n_rows as double)"), 6).as("skew_ratio"))
        .withColumn("needs_salting", col("skew_ratio") > 10.0)
    census("events", "event_type", Tables.events(s, d))
      .unionAll(census("events", "user_id", Tables.events(s, d)))
      .unionAll(census("lineitem", "l_orderkey", Tables.lineitem(s, d)))
      .unionAll(census("lineitem", "l_suppkey", Tables.lineitem(s, d)))
      .unionAll(census("orders", "o_custkey", Tables.orders(s, d)))
      .orderBy("table_name", "key_col")
  }

  /** T200: TOP-K VALUE PROFILE per categorical column — the "what's
    * actually in this column" half of a data profile
    * ([[profileTable]] gives the stats, this gives the values; every
    * warehouse profiler ships both). Per column: the 3 most frequent
    * values with exact counts (count desc, value asc tiebreak). One
    * hash agg per column folds the corpus to the distinct-value
    * table; the rank window runs OVER THAT (domain-constant rows —
    * the second-level-pass rule), never over the corpus. */
  def profileTopk(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    def top(colName: String): DataFrame = {
      val w = Window.orderBy(col("n").desc, col("value").asc)
      doc.groupBy(col(colName).as("value"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(lit(colName).as("column"), col("rk"), col("value"),
          col("n"))
    }
    top("lang").unionAll(top("source")).orderBy("column", "rk")
  }

  /** T206: χ² INDEPENDENCE test of the source × lang contingency — the
    * DQ monitor's "did the corpus mix shift" alarm (a skewed
    * source-language association is how a scraper regression shows up
    * before any single count looks wrong). The full r×c grid comes
    * from the cross join of the two broadcast-sized marginal panels
    * LEFT-joined to observed cells (zero cells MUST contribute their
    * expected mass); each (o−e)²/e term quantizes to the 1e-9 grid so
    * the grid-sized sum is order-free, and Cramér's V normalizes by
    * N·min(r−1, c−1). One corpus scan builds all three count tables
    * map-side; everything after is dim-cardinality. */
  def dqChisq(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val obs = docs.groupBy("source", "lang").agg(count(lit(1)).as("o"))
    val rowt = docs.groupBy("source").agg(count(lit(1)).as("rt"))
    val colt = docs.groupBy("lang").agg(count(lit(1)).as("ctt"))
    val tot = docs.agg(count(lit(1)).as("nn"),
      countDistinct("source").as("r"), countDistinct("lang").as("cdim"))
    rowt.crossJoin(colt)
      .join(obs, Seq("source", "lang"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("e", expr(
        "cast(rt as double) * cast(ctt as double) / cast(nn as double)"))
      .withColumn("term", expr(
        "cast(round((cast(o as double) - e) * (cast(o as double) - e)" +
          " / e, 9) as decimal(28,9))"))
      .agg(max("nn").as("n_docs"), max("r").as("r"),
        max("cdim").as("cdim"), sum("term").as("chi2q"))
      .select(col("n_docs"),
        col("r").cast("int").as("n_sources"),
        col("cdim").cast("int").as("n_langs"),
        expr("cast((r - 1) * (cdim - 1) as int)").as("dof"),
        expr("round(cast(chi2q as double), 6)").as("chi2"),
        expr("round(sqrt(cast(chi2q as double) / (cast(n_docs as double)" +
          " * cast(least(r - 1, cdim - 1) as double))), 6)")
          .as("cramers_v"))
  }

  /** T211: SNAPSHOT DRIFT report between the two key-parity halves of
    * the orders table — the ingest monitor's "did today's load change
    * shape" check, restated on a deterministic split (o_orderkey
    * parity stands in for yesterday/today). Three signals in one row:
    * PSI over the order-status distribution (the standard population-
    * stability index, Σ(pa−pb)·ln(pa/pb), each term 1e-9-quantized on
    * the ≤3-row status panel, zero-share terms dropped by the usual
    * clamp-free convention), exact DECIMAL(18,2) mean order values
    * per half, and the relative mean shift. Two map-side-combinable
    * scans (status cells, money sums); everything after is
    * status-cardinality. */
  def dqSnapshotDrift(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .withColumn("half", expr("cast(o_orderkey % 2 as int)"))
    val halves = ord.groupBy("half")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("sv"))
    val wide = halves.groupBy()
      .agg(max(when(col("half") === 0, col("n"))).as("n_a"),
        max(when(col("half") === 1, col("n"))).as("n_b"),
        max(when(col("half") === 0, col("sv"))).as("sv_a"),
        max(when(col("half") === 1, col("sv"))).as("sv_b"))
    val cells = ord.groupBy("o_orderstatus", "half")
      .agg(count(lit(1)).as("c"))
    val psi = cells.groupBy("o_orderstatus")
      .agg(coalesce(max(when(col("half") === 0, col("c"))), lit(0L))
        .as("ca"),
        coalesce(max(when(col("half") === 1, col("c"))), lit(0L))
          .as("cb"))
      .crossJoin(broadcast(wide.select("n_a", "n_b")))
      .withColumn("pa", expr("cast(ca as double) / cast(n_a as double)"))
      .withColumn("pb", expr("cast(cb as double) / cast(n_b as double)"))
      .withColumn("term", expr(
        "cast(round(case when pa * pb = 0 then 0.0" +
          " else (pa - pb) * ln(pa / pb) end, 9) as decimal(18,9))"))
      .agg(sum("term").as("psiq"))
    wide.crossJoin(broadcast(psi))
      .select(col("n_a"), col("n_b"),
        expr("round(cast(psiq as double), 6)").as("psi_status"),
        expr("round(cast(sv_a as double) / cast(n_a as double), 6)")
          .as("mean_price_a"),
        expr("round(cast(sv_b as double) / cast(n_b as double), 6)")
          .as("mean_price_b"),
        expr("round((cast(sv_b as double) / cast(n_b as double)" +
          " - cast(sv_a as double) / cast(n_a as double))" +
          " / (cast(sv_a as double) / cast(n_a as double)) * 100.0, 6)")
          .as("mean_shift_pct"))
  }

  /** The shared QI balance band for the privacy audits: k-anonymity
    * and l-diversity must agree on what an equivalence class is by
    * construction. floor(bal/1000): identical IEEE division + floor
    * in both engines, then exact integers everywhere. */
  private def balBand: Column =
    floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band")

  /** T269: CONTRIBUTION-CAPPED aggregation — the bounded-sensitivity
    * preprocessing under every user-level differential-privacy or
    * robust-statistics release: before aggregating, each user
    * contributes at most k = 5 events (their FIRST five by time — the
    * deterministic cap that makes the statistic's user-sensitivity
    * bounded, so calibrated noise or trimmed estimators work
    * downstream). The panel reports raw vs capped count and revenue
    * per event type with the retained share — exactly the "how much
    * did the cap bite" audit a release pipeline prints. One
    * row_number window partitioned by user (user count bounds state),
    * then a map-side-combinable agg; money through DECIMAL(18,2) per
    * the hash rules. */
  def dqContributionCap(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id"), col("event_id"),
        col("ts"), col("value"))
    val ranked = ev.withColumn("rn", row_number().over(
      Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)))
    ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("raw_n"),
        sum(when(col("rn") <= 5, 1L).otherwise(0L)).as("capped_n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("raw_sum"),
        sum(when(col("rn") <= 5, col("value").cast("decimal(18,2)"))
          .otherwise(lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")))
          .cast("double").as("capped_sum"),
        round(sum(when(col("rn") <= 5, 1.0).otherwise(0.0))
          / count(lit(1)), 6).as("retained_frac"))
      .orderBy(col("event_type"))
  }

  /** T266: l-DIVERSITY audit — dq_kanon's standard companion: class
    * SIZE (k) says a row hides in a crowd, but if the whole crowd
    * shares one sensitive value the attribute still leaks. Classes =
    * (nation, account-balance band), sensitive = market segment;
    * l = distinct segments per class. The histogram of l (classes,
    * rows, row share) is the release-gate panel. Same shape as
    * dq_kanon: one hash-agg to classes (countDistinct folds
    * map-side), one tiny re-agg, one broadcast total. */
  def dqLdiversity(s: SparkSession, d: String): DataFrame = {
    val classes = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), balBand)
      .agg(countDistinct(col("c_mktsegment")).as("l"),
        count(lit(1)).as("class_size"))
    val tot = classes.agg(sum("class_size").as("n_total"))
    classes.groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .crossJoin(broadcast(tot))
      .select(col("l"), col("n_classes"), col("n_rows"),
        round(col("n_rows").cast("double")
          / col("n_total").cast("double"), 6).as("pct_rows"))
      .orderBy(col("l"))
  }

  /** T222: K-ANONYMITY audit over a quasi-identifier set — the privacy
    * gate a training corpus passes before release (Sweeney 2002): group
    * the table by the QI tuple (nation, market segment, account-balance
    * band), then report the equivalence-class-size HISTOGRAM. The
    * k-anonymity level is the smallest class_size row; the re-identifi-
    * cation risk mass is the pct_rows sitting in small classes. Two
    * map-side-combinable hash aggs (corpus → classes → histogram) plus
    * a broadcast 1-row total — nothing wider than the QI tuple
    * shuffles, and the histogram is bounded by max class size. The
    * balance band is the shared [[balBand]]. */
  def dqKanon(s: SparkSession, d: String): DataFrame = {
    val classes = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"), balBand)
      .agg(count(lit(1)).as("class_size"))
    val tot = classes.agg(sum("class_size").as("n_total"))
    classes.groupBy("class_size")
      .agg(count(lit(1)).as("n_classes"))
      .crossJoin(broadcast(tot))
      .select(col("class_size"),
        col("n_classes"),
        (col("class_size") * col("n_classes")).as("n_rows"),
        round((col("class_size") * col("n_classes")).cast("double")
          / col("n_total").cast("double"), 6).as("pct_rows"))
      .orderBy(col("class_size"))
  }

  /** T230: REFERENTIAL-INTEGRITY audit — orphan rates for the three
    * fact→dim foreign keys (lineitem→orders, lineitem→supplier,
    * orders→customer): the load-gate every warehouse runs after
    * ingest, and the check [[j06Anti]]'s incremental anti-join
    * pattern generalizes into a standing panel. Each FK is ONE scan:
    * LEFT join against the DISTINCT dim keys (distinct first, so a
    * duplicated dim key can never multiply fact rows) + a conditional
    * null count in the same aggregate — never a count scan plus a
    * separate anti-join scan. Exact integers; the rate rounds at 6dp.
    * A clean corpus reports zeros — that IS the expected production
    * readout; the operator's value is the alarm when it isn't. */
  def dqReferential(s: SparkSession, d: String): DataFrame = {
    def audit(name: String, fact: DataFrame, key: String,
        dim: DataFrame, dimKey: String): DataFrame =
      fact.join(dim.select(col(dimKey).as("dk")).distinct(),
          col(key) === col("dk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("dk").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_rows"), col("n_orphans"),
          round(col("n_orphans").cast("double")
            / col("n_rows").cast("double"), 6).as("orphan_rate"))
    audit("lineitem.l_orderkey", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey")
      .unionAll(audit("lineitem.l_suppkey", Tables.lineitem(s, d),
        "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
      .unionAll(audit("orders.o_custkey", Tables.orders(s, d),
        "o_custkey", Tables.customer(s, d), "c_custkey"))
      .orderBy("fk")
  }

  /** T231: FRESHNESS audit per event stream — how far each
    * event_type's newest event lags the newest event anywhere (the
    * "is this feed stale" monitor a streaming warehouse pages on;
    * lateness inside the stream is [[graft.streaming]]'s ev_lateness —
    * this is the cross-feed panel). One map-side-combinable agg to the
    * type panel + a broadcast 1-row global max; the lag is exact
    * integer MICROSECOND arithmetic floored to whole minutes, and the
    * timestamp pins to an ISO string (the hash-match date rule). */
  def dqFreshness(s: SparkSession, d: String): DataFrame = {
    val perType = Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("mx"))
    val glob = broadcast(perType.agg(max(col("mx")).as("gx")))
    perType.crossJoin(glob)
      .select(col("event_type"), col("n_events"),
        date_format(col("mx"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("last_seen"),
        expr("(unix_micros(gx) - unix_micros(mx)) div 60000000")
          .as("lag_min"))
      .orderBy("event_type")
  }

  /** T234: PRIMARY-KEY uniqueness audit — duplicate-key row counts for
    * the four tables whose keys every join in the catalog assumes
    * unique ([[dqReferential]]'s dual: that one checks the FK side,
    * this one the PK side). Each table is one map-side-combinable
    * aggregate (count + countDistinct — at scale the exact distinct
    * shuffles the key once; the audit runs per load, not per query);
    * dup rows = rows − distinct keys, exact integers. */
  def dqPkUnique(s: SparkSession, d: String): DataFrame = {
    def audit(table: String, df: DataFrame, key: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(key)).as("n_keys"))
        .select(lit(s"$table.$key").as("pk"), col("n_rows"),
          col("n_keys"), (col("n_rows") - col("n_keys")).as("n_dup_rows"))
    audit("customer", Tables.customer(s, d), "c_custkey")
      .unionAll(audit("documents", Tables.documents(s, d), "doc_id"))
      .unionAll(audit("events", Tables.events(s, d), "event_id"))
      .unionAll(audit("orders", Tables.orders(s, d), "o_orderkey"))
      .orderBy("pk")
  }

  /** T241: SEQUENCE-GAP detection over the purchase event-id stream —
    * the ingest-completeness audit ("did we drop a range") that a
    * plain count can't see. A global lag over the id order would be
    * one monolithic sort; instead consecutive pairs decompose exactly
    * into WITHIN-bucket pairs (id div 1000 buckets, keyed lag windows)
    * plus ADJACENT-bucket boundary pairs — and the boundary pass
    * RECURSES the same banding (round-9: the bucket summary lags
    * within `b div 1000` SUPER-buckets, then one final lag over the
    * super-bucket summary), so no window partition scales linearly
    * with the id span: level sizes are n, n/10³, n/10⁶. Bucket id
    * ranges are monotone in b, so min(mn)/max(mx) per super-bucket ARE
    * its first bucket's mn / last bucket's mx, and the three levels
    * together enumerate every consecutive pair of the global order
    * exactly once. Top-10 gaps by length; the total missing count
    * rides as a constant column derived from the bucket summary (no
    * extra corpus scan). All exact integers. */
  def dqSequenceGaps(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"))
      .withColumn("b", expr("id div 1000"))
    val wIn = Window.partitionBy("b").orderBy(col("id").asc)
    val intra = ids.withColumn("prev", lag(col("id"), 1).over(wIn))
      .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
      .select((col("prev") + 1).as("gap_start"),
        (col("id") - 1).as("gap_end"))
    val bs = ids.groupBy("b")
      .agg(min("id").as("mn"), max("id").as("mx"), count(lit(1)).as("n"))
      .withColumn("sb", expr("b div 1000"))
    val wInB = Window.partitionBy("sb").orderBy(col("b").asc)
    val crossB = bs.withColumn("pmx", lag(col("mx"), 1).over(wInB))
      .filter(col("pmx").isNotNull && col("mn") - col("pmx") > 1)
      .select((col("pmx") + 1).as("gap_start"),
        (col("mn") - 1).as("gap_end"))
    val sbs = bs.groupBy("sb")
      .agg(min("mn").as("mn"), max("mx").as("mx"), sum("n").as("n"))
    val wSb = Window.orderBy(col("sb").asc)
    val crossSb = sbs.withColumn("pmx", lag(col("mx"), 1).over(wSb))
      .filter(col("pmx").isNotNull && col("mn") - col("pmx") > 1)
      .select((col("pmx") + 1).as("gap_start"),
        (col("mn") - 1).as("gap_end"))
    val tot = broadcast(sbs
      .agg(min("mn").as("mn"), max("mx").as("mx"), sum("n").as("n"))
      .select((col("mx") - col("mn") + 1 - col("n")).as("n_missing")))
    intra.unionAll(crossB).unionAll(crossSb).crossJoin(tot)
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1).as("gap_len"),
        col("n_missing"))
      .orderBy(col("gap_len").desc, col("gap_start").asc)
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_skew" -> profileSkew _,
    "dq_sequence_gaps" -> dqSequenceGaps _,
    "dq_pk_unique" -> dqPkUnique _,
    "dq_freshness" -> dqFreshness _,
    "dq_referential" -> dqReferential _,
    "dq_kanon" -> dqKanon _,
    "dq_snapshot_drift" -> dqSnapshotDrift _,
    "dq_chisq" -> dqChisq _,
    "profile_topk" -> profileTopk _,
    "dq_iqr" -> dqIqrOutliers _,
    "dq_reconcile" -> dqReconcile _,
    "dq_fd" -> dqFd _,
    "dq_benford" -> dqBenford _,
    "profile_checksum" -> profileChecksum _,
    "profile_corr" -> profileCorr _,
    "profile_table" -> profileTable _,
    "profile_entropy" -> profileEntropy _,
    "dq_expectations" -> dqExpectations _,
    "dq_ldiversity" -> dqLdiversity _,
    "dq_contribution_cap" -> dqContributionCap _)

  val oracles: Map[String, String] = Map(
    // exact per-key counts, window-max top key with MIN(k) tie-break
    // (≡ the engine's struct-argmin), identical double expression and
    // 1e-6 rounding on both shares so the salting boolean agrees
    "profile_skew" ->
      """WITH census AS MATERIALIZED (
        |  SELECT 'events' AS table_name, 'event_type' AS key_col,
        |    CAST(event_type AS VARCHAR) AS k, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 3
        |  UNION ALL
        |  SELECT 'events', 'user_id', CAST(user_id AS VARCHAR),
        |    CAST(COUNT(*) AS BIGINT) FROM events GROUP BY 3
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey', CAST(l_orderkey AS VARCHAR),
        |    CAST(COUNT(*) AS BIGINT) FROM lineitem GROUP BY 3
        |  UNION ALL
        |  SELECT 'lineitem', 'l_suppkey', CAST(l_suppkey AS VARCHAR),
        |    CAST(COUNT(*) AS BIGINT) FROM lineitem GROUP BY 3
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey', CAST(o_custkey AS VARCHAR),
        |    CAST(COUNT(*) AS BIGINT) FROM orders GROUP BY 3),
        |stats AS (
        |  SELECT table_name, key_col, CAST(SUM(c) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(MAX(c) AS BIGINT) AS max_count
        |  FROM census GROUP BY 1, 2),
        |top AS (
        |  SELECT table_name, key_col, MIN(k) AS top_key FROM (
        |    SELECT table_name, key_col, k, c,
        |      MAX(c) OVER (PARTITION BY table_name, key_col) AS mc
        |    FROM census) WHERE c = mc GROUP BY 1, 2)
        |SELECT s.table_name, s.key_col, s.n_rows, s.n_keys,
        |  s.max_count, t.top_key,
        |  round(CAST(s.max_count AS DOUBLE)
        |    / CAST(s.n_rows AS DOUBLE), 6) AS max_share,
        |  round((CAST(s.max_count AS DOUBLE) * CAST(s.n_keys AS DOUBLE))
        |    / CAST(s.n_rows AS DOUBLE), 6) AS skew_ratio,
        |  round((CAST(s.max_count AS DOUBLE) * CAST(s.n_keys AS DOUBLE))
        |    / CAST(s.n_rows AS DOUBLE), 6) > 10.0 AS needs_salting
        |FROM stats s JOIN top t USING (table_name, key_col)
        |ORDER BY s.table_name, s.key_col""".stripMargin,
    // same parity split, exact DECIMAL money sums, 1e-9-quantized PSI
    // the plain global-lag statement of the same consecutive pairs
    // (provably equal to the engine's bucket decomposition)
    "dq_sequence_gaps" ->
      """WITH ids AS (
        |  SELECT event_id AS id FROM events
        |  WHERE event_type = 'purchase'),
        |g AS (SELECT lag(id) OVER (ORDER BY id) AS prev, id FROM ids),
        |gaps AS (
        |  SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
        |    CAST(id - 1 AS BIGINT) AS gap_end
        |  FROM g WHERE prev IS NOT NULL AND id - prev > 1),
        |tot AS (SELECT CAST(MAX(id) - MIN(id) + 1 - COUNT(*) AS BIGINT)
        |    AS n_missing FROM ids)
        |SELECT gap_start, gap_end,
        |  CAST(gap_end - gap_start + 1 AS BIGINT) AS gap_len,
        |  t.n_missing
        |FROM gaps, tot t
        |ORDER BY gap_len DESC, gap_start ASC LIMIT 10""".stripMargin,
    // one COUNT + COUNT(DISTINCT) aggregate per table
    "dq_pk_unique" ->
      """SELECT pk, n_rows, n_keys, n_rows - n_keys AS n_dup_rows
        |FROM (
        |  SELECT 'customer.c_custkey' AS pk,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys
        |  FROM customer
        |  UNION ALL
        |  SELECT 'documents.doc_id', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'events.event_id', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(DISTINCT event_id) AS BIGINT) FROM events
        |  UNION ALL
        |  SELECT 'orders.o_orderkey', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders)
        |ORDER BY pk""".stripMargin,
    // micros-exact lag floored to minutes; strftime pins the ISO string
    "dq_freshness" ->
      """WITH p AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MAX(ts) AS mx
        |  FROM events GROUP BY event_type),
        |g AS (SELECT MAX(mx) AS gx FROM p)
        |SELECT p.event_type, p.n_events,
        |  strftime(p.mx, '%Y-%m-%d %H:%M:%S.%f') AS last_seen,
        |  CAST((epoch_us(g.gx) - epoch_us(p.mx)) // 60000000 AS BIGINT)
        |    AS lag_min
        |FROM p, g ORDER BY p.event_type""".stripMargin,
    // same one-scan-per-FK left-join null counts
    "dq_referential" ->
      """SELECT fk, n_rows, n_orphans,
        |  round(CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS orphan_rate
        |FROM (
        |  SELECT 'lineitem.l_orderkey' AS fk,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN sp.s_suppkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT s_suppkey FROM supplier) sp
        |    ON l.l_suppkey = sp.s_suppkey
        |  UNION ALL
        |  SELECT 'orders.o_custkey', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM orders od LEFT JOIN
        |    (SELECT DISTINCT c_custkey FROM customer) c
        |    ON od.o_custkey = c.c_custkey)
        |ORDER BY fk""".stripMargin,
    // QI classes → class-size histogram; SUM/COUNT cast to BIGINT
    "dq_kanon" ->
      """WITH classes AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    CAST(COUNT(*) AS BIGINT) AS class_size
        |  FROM customer GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(SUM(class_size) AS BIGINT) AS n_total
        |        FROM classes)
        |SELECT class_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(class_size * COUNT(*) AS BIGINT) AS n_rows,
        |  round(CAST(class_size * COUNT(*) AS DOUBLE)
        |    / CAST(t.n_total AS DOUBLE), 6) AS pct_rows
        |FROM classes, tot t
        |GROUP BY class_size, t.n_total
        |ORDER BY class_size""".stripMargin,
    // terms over the status panel, one shared double tree
    "dq_snapshot_drift" ->
      """WITH ord AS MATERIALIZED (
        |  SELECT CAST(o_orderkey % 2 AS INTEGER) AS half, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders),
        |halves AS (
        |  SELECT half, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS sv
        |  FROM ord GROUP BY half),
        |wide AS (
        |  SELECT MAX(CASE WHEN half = 0 THEN n END) AS n_a,
        |    MAX(CASE WHEN half = 1 THEN n END) AS n_b,
        |    MAX(CASE WHEN half = 0 THEN sv END) AS sv_a,
        |    MAX(CASE WHEN half = 1 THEN sv END) AS sv_b
        |  FROM halves),
        |cells AS (
        |  SELECT o_orderstatus,
        |    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca,
        |    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM ord GROUP BY o_orderstatus),
        |terms AS (
        |  SELECT CAST(round(CASE WHEN pa * pb = 0 THEN 0.0
        |    ELSE (pa - pb) * ln(pa / pb) END, 9) AS DECIMAL(18,9))
        |    AS term
        |  FROM (
        |    SELECT CAST(ca AS DOUBLE) / CAST(wide.n_a AS DOUBLE) AS pa,
        |      CAST(cb AS DOUBLE) / CAST(wide.n_b AS DOUBLE) AS pb
        |    FROM cells, wide) p),
        |psi AS (SELECT SUM(term) AS psiq FROM terms)
        |SELECT n_a, n_b,
        |  round(CAST(psiq AS DOUBLE), 6) AS psi_status,
        |  round(CAST(sv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
        |    AS mean_price_a,
        |  round(CAST(sv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
        |    AS mean_price_b,
        |  round((CAST(sv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |    - CAST(sv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |    / (CAST(sv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) * 100.0, 6)
        |    AS mean_shift_pct
        |FROM wide, psi""".stripMargin,
    // same full-grid expectation algebra: marginals cross-joined, zero
    // cells kept, 1e-9-quantized terms, one final double tree
    "dq_chisq" ->
      """WITH obs AS MATERIALIZED (
        |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY source, lang),
        |rowt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS rt
        |  FROM documents GROUP BY source),
        |colt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS ctt
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS r,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS cdim
        |  FROM documents),
        |grid AS (
        |  SELECT rowt.rt, colt.ctt, COALESCE(obs.o, 0) AS o, tot.nn,
        |    tot.r, tot.cdim
        |  FROM rowt CROSS JOIN colt
        |  LEFT JOIN obs ON rowt.source = obs.source
        |    AND colt.lang = obs.lang
        |  CROSS JOIN tot),
        |terms AS (
        |  SELECT nn, r, cdim,
        |    CAST(round((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)
        |      * CAST(ctt AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)
        |      * CAST(ctt AS DOUBLE) / CAST(nn AS DOUBLE))
        |      / (CAST(rt AS DOUBLE) * CAST(ctt AS DOUBLE)
        |      / CAST(nn AS DOUBLE)), 9) AS DECIMAL(28,9)) AS term
        |  FROM grid),
        |agg AS (
        |  SELECT MAX(nn) AS n_docs, MAX(r) AS r, MAX(cdim) AS cdim,
        |    SUM(term) AS chi2q
        |  FROM terms)
        |SELECT n_docs, CAST(r AS INTEGER) AS n_sources,
        |  CAST(cdim AS INTEGER) AS n_langs,
        |  CAST((r - 1) * (cdim - 1) AS INTEGER) AS dof,
        |  round(CAST(chi2q AS DOUBLE), 6) AS chi2,
        |  round(sqrt(CAST(chi2q AS DOUBLE) / (CAST(n_docs AS DOUBLE)
        |    * CAST(least(r - 1, cdim - 1) AS DOUBLE))), 6) AS cramers_v
        |FROM agg""".stripMargin,
    "profile_topk" ->
      """WITH lt AS (
        |  SELECT 'lang' AS "column",
        |    CAST(row_number() OVER (ORDER BY n DESC, value ASC)
        |      AS INTEGER) AS rk,
        |    value, n
        |  FROM (SELECT lang AS value, COUNT(*) AS n
        |        FROM documents GROUP BY 1)),
        |st AS (
        |  SELECT 'source' AS "column",
        |    CAST(row_number() OVER (ORDER BY n DESC, value ASC)
        |      AS INTEGER) AS rk,
        |    value, n
        |  FROM (SELECT source AS value, COUNT(*) AS n
        |        FROM documents GROUP BY 1))
        |SELECT * FROM (
        |  SELECT * FROM lt WHERE rk <= 3
        |  UNION ALL SELECT * FROM st WHERE rk <= 3)
        |ORDER BY "column", rk""".stripMargin,
    "dq_iqr" ->
      """WITH po AS (
        |  SELECT round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25), 6) AS q1,
        |    round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75), 6) AS q3
        |  FROM orders),
        |pof AS (SELECT q1, q3,
        |    round(q1 - 1.5 * (q3 - q1), 6) AS lo,
        |    round(q3 + 1.5 * (q3 - q1), 6) AS hi FROM po),
        |oo AS (
        |  SELECT 'o_totalprice' AS "column", COUNT(*) AS n,
        |    MAX(f.q1) AS q1, MAX(f.q3) AS q3,
        |    MAX(f.lo) AS fence_lo, MAX(f.hi) AS fence_hi,
        |    CAST(SUM(CASE WHEN CAST(o_totalprice AS DOUBLE) < f.lo
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |    CAST(SUM(CASE WHEN CAST(o_totalprice AS DOUBLE) > f.hi
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        |  FROM orders, pof f),
        |pl AS (
        |  SELECT round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 6) AS q1,
        |    round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 6) AS q3
        |  FROM lineitem),
        |plf AS (SELECT q1, q3,
        |    round(q1 - 1.5 * (q3 - q1), 6) AS lo,
        |    round(q3 + 1.5 * (q3 - q1), 6) AS hi FROM pl),
        |ll AS (
        |  SELECT 'l_extendedprice' AS "column", COUNT(*) AS n,
        |    MAX(f.q1) AS q1, MAX(f.q3) AS q3,
        |    MAX(f.lo) AS fence_lo, MAX(f.hi) AS fence_hi,
        |    CAST(SUM(CASE WHEN CAST(l_extendedprice AS DOUBLE) < f.lo
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |    CAST(SUM(CASE WHEN CAST(l_extendedprice AS DOUBLE) > f.hi
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        |  FROM lineitem, plf f)
        |SELECT * FROM oo UNION ALL SELECT * FROM ll
        |ORDER BY "column"""".stripMargin,
    // same exact-cents recompute and mismatch classing
    "dq_reconcile" ->
      """WITH lt AS MATERIALIZED (
        |  SELECT l_orderkey,
        |    (SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |        AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
        |        AS BIGINT))
        |      * (100 + CAST(CAST(l_tax AS DECIMAL(18,2)) * 100
        |        AS BIGINT))) + 5000) // 10000 AS ltot_cents
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o.o_orderkey,
        |    CASE WHEN lt.ltot_cents IS NULL THEN NULL
        |      ELSE abs(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |          AS BIGINT)
        |        - lt.ltot_cents) END AS diff_cents
        |  FROM orders o LEFT JOIN lt ON lt.l_orderkey = o.o_orderkey),
        |c AS (
        |  SELECT CASE WHEN diff_cents IS NULL THEN 'missing_lines'
        |      WHEN diff_cents = 0 THEN 'exact'
        |      WHEN diff_cents < 100 THEN 'minor'
        |      ELSE 'major' END AS class,
        |    coalesce(diff_cents, 0) AS dc
        |  FROM j)
        |SELECT class, COUNT(*) AS n_orders,
        |  round(CAST(SUM(dc) AS DOUBLE) / 100.0, 2) AS sum_abs_diff
        |FROM c GROUP BY class ORDER BY class""".stripMargin,
    "dq_fd" -> {
      def p(name: String, tbl: String, lhs: String, rhs: String) =
        s"""SELECT '$name' AS fd,
           |  COUNT(*) AS n_groups,
           |  CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  round(CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END)
           |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           |    AS violation_rate,
           |  CAST(MAX(ndv) AS BIGINT) AS max_rhs_distinct
           |FROM (SELECT $lhs, COUNT(DISTINCT $rhs) AS ndv
           |      FROM $tbl GROUP BY $lhs)""".stripMargin
      Seq(
        p("nation_to_region", "nation", "n_nationkey", "n_regionkey"),
        p("partkey_to_brand", "part", "p_partkey", "p_brand"),
        p("custnation_to_segment", "customer",
          "c_nationkey", "c_mktsegment"),
        p("order_to_returnflag", "lineitem",
          "l_orderkey", "l_returnflag"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY fd")
    },
    // same decimal-string digit extraction; windowed SUM is HUGEINT in
    // DuckDB → cast; p_obs is an exact integer division, p_benford the
    // identical (1.0 + 1.0/d) expression tree rounded at 6
    "dq_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |    COUNT(*) AS n
        |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY 1)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / CAST(CAST(SUM(n) OVER () AS BIGINT)
        |    AS DOUBLE), 6) AS p_obs,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS p_benford,
        |  round(CAST(n AS DOUBLE) / CAST(CAST(SUM(n) OVER () AS BIGINT)
        |      AS DOUBLE)
        |    - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS excess
        |FROM d ORDER BY digit""".stripMargin,
    "profile_checksum" ->
      """WITH c AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    concat_ws('|', CAST(o_orderkey AS VARCHAR),
        |      CAST(o_custkey AS VARCHAR), o_orderstatus,
        |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        |      strftime(o_orderdate, '%Y-%m-%d')) AS cs
        |  FROM orders)
        |SELECT month, COUNT(*) AS n_rows,
        |  bit_xor(CAST(list_sum(list_transform(range(13), i ->
        |    CAST(strpos('0123456789abcdef',
        |      substr(md5(cs), CAST(i AS INTEGER) + 1, 1)) - 1 AS DOUBLE)
        |    * power(16.0, CAST(12 - i AS DOUBLE)))) AS BIGINT)) AS digest
        |FROM c GROUP BY month ORDER BY month""".stripMargin,
    // replayed row hash: the 13-nibble md5 integer (exact below 2^53)
    // xor-combined per month — order-independent on both engines
    // exact DECIMAL sufficient statistics → the same fixed double
    // expression tree per group; the round(…,6) is belt-and-braces
    "profile_corr" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
        |    CAST(l_discount AS DECIMAL(18,2)) AS disc
        |  FROM lineitem),
        |a AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(q) AS DOUBLE) AS sq,
        |    CAST(SUM(p) AS DOUBLE) AS sp,
        |    CAST(SUM(disc) AS DOUBLE) AS sd,
        |    CAST(SUM(q * q) AS DOUBLE) AS sqq,
        |    CAST(SUM(p * p) AS DOUBLE) AS spp,
        |    CAST(SUM(disc * disc) AS DOUBLE) AS sdd,
        |    CAST(SUM(q * p) AS DOUBLE) AS sqp,
        |    CAST(SUM(disc * p) AS DOUBLE) AS sdp
        |  FROM c GROUP BY 1)
        |SELECT l_returnflag, 'quantity' AS x_col,
        |  'extendedprice' AS y_col,
        |  round(CASE WHEN sqrt(n * sqq - sq * sq)
        |               * sqrt(n * spp - sp * sp) = 0 THEN NULL
        |    ELSE (n * sqp - sq * sp) /
        |      (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp))
        |    END, 6) AS r
        |FROM a
        |UNION ALL
        |SELECT l_returnflag, 'discount', 'extendedprice',
        |  round(CASE WHEN sqrt(n * sdd - sd * sd)
        |               * sqrt(n * spp - sp * sp) = 0 THEN NULL
        |    ELSE (n * sdp - sd * sp) /
        |      (sqrt(n * sdd - sd * sd) * sqrt(n * spp - sp * sp))
        |    END, 6)
        |FROM a
        |ORDER BY l_returnflag, x_col""".stripMargin,
    "profile_table" -> {
      val kmv = (c: String) =>
        s"""(SELECT round(CASE WHEN len(arr) < 64
           |    THEN CAST(len(arr) AS DOUBLE) ELSE 63.0 / arr[64] END, 6)
           | FROM (SELECT list_sort(list(DISTINCT frac)) AS arr FROM (
           |   SELECT list_sum(list_transform(range(13), i ->
           |     CAST(strpos('0123456789abcdef',
           |       substr(md5(u), CAST(i AS INTEGER) + 1, 1)) - 1 AS DOUBLE)
           |     * power(16.0, CAST(12 - i AS DOUBLE))))
           |     / 4503599627370496.0 AS frac
           |   FROM (SELECT DISTINCT CAST($c AS VARCHAR) AS u
           |         FROM orders WHERE $c IS NOT NULL))))""".stripMargin
      val row = (c: String) =>
        s"""SELECT '$c' AS col_name,
           |  (SELECT COUNT(*) FROM orders) AS n_rows,
           |  (SELECT COUNT(*) - COUNT($c) FROM orders) AS n_null,
           |  ${kmv(c)} AS n_distinct_est,
           |  (SELECT MIN(CAST($c AS VARCHAR)) FROM orders) AS min_s,
           |  (SELECT MAX(CAST($c AS VARCHAR)) FROM orders) AS max_s""".stripMargin
      Seq("o_orderstatus", "o_orderpriority", "o_custkey").map(row)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "profile_entropy" -> {
      val panel = (c: String) =>
        s"""SELECT '$c' AS column_name,
           |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
           |  round(CAST(SUM(CAST(floor(-(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
           |      * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
           |      * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           |    / 1000000000.0, 6) AS entropy,
           |  round(CAST(MAX(n) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 6)
           |    AS top_share
           |FROM (
           |  SELECT n, SUM(n) OVER () AS tot FROM (
           |    SELECT COUNT(*) AS n FROM orders GROUP BY $c))""".stripMargin
      s"""SELECT * FROM (
         |${panel("o_orderstatus")}
         |UNION ALL
         |${panel("o_orderpriority")})
         |ORDER BY column_name""".stripMargin
    },
    "dq_expectations" ->
      """WITH b AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
        |      OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(SUM(CASE WHEN l_discount IS NULL OR l_discount > 0.05
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |    CAST(SUM(CASE WHEN l_returnflag IS NULL
        |      OR l_returnflag NOT IN ('A', 'N', 'R')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v4,
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL
        |      OR l_shipdate < TIMESTAMP '1992-01-01'
        |      OR l_shipdate >= TIMESTAMP '1999-01-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v5,
        |    COUNT(DISTINCT (l_orderkey, l_linenumber)) AS nd
        |  FROM lineitem),
        |ri AS (
        |  SELECT COUNT(*) AS v6
        |  FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderkey IS NULL),
        |rules AS (
        |  SELECT 'r1_orderkey_not_null' AS rule, n AS n_checked,
        |    v1 AS n_violations FROM b
        |  UNION ALL SELECT 'r2_quantity_in_1_50', n, v2 FROM b
        |  UNION ALL SELECT 'r3_discount_le_5pct', n, v3 FROM b
        |  UNION ALL SELECT 'r4_returnflag_domain', n, v4 FROM b
        |  UNION ALL SELECT 'r5_shipdate_in_range', n, v5 FROM b
        |  UNION ALL SELECT 'r6_orderkey_in_orders', n, v6 FROM b, ri
        |  UNION ALL SELECT 'r7_line_pk_unique', n, n - nd FROM b)
        |SELECT rule, n_checked, n_violations,
        |  CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass
        |FROM rules ORDER BY rule""".stripMargin,
    "dq_ldiversity" ->
      """WITH classes AS (
        |  SELECT c_nationkey,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    COUNT(DISTINCT c_mktsegment) AS l,
        |    COUNT(*) AS class_size
        |  FROM customer GROUP BY 1, 2),
        |tot AS (SELECT SUM(class_size) AS n_total FROM classes)
        |SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(class_size) AS BIGINT) AS n_rows,
        |  round(CAST(SUM(class_size) AS DOUBLE)
        |    / (SELECT n_total FROM tot), 6) AS pct_rows
        |FROM classes GROUP BY l ORDER BY l""".stripMargin,
    // same row_number cap replayed; money through DECIMAL(18,2)
    "dq_contribution_cap" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS raw_n,
        |  CAST(SUM(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS capped_n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |    AS DOUBLE) AS raw_sum,
        |  CAST(CAST(SUM(CASE WHEN rn <= 5
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2))
        |    AS DOUBLE) AS capped_sum,
        |  round(CAST(SUM(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS retained_frac
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin)

}

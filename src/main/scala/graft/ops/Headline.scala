package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Headline analytical queries — multi-join aggregate shapes (the
  * classic warehouse patterns) over the testdata star schema. These are
  * the bench's representative "big" plans: fact-fact join, broadcast
  * dims, group-agg, top-k.
  */
object Headline {

  private def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Shipping-priority shape: filtered fact ⋈ fact ⋈ dim → group →
    * revenue top-10. */
  def q03Shipping(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1997-06-01").cast("date"))
    // No broadcast hint on customer: it scales with the corpus (unlike
    // nation/region's fixed 25/5 rows). AQE picks broadcast-vs-shuffle
    // from runtime stats — it still broadcasts at small SF, but won't
    // force an 8 GB+ driver broadcast at 100×.
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Local-supplier-volume shape: 5-way join through both fact sides of
    * nation (customer nation = supplier nation), group by nation. */
  def q05LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    // customer/supplier are SF-proportional: no forced broadcast (AQE
    // decides); nation/region are fixed-size dims: hint is always safe.
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey")
        && cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Top-customer shape: fact agg → broadcast-enrich → top-k (the
    * reverse order — aggregate FIRST, then join the small result to
    * dims — the plan that survives a 100× fact scale-up). */
  def q10TopCustomers(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("total_spend"),
        count(lit(1)).as("n_orders"))
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    // spend is already ≤|customer| rows post-agg; join it to the
    // SF-scaling customer without a forced hint (AQE decides), keep the
    // hint only on fixed-size nation.
    spend.join(cust, spend("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .select(col("o_custkey").as("custkey"), col("c_name"),
        col("n_name").as("nation"), col("total_spend"), col("n_orders"))
      .orderBy(col("total_spend").desc, col("custkey").asc)
      .limit(20)
  }

  /** Forecast-revenue shape: tight filtered single-table agg — the
    * pushdown/pruning showcase (one scalar out of a fact scan). */
  def q06Forecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date")
        && col("l_shipdate") < lit("1998-01-01").cast("date")
        && col("l_discount") >= 0.02 && col("l_discount") <= 0.06
        && col("l_quantity") < 24)
      .agg(sum(money(col("l_extendedprice")) * money(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Hierarchical rollup (beyond-reference breadth: Catalyst gives
    * ROLLUP/CUBE for free): per (returnflag, linestatus) with subtotal
    * and grand-total rows. */
  def a09Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS (beyond ROLLUP's prefix lattice): the
    * by-priority and by-status subtotals plus the grand total in ONE
    * pass — Catalyst expands the sets into a single Expand+Aggregate,
    * so the fact is scanned once however many panels the dashboard
    * asks for. grouping() flags (cast to int both engines) distinguish
    * subtotal NULLs from data NULLs; null ordering pinned NULLS FIRST
    * (DuckDB defaults NULLS LAST for ASC). */
  def a14GroupingSets(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    ord.groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("total"),
        grouping(col("o_orderpriority")).cast("int").as("gp"),
        grouping(col("o_orderstatus")).cast("int").as("gs"))
      .orderBy(col("gp"), col("gs"),
        col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  /** Exact linear-interpolation percentiles per group (the quantile
    * family the catalog otherwise lacks; Spark `percentile` ≡ DuckDB
    * `quantile_cont` — both sort-and-interpolate, so the oracle is a
    * hash match after rounding). At 100 TB exact percentiles need a
    * per-group sort; swap to `approx_percentile` (t-digest, no sort)
    * when error tolerance allows — same plan shape, sketch-based. */
  def a12Percentile(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)"), 6)
          .as("p50"),
        round(expr("percentile(CAST(o_totalprice AS DOUBLE), 0.95)"), 6)
          .as("p95"))
      .orderBy(col("o_orderpriority"))

  /** Large-volume-order shape (TPC-H Q18): the HAVING-driven semi
    * reduction — aggregate the fact once, keep the >300-quantity
    * orders, and only THOSE join back to the order/customer detail.
    * The big fact table is scanned once and aggregated with map-side
    * partials before any join; the survivor set (46 orders at sf0.01)
    * then drives broadcast-sized joins — the reduction-first ordering
    * a naive customer⋈orders⋈lineitem-then-filter plan would miss.
    * sum_qty is an exact DECIMAL sum (order-free cross-engine). */
  def q18BigOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    big.join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        money(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** Suppliers-who-kept-orders-waiting shape (TPC-H Q21, restated for
    * this schema: "late" = shipped more than 90 days after the order
    * date on a finished order). The classic formulation is a join +
    * EXISTS + NOT-EXISTS pair; the Spark-first plan computes both
    * existence tests from ONE aggregate over the joined fact — per
    * order, the distinct supplier count and the distinct LATE supplier
    * count — and keeps late rows whose order has ≥2 suppliers but
    * exactly one late one. The oracle replays the EXISTS/NOT-EXISTS
    * form, pinning the equivalence of the two formulations.
    *
    * 100 TB posture: one fact⋈orders join (both corpus-sized, shuffle
    * on the order key, every later agg/join reuses that key) — the
    * EXISTS pair would walk the fact table three times. */
  def q21Waiting(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l1 = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
    val per = l1.groupBy(col("l_orderkey")).agg(
      countDistinct(col("l_suppkey")).as("n_supp"),
      countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
    l1.filter(col("late"))
      .join(per.filter(col("n_supp") >= 2 && col("n_late_supp") === 1),
        Seq("l_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  /** Promotion-revenue-share shape (TPC-H Q14): one month of shipped
    * lines ⋈ part, the PROMO share as a conditional-sum ratio. Both
    * sums are exact DECIMAL (order-free), the percentage is one fixed
    * double expression over the two exact sums; the date filter
    * reaches the parquet scan. Part is corpus-scaled, so its join
    * stays AQE's choice (broadcast here, shuffle at 100×). */
  def q14Promo(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
    val rev = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    li.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)).as("promo"),
        sum(rev).as("total"),
        count(lit(1)).as("n_lines"))
      .select(
        round(lit(100.0) * col("promo").cast("double") /
          col("total").cast("double"), 6).as("promo_pct"),
        col("total").cast("double").as("total_revenue"),
        col("n_lines"))
  }

  /** Bracketed-predicate shape (TPC-H Q19): an OR of three
    * brand/size/quantity conjunct brackets over lineitem ⋈ part — the
    * classic test that a disjunctive residual predicate still leaves
    * the per-table conjuncts (quantity range, size range) pushable and
    * the join itself on the pure equi-key. Exact DECIMAL revenue. */
  def q19Brackets(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val bracket =
      (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#19" && col("p_size").between(1, 20) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#5" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    li.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .agg(
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_promo"     -> q14Promo _,
    "q19_brackets"  -> q19Brackets _,
    "q18_bigorders" -> q18BigOrders _,
    "q21_waiting"   -> q21Waiting _,
    "a14_groupingsets" -> a14GroupingSets _,
    "a12_percentile" -> a12Percentile _,
    "q03_shipping"  -> q03Shipping _,
    "q05_localsupp" -> q05LocalSupplier _,
    "q06_forecast"  -> q06Forecast _,
    "q10_topcust"   -> q10TopCustomers _,
    "a09_rollup"    -> a09Rollup _)

  val oracles: Map[String, String] = Map(
    "q14_promo" ->
      """SELECT
        |  round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
        |    AS promo_pct,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS total_revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,
    "q19_brackets" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 20
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q18_bigorders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |    AS o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM (SELECT l_orderkey,
        |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |      FROM lineitem GROUP BY 1
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) b
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    // the classic EXISTS / NOT-EXISTS formulation — the engine's
    // single-aggregate restatement must coincide with it exactly
    "q21_waiting" ->
      """WITH l1 AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'),
        |w AS (
        |  SELECT a.l_orderkey, a.l_suppkey
        |  FROM l1 a
        |  WHERE a.late
        |    AND EXISTS (SELECT 1 FROM l1 b
        |      WHERE b.l_orderkey = a.l_orderkey
        |        AND b.l_suppkey <> a.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM l1 c
        |      WHERE c.l_orderkey = a.l_orderkey
        |        AND c.l_suppkey <> a.l_suppkey AND c.late))
        |SELECT s.s_name, COUNT(*) AS numwait
        |FROM w JOIN supplier s ON w.l_suppkey = s.s_suppkey
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "a14_groupingsets" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS gp,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS gs
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY gp, gs, o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin,
    "a12_percentile" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 6) AS p50,
        |  round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.95), 6) AS p95
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q06_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "a09_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS n_lines
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q03_shipping" ->
      """SELECT l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |  o.o_orderpriority,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l.l_shipdate > DATE '1997-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10""".stripMargin,
    "q05_localsupp" ->
      """SELECT n.n_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n.n_name ASC""".stripMargin,
    "q10_topcust" ->
      """SELECT o.o_custkey AS custkey, c.c_name, n.n_name AS nation,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_spend,
        |  COUNT(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1, 2, 3
        |ORDER BY total_spend DESC, custkey ASC LIMIT 20""".stripMargin)
}

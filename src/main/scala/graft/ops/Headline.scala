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

  /** Min-cost-supplier shape (TPC-H Q2, restated — this schema has no
    * partsupp, so the part↔supplier price relation is derived from
    * lineitem): for each small BOLT-family part, the supplier that has
    * shipped it cheapest. The correlated `MIN(cost) WHERE partkey = ...`
    * subquery of the classic SQL becomes a per-(part,supplier) aggregate
    * followed by an argmin collapse — `min(struct(cost, suppkey))` is a
    * lexicographic struct-min, so the per-part winner is ONE hash
    * aggregate (no window sort, ties pinned by suppkey) and only the
    * winner set (≤|part| rows) joins back to supplier/nation.
    *
    * 100 TB posture: the fact is touched once; both aggregates are
    * map-side-combinable on shrinking key spaces (part×supplier → part);
    * the join-back is dimension-sized. The classic correlated form would
    * rescan the fact per probe. */
  def q02MinCost(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_size") < 15 && col("p_name").endsWith("bolt"))
      .select(col("p_partkey"), col("p_name"), col("p_size"))
    val perPs = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(money(col("l_extendedprice"))).as("cost"))
    val best = perPs
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("cost"), col("l_suppkey"))).as("b"))
      .select(col("l_partkey"), col("b.cost").as("cost"),
        col("b.l_suppkey").as("l_suppkey"))
    best.join(parts, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey").as("partkey"), col("p_name"), col("p_size"),
        col("s_name"), col("n_name").as("nation"),
        col("cost").cast("double").as("min_cost"))
      .orderBy(col("min_cost").asc, col("partkey").asc)
      .limit(100)
  }

  /** Nation-pair trade-volume shape (TPC-H Q7): revenue shipped between
    * two nations in either direction, by (supplier nation, customer
    * nation, ship year). Both nation copies are fixed-size broadcast
    * dims; the nation filter applies to the joined pair, and the only
    * corpus-sized shuffle is lineitem⋈orders on the order key. */
  def q07Volume(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val pair = (col("supp_nation") === "NATION_1" &&
        col("cust_nation") === "NATION_2") ||
      (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter(pair)
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Market-share shape (TPC-H Q8): NATION_6's share of ECONOMY-part
    * revenue delivered into AMERICA, per order year. The share is a
    * conditional-sum ratio over ONE aggregate — numerator and
    * denominator are exact DECIMAL sums from the same pass, the division
    * is one double op on the 2-digit year panel (order-free
    * cross-engine). Supplier nation drives the numerator flag; customer
    * region drives the filter. */
  def q08Share(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
    val amer = nat
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nkey"))
    val supNat = nat.select(col("n_nationkey").as("s_nkey"),
      col("n_name").as("supp_nation"))
    val rev = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(amer), col("c_nationkey") === col("c_nkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supNat), col("s_nationkey") === col("s_nkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_6", rev)).as("nation_rev"),
        sum(rev).as("total_rev"))
      .select(col("o_year"),
        round(coalesce(col("nation_rev"), lit(0)).cast("double") /
          col("total_rev").cast("double"), 6).as("mkt_share"),
        col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("o_year"))
  }

  /** Product-profit shape (TPC-H Q9, restated — no partsupp supplycost,
    * so cost = 20% of retail price × quantity): profit on "red" parts by
    * (supplier nation, order year). Revenue and gross cost accumulate as
    * TWO exact DECIMAL sums in one aggregate (order-free cross-engine);
    * the 0.2 factor and the subtraction happen once per output group in
    * double — a three-factor decimal product would overflow the 38-digit
    * decimal grid differently per engine, so the scalar factor stays out
    * of the sum. The part filter prunes the fact early (semi-reduction
    * through the join), nation is broadcast. */
  def q09Profit(s: SparkSession, d: String): DataFrame = {
    val rev = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    val grossCost = money(col("p_retailprice")) * money(col("l_quantity"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").startsWith("red")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(rev).as("r"), sum(grossCost).as("c"), count(lit(1)).as("n_lines"))
      .select(col("nation"), col("o_year"),
        round(col("r").cast("double") - lit(0.2) * col("c").cast("double"), 6)
          .as("profit"),
        col("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Order-priority-checking shape (TPC-H Q4, restated for this schema:
    * "late" = a line shipped more than 60 days after the order date):
    * one quarter of orders, count per priority of those with ≥1 late
    * line. EXISTS becomes a LEFT SEMI join with a non-equi residual —
    * the equi key (order key) still drives the shuffle, the date
    * comparison rides as the residual condition, and the semi form never
    * duplicates an order however many late lines it has. */
  def q04Priority(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, ord("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Important-stock shape (TPC-H Q11): parts whose total revenue
    * exceeds a fixed fraction (1/1500) of the global total. The scalar
    * subquery becomes a 1-row broadcast joined to the per-part
    * aggregate; the threshold compare is exact-DECIMAL
    * (`value × 10000 > total`) so no double boundary can flip a row
    * between engines. The fact is scanned once; the global total reuses
    * the per-part aggregate (sum of sums), not a second scan. */
  def q11Important(s: SparkSession, d: String): DataFrame = {
    val per = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(money(col("l_extendedprice"))).as("value"))
    val tot = per.agg(sum(col("value")).as("tot"))
    per.join(broadcast(tot))
      .filter(col("value") * lit(1500) > col("tot"))
      .select(col("l_partkey").as("partkey"),
        col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("partkey").asc)
  }

  /** Shipping-priority-split shape (TPC-H Q12, restated — this schema
    * has no ship mode, so the split dimension is the priority class):
    * one ship-year of lines joined to orders, and per class
    * (high = 1-URGENT/2-HIGH, low = rest) the late vs on-time line
    * counts as TWO conditional sums in ONE aggregate — the
    * two-flag-columns-from-one-pass shape. The date filter reaches the
    * lineitem scan; "late" = shipped >30 days after the order date. */
  def q12Priority(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date"))
    val late = col("l_shipdate") >
      col("o_orderdate") + expr("INTERVAL 30 DAYS")
    li.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .withColumn("prio_class",
        when(col("o_orderpriority").startsWith("1-") ||
          col("o_orderpriority").startsWith("2-"), "high").otherwise("low"))
      .groupBy(col("prio_class"))
      .agg(sum(when(late, 1L).otherwise(0L)).as("late_lines"),
        sum(when(late, 0L).otherwise(1L)).as("ontime_lines"))
      .orderBy(col("prio_class"))
  }

  /** Customer-order-count distribution shape (TPC-H Q13): LEFT join
    * customers to their non-urgent orders, count per customer (zero
    * included), then the histogram of those counts. Two aggregates: the
    * first shuffles on the corpus-sized customer key, the second
    * collapses onto the tiny count domain (map-side combinable). */
  def q13CustDist(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(!col("o_orderpriority").startsWith("1-"))
      .select(col("o_custkey"))
    val per = Tables.customer(s, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
    per.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Top-supplier shape (TPC-H Q15): quarterly revenue per supplier,
    * keep the maximum (ties all kept, as the classic view formulation
    * does). The scalar-subquery MAX is a 1-row broadcast join against
    * the same aggregate (no rescan); revenue equality is exact-DECIMAL
    * so the tie set is identical cross-engine. */
  def q15TopSupp(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-04-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    rev.join(broadcast(mx), col("total_rev") === col("mx"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey").as("suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("suppkey"))
  }

  /** Parts-supplier-relationship shape (TPC-H Q16): distinct supplier
    * count per (brand, type, size) slice, with an excluded brand and a
    * supplier blacklist anti-join. The part↔supplier relation derives
    * from lineitem; the anti-join removes blacklisted suppliers BEFORE
    * the distinct count so the expensive countDistinct runs on the
    * pruned pair set. */
  def q16PartSupp(s: SparkSession, d: String): DataFrame = {
    val badSup = Tables.supplier(s, d)
      .filter(col("s_name").contains("7")).select(col("s_suppkey"))
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#13" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29))
    // badSup scales with supplier (SF-proportional): no forced
    // broadcast — AQE picks broadcast-anti at this SF from runtime stats
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(badSup, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Small-quantity-order revenue shape (TPC-H Q17): lines of one
    * brand's small parts whose quantity is below 20% of that part's
    * corpus-wide average. The correlated per-part AVG becomes a per-part
    * aggregate joined back; the threshold compare is the integer-free
    * restatement `5·qty·n < Σqty` in exact DECIMAL — an FP average at
    * the comparison boundary could flip rows between engines, the exact
    * form cannot. The per-part stats aggregate is corpus-wide but
    * map-side combinable on the part key. */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val stats = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("sp_partkey"))
      .agg(sum(money(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_q"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d)
        .filter(col("p_brand") === "Brand#13" && col("p_size") <= 5),
        col("l_partkey") === col("p_partkey"))
      .join(stats, col("l_partkey") === col("sp_partkey"))
      .filter(money(col("l_quantity")) * lit(5) * col("n_q") < col("sum_qty"))
      .agg(sum(money(col("l_extendedprice"))).as("total"),
        count(lit(1)).as("n_lines"))
      .select(round(col("total").cast("double") / 7.0, 6).as("avg_yearly"),
        col("n_lines"))
  }

  /** Excess-inventory supplier shape (TPC-H Q20, restated): suppliers
    * who shipped more than 400 units of "small" parts during 1997. The
    * nested-IN chain becomes part-prefilter → per-supplier aggregate →
    * HAVING → LEFT SEMI back to supplier — each step shrinks the key
    * space before the next join, and the supplier table is never
    * scanned per candidate. */
  def q20Excess(s: SparkSession, d: String): DataFrame = {
    val smallParts = Tables.part(s, d)
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val heavy = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(money(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 400)
    Tables.supplier(s, d)
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("suppkey"), col("s_name"),
        col("n_name").as("nation"))
      .orderBy(col("suppkey"))
  }

  /** Idle-rich-customer shape (TPC-H Q22, restated: "idle" = no order
    * since 2000-01-01): per nation, customers with above-average
    * (positive) account balance and no recent orders. The scalar AVG
    * subquery is a 1-row broadcast; the compare is the exact-DECIMAL
    * restatement `bal·cnt > Σbal` (no FP boundary); the "no recent
    * orders" test is one LEFT ANTI join against the date-filtered order
    * set (the date predicate is pushed to the orders scan BEFORE the
    * anti-join shuffles anything). */
  def q22Idle(s: SparkSession, d: String): DataFrame = {
    val stats = Tables.customer(s, d)
      .filter(col("c_acctbal") > 0.0)
      .agg(sum(money(col("c_acctbal"))).as("tot"), count(lit(1)).as("cnt"))
    val rich = Tables.customer(s, d)
      .join(broadcast(stats))
      .filter(money(col("c_acctbal")) * col("cnt") > col("tot"))
    rich
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("numcust"),
        sum(money(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("nation"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q02_mincost"   -> q02MinCost _,
    "q04_priority"  -> q04Priority _,
    "q07_volume"    -> q07Volume _,
    "q08_share"     -> q08Share _,
    "q09_profit"    -> q09Profit _,
    "q11_important" -> q11Important _,
    "q12_priority"  -> q12Priority _,
    "q13_custdist"  -> q13CustDist _,
    "q15_topsupp"   -> q15TopSupp _,
    "q16_partsupp"  -> q16PartSupp _,
    "q17_smallqty"  -> q17SmallQty _,
    "q20_excess"    -> q20Excess _,
    "q22_idle"      -> q22Idle _,
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
    // classic correlated-MIN formulation; the engine's argmin collapse
    // must coincide with the window keep-first exactly (ties by suppkey)
    "q02_mincost" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |best AS (
        |  SELECT l_partkey, cost, l_suppkey,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY cost, l_suppkey) AS rn
        |  FROM ps)
        |SELECT p.p_partkey AS partkey, p.p_name, p.p_size, s.s_name,
        |  n.n_name AS nation, CAST(b.cost AS DOUBLE) AS min_cost
        |FROM best b
        |JOIN part p ON b.l_partkey = p.p_partkey
        |JOIN supplier s ON b.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE b.rn = 1 AND p.p_size < 15 AND p.p_name LIKE '%bolt'
        |ORDER BY min_cost ASC, partkey ASC LIMIT 100""".stripMargin,
    // classic EXISTS formulation — the engine's LEFT SEMI restatement
    // must coincide with it
    "q04_priority" ->
      """SELECT o.o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // classic scalar-subquery HAVING formulation
    "q11_important" ->
      """SELECT l_partkey AS partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS value
        |FROM lineitem
        |GROUP BY 1
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 1500 >
        |  (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |   FROM lineitem)
        |ORDER BY value DESC, partkey ASC""".stripMargin,
    "q12_priority" ->
      """SELECT CASE WHEN o.o_orderpriority LIKE '1-%'
        |         OR o.o_orderpriority LIKE '2-%'
        |       THEN 'high' ELSE 'low' END AS prio_class,
        |  CAST(SUM(CASE WHEN l.l_shipdate >
        |      o.o_orderdate + INTERVAL 30 DAY THEN 1 ELSE 0 END)
        |    AS BIGINT) AS late_lines,
        |  CAST(SUM(CASE WHEN l.l_shipdate >
        |      o.o_orderdate + INTERVAL 30 DAY THEN 0 ELSE 1 END)
        |    AS BIGINT) AS ontime_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= DATE '1997-01-01'
        |  AND l.l_shipdate < DATE '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
        |      FROM customer c
        |      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |        AND o.o_orderpriority NOT LIKE '1-%'
        |      GROUP BY 1)
        |GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // the classic CREATE-VIEW + scalar MAX formulation
    "q15_topsupp" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1997-01-01'
        |    AND l_shipdate < DATE '1997-04-01'
        |  GROUP BY 1)
        |SELECT s.s_suppkey AS suppkey, s.s_name,
        |  CAST(r.total_rev AS DOUBLE) AS total_rev
        |FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_rev = (SELECT MAX(total_rev) FROM r)
        |ORDER BY suppkey""".stripMargin,
    "q16_partsupp" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#13'
        |  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29)
        |  AND l.l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // the classic correlated 0.2*AVG formulation, restated exactly as
    // the engine's integer-free 5·qty·n < Σqty compare
    "q17_smallqty" ->
      """WITH s AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    COUNT(*) AS n_q
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0, 6) AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN s ON l.l_partkey = s.l_partkey
        |WHERE p.p_brand = 'Brand#13' AND p.p_size <= 5
        |  AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * s.n_q < s.sum_qty""".stripMargin,
    // the classic nested-IN formulation
    "q20_excess" ->
      """SELECT s.s_suppkey AS suppkey, s.s_name, n.n_name AS nation
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s.s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |    AND l_shipdate >= DATE '1997-01-01'
        |    AND l_shipdate < DATE '1998-01-01'
        |  GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 400)
        |ORDER BY suppkey""".stripMargin,
    // the classic scalar-AVG + NOT-EXISTS formulation, with the exact
    // bal·cnt > Σbal compare replayed
    "q22_idle" ->
      """WITH st AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tot,
        |    COUNT(*) AS cnt
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT n.n_name AS nation, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |CROSS JOIN st
        |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * st.cnt > st.tot
        |  AND NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |       AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q08_share" ->
      """SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |  round(CAST(coalesce(SUM(CASE WHEN n1.n_name = 'NATION_6'
        |      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END), 0) AS DOUBLE)
        |    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
        |    AS mkt_share,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS total_rev
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |JOIN region r ON n2.n_regionkey = r.r_regionkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_profit" ->
      """SELECT n.n_name AS nation,
        |  CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |  round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    - 0.2 * CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2)) *
        |      CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS profit,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_name LIKE 'red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
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

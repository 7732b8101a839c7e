package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator catalog over the TESTDATA tables.
  *
  * Each entry re-expresses one operator family from SURVEY.md §2 (the
  * reference's BigQuery/ES/pandas relational surface) as an idiomatic
  * Spark DataFrame plan, paired with an ANSI-SQL oracle in
  * [[CoreRelational.oracles]] for the DuckDB correctness gate.
  *
  * Conventions (hash-match safety, see Verify):
  *  - money aggregates go through decimal(18,2) for exact arithmetic,
  *    then cast to double so both engines emit identical values+schema;
  *  - every query ends with a total ORDER BY over a unique key (Catalyst
  *    drops the sort under count(), so bench cost is unaffected);
  *  - DuckDB integer SUM/year() are cast to match Spark's bigint/int.
  *
  * Scale notes: fact tables (lineitem/orders) are only ever joined to
  * dims via broadcast hints; aggregations are partial+final hash aggs;
  * no collect()s. At 100 TB the same plans hold: dims stay broadcast,
  * facts shuffle only on their agg/join keys.
  */
object CoreRelational {

  private def money(c: Column): Column = c.cast("decimal(18,2)")

  /** P1+A: flagship-style agg — pricing summary over lineitem
    * (mirrors the reference's master-table aggregation shape). */
  def q01Pricing(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit("1998-09-01").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** P1: projection + rename (contributions.sql `other_id AS source`). */
  def p01Project(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        col("l_partkey").as("part_id"),
        col("l_extendedprice").as("price"))
      .orderBy(col("order_id"), col("line_no"))

  /** P2: classification predicate algebra — substring prefix tests,
    * LIKE, NOT(... AND ...), null guards (contributions.sql:6-61). */
  def p02Classify(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(
        !(substring(col("o_orderpriority"), 1, 1).isin("4", "5")
          && !col("o_orderpriority").isin("4-NOT SPECIFIED"))
          && col("o_orderstatus").like("%O%")
          && col("o_custkey").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** P3: memo-row exclusion — derived nullable column, IS NULL filter. */
  def p03NullFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("memo_cd",
        when(col("l_returnflag") === "R", lit("M")))
      .filter(col("memo_cd").isNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** P4: exists / not-exists membership filter (the reference's
    * `context.last_graphed IS NULL` work-selection pattern): customers
    * that have never placed an URGENT order, via a LEFT ANTI
    * membership probe — the NOT EXISTS plan shape (no payload from the
    * probe side, one shuffle, null-safe unlike NOT IN; the probe's
    * filter pushes to its scan). */
  def p04Exists(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** P6: range filter over a timestamp (ES `last_indexed > now-1d`). */
  def p06Range(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("o_orderkey"))

  /** P7: ids filter (`isin` against a key list). */
  def p07Ids(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** J1: fact × two broadcast dims, left joins (contributions enrich). */
  def j01Enrich(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val prt = Tables.part(s, d)
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left")
      .join(broadcast(prt), li("l_partkey") === prt("p_partkey"), "left")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("s_name").as("supplier_name"),
        col("p_name").as("part_name"),
        col("p_brand").as("brand"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** J3: same dim joined twice under aliases (cm22 as source AND target):
    * nation looked up for the customer side and the supplier side. */
  def j03SelfDim(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val cNat = Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val sNat = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left")
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"), "left")
      .join(broadcast(cNat), col("c_nationkey") === col("cn_key"), "left")
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left")
      .join(broadcast(sNat), col("s_nationkey") === col("sn_key"), "left")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("cust_nation"), col("supp_nation"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** J5: left join against a restricted dim + IFNULL-style coalescing of
    * the missing side (expenditures master-table union enrich). */
  def j05Coalesce(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val bigParts = Tables.part(s, d).filter(col("p_size") > 25)
    li.join(broadcast(bigParts), li("l_partkey") === bigParts("p_partkey"), "left")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("p_name"), lit("UNKNOWN")).as("part_name"),
        coalesce(col("p_retailprice"), col("l_extendedprice")).as("eff_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** J6: incremental anti-join — "rows not yet loaded" (LEFT ANTI on the
    * progress key-set; the LIMIT batching of the reference dissolves). */
  def j06Anti(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val loaded = ord.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("loaded_key"))
    ord.join(loaded, ord("o_orderkey") === loaded("loaded_key"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** J10/J13: membership check as LEFT SEMI (registry lookups). */
  def j10Semi(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 200000.0)
    cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** J9: FULL OUTER merge of two per-key summaries (AllSides ⟗ MBFC). */
  def j09FullOuter(s: SparkSession, d: String): DataFrame = {
    val cBy = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_customers"))
    val sBy = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_suppliers"))
    cBy.join(sBy, Seq("nk"), "outer")
      .select(col("nk").as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(col("nationkey"))
  }

  /** J11: theta (non-equi) join — fact bucketed against a tiny bound
    * table (broadcast nested loop; the only sane physical plan, same as
    * the reference's Domain⟗Source containment match). */
  def j11Theta(s: SparkSession, d: String): DataFrame = {
    val buckets = Tables.region(s, d).select(
      col("r_regionkey").cast("int").as("bucket_id"),
      (col("r_regionkey") * 10).cast("double").as("lo"),
      ((col("r_regionkey") + 1) * 10).cast("double").as("hi"))
    val li = Tables.lineitem(s, d)
    li.join(broadcast(buckets),
        li("l_quantity") >= buckets("lo") && li("l_quantity") < buckets("hi"),
        "inner")
      .groupBy(col("bucket_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("double").as("sum_qty"))
      .orderBy(col("bucket_id"))
  }

  /** A1: SELECT DISTINCT over several columns (master-table dedup). */
  def a01Distinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).as("ship_year"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("ship_year"))

  /** A2: keep-oldest-per-group via row_number window (article dedup). */
  def a02KeepOldest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_order_date"))
      .orderBy(col("o_custkey"))
  }

  /** A3: group into sorted arrays (linkage fan-out collect_list).
    * The list rides the compare as a joined string — the driver's
    * pandas canonicalizer cannot sort raw array cells. */
  def a03CollectList(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 20)
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",",
        sort_array(collect_list(col("o_orderkey")))).as("order_keys"))
      .orderBy(col("o_custkey"))

  /** A6: min/max cursor maintenance per key (tweet id cursors). */
  def a06MinMax(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))

  /** A8: day-range expansion via explode(sequence(...)) (ad delivery). */
  def a08DayExplode(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"),
        explode(sequence(
          col("o_orderdate").cast("date"),
          date_add(col("o_orderdate").cast("date"), 2),
          expr("interval 1 day"))).as("d"))
      .select(col("o_orderkey"), date_format(col("d"), "yyyy-MM-dd").as("day"))
      .orderBy(col("o_orderkey"), col("day"))

  /** J7: linkage fan-out — per key, the deduped related records rolled
    * into one sorted digest (collect_list after key-dedup; the digest
    * string keeps the array comparable across engines). */
  def j07Linkage(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .dropDuplicates("o_orderkey")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        concat_ws(";", sort_array(collect_list(concat_ws(":",
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd"))))).as("linkages"))
      .orderBy(col("o_custkey"))

  /** J8: hydration join — explode per-row reference list (a tagged
    * union of id kinds), resolve each against its broadcast dimension
    * (tweet author/referenced-tweet hydration vs `includes`). */
  /** T247: SALTED hot-key join — [[SkewJoin.saltedJoin]] as a catalog
    * entry (the companion to [[profileSkew]]'s salting flag: this is
    * what you switch ON when the flag fires). The big side's salt
    * spreads every hot user over 8 tasks; the dim side replicates 8×;
    * the (key, salt) equi-join then re-aggregates — and the RESULT is
    * provably identical to the plain join, which is exactly what the
    * oracle replays (the salt is invisible to semantics, the catalog
    * row proves it stays that way). Deterministic salt (xxhash64 of
    * the unique event id), so the plan itself is reproducible. */
  def j14SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"))
    val dim = Tables.customer(s, d)
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    SkewJoin.saltedJoin(ev, dim, "user_id", "event_id", 8)
      .groupBy("segment")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("segment")
  }

  def j08Hydrate(s: SparkSession, d: String): DataFrame = {
    val refs = Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(array(
          struct(lit("part").as("ref_type"), col("l_partkey").as("ref_id")),
          struct(lit("supp").as("ref_type"), col("l_suppkey").as("ref_id"))))
          .as("r"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("r.ref_type"), col("r.ref_id"))
    val part = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
    refs
      .join(broadcast(part),
        col("ref_type") === "part" && col("ref_id") === col("p_partkey"), "left")
      .join(broadcast(sup),
        col("ref_type") === "supp" && col("ref_id") === col("s_suppkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("ref_type"),
        col("ref_id"), coalesce(col("p_name"), col("s_name")).as("ref_name"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("ref_type"))
  }

  /** O1/O2: top-k with deterministic tiebreak (staleness top-k). */
  def o01TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** O7: deterministic pseudo-random sample — ORDER BY md5(key) LIMIT n
    * (cross-engine-stable stand-in for ORDER BY rand()). */
  def o07Sample(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .orderBy(md5(col("c_custkey").cast("string")).asc, col("c_custkey").asc)
      .limit(50)
      .select(col("c_custkey"), col("c_name"))

  /** O5 + G8: amendment replay — newest filing per key wins (max_by on
    * the (date, id) changelog order; one hash-agg, no window sort). */
  def o05Amendment(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max_by(
        struct(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od")),
        struct(col("o_orderdate"), col("o_orderkey"))).as("last"))
      .select(col("o_custkey"),
        col("last.o_orderkey").as("latest_order"),
        col("last.od").as("latest_date"))
      .orderBy(col("o_custkey"))

  /** U1 + A1: SELECT DISTINCT over a UNION ALL (master-table dedup). */
  def u01UnionDistinct(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d)
      .select(col("o_custkey").as("key"), lit("ord").as("src"))
    val b = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("key"), lit("li").as("src"))
    a.unionByName(b).distinct().orderBy(col("key"), col("src"))
  }

  /** P10: domain-blacklist + empty-value guard filter. */
  def p10Blacklist(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(!col("source").isin("src1", "src7", "src13")
        && col("source").isNotNull && col("source") =!= "")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** P8: ES bool-should with minimum_should_match=1 — keep rows where
    * at least one of two optional signals is present. */
  def p08BoolShould(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(get_json_object(col("props"), "$.k").isNotNull
        || col("event_type") === "click")
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id"))

  /** P12: containment guard — the "article url must contain its domain"
    * rule as a substring predicate. */
  def p12ContainsGuard(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").contains("the") && col("source") =!= "")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** G7: the reified + shortcut double-edge pattern under MERGE
    * semantics — Donor→Contribution→Committee plus the direct
    * Donor→Committee shortcut, key-deduped exactly like the batched
    * Cypher MERGE (`dropDuplicates` on the edge key). */
  def g07ReifiedEdges(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val reified1 = ord.select(
      concat(lit("donor:"), col("o_custkey")).as("src"),
      concat(lit("contrib:"), col("o_orderkey")).as("dst"),
      lit("CONTRIBUTED").as("rel"))
    val reified2 = ord.select(
      concat(lit("contrib:"), col("o_orderkey")).as("src"),
      concat(lit("cmte:"), col("o_orderpriority")).as("dst"),
      lit("CONTRIBUTED_TO").as("rel"))
    val shortcut = ord.select(
      concat(lit("donor:"), col("o_custkey")).as("src"),
      concat(lit("cmte:"), col("o_orderpriority")).as("dst"),
      lit("CONTRIBUTED_TO").as("rel"))
    reified1.unionByName(reified2).unionByName(shortcut)
      .dropDuplicates("src", "dst", "rel")
      .orderBy(col("src"), col("dst"), col("rel"))
  }

  /** G8: amendment tombstones as relational algebra — a filing whose
    * key is named as some later filing's `prev` is DETACH-DELETEd;
    * survivors are the anti-join against the tombstone set. */
  def g08Tombstones(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    // synthetic amendment chain: every 10th filing amends its
    // predecessor key
    val tombstones = ord.filter(col("o_orderkey") % 10 === 0)
      .select((col("o_orderkey") - 1).as("prev_key"))
    ord.join(tombstones, col("o_orderkey") === col("prev_key"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy(col("o_orderkey"))
  }

  /** U3: UNION ALL of classification branches with null-padded schema
    * alignment (contributions_elastic22 shape). */
  def u03UnionPad(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val high = ord.filter(col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), lit("high").as("class"),
        col("o_totalprice").as("amount"),
        col("o_orderpriority").as("priority"))
    val low = ord.filter(col("o_totalprice") <= 150000.0)
      .select(col("o_orderkey"), lit("low").as("class"),
        col("o_totalprice").as("amount"),
        lit(null).cast("string").as("priority"))
    high.unionByName(low).orderBy(col("o_orderkey"))
  }

  /** W: running aggregate window per key (beyond-reference windowing). */
  def w02Running(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_spend",
        sum(money(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Skew-safe aggregation: two-phase salted sum/count over a skewed
    * key (l_returnflag owns ~half the rows) — result provably equal to
    * the direct aggregate, which is exactly what the oracle computes. */
  def a10SaltedAgg(s: SparkSession, d: String): DataFrame =
    SkewJoin.saltedSumCount(
      Tables.lineitem(s, d),
      "l_returnflag",
      col("l_quantity").cast("decimal(18,2)"),
      "l_orderkey", 8)
      .select(col("l_returnflag"),
        col("total").cast("double").as("total_qty"), col("n_rows"))
      .orderBy(col("l_returnflag"))

  /** W: lag/delta window — per-key change vs the previous event (the
    * cursor-advance shape; unique (ts, event_id) tiebreak both sides). */
  def w03LagDelta(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("event_id"), col("user_id"),
        round(col("value") - coalesce(col("prev_value"), lit(0.0)), 6)
          .as("delta"))
      .orderBy(col("event_id"))
  }

  /** The full SQL ranking-function panel — rank / dense_rank /
    * percent_rank / cume_dist over a TIED ordering (quantity repeats
    * within an order, so gap-vs-dense and the tie-stable fraction
    * semantics are actually exercised) plus ntile over a UNIQUE
    * ordering (ntile is row_number-based, so a tied sort would be
    * nondeterministic — the linenumber tiebreak pins it). Windows key
    * on l_orderkey (high-cardinality, bounded groups — never a
    * monolithic partition); the orderkey sample predicate pushes to
    * the scan and keeps whole orders, so every window group is
    * complete. */
  def w04Ranks(s: SparkSession, d: String): DataFrame = {
    val wTied = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_quantity").desc)
    val wUniq = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_quantity").desc, col("l_linenumber").asc)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        rank().over(wTied).as("rnk"),
        dense_rank().over(wTied).as("drnk"),
        round(percent_rank().over(wTied), 6).as("prnk"),
        round(cume_dist().over(wTied), 6).as("cdist"),
        ntile(3).over(wUniq).as("tile"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Slowly-changing dimension, Type 2: the order-priority history of
    * each customer as validity intervals [valid_from, valid_to) with a
    * current flag — the warehouse-dimension shape behind every
    * "attribute as of date X" join (the reference keeps only latest
    * state in ES/BigQuery and re-derives history by rescanning; SCD2
    * materializes it once).
    *
    * Two window passes over the SAME partitioning (o_custkey): lag
    * detects value changes on the (date, orderkey)-ordered event
    * stream, lead on the SURVIVING change rows assigns each interval's
    * end. Catalyst plans one Exchange: the second Window reuses the
    * first's hash partitioning and only re-sorts the (smaller)
    * filtered set. High-cardinality balanced key ⇒ no skew; dates are
    * pinned to ISO strings, the flag to int — exact cross-engine. */
  def dimScd2(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val changes = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority").as("priority"))
      .withColumn("prev", lag(col("priority"), 1).over(byTime))
      .filter(col("prev").isNull || col("priority") =!= col("prev"))
    changes
      .withColumn("next_from", lead(col("o_orderdate"), 1).over(byTime))
      .select(col("o_custkey"),
        col("priority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("next_from"), "yyyy-MM-dd"),
          lit("9999-12-31")).as("valid_to"),
        when(col("next_from").isNull, 1).otherwise(0).as("is_current"),
        col("o_orderkey").as("change_key"))
      .orderBy(col("o_custkey"), col("valid_from"), col("change_key"))
  }

  /** U: INTERSECT DISTINCT — customers active in BOTH halves of 1997.
    * Catalyst plans set intersection as a left-semi join under
    * distinct (one key shuffle per side), never a sort-based set op. */
  def u04Intersect(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val h1 = ord.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
      && col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select(col("o_custkey"))
    val h2 = ord.filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp")
      && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    h1.intersect(h2).orderBy(col("o_custkey"))
  }

  /** U: EXCEPT DISTINCT — churned customers: active in H1, gone in H2
    * (left-anti join under distinct, the set-difference twin of
    * `u04_intersect`). */
  def u05Except(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val h1 = ord.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
      && col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select(col("o_custkey"))
    val h2 = ord.filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp")
      && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    h1.except(h2).orderBy(col("o_custkey"))
  }

  /** P: the correlated-scalar-subquery shape ("orders above their
    * priority's average"), restated as the scale form: a per-group
    * aggregate joined back to the fact. The aggregate table is
    * GROUP-cardinality-sized (domain constant, not SF-proportional),
    * so its broadcast is safe at any scale — the fact is scanned
    * twice but never shuffled. The average is pinned cross-engine as
    * exact-decimal sum → double ÷ count (never avg() over doubles,
    * whose accumulation order is nondeterministic). */
  def p14AboveAvg(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val avgP = ord.groupBy(col("o_orderpriority"))
      .agg((sum(money(col("o_totalprice"))).cast("double")
        / count(lit(1))).as("ap"))
    ord.join(broadcast(avgP), "o_orderpriority")
      .filter(col("o_totalprice").cast("double") > col("ap"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** O: keyset pagination — "the page after cursor (date, key)",
    * written in the OR-of-ranges form (`d > D OR (d = D AND k > K)`)
    * rather than a tuple comparison so BOTH branches push down to the
    * parquet scan as range filters; resume is O(page), not
    * O(offset + page) like OFFSET pagination (the reference's keyset
    * schedule-A source, O6, as a checkable query). */
  def o09Keyset(s: SparkSession, d: String): DataFrame = {
    val cursorDate = lit("1997-06-01").cast("timestamp")
    Tables.orders(s, d)
      .filter(col("o_orderdate") > cursorDate ||
        (col("o_orderdate") === cursorDate && col("o_orderkey") > 3000L))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        col("o_custkey"))
  }

  /** A: approximate distinct via DETERMINISTIC HyperLogLog (Flajolet
    * et al. 2007) — the industry-standard cardinality sketch, restated
    * so a SQL oracle can replay the estimate exactly: the hash is the
    * md5 hex string (stable everywhere), the register index is the
    * first byte (m = 256), the rank is the leading-zero count of the
    * next 52 bits computed by STRING ops (hex-digit CLZ — no
    * cross-engine log2/floor edge cases), and the harmonic sum
    * Σ 2^−M_j is EXACT INTEGER arithmetic: each term scales to
    * 2^(53−M_j), a whole long, so the register sum is order-free with
    * no FP at all until the final one-expression estimate (round 4
    * absorbs the engines' last-ulp `ln`). Small-range correction
    * (linear counting on zero registers) included, per the paper.
    *
    * 100 TB posture: two map-side-combinable hash aggs — corpus →
    * (group, 256 registers) → group; state per group is 256 longs.
    * This is the declarative restatement of the
    * [[graft.functions.expressions.KmvDistinct]]-style native
    * aggregates (same O(m) sketch bound, zero custom code); exact
    * count rides along as the accuracy reference. */
  /** Per-row HLL (register, rank) derivation from md5(user_id) — see
    * [[a20Hll]] for the contract. */
  /** A: data profiling — the ANALYZE-TABLE panel (per-column null
    * count, distinct estimate, min/max) computed in ONE corpus pass:
    * all 13 aggregates run in a single hash-agg (the KMV sketch keeps
    * the distinct estimates O(k) per column), then `stack` unpivots
    * the 1-row result driver-side. Low-cardinality columns sit below
    * k → exact counts; high-cardinality ones get the estimate — both
    * regimes in one row set. Values normalize to strings so the
    * profile has one schema for any column type. */
  /** Categorical-column entropy profile: per low-cardinality orders
    * column, the distinct count, Shannon entropy (how spread the value
    * distribution is — 0 means constant, ln n means uniform) and the
    * modal share. One value-count aggregate per column unioned into a
    * long panel; entropy terms −p·ln p quantize to 1e-9 scaled longs
    * before summing (few terms, order-proof all the same). The
    * [[profileTable]] companion for distribution SHAPE rather than
    * null/min/max bounds. */
  /** Temporal-dimension lookup — "the attribute as of date X": facts
    * resolve against the SCD2-style change table through the NATIVE
    * as-of join ([[graft.plans.Asof.join]]) instead of a BETWEEN
    * interval join. The change table keeps one row per (customer,
    * change date) — last change of the day wins via max_by — and the
    * backward as-of picks the latest change ≤ each fact date: interval
    * containment without materializing valid_to, no non-equi join, one
    * merge pass over the co-partitioned sorted sides. The
    * self-consistency flag (`matches_actual`) diagnoses same-day
    * collisions. */
  def dimAsofLookup(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val changes = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority").as("priority"))
      .withColumn("prev", lag(col("priority"), 1).over(byTime))
      .filter(col("prev").isNull || col("priority") =!= col("prev"))
    val dim = changes
      .groupBy(col("o_custkey").as("d_custkey"),
        to_date(col("o_orderdate")).as("valid_from"))
      .agg(max_by(col("priority"), col("o_orderkey")).as("dim_priority"))
    val fact = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("od"), col("o_orderpriority"))
    graft.plans.Asof.join(fact, dim,
        Seq("o_custkey"), Seq("d_custkey"), "od", "valid_from")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("od"), "yyyy-MM-dd").as("order_date"),
        col("dim_priority"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
        (col("dim_priority") === col("o_orderpriority")).cast("int")
          .as("matches_actual"))
      .orderBy(col("o_orderkey"))
  }

  /** T265: bucketized INTERVAL-OVERLAP self-join — the missing join
    * class between the equi family and j11's broadcast theta: "which
    * same-supplier shipments were in flight simultaneously". Naive
    * overlap is O(n²) per supplier; the scale pattern is the classic
    * bucket decomposition: each interval EXPLODES into the month
    * buckets it spans (bounded: the synthetic in-flight window is
    * ≤ 28 days ⇒ ≤ 2 buckets), the join runs on (supplier, bucket) —
    * an EQUI join Spark shuffles normally, never a cross product —
    * and exact overlap filters after. A pair meeting in two buckets
    * would double-count, so each pair is claimed only by the bucket
    * containing the OVERLAP START (the standard dedup trick; no
    * distinct needed). Interval end derives deterministically from
    * the keys (the data ships no receipt date), so the oracle joins
    * the same intervals directly with a range predicate. */
  def j15Interval(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 48)
      .select(col("l_suppkey").as("suppkey"),
        col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
        col("l_shipdate").cast("date").as("ship"))
      .withColumn("receipt", date_add(col("ship"),
        ((col("okey") * 7 + col("lnum") * 3) % 25 + 3).cast("int")))
    val b = iv.withColumn("bucket", explode(expr(
      "sequence(trunc(ship, 'MM'), trunc(receipt, 'MM'), interval 1 month)")))
    val left = b.select(col("suppkey"), col("bucket"),
      col("okey").as("okey1"), col("lnum").as("lnum1"),
      col("ship").as("ship1"), col("receipt").as("receipt1"))
    val right = b.select(col("suppkey"), col("bucket"),
      col("okey").as("okey2"), col("lnum").as("lnum2"),
      col("ship").as("ship2"), col("receipt").as("receipt2"))
    left.join(right, Seq("suppkey", "bucket"))
      .filter(col("okey1") < col("okey2") ||
        (col("okey1") === col("okey2") && col("lnum1") < col("lnum2")))
      .filter(col("ship1") <= col("receipt2") &&
        col("ship2") <= col("receipt1"))
      .filter(col("bucket") ===
        trunc(greatest(col("ship1"), col("ship2")), "MM"))
      .select(col("suppkey"), col("okey1"), col("lnum1"),
        col("okey2"), col("lnum2"),
        (datediff(least(col("receipt1"), col("receipt2")),
          greatest(col("ship1"), col("ship2"))) + 1).as("overlap_days"))
      .orderBy(col("overlap_days").desc, col("suppkey").asc,
        col("okey1").asc, col("lnum1").asc, col("okey2").asc,
        col("lnum2").asc)
      .limit(20)
  }

  /** T227: FILE-SIZING plan per output partition (source) — the
    * small-files/compaction planner every lake-house writer runs
    * before a `partitionBy` write: given a target file size, how many
    * files does each partition key get, and which keys are HOT
    * (bytes > 1.1× the mean — the skew alarm that says "salt this key
    * or give it its own write job"). Byte volume is the exact n_chars
    * sum; the target here is 4096 bytes, the scaled-down stand-in for
    * a 128-256 MiB production target. One map-side-combinable corpus
    * agg to the key panel + one broadcast 1-row total; the hot flag is
    * an INTEGER cross-multiplication (10·bytes·n_keys > 11·total), so
    * no FP enters the plan at all. */

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u04_intersect"  -> u04Intersect _,
    "u05_except"     -> u05Except _,
    "p14_aboveavg"   -> p14AboveAvg _,
    "o09_keyset"     -> o09Keyset _,
    "q01_pricing"    -> q01Pricing _,
    "p08_boolshould" -> p08BoolShould _,
    "p10_blacklist"  -> p10Blacklist _,
    "p12_contains"   -> p12ContainsGuard _,
    "g07_reified"    -> g07ReifiedEdges _,
    "g08_tombstone"  -> g08Tombstones _,
    "j07_linkage"    -> j07Linkage _,
    "j08_hydrate"    -> j08Hydrate _,
    "o05_amendment"  -> o05Amendment _,
    "a10_saltedagg"  -> a10SaltedAgg _,
    "u01_uniondist"  -> u01UnionDistinct _,
    "w03_lagdelta"   -> w03LagDelta _,
    "w04_ranks"      -> w04Ranks _,
    "dim_scd2"       -> dimScd2 _,
    "dim_asof_lookup" -> dimAsofLookup _,
    "p01_project"    -> p01Project _,
    "p02_classify"   -> p02Classify _,
    "p03_nullfilter" -> p03NullFilter _,
    "p04_exists"     -> p04Exists _,
    "p06_range"      -> p06Range _,
    "p07_ids"        -> p07Ids _,
    "j01_enrich"     -> j01Enrich _,
    "j03_selfdim"    -> j03SelfDim _,
    "j05_coalesce"   -> j05Coalesce _,
    "j06_anti"       -> j06Anti _,
    "j09_fullouter"  -> j09FullOuter _,
    "j10_semi"       -> j10Semi _,
    "j11_theta"      -> j11Theta _,
    "j14_saltedjoin" -> j14SaltedJoin _,
    "j15_interval" -> j15Interval _,
    "a01_distinct"   -> a01Distinct _,
    "a02_keepoldest" -> a02KeepOldest _,
    "a03_collect"    -> a03CollectList _,
    "a06_minmax"     -> a06MinMax _,
    "a08_dayexplode" -> a08DayExplode _,
    "o01_topk"       -> o01TopK _,
    "o07_sample"     -> o07Sample _,
    "u03_unionpad"   -> u03UnionPad _,
    "w02_running"    -> w02Running _)

  val oracles: Map[String, String] = Map(
    // the oracle joins the SAME derived intervals directly with the
    // range predicate — DuckDB's planner handles the theta join at
    // oracle scale; the engine's bucket decomposition must agree
    "j15_interval" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS suppkey, l_orderkey AS okey,
        |    l_linenumber AS lnum,
        |    CAST(l_shipdate AS DATE) AS ship,
        |    CAST(l_shipdate AS DATE)
        |      + CAST(((l_orderkey * 7 + l_linenumber * 3) % 25 + 3)
        |        AS INTEGER) AS receipt
        |  FROM lineitem WHERE l_quantity >= 48)
        |SELECT a.suppkey, a.okey AS okey1, a.lnum AS lnum1,
        |  b.okey AS okey2, b.lnum AS lnum2,
        |  CAST(datediff('day', greatest(a.ship, b.ship),
        |    least(a.receipt, b.receipt)) + 1 AS INTEGER) AS overlap_days
        |FROM iv a JOIN iv b ON a.suppkey = b.suppkey
        |  AND (a.okey < b.okey OR (a.okey = b.okey AND a.lnum < b.lnum))
        |  AND a.ship <= b.receipt AND b.ship <= a.receipt
        |ORDER BY overlap_days DESC, a.suppkey, okey1, lnum1, okey2, lnum2
        |LIMIT 20""".stripMargin,
    // the salt is invisible to semantics: the oracle IS the plain join
    "j14_saltedjoin" ->
      """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |    AS DOUBLE) AS revenue
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "u04_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "u05_except" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "p14_aboveavg" ->
      """WITH ap AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) AS ap
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderkey, o.o_custkey, o.o_orderpriority
        |FROM orders o JOIN ap USING (o_orderpriority)
        |WHERE CAST(o.o_totalprice AS DOUBLE) > ap.ap
        |ORDER BY o.o_orderkey""".stripMargin,
    "o09_keyset" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
        |  o_custkey
        |FROM orders
        |WHERE o_orderdate > TIMESTAMP '1997-06-01'
        |   OR (o_orderdate = TIMESTAMP '1997-06-01' AND o_orderkey > 3000)
        |ORDER BY o_orderdate, o_orderkey LIMIT 100""".stripMargin,
    "p08_boolshould" ->
      """SELECT event_id, event_type FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |   OR event_type = 'click'
        |ORDER BY event_id""".stripMargin,
    "p12_contains" ->
      """SELECT doc_id, source FROM documents
        |WHERE contains(text, 'the') AND source != ''
        |ORDER BY doc_id""".stripMargin,
    "g07_reified" ->
      """SELECT DISTINCT src, dst, rel FROM (
        |  SELECT 'donor:' || o_custkey AS src,
        |    'contrib:' || o_orderkey AS dst, 'CONTRIBUTED' AS rel
        |  FROM orders
        |  UNION ALL
        |  SELECT 'contrib:' || o_orderkey, 'cmte:' || o_orderpriority,
        |    'CONTRIBUTED_TO'
        |  FROM orders
        |  UNION ALL
        |  SELECT 'donor:' || o_custkey, 'cmte:' || o_orderpriority,
        |    'CONTRIBUTED_TO'
        |  FROM orders)
        |ORDER BY src, dst, rel""".stripMargin,
    "g08_tombstone" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders a
        |  WHERE a.o_orderkey % 10 = 0 AND a.o_orderkey - 1 = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "p10_blacklist" ->
      """SELECT doc_id, source FROM documents
        |WHERE source NOT IN ('src1', 'src7', 'src13')
        |  AND source IS NOT NULL AND source != ''
        |ORDER BY doc_id""".stripMargin,
    "j07_linkage" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  array_to_string(list_sort(list(
        |    CAST(o_orderkey AS VARCHAR) || ':' || strftime(o_orderdate, '%Y-%m-%d'))), ';')
        |    AS linkages
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "j08_hydrate" ->
      """WITH refs AS (
        |  SELECT l_orderkey, l_linenumber, r.ref_type, r.ref_id
        |  FROM lineitem, UNNEST([
        |    {'ref_type': 'part', 'ref_id': l_partkey},
        |    {'ref_type': 'supp', 'ref_id': l_suppkey}]) AS t(r)
        |  WHERE l_orderkey <= 200)
        |SELECT l_orderkey, l_linenumber, ref_type, ref_id,
        |  coalesce(p.p_name, s.s_name) AS ref_name
        |FROM refs
        |LEFT JOIN part p ON ref_type = 'part' AND ref_id = p.p_partkey
        |LEFT JOIN supplier s ON ref_type = 'supp' AND ref_id = s.s_suppkey
        |ORDER BY l_orderkey, l_linenumber, ref_type""".stripMargin,
    "a10_saltedagg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "o05_amendment" ->
      """SELECT o_custkey, o_orderkey AS latest_order,
        |  strftime(o_orderdate, '%Y-%m-%d') AS latest_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "u01_uniondist" ->
      """SELECT DISTINCT key, src FROM (
        |  SELECT o_custkey AS key, 'ord' AS src FROM orders
        |  UNION ALL
        |  SELECT l_suppkey AS key, 'li' AS src FROM lineitem)
        |ORDER BY key, src""".stripMargin,
    // same change-table build + DuckDB's native ASOF as the interval
    // lookup (arg_max ≡ max_by on the unique change key)
    "dim_asof_lookup" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |    o_orderpriority AS priority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (SELECT * FROM ch WHERE prev IS NULL OR priority <> prev),
        |dim AS (
        |  SELECT o_custkey AS d_custkey,
        |    CAST(o_orderdate AS DATE) AS valid_from,
        |    arg_max(priority, o_orderkey) AS dim_priority
        |  FROM chg GROUP BY 1, 2),
        |f AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od,
        |    o_orderpriority
        |  FROM orders)
        |SELECT f.o_orderkey, f.o_custkey,
        |  strftime(f.od, '%Y-%m-%d') AS order_date,
        |  dim.dim_priority,
        |  strftime(dim.valid_from, '%Y-%m-%d') AS valid_from,
        |  CAST(f.o_orderpriority = dim.dim_priority AS INTEGER)
        |    AS matches_actual
        |FROM f ASOF LEFT JOIN dim
        |  ON f.o_custkey = dim.d_custkey AND f.od >= dim.valid_from
        |ORDER BY o_orderkey""".stripMargin,
    "w04_ranks" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  CAST(ntile(3) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_quantity DESC, l_linenumber ASC) AS INT) AS tile
        |FROM lineitem
        |WHERE l_orderkey % 97 = 0
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "dim_scd2" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |    o_orderpriority AS priority,
        |    LAG(o_orderpriority) OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (SELECT * FROM seq WHERE prev IS NULL OR priority <> prev),
        |iv AS (
        |  SELECT o_custkey, priority, o_orderdate, o_orderkey,
        |    LEAD(o_orderdate) OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS next_from
        |  FROM chg)
        |SELECT o_custkey, priority,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  COALESCE(strftime(next_from, '%Y-%m-%d'), '9999-12-31')
        |    AS valid_to,
        |  CASE WHEN next_from IS NULL THEN 1 ELSE 0 END AS is_current,
        |  o_orderkey AS change_key
        |FROM iv ORDER BY o_custkey, valid_from, change_key""".stripMargin,
    "w03_lagdelta" ->
      """SELECT event_id, user_id,
        |  round(value - coalesce(prev_value, 0.0), 6) AS delta
        |FROM (
        |  SELECT event_id, user_id, value,
        |    lag(value) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_value
        |  FROM events)
        |ORDER BY event_id""".stripMargin,
    "q01_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate < DATE '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "p01_project" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |  l_partkey AS part_id, l_extendedprice AS price
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin,
    "p02_classify" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE NOT (substring(o_orderpriority, 1, 1) IN ('4','5')
        |           AND o_orderpriority NOT IN ('4-NOT SPECIFIED'))
        |  AND o_orderstatus LIKE '%O%' AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "p03_nullfilter" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM (SELECT *, CASE WHEN l_returnflag = 'R' THEN 'M' END AS memo_cd
        |      FROM lineitem)
        |WHERE memo_cd IS NULL ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p04_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "p06_range" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "p07_ids" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (1,2,3,5,8,13,21,34,55,89) ORDER BY c_custkey""".stripMargin,
    "j01_enrich" ->
      """SELECT l.l_orderkey, l.l_linenumber, s.s_name AS supplier_name,
        |  p.p_name AS part_name, p.p_brand AS brand
        |FROM lineitem l
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "j03_selfdim" ->
      """SELECT l.l_orderkey, l.l_linenumber,
        |  cn.n_name AS cust_nation, sn.n_name AS supp_nation
        |FROM lineitem l
        |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "j05_coalesce" ->
      """SELECT l.l_orderkey, l.l_linenumber,
        |  COALESCE(p.p_name, 'UNKNOWN') AS part_name,
        |  COALESCE(p.p_retailprice, l.l_extendedprice) AS eff_price
        |FROM lineitem l
        |LEFT JOIN (SELECT * FROM part WHERE p_size > 25) p
        |  ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "j06_anti" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM orders l
        |  WHERE l.o_orderstatus = 'F' AND l.o_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "j09_fullouter" ->
      """SELECT COALESCE(c.nk, s.nk) AS nationkey,
        |  COALESCE(c.n_customers, 0) AS n_customers,
        |  COALESCE(s.n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers
        |      FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers
        |      FROM supplier GROUP BY s_nationkey) s
        |  ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin,
    "j10_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j11_theta" ->
      """SELECT b.bucket_id, COUNT(*) AS n_rows,
        |  CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem l
        |JOIN (SELECT CAST(r_regionkey AS INTEGER) AS bucket_id,
        |        CAST(r_regionkey * 10 AS DOUBLE) AS lo,
        |        CAST((r_regionkey + 1) * 10 AS DOUBLE) AS hi
        |      FROM region) b
        |  ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
        |GROUP BY b.bucket_id ORDER BY b.bucket_id""".stripMargin,
    "a01_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus,
        |  CAST(year(l_shipdate) AS INTEGER) AS ship_year
        |FROM lineitem ORDER BY l_returnflag, l_linestatus, ship_year""".stripMargin,
    "a02_keepoldest" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_order_date
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "a03_collect" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
        |FROM orders WHERE o_custkey <= 20
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a06_minmax" ->
      """SELECT o_custkey, MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a08_dayexplode" ->
      """SELECT o_orderkey,
        |  strftime(UNNEST(generate_series(CAST(o_orderdate AS DATE),
        |    CAST(o_orderdate AS DATE) + INTERVAL 2 DAY, INTERVAL 1 DAY)), '%Y-%m-%d') AS day
        |FROM orders WHERE o_orderkey <= 100
        |ORDER BY o_orderkey, day""".stripMargin,
    "o01_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "o07_sample" ->
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY md5(CAST(c_custkey AS VARCHAR)) ASC, c_custkey ASC LIMIT 50""".stripMargin,
    "u03_unionpad" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, 'high' AS class, o_totalprice AS amount,
        |    o_orderpriority AS priority
        |  FROM orders WHERE o_totalprice > 150000.0
        |  UNION ALL
        |  SELECT o_orderkey, 'low' AS class, o_totalprice AS amount,
        |    CAST(NULL AS VARCHAR) AS priority
        |  FROM orders WHERE o_totalprice <= 150000.0
        |) ORDER BY o_orderkey""".stripMargin,
    "w02_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
}

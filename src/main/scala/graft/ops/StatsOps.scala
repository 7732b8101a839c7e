package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Statistical / time-series / mining panel — the model-evaluation and
  * monitoring layer a large-scale training-data pipeline runs OVER the
  * engine's tables: autocorrelation, trend fits, seasonal backtests,
  * survival analysis, cohort LTV, Pareto concentration, rank fusion and
  * market-basket association rules.
  *
  * Design rules shared by every operator here:
  *  - integer/decimal sums first, doubles last: every statistic is
  *    assembled from exact per-group integer or DECIMAL aggregates, and
  *    the floating-point arithmetic happens once, on the final 1-row-
  *    per-group panel, with the SAME expression shape the DuckDB oracle
  *    uses (IEEE doubles are deterministic given identical expression
  *    trees over identical inputs);
  *  - where a per-row double MUST be summed (sMAPE terms, chi-square
  *    terms, Kaplan–Meier log terms), it is quantized to the 1e-9 grid
  *    and summed as DECIMAL(28,9) — the exact-decimal quantized-sum
  *    idiom — so partition/engine accumulation order cannot flip a bit;
  *  - daily series are zero-filled over an explicit per-key date spine
  *    (min..max day), so gaps cannot silently shift lag alignments; the
  *    spine is calendar-bounded (rows = day span × |event types|), NOT
  *    SF-proportional, and every window that walks it is either keyed
  *    by event type or bounded by the day span.
  */
object StatsOps {

  private def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Zero-filled daily count series per event type with a dense integer
    * day index `t` (0 = first observed day for that type). The series
    * length is calendar-bounded, so the explode and the later
    * self-joins on (event_type, t) are keyed and scale-safe. */
  private def dailyFilled(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val span = daily.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
    span.select(col("event_type"), col("d0"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("t"),
        coalesce(col("n"), lit(0L)).as("x"))
  }

  /** Autocorrelation function of the daily event-count series per event
    * type at lags {1, 2, 3, 7} — the seasonality probe run before
    * choosing a forecast model. acf_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)²
    * with the full-series mean μ, expanded so every Σ is an exact
    * integer aggregate: num = S_ab − μ(S_a+S_b) + mμ², den = SS − nμ².
    * The lag pairing is ONE keyed self-join on (event_type, t) with the
    * lag set exploded on the probe side — no per-lag window, no
    * monolithic sort. */
  def evAcf(s: SparkSession, d: String): DataFrame = {
    val f = dailyFilled(s, d)
    val stats = f.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("x").as("s"),
      sum(col("x") * col("x")).as("ss"))
    val probe = f.select(col("event_type"),
        explode(array(lit(1), lit(2), lit(3), lit(7))).as("lag"),
        col("t"), col("x").as("xb"))
      .withColumn("t", col("t") - col("lag"))
    val lagged = f.select(col("event_type"), col("t"), col("x").as("xa"))
      .join(probe, Seq("event_type", "t"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("m"), sum("xa").as("sa"),
        sum("xb").as("sb"), sum(col("xa") * col("xb")).as("sab"))
    lagged.join(stats, "event_type")
      .withColumn("mu", expr("cast(s as double) / cast(n as double)"))
      .withColumn("num", expr(
        "cast(sab as double) - mu * cast(sa + sb as double)" +
          " + cast(m as double) * mu * mu"))
      .withColumn("den", expr(
        "cast(ss as double) - cast(n as double) * mu * mu"))
      .select(col("event_type"), col("lag").cast("int").as("lag"),
        expr("round(case when den = 0 then null else num / den end, 6)")
          .as("acf"))
      .orderBy("event_type", "lag")
  }

  /** Per-type OLS trend of the zero-filled daily count series: slope,
    * intercept and R² from the five exact integer sums (m, Σt, Σx, Σtx,
    * Σt², Σx²) — the closed-form regression, one aggregate per type, no
    * iteration. A zero-variance series (den = 0) yields NULLs, the SQL
    * `regr_*` convention. */
  def evRegression(s: SparkSession, d: String): DataFrame = {
    dailyFilled(s, d)
      .groupBy("event_type").agg(
        count(lit(1)).as("m"), sum("t").as("sx"), sum("x").as("sy"),
        sum(col("t") * col("x")).as("sxy"),
        sum(col("t") * col("t")).as("sxx"),
        sum(col("x") * col("x")).as("syy"))
      .withColumn("num", expr(
        "cast(m as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double)"))
      .withColumn("den", expr(
        "cast(m as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double)"))
      .withColumn("deny", expr(
        "cast(m as double) * cast(syy as double)" +
          " - cast(sy as double) * cast(sy as double)"))
      .withColumn("slope", expr("case when den = 0 then null else num / den end"))
      .select(col("event_type"), col("m").cast("int").as("n_days"),
        expr("round(slope, 6)").as("slope"),
        expr("round((cast(sy as double) - slope * cast(sx as double))" +
          " / cast(m as double), 6)").as("intercept"),
        expr("round(case when den * deny = 0 then null" +
          " else (num * num) / (den * deny) end, 6)").as("r2"))
      .orderBy("event_type")
  }

  /** Seasonal-naïve backtest: forecast each day with the value seven
    * days earlier, score MAE / RMSE / sMAPE per event type — the
    * baseline every fancier forecaster must beat, and the shape of any
    * model-eval scoring job. Error sums are exact integers (|x−f|,
    * (x−f)²); the per-row sMAPE terms are doubles, so each is quantized
    * to 1e-9 and summed as DECIMAL — accumulation-order-proof. The
    * (t, t−7) pairing is the same keyed self-join as [[evAcf]]. */
  def evForecastEval(s: SparkSession, d: String): DataFrame = {
    val f = dailyFilled(s, d)
    val fc = f.select(col("event_type"), (col("t") + 7).as("t"),
      col("x").as("fv"))
    f.join(fc, Seq("event_type", "t"))
      .groupBy("event_type").agg(
        count(lit(1)).as("m"),
        sum(abs(col("x") - col("fv"))).as("ae"),
        sum((col("x") - col("fv")) * (col("x") - col("fv"))).as("se"),
        sum(expr("cast(round(case when x + fv = 0 then 0.0" +
          " else 2.0 * cast(abs(x - fv) as double)" +
          " / cast(x + fv as double) end, 9) as decimal(28,9))")).as("sq"))
      .select(col("event_type"), col("m").cast("int").as("n_scored"),
        expr("round(cast(ae as double) / cast(m as double), 6)").as("mae"),
        expr("round(sqrt(cast(se as double) / cast(m as double)), 6)")
          .as("rmse"),
        expr("round(cast(sq as double) / cast(m as double), 6)").as("smape"))
      .orderBy("event_type")
  }

  /** Day-of-week seasonality profile + χ² uniformity test per event
    * type: observed counts against the flat expectation total/7. The χ²
    * terms are per-(type, dow) doubles → 1e-9-quantized DECIMAL sum
    * (seven terms per type, but order-proof all the same). The dow grid
    * is explicitly materialized (7 rows per type) so an empty weekday
    * still contributes its (0−e)²/e term. */
  def evSeasonality(s: SparkSession, d: String): DataFrame = {
    val dow = Tables.events(s, d)
      .groupBy(col("event_type"),
        (weekday(date_trunc("day", col("ts")).cast("date")) + 1)
          .as("isodow"))
      .agg(count(lit(1)).as("n"))
    val grid = dow.select("event_type").distinct()
      .select(col("event_type"),
        explode(sequence(lit(1), lit(7))).as("isodow"))
      .join(dow, Seq("event_type", "isodow"), "left")
      .select(col("event_type"), col("isodow"),
        coalesce(col("n"), lit(0L)).as("x"))
    val tot = grid.groupBy("event_type").agg(sum("x").as("tot"))
    val rows = grid.join(broadcast(tot), "event_type")
      .withColumn("e", expr("cast(tot as double) / 7.0"))
      .withColumn("term", expr(
        "cast(round((cast(x as double) - e) * (cast(x as double) - e) / e," +
          " 9) as decimal(28,9))"))
    val chi2 = rows.groupBy("event_type")
      .agg(sum("term").as("chi2q"))
    rows.join(broadcast(chi2), "event_type")
      .select(col("event_type"), col("isodow").cast("int").as("isodow"),
        col("x").as("n"),
        expr("round(cast(x as double) / cast(tot as double), 6)")
          .as("share"),
        expr("round(cast(chi2q as double), 6)").as("chi2"))
      .orderBy("event_type", "isodow")
  }

  /** Kaplan–Meier survival over user lifetimes: duration = days between
    * a user's first and last event; a user still active on the final
    * observed day is right-censored (still alive), everyone whose last
    * event predates the corpus end "died" at their duration. S(t) = Π_{tᵢ≤t}(1−dᵢ/nᵢ)
    * via the log-space cumulative: each ln(1−d/n) is quantized to 1e-9
    * and DECIMAL-cumsum'd, then exponentiated once — order-proof, and a
    * step where everyone at risk dies (d = n) is handled exactly
    * (S = 0 from there on) instead of through ln(0) = −∞.
    *
    * Scale: per-user first/last is one map-side-combinable aggregate;
    * the life table itself has one row per distinct duration — bounded
    * by the observation window in DAYS, not by SF — so its two ordered
    * windows (at-risk counts, cumulative hazard) walk a calendar-sized
    * series, the [[EventOps.evHolt]] precedent. */
  def evSurvival(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
    val maxd = ev.agg(max("day").as("maxd"))
    val users = ev.groupBy("user_id")
      .agg(min("day").as("f"), max("day").as("l"))
      .crossJoin(broadcast(maxd))
      .select(datediff(col("l"), col("f")).cast("long").as("dur"),
        expr("case when datediff(maxd, l) >= 1 then 1 else 0 end").as("died"))
    val nTotal = users.agg(count(lit(1)).as("n_users"))
    val lifetab = users.groupBy("dur")
      .agg(count(lit(1)).as("c"), sum("died").as("dth"))
      .crossJoin(broadcast(nTotal))
    val wAll = Window.orderBy("dur")
    val atRisk = lifetab
      .withColumn("exits",
        coalesce(sum("c").over(wAll.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("n_risk", col("n_users") - col("exits"))
      .filter(col("dth") > 0)
    val wStep = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atRisk
      .withColumn("term", expr(
        "case when dth = n_risk then cast(0.0 as decimal(28,9))" +
          " else cast(round(ln(1.0 - cast(dth as double)" +
          " / cast(n_risk as double)), 9) as decimal(28,9)) end"))
      .withColumn("anyzero",
        max(expr("case when dth = n_risk then 1 else 0 end")).over(wStep))
      .withColumn("cuml", sum("term").over(wStep))
      .select(col("dur").cast("int").as("t_days"), col("n_risk"),
        col("dth").as("d_deaths"),
        expr("case when anyzero = 1 then 0.0" +
          " else round(exp(cast(cuml as double)), 6) end").as("survival"))
      .orderBy("t_days")
  }

  /** Cohort lifetime-value panel: users cohorted by first-event ISO
    * week, revenue accumulated by cohort age in weeks — the
    * retention-revenue curve behind every "payback period" question.
    * Revenue rides DECIMAL(18,2) end to end; the cumulative sum windows
    * per cohort over AGE (calendar-bounded), and the cohort-size table
    * is |weeks|-sized → broadcast. */
  def evCohortLtv(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val u = ev.groupBy("user_id").agg(min("ts").as("c0"))
      .select(col("user_id"),
        date_trunc("week", col("c0")).cast("date").as("cw"))
    val sizes = u.groupBy("cw").agg(count(lit(1)).as("n_cohort"))
    val aged = ev.join(u, "user_id")
      .select(col("cw"),
        expr("cast(datediff(cast(date_trunc('week', ts) as date), cw)" +
          " div 7 as int)").as("age_weeks"),
        col("user_id"), col("value"))
    val g = aged.groupBy("cw", "age_weeks")
      .agg(coalesce(sum(money(col("value"))), lit(0).cast("decimal(18,2)"))
          .as("rev"),
        countDistinct("user_id").as("n_active"))
    val wc = Window.partitionBy("cw").orderBy("age_weeks")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("cum", sum("rev").over(wc))
      .join(broadcast(sizes), "cw")
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("age_weeks"), col("n_cohort"), col("n_active"),
        col("cum").cast("double").as("cum_value"),
        expr("round(cast(cum as double) / cast(n_cohort as double), 6)")
          .as("ltv_per_user"))
      .orderBy("cohort_week", "age_weeks")
  }

  /** Exact global rank under (value DESC, key ASC) without a
    * single-partition window: rows bucket by a value-monotone group id,
    * the intra-bucket row_number is keyed by bucket, and the carry-in
    * offset joins from a bucket-count-sized broadcast — the
    * EventOps.globalRank two-level idiom, descending flavor. Also
    * carries the bucket-local DECIMAL value cumsum + carry-in so Pareto
    * consumers get the exact prefix revenue from the same pass. */
  private def rankedDesc(df: DataFrame, value: String, gid: Column,
      key: String, withCum: Boolean): DataFrame = {
    val g = df.withColumn("__gid", gid)
    val wIn = Window.partitionBy("__gid")
      .orderBy(col(value).desc, col(key).asc)
    val wOff = Window.orderBy(col("__gid").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = g.groupBy("__gid")
      .agg(count(lit(1)).as("__n"), sum(col(value)).as("__v"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .withColumn("__voff", sum("__v").over(wOff))
      .select("__gid", "__off", "__voff")
    val ranked = g.join(broadcast(offs), "__gid")
      .withColumn("rank", col("__off") + row_number().over(wIn))
    val out =
      if (withCum)
        ranked.withColumn("cum",
          coalesce(col("__voff"), lit(0).cast("decimal(18,2)")) +
            sum(col(value)).over(
              wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      else ranked
    out.drop("__gid", "__off", "__voff")
  }

  /** Pareto / ABC concentration: suppliers ranked by revenue, classed A
    * (cumulative share ≤ 80%), B (≤ 95%), C (rest), reported as a
    * 3-row panel. The rank AND the exact DECIMAL prefix revenue come
    * from the two-level [[rankedDesc]] — no supplier-count-sized
    * single-partition window anywhere; the only doubles are the final
    * share divisions over exact decimals. */
  def paretoAbc(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey").as("s"))
      .agg(sum(money(col("l_extendedprice")) *
        (lit(1) - money(col("l_discount")))).as("rev"))
    val tot = rev.agg(sum("rev").as("tot"))
    rankedDesc(rev, "rev",
        floor(col("rev").cast("double") / 10000.0).cast("long"), "s",
        withCum = true)
      .crossJoin(broadcast(tot))
      .withColumn("cls", expr(
        "case when cast(cum as double) / cast(tot as double) <= 0.80 then 'A'" +
          " when cast(cum as double) / cast(tot as double) <= 0.95 then 'B'" +
          " else 'C' end"))
      .groupBy(col("cls").as("abc_class"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum("rev").cast("double").as("revenue"),
        max("tot").as("__tot"))
      .select(col("abc_class"), col("n_suppliers"), col("revenue"),
        expr("round(revenue / cast(__tot as double), 6)").as("share"))
      .orderBy("abc_class")
  }

  /** Reciprocal-rank fusion of two supplier rankings (by revenue, by
    * distinct orders served): rrf = 1/(60+r₁) + 1/(60+r₂) — the
    * standard multi-signal ranking merge (search result fusion, feature
    * ensembling). Both ranks are exact two-level [[rankedDesc]] ranks;
    * the fusion is two double divisions per supplier. */
  def rankFusion(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey").as("s"))
      .agg(sum(money(col("l_extendedprice")) *
          (lit(1) - money(col("l_discount")))).as("rev"),
        countDistinct("l_orderkey").as("nord"))
    val r1 = rankedDesc(base, "rev",
        floor(col("rev").cast("double") / 10000.0).cast("long"), "s",
        withCum = false)
      .withColumnRenamed("rank", "r_rev")
    val r2 = rankedDesc(r1, "nord", col("nord"), "s", withCum = false)
      .withColumnRenamed("rank", "r_ord")
    r2.select(col("s").as("suppkey"), col("r_rev"), col("r_ord"),
        expr("round(1.0 / (60.0 + cast(r_rev as double))" +
          " + 1.0 / (60.0 + cast(r_ord as double)), 6)").as("rrf"))
      .orderBy(col("rrf").desc, col("suppkey").asc)
      .limit(25)
  }

  /** Market-basket association rules over brands co-purchased in one
    * order: support / confidence (both directions) / lift for every
    * brand pair, top 25 by lift. The per-order brand set is bounded by
    * order SIZE (TPC-H ≤ 7 lines; any real order is O(items)), so the
    * in-row pair expansion is C(|order|, 2) — per-ORDER bounded, unlike
    * a hub-degree projection; the pair key space is |brands|² (≤ 625),
    * so the rule table is a constant-size panel whatever the SF. All
    * counts are exact integers; the three scores are final-step double
    * divisions. */
  def basketRules(s: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("o"), col("p_brand").as("b"))
      .distinct()
    // r13 optimization (guide §2.4, localCheckpoint-the-2+-consumer
    // rule): the posting table feeds THREE consumers (pair expansion,
    // per-brand counts, the order total); un-materialized, the
    // lineitem⋈part + distinct subtree executed once per consumer
    // (profiled: two identical 1 s / 5.8 MB map stages per call).
    // Checkpointed, the corpus is scanned once; brand counts are the
    // postings re-exploded ((o, b) is distinct, so counting exploded
    // entries per brand ≡ counting items per brand — same integers).
    val posts = items.groupBy("o")
      .agg(sort_array(collect_list(col("b"))).as("bs"))
      .localCheckpoint()
    val nOrders = posts.agg(count(lit(1)).as("n_orders"))
    val pairs = posts
      .select(explode(expr(
        """flatten(transform(bs, (a, i) ->
          |  transform(slice(bs, i + 2, size(bs)), c ->
          |    struct(a AS b1, c AS b2))))""".stripMargin)).as("p"))
      .groupBy(col("p.b1").as("b1"), col("p.b2").as("b2"))
      .agg(count(lit(1)).as("n_pair"))
    val bc = posts.select(explode(col("bs")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("nb"))
    pairs
      .join(broadcast(bc.select(col("b").as("b1"), col("nb").as("n1"))), "b1")
      .join(broadcast(bc.select(col("b").as("b2"), col("nb").as("n2"))), "b2")
      .crossJoin(broadcast(nOrders))
      .select(col("b1"), col("b2"), col("n_pair"),
        expr("round(cast(n_pair as double) / cast(n_orders as double), 6)")
          .as("support"),
        expr("round(cast(n_pair as double) / cast(n1 as double), 6)")
          .as("conf_12"),
        expr("round(cast(n_pair as double) / cast(n2 as double), 6)")
          .as("conf_21"),
        expr("round(cast(n_pair as double) * cast(n_orders as double)" +
          " / (cast(n1 as double) * cast(n2 as double)), 6)").as("lift"))
      .orderBy(col("lift").desc, col("b1").asc, col("b2").asc)
      .limit(25)
  }

  /** CUBE over (returnflag, linestatus): all four grouping combinations
    * in one pass (Spark expands to an expand-node + single hash agg —
    * one shuffle for the whole lattice, the same plan GROUPING SETS
    * gets). NULL group labels render as 'ALL'. */
  def cubeQty(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("l_quantity"))).cast("double").as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("return_flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
        col("n"), col("qty"))
      .orderBy("return_flag", "line_status")

  /** Class-balanced downsample: every language keeps exactly
    * min-stratum-count docs, chosen by the deterministic md5 shuffle —
    * the class-imbalance fix applied before training a classifier on
    * skewed strata. Rank-within-stratum is the TWO-LEVEL
    * (lang, md5-prefix-group) row_number of TrainOps.sampleStratified
    * (no monolithic per-language window; one language at 100 TB is most
    * of the corpus), and the cutoff is a 1-row broadcast min over the
    * |langs|-sized stratum table. */
  def sampleBalanced(s: SparkSession, d: String): DataFrame = {
    val keyed = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .withColumn("__h", md5(col("doc_id").cast("string")))
      .withColumn("__gid", substring(col("__h"), 1, 2))
    val wIn = Window.partitionBy("lang", "__gid")
      .orderBy(col("__h"), col("doc_id"))
    val wOff = Window.partitionBy("lang").orderBy("__gid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(col("lang"), col("__gid"))
      .agg(count(lit(1)).as("__g_n"))
      .withColumn("__g_off", coalesce(sum("__g_n").over(wOff), lit(0L)))
    val mmin = offs.groupBy("lang").agg(sum("__g_n").as("__n"))
      .agg(min("__n").as("m"))
    keyed
      .withColumn("__rn", row_number().over(wIn))
      .join(offs.select("lang", "__gid", "__g_off"), Seq("lang", "__gid"))
      .withColumn("rk", (col("__g_off") + col("__rn")).cast("int"))
      .crossJoin(broadcast(mmin))
      .filter(col("rk").cast("bigint") <= col("m"))
      .select("doc_id", "lang", "rk")
      .orderBy("doc_id")
  }

  /** A/B experiment readout: users deterministically hash-split into
    * control (user_id even) and treatment (odd), conversion = a
    * heavy-purchaser flag (≥ 14 purchase events), scored with the
    * two-proportion pooled z-test — the experimentation panel every
    * product pipeline runs. Per-user flags come from ONE map-side-
    * combinable aggregate; the z arithmetic happens once on the 1×2
    * panel (exact integer counts → one expression tree of doubles,
    * identical in the oracle). A degenerate experiment (pooled rate 0
    * or 1 — zero variance) yields NULL z rather than an ANSI 0/0. */
  def evAbtest(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(expr("case when sum(case when event_type = 'purchase'" +
        " then 1 else 0 end) >= 14 then 1 else 0 end").as("converted"))
      .withColumn("variant", expr("cast(user_id % 2 as int)"))
    val panel = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
    val wide = panel.groupBy()
      .agg(
        max(expr("case when variant = 0 then n end")).as("n_control"),
        max(expr("case when variant = 0 then conv end")).as("conv_control"),
        max(expr("case when variant = 1 then n end")).as("n_treat"),
        max(expr("case when variant = 1 then conv end")).as("conv_treat"))
    wide
      .withColumn("rate_control",
        expr("cast(conv_control as double) / cast(n_control as double)"))
      .withColumn("rate_treat",
        expr("cast(conv_treat as double) / cast(n_treat as double)"))
      .withColumn("pool", expr("cast(conv_control + conv_treat as double)" +
        " / cast(n_control + n_treat as double)"))
      .withColumn("z", expr("case when pool * (1.0 - pool) = 0 then null" +
        " else (rate_treat - rate_control)" +
        " / sqrt(pool * (1.0 - pool) * (1.0 / cast(n_control as double)" +
        " + 1.0 / cast(n_treat as double))) end"))
      .select(col("n_control"), col("conv_control"),
        expr("round(rate_control, 6)").as("rate_control"),
        col("n_treat"), col("conv_treat"),
        expr("round(rate_treat, 6)").as("rate_treat"),
        expr("round(z, 6)").as("z"),
        expr("cast(abs(z) > 1.96 as int)").as("significant"))
  }

  /** Forecasting feature matrix: per (event_type, day) the zero-filled
    * count plus its lag-1, lag-7 and trailing-7-day mean — the feature
    * engineering pass a downstream model trains on. Windows key on
    * event_type over the calendar-bounded day spine (the [[evEwma]]
    * series-size argument); the trailing mean divides exact integer
    * window sums by the actual window row count, so series heads are
    * well-defined without NULL-padding heuristics. */
  def evLagFeatures(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("t")
    val w7 = w.rowsBetween(-6, Window.currentRow)
    dailyFilled(s, d)
      .withColumn("lag1", lag(col("x"), 1).over(w))
      .withColumn("lag7", lag(col("x"), 7).over(w))
      .withColumn("s7", sum("x").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .select(col("event_type"), col("t").cast("int").as("t"), col("x"),
        col("lag1"), col("lag7"),
        expr("round(cast(s7 as double) / cast(c7 as double), 6)").as("ma7"))
      .orderBy("event_type", "t")
  }

  /** Generated date dimension over the observed event span — the
    * warehouse calendar table (year/quarter/month/ISO week/ISO dow/
    * weekend flag) every BI join hangs off. One row per calendar day:
    * the size is the OBSERVATION WINDOW, never the SF. */
  def dimDates(s: SparkSession, d: String): DataFrame = {
    val span = Tables.events(s, d)
      .agg(min(date_trunc("day", col("ts")).cast("date")).as("d0"),
        max(date_trunc("day", col("ts")).cast("date")).as("d1"))
    span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        year(col("day")).as("year"),
        quarter(col("day")).as("quarter"),
        month(col("day")).as("month"),
        weekofyear(col("day")).as("iso_week"),
        (weekday(col("day")) + 1).as("isodow"),
        expr("cast(weekday(day) >= 5 as int)").as("is_weekend"))
      .orderBy("day")
  }

  /** Classical seasonal decomposition (the moving-average STL
    * precursor): per event type, trend = centered 7-day mean of the
    * zero-filled daily series (true window row count at the edges),
    * seasonal = the per-phase (t mod 7) mean of the detrended series, residual
    * = what's left. Trend divides exact integer window sums; the
    * detrended values are doubles, so their per-dow accumulation
    * quantizes to 1e-9 scaled longs first (order-proof); every window
    * is keyed by event type over the calendar-bounded spine. */
  def evSeasonalDecompose(s: SparkSession, d: String): DataFrame = {
    val w7 = Window.partitionBy("event_type").orderBy("t")
      .rowsBetween(-3, 3)
    val trended = dailyFilled(s, d)
      .withColumn("ts7", sum("x").over(w7))
      .withColumn("tc7", count(lit(1)).over(w7))
      .withColumn("trend", expr("cast(ts7 as double) / cast(tc7 as double)"))
      .withColumn("phase7", expr("cast(t % 7 as int)"))
      .withColumn("qd", expr(
        "cast(floor((cast(x as double) - trend) * 1000000000.0 + 0.5)" +
          " as bigint)"))
    val seasonal = trended.groupBy("event_type", "phase7")
      .agg(sum("qd").as("sq"), count(lit(1)).as("sc"))
      .withColumn("seasonal", expr(
        "cast(sq as double) / 1000000000.0 / cast(sc as double)"))
      .select("event_type", "phase7", "seasonal")
    trended.join(broadcast(seasonal), Seq("event_type", "phase7"))
      .select(col("event_type"), col("t").cast("int").as("t"), col("x"),
        expr("round(trend, 6)").as("trend"),
        expr("round(seasonal, 6)").as("seasonal"),
        expr("round(cast(x as double) - trend - seasonal, 6) + 0.0")
          .as("residual"))
      .orderBy("event_type", "t")
  }

  /** Experiment power analysis on the [[evAbtest]] split: the
    * per-arm sample size needed to detect a 0.1 absolute lift at
    * α=0.05 / 80% power — n = (z_{α/2}+z_β)²·2p̄(1−p̄)/d² with the
    * observed pooled rate — against what the arms actually hold. The
    * guardrail read before trusting (or ending) an experiment; pure
    * closed-form scalar math on the 1-row exact-count panel. */
  def evAbtestPower(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(expr("case when sum(case when event_type = 'purchase'" +
        " then 1 else 0 end) >= 14 then 1 else 0 end").as("converted"))
      .withColumn("variant", expr("cast(user_id % 2 as int)"))
    perUser.groupBy()
      .agg(
        sum(expr("case when variant = 0 then 1 else 0 end")).as("n_control"),
        sum(expr("case when variant = 1 then 1 else 0 end")).as("n_treat"),
        sum(col("converted")).as("conv_all"),
        count(lit(1)).as("n_all"))
      .withColumn("p_pool",
        expr("cast(conv_all as double) / cast(n_all as double)"))
      .withColumn("n_needed", expr(
        "cast(ceil((1.96 + 0.84) * (1.96 + 0.84) * 2.0 * p_pool" +
          " * (1.0 - p_pool) / (0.1 * 0.1)) as bigint)"))
      .select(col("n_control"), col("n_treat"),
        expr("round(p_pool, 6)").as("p_pool"),
        lit(0.1).as("mde"), col("n_needed"),
        expr("cast(least(n_control, n_treat) >= n_needed as int)")
          .as("powered"))
  }

  /** T220: minimum-detectable-effect CURVE on the [[evAbtest]] split —
    * the inverse read of [[evAbtestPower]]: instead of solving n for a
    * fixed lift, report the absolute lift detectable (α=0.05, 80%
    * power, two-proportion z) at five per-arm sizes spanning ¼× to 4×
    * the smaller observed arm: MDE(n) = (z_α/2 + z_β)·√(2p̄(1−p̄)/n).
    * The planning chart an experimentation platform renders before a
    * test launches ("how long until we could see a 2% lift?").
    *
    * One map-side-combinable per-user aggregate → 1-row exact-count
    * panel → a 5-row literal-array explode; all the z arithmetic is a
    * closed-form expression tree on exact integers cast to double,
    * identical in the oracle. n_base floors at 1 so a near-empty
    * events table still yields a well-defined (if useless) curve;
    * an EMPTY table nulls p̄ and the MDE rather than dividing 0/0. */
  def evMdeCurve(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(expr("case when sum(case when event_type = 'purchase'" +
        " then 1 else 0 end) >= 14 then 1 else 0 end").as("converted"))
      .withColumn("variant", expr("cast(user_id % 2 as int)"))
    perUser.groupBy()
      .agg(
        sum(expr("case when variant = 0 then 1 else 0 end")).as("n_control"),
        sum(expr("case when variant = 1 then 1 else 0 end")).as("n_treat"),
        sum(col("converted")).as("conv_all"),
        count(lit(1)).as("n_all"))
      .withColumn("p_pool", expr("case when n_all = 0 then null" +
        " else cast(conv_all as double) / cast(n_all as double) end"))
      .withColumn("n_base",
        expr("greatest(least(n_control, n_treat) div 4, 1L)"))
      .select(col("p_pool"), col("n_base"),
        explode(expr("array(1, 2, 4, 8, 16)")).as("mult"))
      .select(col("mult").cast("int").as("mult"),
        (col("n_base") * col("mult")).cast("long").as("n_per_arm"),
        round(col("p_pool"), 6).as("p_pool"),
        round(expr("(1.96 + 0.84) * sqrt(2.0 * p_pool * (1.0 - p_pool)" +
          " / cast(n_base * mult as double))"), 6).as("mde"))
      .orderBy("mult")
  }

  /** Theil–Sen robust trend — the median of all pairwise day-to-day
    * slopes, per event type: the outlier-proof alternative to
    * [[evRegression]]'s OLS line (one corrupted day drags an OLS slope
    * arbitrarily; the pairwise median shrugs off up to ~29% corrupted
    * points). The pair expansion is per-type over the CALENDAR-BOUNDED
    * daily series (a domain constant — ~2k days even at decade scale,
    * so the per-type pair table is ≤ ~2M rows regardless of SF); each
    * slope is one exact-integer-count division, the median picks rank
    * ⌈m/2⌉ / ⌊m/2⌋+1 (even m averages the two — a single determinate
    * add), full tie-broken ordering keeps both engines aligned. */
  def evTheilSen(s: SparkSession, d: String): DataFrame = {
    val f = dailyFilled(s, d)
    val a = f.select(col("event_type"), col("t").as("t1"), col("x").as("x1"))
    val b = f.select(col("event_type"), col("t").as("t2"), col("x").as("x2"))
    val slopes = a.join(b, Seq("event_type")).filter(col("t2") > col("t1"))
      .select(col("event_type"), col("t1"), col("t2"),
        ((col("x2") - col("x1")).cast("double")
          / (col("t2") - col("t1")).cast("double")).as("sl"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("sl"), col("t1"), col("t2"))
    val m = slopes.groupBy("event_type").agg(count(lit(1)).as("m"))
    val days = f.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    slopes.withColumn("rn", row_number().over(w))
      .join(broadcast(m), Seq("event_type"))
      .filter(expr("rn = (m + 1) div 2 or rn = m div 2 + 1"))
      .groupBy(col("event_type"))
      .agg(max(col("m")).as("n_pairs"),
        round(sum(col("sl")) / count(lit(1)), 6).as("ts_slope"))
      .join(broadcast(days), Seq("event_type"))
      .select(col("event_type"), col("n_days").cast("int").as("n_days"),
        col("n_pairs"), col("ts_slope"))
      .orderBy(col("event_type"))
  }

  /** Additive Holt–Winters (triple exponential: level + trend + weekly
    * seasonality, α=.3 β=.1 γ=.2) over the gap-filled per-type daily
    * series — the classic seasonal forecaster that completes the
    * smoothing ladder (ev_ewma → ev_holt → this). Initialization:
    * level = mean of week 1, trend = 0, seasonal s_i = x_i − level;
    * then one sorted fold from day 8 with a 10-slot array accumulator
    * [l, b, s0..s6, i] (the ev_holt array-fold idiom extended with the
    * in-accumulator day index that picks the seasonal slot). Per-type
    * state is the DAY SPAN, not the corpus SF; the oracle's recursive
    * CTE replays the identical double-op order, so the result is
    * bit-stable cross-engine. Forecast = l + b + s_{n mod 7}. */
  def evHoltWinters(s: SparkSession, d: String): DataFrame = {
    val si = "cast(element_at(acc, 10) as int) % 7 + 3"
    val sv = s"element_at(acc, $si)"
    val lp = s"0.3 * (x - $sv)" +
      " + 0.7 * (element_at(acc, 1) + element_at(acc, 2))"
    val l0 = "aggregate(slice(xs, 1, 7), cast(0.0 as double)," +
      " (a, v) -> a + v) / 7.0"
    val fold =
      s"""aggregate(
         |  slice(xs, 8, greatest(size(xs) - 7, 0)),
         |  concat(
         |    array($l0, cast(0.0 as double)),
         |    transform(slice(xs, 1, 7), v -> v - $l0),
         |    array(cast(7.0 as double))),
         |  (acc, x) -> transform(sequence(1, 10), j ->
         |    CASE
         |      WHEN j = 1 THEN $lp
         |      WHEN j = 2 THEN 0.1 * (($lp) - element_at(acc, 1))
         |                      + 0.9 * element_at(acc, 2)
         |      WHEN j = $si THEN 0.2 * (x - ($lp)) + 0.8 * $sv
         |      WHEN j = 10 THEN element_at(acc, 10) + 1.0
         |      ELSE element_at(acc, j)
         |    END))""".stripMargin
    val xs = transform(
      sort_array(collect_list(struct(col("t"), col("x")))),
      e => e.getField("x").cast("double"))
    dailyFilled(s, d).groupBy(col("event_type")).agg(xs.as("xs"))
      .select(col("event_type"), size(col("xs")).as("n_days"),
        expr(fold).as("st"))
      .select(col("event_type"), col("n_days"),
        round(element_at(col("st"), 1), 6).as("level"),
        round(element_at(col("st"), 2), 6).as("trend"),
        round(expr("element_at(st, 1) + element_at(st, 2)" +
          " + element_at(st, n_days % 7 + 3)"), 6).as("forecast_next"))
      .orderBy(col("event_type"))
  }

  /** Sample-ratio-mismatch guardrail — the A/B-testing sanity check
    * that catches broken assignment BEFORE anyone reads the outcome
    * metric ([[evAbtest]] trusts the split; this one audits it):
    * chi-square of the observed user split against the designed
    * 50/50, flagged at the df=1 95% critical value. The single most
    * common invalidator of real experiments (bot filtering, logging
    * loss and redirect bugs all skew assignment, not outcomes).
    * One distinct-user aggregate; exact integers into one fixed
    * double expression. */
  def evAbSrm(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id")).distinct()
      .agg(
        sum((col("user_id") % 2 === 0).cast("long")).as("n_a"),
        sum((col("user_id") % 2 =!= 0).cast("long")).as("n_b"))
      .withColumn("e", (col("n_a") + col("n_b")).cast("double") / lit(2.0))
      .select(col("n_a"), col("n_b"),
        round((col("n_a").cast("double") - col("e"))
          * (col("n_a").cast("double") - col("e")) / col("e")
          + (col("n_b").cast("double") - col("e"))
          * (col("n_b").cast("double") - col("e")) / col("e"), 6)
          .as("chi2"))
      .withColumn("srm_flag", (col("chi2") > 3.841459).cast("int"))

  /** T240: ROLLING 14-day correlation between the click and purchase
    * daily series — the co-movement monitor behind "did purchases
    * decouple from traffic this week" alerts (a level drop shows in
    * either series alone; a BROKEN FUNNEL shows first as decorrelation
    * while both levels still look normal). The two series zero-fill
    * over a COMMON global day spine (dailyFilled anchors t per type,
    * which would misalign the join — alignment is the whole point
    * here), then one windowed pass computes the six exact integer sums
    * and the Pearson closed form per day. The window is unkeyed BUT
    * calendar-bounded (day-span rows — the module's second-level-pass
    * rule); zero-variance windows yield NULL. */
  def evRollingCorr(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(
        sum((col("event_type") === "click").cast("long")).as("xr"),
        sum((col("event_type") === "purchase").cast("long")).as("yr"))
    val span = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(ev, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("xr"), lit(0L)).as("x"),
        coalesce(col("yr"), lit(0L)).as("y"))
    val w = Window.orderBy(col("day").asc).rowsBetween(-13, 0)
    spine
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum("x").over(w))
      .withColumn("sy", sum("y").over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("den", expr(
        "(cast(n as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))" +
          " * (cast(n as double) * cast(syy as double)" +
          " - cast(sy as double) * cast(sy as double))"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("x").as("n_clicks"), col("y").as("n_purchases"),
        col("n").cast("int").as("win_days"),
        expr("round(case when den <= 0 then null else" +
          " (cast(n as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double))" +
          " / sqrt(den) end, 6)").as("corr14"))
      .orderBy("day")
  }

  /** T238: SEGMENT-LEVEL sample-ratio mismatch — [[evAbSrm]] sliced by
    * event type: a GLOBAL 50/50 can pass while one segment is badly
    * skewed (the redirect bug that only fires on one surface — the
    * second most common experiment invalidator after global SRM, and
    * invisible to the pooled test). Per segment: distinct users per
    * parity arm (a user active in two segments counts in both — the
    * panel audits each segment's own assignment), the same fixed
    * chi-square expression, the same df=1 95% flag. One
    * (event_type, user) distinct + one conditional aggregate. */
  def evSrmSegments(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("event_type"), col("user_id"))
      .distinct()
      .groupBy("event_type")
      .agg(
        sum((col("user_id") % 2 === 0).cast("long")).as("n_a"),
        sum((col("user_id") % 2 =!= 0).cast("long")).as("n_b"))
      .withColumn("e", (col("n_a") + col("n_b")).cast("double") / lit(2.0))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round((col("n_a").cast("double") - col("e"))
          * (col("n_a").cast("double") - col("e")) / col("e")
          + (col("n_b").cast("double") - col("e"))
          * (col("n_b").cast("double") - col("e")) / col("e"), 6)
          .as("chi2"))
      .withColumn("srm_flag", (col("chi2") > 3.841459).cast("int"))
      .orderBy("event_type")

  /** T168: NEYMAN-OPTIMAL stratified sample allocation (Neyman 1934)
    * — given a 1,000-row sampling budget over the event-type strata,
    * allocate n_h ∝ N_h·S_h (stratum size × stratum standard
    * deviation): the design that minimizes the estimator's variance,
    * vs proportional allocation's N_h-only split. The op every
    * eval-set or labeling-budget designer runs before sampling.
    *
    * Determinism: per-stratum sufficient statistics are exact DECIMAL
    * sums in ONE corpus scan (the profile_corr idiom); the std and
    * the N_h·S_h weight are fixed double expression trees shared with
    * the oracle; the weight then QUANTIZES to a 1e-6-scaled BIGINT so
    * the integer allocation is a largest-remainder split (the
    * a21_allocate machinery: base = div, leftovers ranked by exact
    * remainder, ties to stratum name) — allocations sum to exactly
    * 1,000 with no FP anywhere in the split.
    *
    * 100 TB posture: one map-side-combinable aggregate; everything
    * after runs on the |strata|-row panel (bounded windows). */
  def sampleNeyman(s: SparkSession, d: String): DataFrame = {
    val budget = 1000L
    val st = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"),
        sum(col("value").cast("decimal(18,6)")).as("sx"),
        sum((col("value") * col("value")).cast("decimal(28,12)"))
          .as("sxx"))
      .withColumn("mean_v", expr(
        "round(cast(sx as double) / cast(nh as double), 6)"))
      .withColumn("std_v", expr(
        "case when nh < 2 then 0.0 else" +
          " sqrt((cast(nh as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))" +
          " / (cast(nh as double) * cast(nh - 1 as double))) end"))
      .withColumn("wq", expr(
        "cast(floor(cast(nh as double) * std_v * 1000000.0 + 0.5)" +
          " as bigint)"))
    // all-zero weights (every stratum constant or single-row) fall
    // back to PROPORTIONAL allocation by stratum size — without this
    // the div/mod by zero would null every allocation
    val tot = st.agg(sum("wq").as("wsum"), sum("nh").as("nsum"))
    val wp = Window.partitionBy(lit(1)) // |strata|-row bounded panel
    val wr = Window.orderBy(col("fr").desc, col("event_type").asc)
    st.crossJoin(broadcast(tot))
      .withColumn("ew", expr("case when wsum = 0 then nh else wq end"))
      .withColumn("sumwq", expr("case when wsum = 0 then nsum else wsum end"))
      .withColumn("base", expr(s"$budget * ew div sumwq"))
      .withColumn("fr", expr(s"($budget * ew) % sumwq"))
      .withColumn("rsum", sum(col("fr")).over(wp))
      .withColumn("r", expr("rsum div sumwq"))
      .withColumn("rn", row_number().over(wr))
      .select(col("event_type"), col("nh").as("n_rows"),
        col("mean_v"), round(col("std_v"), 6).as("std_v"),
        col("wq"),
        (col("base") + when(col("rn") <= col("r"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy(col("event_type"))
  }

  /** T173: CUPED variance reduction for the A/B readout (Deng et al.
    * 2013, "Improving the sensitivity of online controlled
    * experiments") — adjust each user's experiment-period metric by
    * their PRE-period behavior: y' = y − θ(x − x̄), θ = cov(x,y)/
    * var(x). The industry-standard way to shrink experiment
    * confidence intervals without more traffic; the panel reports the
    * per-arm raw vs adjusted means and the achieved variance
    * reduction.
    *
    * Determinism contract: the pre/post split is the integer-µs
    * midpoint of the observed span; per-user x/y are exact DECIMAL
    * sums; θ and x̄ come from exact DECIMAL sufficient statistics
    * through a fixed double tree; each user's adjusted metric
    * QUANTIZES to decimal(18,6) before any cross-user sum, so the
    * per-arm aggregates are order-free (the scaled-long idiom in its
    * decimal form). Arms are user-parity, the ev_abtest convention.
    *
    * 100 TB posture: one corpus scan → user agg (map-side
    * combinable), one 1-row stats agg broadcast back, one arm agg —
    * no window, no join wider than a broadcast. */
  def evCuped(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tu"),
        col("value"))
    val span = ev.agg(expr("(min(tu) + max(tu)) div 2").as("mid"))
    val perUser = ev.crossJoin(broadcast(span))
      .groupBy("user_id")
      .agg(
        sum(when(col("tu") <= col("mid"),
          col("value").cast("decimal(18,2)")).otherwise(lit(0)
            .cast("decimal(18,2)"))).cast("decimal(18,2)").as("x"),
        sum(when(col("tu") > col("mid"),
          col("value").cast("decimal(18,2)")).otherwise(lit(0)
            .cast("decimal(18,2)"))).cast("decimal(18,2)").as("y"))
      .withColumn("variant", expr("cast(user_id % 2 as int)"))
    val stats = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,6)")).as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,6)")).as("sxx"))
    val withTheta = perUser.crossJoin(broadcast(stats))
      .withColumn("theta", expr(
        "(cast(n as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double))" +
          " / (cast(n as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))"))
      .withColumn("xbar", expr("cast(sx as double) / cast(n as double)"))
      .withColumn("adjq", expr(
        "cast(round(cast(y as double)" +
          " - theta * (cast(x as double) - xbar), 6)" +
          " as decimal(18,6))"))
    withTheta.groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(col("y")).as("sy_a"),
        sum((col("y") * col("y")).cast("decimal(38,6)")).as("syy_a"),
        sum(col("adjq")).as("sa_a"),
        sum((col("adjq") * col("adjq")).cast("decimal(38,12)"))
          .as("saa_a"),
        max(col("theta")).as("theta"))
      .select(col("variant"), col("n_users"),
        expr("round(cast(sy_a as double) / cast(n_users as double), 6)")
          .as("mean_y"),
        expr("round(cast(sa_a as double) / cast(n_users as double), 6)")
          .as("mean_adj"),
        expr("round(theta, 6)").as("theta"),
        expr("round(1.0 - (cast(saa_a as double)" +
          " / cast(n_users as double)" +
          " - pow(cast(sa_a as double) / cast(n_users as double), 2))" +
          " / (cast(syy_a as double) / cast(n_users as double)" +
          " - pow(cast(sy_a as double) / cast(n_users as double), 2))" +
          ", 6)").as("var_reduction"))
      .orderBy("variant")
  }

  /** T177: QUANTILE treatment effects — the distributional A/B
    * readout a mean difference hides: treated-vs-control value
    * quantiles (p10/p25/p50/p75/p90) and their per-quantile deltas
    * (does the treatment lift the median or just the tail?). Exact
    * linear-interpolation percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the a12 precedent) per parity arm, pivoted wide
    * then unpivoted to one row per quantile via `stack`. One corpus
    * agg per arm group — the quantile family needs the per-group sort
    * (swap to approx_percentile sketches at tolerance, same shape). */
  def evQte(s: SparkSession, d: String): DataFrame = {
    // (display label, dot-free column suffix, fraction)
    val ps = Seq(("0.10", "p10", 0.10), ("0.25", "p25", 0.25),
      ("0.50", "p50", 0.50), ("0.75", "p75", 0.75),
      ("0.90", "p90", 0.90))
    val qCols = ps.map { case (_, sfx, p) =>
      round(expr(s"percentile(CAST(value AS DOUBLE), $p)"), 6)
        .as(s"q$sfx")
    }
    val arms = Tables.events(s, d)
      .select(col("value"), expr("cast(user_id % 2 as int)").as("v"))
      .groupBy("v")
      .agg(qCols.head, qCols.tail: _*)
    val wideCols = ps.flatMap { case (_, sfx, _) =>
      Seq(max(when(col("v") === 0, col(s"q$sfx"))).as(s"c$sfx"),
        max(when(col("v") === 1, col(s"q$sfx"))).as(s"t$sfx"))
    }
    val wide = arms.groupBy().agg(wideCols.head, wideCols.tail: _*)
    val stackArgs = ps.map { case (lbl, sfx, _) =>
      s"'$lbl', c$sfx, t$sfx"
    }.mkString(", ")
    wide.select(expr(
        s"stack(${ps.size}, $stackArgs) as (quantile, control, treat)"))
      .withColumn("qte",
        round(col("treat") - col("control"), 6))
      .orderBy("quantile")
  }

  /** T178: DIFFERENCE-IN-DIFFERENCES — the quasi-experimental readout
    * when assignment isn't randomized per-exposure: mean event value
    * per (parity arm × pre/post period around the event-time
    * midpoint), effect = (treat_post − treat_pre) − (ctrl_post −
    * ctrl_pre), netting out both the arm baseline and the common time
    * trend. The four cell sums are exact DECIMAL; all double math
    * happens once on the 1-row panel with the oracle's expression
    * tree. One events scan → 4-group agg with a broadcast 1-row
    * midpoint — scale-shape identical to [[evCuped]]. */
  def evDiffInDiff(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tu"),
        col("value"))
    val span = ev.agg(expr("(min(tu) + max(tu)) div 2").as("mid"))
    val cells = ev.crossJoin(broadcast(span))
      .select(expr("cast(user_id % 2 as int)").as("variant"),
        expr("cast(tu > mid as int)").as("post"),
        money(col("value")).as("v"))
      .groupBy("variant", "post")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    def cell(v: Int, p: Int, c: String) =
      max(when(col("variant") === v && col("post") === p, col(c)))
    cells.groupBy()
      .agg(cell(0, 0, "n").as("n_c_pre"), cell(0, 1, "n").as("n_c_post"),
        cell(1, 0, "n").as("n_t_pre"), cell(1, 1, "n").as("n_t_post"),
        cell(0, 0, "sv").as("s_c_pre"), cell(0, 1, "sv").as("s_c_post"),
        cell(1, 0, "sv").as("s_t_pre"), cell(1, 1, "sv").as("s_t_post"))
      .withColumn("m_c_pre",
        expr("cast(s_c_pre as double) / cast(n_c_pre as double)"))
      .withColumn("m_c_post",
        expr("cast(s_c_post as double) / cast(n_c_post as double)"))
      .withColumn("m_t_pre",
        expr("cast(s_t_pre as double) / cast(n_t_pre as double)"))
      .withColumn("m_t_post",
        expr("cast(s_t_post as double) / cast(n_t_post as double)"))
      .select(col("n_c_pre"), col("n_c_post"), col("n_t_pre"),
        col("n_t_post"),
        expr("round(m_c_pre, 6)").as("mean_ctrl_pre"),
        expr("round(m_c_post, 6)").as("mean_ctrl_post"),
        expr("round(m_t_pre, 6)").as("mean_treat_pre"),
        expr("round(m_t_post, 6)").as("mean_treat_post"),
        expr("round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6)")
          .as("did"))
  }

  /** T179: DELETE-ONE-GROUP JACKKNIFE standard error for the
    * conversion rate — the variance machinery behind every ratio-
    * metric CI at scale (users are not i.i.d. rows; bucket-level
    * resampling is, and the jackknife is its deterministic form, no
    * RNG): users hash into 20 buckets (md5 of the id — independent of
    * the parity arms), θ_i = leave-bucket-i-out conversion rate,
    * SE² = (G−1)/G · Σ(θ_i − θ̄)². Per-bucket (n, conv) fold first
    * (corpus → 20 exact-integer rows), totals broadcast back; the
    * 20 double θ-terms quantize to the 1e-9 grid before the variance
    * sum (the sMAPE idiom) so accumulation order can't flip a bit. */
  def evJackknife(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(expr("case when sum(case when event_type = 'purchase'" +
        " then 1 else 0 end) >= 14 then 1 else 0 end").as("converted"))
      .withColumn("g", expr(
        "cast(conv(substring(md5(cast(user_id as string)), 1, 8)," +
          " 16, 10) as bigint) % 20"))
    val buckets = perUser.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("converted").as("c"))
    val tot = buckets.agg(sum("n").as("tn"), sum("c").as("tc"),
      count(lit(1)).as("gg"))
    val theta = buckets.crossJoin(broadcast(tot))
      .withColumn("th", expr(
        "case when tn - n = 0 then null" +
          " else cast(tc - c as double) / cast(tn - n as double) end"))
      // decimal(18,9), NOT the usual (28,9) grid type: θ ∈ [0,1], and
      // the variance sum below squares thq — (28,9)² needs precision
      // 57, which Spark silently rescales to scale 6 (precision-loss
      // rule), while (18,9)² = (37,18) stays exact under the 38 cap
      .withColumn("thq", expr(
        "cast(round(th, 9) as decimal(18,9))"))
    theta.groupBy()
      .agg(max("tn").as("n_users"), max("tc").as("n_conv"),
        max("gg").as("g"), sum(col("thq")).as("sth"),
        sum((col("thq") * col("thq")).cast("decimal(38,18)")).as("sthh"))
      .withColumn("rate", expr(
        "cast(n_conv as double) / cast(n_users as double)"))
      .withColumn("se", expr(
        "sqrt((cast(g as double) - 1.0) / cast(g as double)" +
          " * (cast(sthh as double) - cast(sth as double)" +
          " * cast(sth as double) / cast(g as double)))"))
      .select(col("n_users"), col("n_conv"),
        expr("round(rate, 6)").as("rate"),
        expr("round(se, 6)").as("se_jack"),
        expr("round(rate - 1.96 * se, 6)").as("ci_lo"),
        expr("round(rate + 1.96 * se, 6)").as("ci_hi"))
  }

  /** T180: one-sided CUSUM drift detector per event type over the
    * zero-filled daily series — the change monitor that fires on a
    * sustained small shift a per-day z-score (ev_anomaly) misses.
    * Restated non-recursively so it's pure windows: with P_t =
    * Σ_{j≤t}(x_j − μ), the classic S_t = max(0, S_{t−1} + x_t − μ)
    * equals P_t − min_{j≤t} P_j. Both P and its running min stay
    * EXACT by clearing the rational mean: num_t = n·prefix_t − t·s
    * (longs), S_t = (num_t − min num)/n. Two type-keyed window passes
    * over the calendar-bounded spine; the report is the max statistic
    * and its first alarm day. */
  def evCusum(s: SparkSession, d: String): DataFrame = {
    val f = dailyFilled(s, d)
    val stats = f.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val w = Window.partitionBy("event_type").orderBy("t")
    val scored = f.join(broadcast(stats), "event_type")
      .withColumn("px", sum("x").over(w))
      .withColumn("num",
        col("n") * col("px") - (col("t") + 1) * col("sx"))
      .withColumn("mn", min("num").over(w))
      .withColumn("cu", expr(
        "cast(num - mn as double) / cast(n as double)"))
    scored.groupBy("event_type")
      .agg(max(struct(round(col("cu"), 6).as("s"),
        (-col("t")).as("negt"))).as("top"))
      .select(col("event_type"),
        col("top.s").as("cusum_max"),
        (-col("top.negt")).cast("int").as("t_alarm"))
      .orderBy("event_type")
  }

  /** T181: WINSORIZED / TRIMMED arm means — the robust A/B metric
    * that keeps one whale from deciding the experiment: per parity
    * arm, exact p05/p95 value fences (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the a12 precedent), then the mean of the
    * clamped values and the mean of the strictly-inside values.
    * Clamped doubles quantize to the 1e-6 grid before the cross-user
    * sum (the evCuped adjq idiom). Two scans: a 2-row fence panel,
    * broadcast back over one re-aggregate. */
  def evWinsorized(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(expr("cast(user_id % 2 as int)").as("variant"),
        col("value").cast("double").as("v"))
    val fences = ev.groupBy("variant")
      .agg(round(expr("percentile(v, 0.05)"), 6).as("lo"),
        round(expr("percentile(v, 0.95)"), 6).as("hi"))
    ev.join(broadcast(fences), "variant")
      .withColumn("wq", expr(
        "cast(round(least(greatest(v, lo), hi), 6) as decimal(18,6))"))
      .withColumn("vq", expr("cast(round(v, 6) as decimal(18,6))"))
      .groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum("vq").as("sv"),
        sum("wq").as("sw"),
        sum(when(col("v") >= col("lo") && col("v") <= col("hi"),
          col("vq"))).as("st"),
        sum(when(col("v") >= col("lo") && col("v") <= col("hi"), 1L)
          .otherwise(0L)).as("nt"),
        max("lo").as("lo"), max("hi").as("hi"))
      .select(col("variant"), col("n"), col("lo"), col("hi"),
        expr("round(cast(sv as double) / cast(n as double), 6)")
          .as("mean_raw"),
        expr("round(cast(sw as double) / cast(n as double), 6)")
          .as("mean_winsor"),
        col("nt").as("n_kept"),
        expr("round(cast(st as double) / cast(nt as double), 6)")
          .as("mean_trimmed"))
      .orderBy("variant")
  }

  /** Per-user purchase revenue in exact integer cents with the parity
    * arm tag — the shared fixture for the nonparametric two-sample
    * tests ([[evRankSum]], [[evKsTest]]). Users with no purchase rows
    * are absent (no imputed zeros), matching the classic "revenue per
    * paying user" framing. */
  private def purchaseCents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(money(col("value"))).as("rev"))
      .select(col("user_id"), (col("rev") * 100).cast("long").as("cents"),
        expr("cast(user_id % 2 as int)").as("trt"))

  /** T201: MANN–WHITNEY U rank-sum test of per-user purchase revenue
    * by parity arm — the nonparametric A/B readout that needs no
    * normality assumption. Average ranks over ties come from the
    * value-grouped table: a tied group at cents v with c members and
    * p predecessors contributes avg rank p + (c+1)/2, so 2·R_treat =
    * Σ ct·(2p + c + 1) is an EXACT integer; 2·U = 2R − n₁(n₁+1), the
    * tie-corrected variance uses the exact Σ(c³−c), and the single
    * z = (2U − n₁n₀) / (2·√var) double tree runs once on the 1-row
    * panel (oracle-identical). Predecessor counts use the ev_gini
    * two-level cumulative (banded in-group window + broadcast band
    * offsets) — no global rank window ever sorts the user table. */
  def evRankSum(s: SparkSession, d: String): DataFrame = {
    val vc = purchaseCents(s, d).groupBy("cents")
      .agg(count(lit(1)).as("c"), sum("trt").as("ct"))
      .withColumn("__b", floor(col("cents") / 100000).cast("long"))
    val wIn = Window.partitionBy("__b").orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = vc.groupBy("__b").agg(sum("c").as("tb"))
      .withColumn("off", coalesce(sum("tb").over(wOff), lit(0L)))
      .select("__b", "off")
    vc.withColumn("pin", coalesce(sum("c").over(wIn), lit(0L)))
      .join(offs, Seq("__b"))
      .withColumn("p", col("off") + col("pin"))
      .agg(sum("c").as("nn"), sum("ct").as("n1"),
        sum(expr("ct * (2 * p + c + 1)")).as("r2"),
        sum(expr("c * c * c - c")).as("ties"))
      .withColumn("n0", col("nn") - col("n1"))
      .withColumn("u2", expr("r2 - n1 * (n1 + 1)"))
      .withColumn("varu", expr(
        "case when nn < 2 then null else" +
          " cast(n1 as double) * cast(n0 as double) / 12.0" +
          " * (cast(nn + 1 as double) - cast(ties as double)" +
          " / (cast(nn as double) * cast(nn - 1 as double))) end"))
      .withColumn("z", expr(
        "case when varu is null or varu <= 0 then null else" +
          " (cast(u2 as double)" +
          " - cast(n1 as double) * cast(n0 as double))" +
          " / (2.0 * sqrt(varu)) end"))
      .select(col("n0").as("n_control"), col("n1").as("n_treat"),
        expr("cast(u2 as double) / 2.0").as("u_treat"),
        expr("round(z, 6)").as("z"),
        expr("cast(abs(z) > 1.96 as int)").as("significant"))
  }

  /** T202: two-sample KOLMOGOROV–SMIRNOV test on per-user purchase
    * revenue by parity arm — the distribution-shift A/B readout (did
    * the whole revenue CURVE move, not just the mean). The D statistic
    * is assembled from exact integers: at every distinct cents value,
    * |cumt·n₀ − cumc·n₁| (inclusive per-arm cumulative counts cross-
    * multiplied by the opposite arm size) maxes to D·n₁·n₀ without a
    * single double riding the scan; the normalized K = √(n₁n₀/N)·D
    * and the 1.358 (α=0.05) cut happen once on the 1-row panel.
    * Cumulatives use the banded two-level window — no global sort. */
  def evKsTest(s: SparkSession, d: String): DataFrame = {
    val ur = purchaseCents(s, d)
    val vc = ur.groupBy("cents")
      .agg(sum("trt").as("ct"),
        sum(expr("1 - trt")).as("cc"))
      .withColumn("__b", floor(col("cents") / 100000).cast("long"))
    val wIn = Window.partitionBy("__b").orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = vc.groupBy("__b")
      .agg(sum("ct").as("tbt"), sum("cc").as("tbc"))
      .withColumn("offt", coalesce(sum("tbt").over(wOff), lit(0L)))
      .withColumn("offc", coalesce(sum("tbc").over(wOff), lit(0L)))
      .select("__b", "offt", "offc")
    val tot = ur.agg(sum("trt").as("n1"),
      sum(expr("1 - trt")).as("n0"))
    vc.withColumn("pint", sum("ct").over(wIn))
      .withColumn("pinc", sum("cc").over(wIn))
      .join(offs, Seq("__b"))
      .crossJoin(broadcast(tot))
      .withColumn("dnum", abs(
        (col("offt") + col("pint")) * col("n0") -
          (col("offc") + col("pinc")) * col("n1")))
      .agg(max("dnum").as("dmax"), max("n1").as("n1"),
        max("n0").as("n0"))
      .withColumn("d", expr(
        "case when n1 * n0 = 0 then null else" +
          " cast(dmax as double) / (cast(n1 as double) * cast(n0 as double)) end"))
      .select(col("n0").as("n_control"), col("n1").as("n_treat"),
        expr("round(d, 6)").as("d_stat"),
        expr("round(sqrt(cast(n1 as double) * cast(n0 as double)" +
          " / cast(n1 + n0 as double)) * d, 6)").as("k_stat"),
        expr("cast(sqrt(cast(n1 as double) * cast(n0 as double)" +
          " / cast(n1 + n0 as double)) * d > 1.358 as int)")
          .as("significant"))
  }

  /** T203: SPRT — Wald's sequential probability ratio test on the
    * per-arm conversion stream (H₀: p=0.10 vs H₁: p=0.15, α=β=0.05),
    * the always-valid peek that replaces a fixed-horizon z-test when
    * the experiment is monitored live. Users arrive in user_id order;
    * the log-likelihood ratio after t trials with k conversions is
    * k·ln(1.5) + (t−k)·ln(17/18), held EXACTLY as the integer
    * k·405465108108 − (t−k)·57158413839 on the 1e-12 grid (the two
    * increments and the ±ln 19 = ±2944438979166 boundaries are
    * constants, so no float ever enters the decision), and the first
    * boundary crossing is a min-over-crossings aggregate. Trial
    * indices and running conversions come from the banded two-level
    * cumulative (user_id div 1024) — no global sort at any width. */
  def evSprt(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(expr("case when sum(case when event_type = 'purchase'" +
        " then 1 else 0 end) >= 14 then 1 else 0 end").as("conv"))
      .withColumn("variant", expr("cast(user_id % 2 as int)"))
      .withColumn("__b", floor(col("user_id") / 1024).cast("long"))
    val wIn = Window.partitionBy("variant", "__b")
      .orderBy(col("user_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy("variant").orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = perUser.groupBy("variant", "__b")
      .agg(count(lit(1)).as("nb"), sum("conv").as("cb"))
      .withColumn("offn", coalesce(sum("nb").over(wOff), lit(0L)))
      .withColumn("offc", coalesce(sum("cb").over(wOff), lit(0L)))
      .select("variant", "__b", "offn", "offc")
    perUser
      .withColumn("tin", count(lit(1)).over(wIn))
      .withColumn("cin", sum("conv").over(wIn))
      .join(offs, Seq("variant", "__b"))
      .withColumn("t", col("offn") + col("tin"))
      .withColumn("k", col("offc") + col("cin"))
      .withColumn("llr",
        expr("k * 405465108108 - (t - k) * 57158413839"))
      .groupBy("variant")
      .agg(max("t").as("n_trials"), max("k").as("n_conv"),
        min(when(col("llr") >= 2944438979166L, col("t"))).as("th1"),
        min(when(col("llr") <= -2944438979166L, col("t"))).as("th0"),
        expr("max_by(llr, t)").as("llrEnd"))
      .withColumn("decision_t", expr(
        "case when th1 is not null and (th0 is null or th1 <= th0)" +
          " then th1 when th0 is not null then th0 else -1 end"))
      .select(col("variant"), col("n_trials"), col("n_conv"),
        expr("round(cast(llrEnd as double) / 1e12, 6)").as("llr_final"),
        col("decision_t"),
        expr("case when th1 is not null and (th0 is null or th1 <= th0)" +
          " then 'accept_h1' when th0 is not null then 'accept_h0'" +
          " else 'continue' end").as("decision"))
      .orderBy("variant")
  }

  /** T204: deterministic POISSON BOOTSTRAP confidence interval for
    * mean per-user revenue — the only bootstrap that works at cluster
    * scale (each row draws its own replicate weights; nothing is ever
    * resampled "with replacement" across the fleet). Replicate b
    * weights each user by the inverse-CDF Poisson(1) draw of the
    * uniform u = md5(user:b)[0,8)/2³², so both engines replay the
    * identical resample from the hash alone. Replicate means quantize
    * to the 1e-6 grid (DECIMAL(18,6)) before the 32-row panel, making
    * the bootstrap SE's Σq/Σq² exact; the interval is the 2nd-smallest
    * / 2nd-largest replicate mean — exact order statistics (a ~94% CI
    * at B=32), immune to quantile-interpolation drift. */
  def evBootstrap(s: SparkSession, d: String): DataFrame = {
    val ur = Tables.events(s, d)
      .groupBy("user_id")
      .agg(sum(money(col("value"))).as("rev"))
      .select(col("user_id"), (col("rev") * 100).cast("long").as("cents"))
    val rep = ur
      .select(col("user_id"), col("cents"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("hv", expr(
        "cast(conv(substring(md5(concat(cast(user_id as string), ':'," +
          " cast(b as string))), 1, 8), 16, 10) as bigint)"))
      .withColumn("u", expr("cast(hv as double) / 4294967296.0"))
      .withColumn("w", expr(
        "case when u < 0.3678794412 then 0 when u < 0.7357588823 then 1" +
          " when u < 0.9196986029 then 2 when u < 0.9810118431 then 3" +
          " when u < 0.9963401532 then 4 when u < 0.9994058152 then 5" +
          " when u < 0.9999167589 then 6 else 7 end"))
    val means = rep.groupBy("b")
      .agg(sum(expr("w * cents")).as("swx"), sum("w").as("sw"))
      .filter(col("sw") > 0)
      .withColumn("qm", expr(
        "cast(round(cast(swx as double) / cast(sw as double) / 100.0," +
          " 6) as decimal(18,6))"))
    // the upper bound ranks DESCENDING (2nd-largest = desc-rank 2)
    // instead of pinning an absolute asc-rank 31, so the documented
    // order-statistic contract holds even when replicates drop out of
    // the sw>0 filter (round-8 ADVICE: rn=31 silently became the max —
    // or NULL — whenever n_rep < 32). Both windows are ≤32-row panels.
    val wRank = Window.orderBy(col("qm").asc, col("b").asc)
    val wRankD = Window.orderBy(col("qm").desc, col("b").desc)
    val ranked = means.withColumn("rn", row_number().over(wRank))
      .withColumn("rd", row_number().over(wRankD))
    val base = ur.agg(count(lit(1)).as("n_users"), sum("cents").as("sc"))
    ranked
      .agg(count(lit(1)).as("n_rep"), sum("qm").as("sq"),
        sum(expr("qm * qm")).as("sqq"),
        max(when(col("rn") === 2, col("qm"))).as("qlo"),
        max(when(col("rd") === 2, col("qm"))).as("qhi"))
      .crossJoin(broadcast(base))
      .select(col("n_users"), col("n_rep"),
        expr("round(cast(sc as double) / cast(n_users as double)" +
          " / 100.0, 6)").as("est_mean"),
        expr("round(case when n_rep < 2 then null else" +
          " sqrt((cast(sqq as double) - cast(sq as double)" +
          " * cast(sq as double) / cast(n_rep as double))" +
          " / cast(n_rep - 1 as double)) end, 6)").as("boot_se"),
        expr("cast(qlo as double)").as("ci_lo"),
        expr("cast(qhi as double)").as("ci_hi"))
  }

  /** T205: QINI / UPLIFT decile table — the incrementality readout
    * that ranks users by a targeting score (pre-activity = per-user
    * event count) and asks, decile by decile, how much conversion the
    * treatment actually CAUSED. Deciles come from nine exact
    * percentile cuts of the score (broadcast 1-row panel, ties to the
    * lower-activity decile — no ntile, whose row-order tie-breaks are
    * engine-dependent), cells are exact integer (decile × arm) counts,
    * and the Qini curve's cumulative increment c_t − c_c·n_t/n_c
    * quantizes to the 1e-9 grid before the 10-row ordered cumsum, so
    * the curve is bit-stable. */
  def evQini(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("ne"),
        expr("case when sum(case when event_type = 'purchase'" +
          " then 1 else 0 end) >= 14 then 1 else 0 end").as("conv"))
      .withColumn("variant", expr("cast(user_id % 2 as int)"))
    val cutCols = (1 to 9).map(i => round(expr(
      s"percentile(cast(ne as double), 0.${10 - i})"), 6).as(s"q$i"))
    val cuts = perUser.agg(cutCols.head, cutCols.tail: _*)
    val cells = perUser.crossJoin(broadcast(cuts))
      .withColumn("decile", expr(
        "case when cast(ne as double) > q1 then 1" +
          " when cast(ne as double) > q2 then 2" +
          " when cast(ne as double) > q3 then 3" +
          " when cast(ne as double) > q4 then 4" +
          " when cast(ne as double) > q5 then 5" +
          " when cast(ne as double) > q6 then 6" +
          " when cast(ne as double) > q7 then 7" +
          " when cast(ne as double) > q8 then 8" +
          " when cast(ne as double) > q9 then 9 else 10 end"))
      .groupBy("decile", "variant")
      .agg(count(lit(1)).as("n"), sum("conv").as("cv"))
    val wide = cells.groupBy("decile")
      .agg(
        coalesce(max(when(col("variant") === 1, col("n"))), lit(0L))
          .as("n_treat"),
        coalesce(max(when(col("variant") === 1, col("cv"))), lit(0L))
          .as("conv_treat"),
        coalesce(max(when(col("variant") === 0, col("n"))), lit(0L))
          .as("n_control"),
        coalesce(max(when(col("variant") === 0, col("cv"))), lit(0L))
          .as("conv_control"))
      .withColumn("inc", expr(
        "cast(round(case when n_control = 0 then cast(conv_treat as double)" +
          " else cast(conv_treat as double) - cast(conv_control as double)" +
          " * cast(n_treat as double) / cast(n_control as double) end," +
          " 9) as decimal(18,9))"))
    val wCum = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wide.withColumn("qini_cum", sum("inc").over(wCum))
      .select(col("decile").cast("int").as("decile"),
        col("n_treat"), col("conv_treat"),
        col("n_control"), col("conv_control"),
        expr("round(case when n_treat = 0 or n_control = 0 then null" +
          " else cast(conv_treat as double) / cast(n_treat as double)" +
          " - cast(conv_control as double) / cast(n_control as double)" +
          " end, 6)").as("uplift"),
        expr("round(cast(qini_cum as double), 6)").as("qini"))
      .orderBy("decile")
  }

  /** T208: TOST equivalence test (two one-sided tests, margin
    * δ = 0.02 absolute on conversion rate) — the readout that can
    * PROVE "the cheaper variant is no worse", which a plain z-test
    * can never do (failing to reject ≠ equivalent). Arm cells are the
    * exact [[evAbtest]] integers; the unpooled SE and both one-sided
    * z's — z_lower = (Δ+δ)/se against −δ, z_upper = (δ−Δ)/se against
    * +δ — run once on the 1-row panel; equivalence = both > 1.645
    * (α = 0.05). */
  def evTost(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(expr("case when sum(case when event_type = 'purchase'" +
        " then 1 else 0 end) >= 14 then 1 else 0 end").as("conv"))
      .withColumn("variant", expr("cast(user_id % 2 as int)"))
    perUser.groupBy()
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0, col("conv"))
          .otherwise(lit(0))).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, col("conv"))
          .otherwise(lit(0))).as("c1"))
      .withColumn("p0", expr("cast(c0 as double) / cast(n0 as double)"))
      .withColumn("p1", expr("cast(c1 as double) / cast(n1 as double)"))
      .withColumn("se", expr(
        "sqrt(p0 * (1.0 - p0) / cast(n0 as double)" +
          " + p1 * (1.0 - p1) / cast(n1 as double))"))
      .withColumn("zl", expr(
        "case when se = 0 then null else (p1 - p0 + 0.02) / se end"))
      .withColumn("zu", expr(
        "case when se = 0 then null else (0.02 - (p1 - p0)) / se end"))
      .select(col("n0").as("n_control"), col("c0").as("conv_control"),
        col("n1").as("n_treat"), col("c1").as("conv_treat"),
        expr("round(p1 - p0, 6)").as("diff"),
        expr("round(se, 6)").as("se"),
        expr("round(zl, 6)").as("z_lower"),
        expr("round(zu, 6)").as("z_upper"),
        expr("cast(zl > 1.645 and zu > 1.645 as int)").as("equivalent"))
  }

  /** T209: DELTA-METHOD ratio-metric test — revenue per event, the
    * ratio whose numerator and denominator are correlated per user
    * (naive per-user-mean z-tests are simply wrong here; the delta
    * method is the industry-standard fix). Per arm, six exact moments
    * (n, Σx, Σk, Σx², Σk², Σxk with x = cents, k = events) feed
    * var(R) = (s²_x − 2R·s_xk + R²·s²_k) / (n·k̄²) on the 1-row
    * panel; z compares arms through the combined SE. Sums of cents²
    * ride DECIMAL(38,0) so 100 TB of whales cannot overflow them. */
  def evRatioDelta(s: SparkSession, d: String): DataFrame = {
    val pu = Tables.events(s, d)
      .groupBy("user_id")
      .agg(sum(money(col("value"))).as("rev"), count(lit(1)).as("k"))
      .select(expr("cast(user_id % 2 as int)").as("variant"),
        (col("rev") * 100).cast("long").as("x"), col("k"))
    val arms = pu.groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("k").as("sk"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(k as decimal(38,0)) * k")).as("skk"),
        sum(expr("cast(x as decimal(38,0)) * k")).as("sxk"))
      .withColumn("r", expr("cast(sx as double) / cast(sk as double)"))
      .withColumn("kbar", expr("cast(sk as double) / cast(n as double)"))
      .withColumn("vx", expr(
        "(cast(sxx as double) - cast(sx as double) * cast(sx as double)" +
          " / cast(n as double)) / cast(n - 1 as double)"))
      .withColumn("vk", expr(
        "(cast(skk as double) - cast(sk as double) * cast(sk as double)" +
          " / cast(n as double)) / cast(n - 1 as double)"))
      .withColumn("cxk", expr(
        "(cast(sxk as double) - cast(sx as double) * cast(sk as double)" +
          " / cast(n as double)) / cast(n - 1 as double)"))
      .withColumn("vr", expr(
        "(vx - 2.0 * r * cxk + r * r * vk)" +
          " / (cast(n as double) * kbar * kbar)"))
    arms.groupBy()
      .agg(max(when(col("variant") === 0, col("n"))).as("n_control"),
        max(when(col("variant") === 1, col("n"))).as("n_treat"),
        max(when(col("variant") === 0, col("r"))).as("r0"),
        max(when(col("variant") === 1, col("r"))).as("r1"),
        max(when(col("variant") === 0, col("vr"))).as("v0"),
        max(when(col("variant") === 1, col("vr"))).as("v1"))
      .withColumn("z", expr(
        "case when v0 + v1 <= 0 then null else" +
          " (r1 - r0) / sqrt(v0 + v1) end"))
      .select(col("n_control"), col("n_treat"),
        expr("round(r0 / 100.0, 6)").as("rpe_control"),
        expr("round(r1 / 100.0, 6)").as("rpe_treat"),
        expr("round(sqrt(v0 + v1) / 100.0, 6)").as("se"),
        expr("round(z, 6)").as("z"),
        expr("cast(abs(z) > 1.96 as int)").as("significant"))
  }

  /** T217: NPV-DISCOUNTED cohort LTV — revenue a weekly signup
    * cohort is WORTH today at a 0.9/week discount, the finance-grade
    * complement of [[evCohortLtv]]'s raw curves (which overweight
    * far-future revenue a CFO would discount away). The discount
    * ladder 0.9^k is a 37-row LITERAL table of 1e-12-scale decimals
    * (BigDecimal-derived, identical text in the oracle), so no pow()
    * ever runs in either engine and cents·factor stays an exact
    * (23,0)×(14,12)→(38,12) product — Spark's product precision is
    * p1+p2+1 = 38, EXACTLY the cap, so no precision-loss rescale fires
    * (a (24,0) cents column would make it 39 → clamped to (38,11) with
    * a HALF_UP round the DuckDB oracle, whose width rule is p1+p2,
    * never performs — the round-8 ADVICE latent flake); the
    * horizon is 36 weeks (a stated contract — beyond-horizon rows
    * are excluded, not silently misdiscounted). Week offsets are
    * exact day-diff div 7 over week-truncated stamps. One events
    * scan folds to (cohort, week-offset) cells before any join. */
  def evLtvNpv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("em"),
        money(col("value")).as("v"))
    val pu = ev.groupBy("user_id").agg(min("em").as("cm"))
    val cohorts = pu.groupBy("cm").agg(count(lit(1)).as("n_users"))
    val factors = (0 to 36).map(k => (k.toLong,
        BigDecimal(0.9).pow(k).setScale(12, BigDecimal.RoundingMode.HALF_UP)
          .toString))
      .toDF("k", "fs")
      .select(col("k"), col("fs").cast("decimal(14,12)").as("f"))
    val cells = ev.join(pu, "user_id")
      .withColumn("k", expr("cast(datediff(em, cm) div 7 as long)"))
      .filter(col("k") <= 36)
      .groupBy("cm", "k")
      .agg((sum("v") * 100).cast("decimal(23,0)").as("cents"))
    cells.join(broadcast(factors), Seq("k"))
      .groupBy("cm")
      .agg(sum("cents").as("tot"), sum(expr("cents * f")).as("npvq"))
      .join(cohorts, Seq("cm"))
      .select(date_format(col("cm"), "yyyy-MM-dd").as("cohort"),
        col("n_users"),
        expr("round(cast(tot as double) / 100.0, 2)").as("total_rev"),
        expr("round(cast(npvq as double) / 100.0, 2)").as("npv"),
        expr("round(cast(npvq as double) / cast(tot as double), 6)")
          .as("npv_share"))
      .orderBy("cohort")
  }

  /** T218: INTERVENTION IMPACT (CausalImpact-lite) — fit the
    * pre-period linear trend of each event type's daily series,
    * extrapolate it over the post-period as the counterfactual, and
    * report the cumulative actual-minus-predicted effect. The split
    * is the day-span midpoint (T div 2, a stated deterministic
    * stand-in for the intervention date); slope/intercept come from
    * the [[evRegression]] exact integer sums over the pre rows only;
    * each post-day prediction a + b·t quantizes to the 1e-9 grid so
    * the cumulative effect is an exact DECIMAL sum. One spine pass,
    * one broadcast 2-row-per-type panel, per-type output. */
  def evIntervention(s: SparkSession, d: String): DataFrame = {
    val f = dailyFilled(s, d)
    val mids = f.groupBy("event_type")
      .agg((count(lit(1)) / 2).cast("long").as("mid"))
    val fm = f.join(broadcast(mids), "event_type")
    val pre = fm.filter(col("t") < col("mid"))
      .groupBy("event_type").agg(
        count(lit(1)).as("m"), sum("t").as("sx"), sum("x").as("sy"),
        sum(col("t") * col("x")).as("sxy"),
        sum(col("t") * col("t")).as("sxx"))
      .withColumn("den", expr(
        "cast(m as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double)"))
      .withColumn("b", expr(
        "case when den = 0 then null else" +
          " (cast(m as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double)) / den end"))
      .withColumn("a", expr(
        "(cast(sy as double) - b * cast(sx as double))" +
          " / cast(m as double)"))
      .select(col("event_type"), col("m").as("n_pre"),
        col("b"), col("a"))
    fm.filter(col("t") >= col("mid"))
      .join(broadcast(pre), "event_type")
      .withColumn("predq", expr(
        "cast(round(a + b * cast(t as double), 9) as decimal(28,9))"))
      .groupBy("event_type")
      .agg(max("n_pre").as("n_pre"), count(lit(1)).as("n_post"),
        max("b").as("b"), sum("x").as("actual"),
        sum("predq").as("predsum"))
      .select(col("event_type"), col("n_pre").cast("int").as("n_pre"),
        col("n_post").cast("int").as("n_post"),
        expr("round(b, 6)").as("slope_pre"),
        col("actual").as("actual_post"),
        expr("round(cast(predsum as double), 6)").as("pred_post"),
        expr("round(cast(actual as double)" +
          " - cast(predsum as double), 6)").as("abs_effect"),
        expr("round(case when cast(predsum as double) = 0 then null" +
          " else (cast(actual as double) - cast(predsum as double))" +
          " / cast(predsum as double) end, 6)").as("rel_effect"))
      .orderBy("event_type")
  }

  /** T236: PRICE ELASTICITY — the log-log OLS every pricing team runs:
    * ln(quantity) regressed on ln(unit price) across order lines,
    * slope = elasticity. Each ln term quantizes ONCE to the 1e-6 grid
    * (scaled long); the five regression sums are exact — the squared
    * and cross terms as DECIMAL(38,0) (a 1e7-scaled long squared
    * overflows int64 at corpus row counts) — so partition order cannot
    * flip a bit, and the closed-form slope/intercept/R² divide the
    * identical exact operands in both engines (the grid scale cancels
    * in slope and R²). ONE map-side-combinable aggregate over the
    * fact scan; output is a 1-row panel. */
  def evElasticity(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .select(
        expr("cast(floor(ln(cast(l_extendedprice as double)" +
          " / cast(l_quantity as double)) * 1000000.0 + 0.5)" +
          " as bigint)").as("qx"),
        expr("cast(floor(ln(cast(l_quantity as double)) * 1000000.0" +
          " + 0.5) as bigint)").as("qy"))
      .agg(count(lit(1)).as("m"),
        sum("qx").as("sx"), sum("qy").as("sy"),
        sum(expr("cast(qx as decimal(19,0)) * cast(qy as decimal(19,0))"))
          .as("sxy"),
        sum(expr("cast(qx as decimal(19,0)) * cast(qx as decimal(19,0))"))
          .as("sxx"),
        sum(expr("cast(qy as decimal(19,0)) * cast(qy as decimal(19,0))"))
          .as("syy"))
      .withColumn("num", expr(
        "cast(m as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double)"))
      .withColumn("den", expr(
        "cast(m as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double)"))
      .withColumn("deny", expr(
        "cast(m as double) * cast(syy as double)" +
          " - cast(sy as double) * cast(sy as double)"))
      .withColumn("slope",
        expr("case when den = 0 then null else num / den end"))
      .select(col("m").as("n_items"),
        expr("round(slope, 6)").as("elasticity"),
        expr("round((cast(sy as double) / 1000000.0 - slope *" +
          " (cast(sx as double) / 1000000.0)) / cast(m as double), 6)")
          .as("ln_intercept"),
        expr("round(case when den * deny = 0 then null" +
          " else (num * num) / (den * deny) end, 6)").as("r2"))
  }

  /** T237: GEOMETRIC ADSTOCK of the daily event series — marketing's
    * carry-over transform (today's response = today's impressions plus
    * a decaying memory of the last week's): adstock_t = Σ_{k=0..7}
    * 0.5^k · x_{t−k}. The recursion is restated as a bounded 8-term
    * lag window (the exact unrolling at half-life decay, residual
    * < 0.4% of peak), each weight a LITERAL exact BigDecimal 0.5^k
    * (the T217 ladder idiom — no pow in either engine), so every
    * adstock value is an exact integer×decimal sum off the zero-filled
    * spine. Window keyed by event_type over the calendar-bounded
    * series. */
  def evAdstock(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("t").asc)
    val half = java.math.BigDecimal.valueOf(5, 1)
    val terms = (0 to 7).map { k =>
      coalesce(lag(col("x"), k).over(w), lit(0L)) * lit(half.pow(k))
    }
    dailyFilled(s, d)
      .withColumn("ad", terms.reduce(_ + _))
      .select(col("event_type"), col("t"), col("x").as("n_events"),
        round(col("ad").cast("double"), 6).as("adstock"))
      .orderBy("event_type", "t")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_elasticity"    -> evElasticity _,
    "ev_adstock"       -> evAdstock _,
    "ev_intervention"  -> evIntervention _,
    "ev_ltv_npv"       -> evLtvNpv _,
    "ev_tost"          -> evTost _,
    "ev_ratio_delta"   -> evRatioDelta _,
    "ev_ranksum"       -> evRankSum _,
    "ev_kstest"        -> evKsTest _,
    "ev_sprt"          -> evSprt _,
    "ev_bootstrap"     -> evBootstrap _,
    "ev_qini"          -> evQini _,
    "ev_did"           -> evDiffInDiff _,
    "ev_jackknife"     -> evJackknife _,
    "ev_cusum"         -> evCusum _,
    "ev_winsorized"    -> evWinsorized _,
    "ev_qte"           -> evQte _,
    "ev_cuped"         -> evCuped _,
    "sample_neyman"    -> sampleNeyman _,
    "ev_ab_srm"        -> evAbSrm _,
    "ev_srm_segments"  -> evSrmSegments _,
    "ev_rolling_corr"  -> evRollingCorr _,
    "ev_holtwinters"   -> evHoltWinters _,
    "ev_theilsen"      -> evTheilSen _,
    "ev_abtest_power"  -> evAbtestPower _,
    "ev_mde_curve"     -> evMdeCurve _,
    "ev_decompose"     -> evSeasonalDecompose _,
    "ev_lag_features"  -> evLagFeatures _,
    "dim_dates"        -> dimDates _,
    "ev_abtest"        -> evAbtest _,
    "ev_acf"           -> evAcf _,
    "ev_regression"    -> evRegression _,
    "ev_forecast_eval" -> evForecastEval _,
    "ev_seasonality"   -> evSeasonality _,
    "ev_survival"      -> evSurvival _,
    "ev_cohort_ltv"    -> evCohortLtv _,
    "o12_pareto"       -> paretoAbc _,
    "o13_rankfusion"   -> rankFusion _,
    "basket_rules"     -> basketRules _,
    "a18_cube"         -> cubeQty _,
    "sample_balanced"  -> sampleBalanced _)

  private val dailyFilledCte =
    """daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |         FROM daily GROUP BY 1),
      |spine AS (
      |  SELECT event_type, d0,
      |    CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |f AS (
      |  SELECT s.event_type,
      |    CAST(date_diff('day', s.d0, s.day) AS BIGINT) AS t,
      |    COALESCE(d.n, 0) AS x
      |  FROM spine s LEFT JOIN daily d
      |    ON s.event_type = d.event_type AND s.day = d.day)""".stripMargin

  // shared per-user purchase-cents fixture for the nonparametric tests
  private val purchaseCentsCte =
    """ur AS MATERIALIZED (
      |  SELECT user_id,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents,
      |    CAST(user_id % 2 AS INTEGER) AS trt
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // same midpoint split, exact pre-period OLS sums, 1e-9-quantized
    // per-day counterfactuals, one shared double tree for the effects
    "ev_intervention" ->
      (s"""WITH $dailyFilledCte,
        |mids AS (SELECT event_type, CAST(COUNT(*) // 2 AS BIGINT)""" +
        """ AS mid
        |  FROM f GROUP BY event_type),
        |fm AS (SELECT f.*, m.mid FROM f JOIN mids m USING (event_type)),
        |pre AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(x) AS BIGINT) AS sy,
        |    CAST(SUM(t * x) AS BIGINT) AS sxy,
        |    CAST(SUM(t * t) AS BIGINT) AS sxx
        |  FROM fm WHERE t < mid GROUP BY event_type),
        |ab AS (
        |  SELECT event_type, m AS n_pre,
        |    CASE WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
        |      ELSE (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS b,
        |    (CAST(sy AS DOUBLE) - (CASE WHEN CAST(m AS DOUBLE)
        |        * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) = 0 THEN NULL
        |      ELSE (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END)
        |      * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE) AS a
        |  FROM pre),
        |post AS (
        |  SELECT fm.event_type, ab.n_pre,
        |    CAST(COUNT(*) AS BIGINT) AS n_post, MAX(ab.b) AS b,
        |    CAST(SUM(fm.x) AS BIGINT) AS actual,
        |    SUM(CAST(round(ab.a + ab.b * CAST(fm.t AS DOUBLE), 9)
        |      AS DECIMAL(28,9))) AS predsum
        |  FROM fm JOIN ab USING (event_type)
        |  WHERE fm.t >= fm.mid GROUP BY 1, 2)
        |SELECT event_type, CAST(n_pre AS INTEGER) AS n_pre,
        |  CAST(n_post AS INTEGER) AS n_post,
        |  round(b, 6) AS slope_pre, actual AS actual_post,
        |  round(CAST(predsum AS DOUBLE), 6) AS pred_post,
        |  round(CAST(actual AS DOUBLE) - CAST(predsum AS DOUBLE), 6)
        |    AS abs_effect,
        |  round(CASE WHEN CAST(predsum AS DOUBLE) = 0 THEN NULL
        |    ELSE (CAST(actual AS DOUBLE) - CAST(predsum AS DOUBLE))
        |    / CAST(predsum AS DOUBLE) END, 6) AS rel_effect
        |FROM post ORDER BY event_type""").stripMargin,
    // identical literal 0.9^k decimal ladder (no pow in either
    // engine), same exact (24,0)×(14,12) products and 36-month horizon
    "ev_ltv_npv" -> {
      val vals = (0 to 36).map(k =>
        s"($k, ${BigDecimal(0.9).pow(k)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)})")
        .mkString(", ")
      s"""WITH ev AS MATERIALIZED (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS em,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |pu AS MATERIALIZED (
        |  SELECT user_id, MIN(em) AS cm FROM ev GROUP BY user_id),
        |coh AS (SELECT cm, CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM pu GROUP BY cm),
        |fac AS (SELECT k, CAST(f AS DECIMAL(14,12)) AS f
        |  FROM (VALUES $vals) t(k, f)),
        |cells AS (
        |  SELECT pu.cm,
        |    CAST(date_diff('day', pu.cm, ev.em) // 7 AS BIGINT) AS k,
        |    CAST(SUM(v) * 100 AS DECIMAL(23,0)) AS cents
        |  FROM ev JOIN pu USING (user_id)
        |  WHERE date_diff('day', pu.cm, ev.em) // 7 <= 36
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT cm, SUM(cents) AS tot, SUM(cents * f) AS npvq
        |  FROM cells JOIN fac USING (k) GROUP BY cm)
        |SELECT strftime(agg.cm, '%Y-%m-%d') AS cohort, coh.n_users,
        |  round(CAST(tot AS DOUBLE) / 100.0, 2) AS total_rev,
        |  round(CAST(npvq AS DOUBLE) / 100.0, 2) AS npv,
        |  round(CAST(npvq AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |    AS npv_share
        |FROM agg JOIN coh USING (cm) ORDER BY cohort""".stripMargin
    },
    // same exact conversion cells, unpooled SE, both one-sided z's in
    // one double tree; equivalent = both > 1.645
    "ev_tost" ->
      """WITH pu AS MATERIALIZED (
        |  SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv,
        |    CAST(user_id % 2 AS INTEGER) AS variant
        |  FROM events GROUP BY user_id),
        |cells AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END)
        |      AS BIGINT) AS c1
        |  FROM pu),
        |p AS (
        |  SELECT *, CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
        |    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1
        |  FROM cells),
        |se AS (
        |  SELECT *, sqrt(p0 * (1.0 - p0) / CAST(n0 AS DOUBLE)
        |    + p1 * (1.0 - p1) / CAST(n1 AS DOUBLE)) AS se
        |  FROM p),
        |z AS (
        |  SELECT *,
        |    CASE WHEN se = 0 THEN NULL
        |      ELSE (p1 - p0 + 0.02) / se END AS zl,
        |    CASE WHEN se = 0 THEN NULL
        |      ELSE (0.02 - (p1 - p0)) / se END AS zu
        |  FROM se)
        |SELECT n0 AS n_control, c0 AS conv_control, n1 AS n_treat,
        |  c1 AS conv_treat, round(p1 - p0, 6) AS diff,
        |  round(se, 6) AS se, round(zl, 6) AS z_lower,
        |  round(zu, 6) AS z_upper,
        |  CAST(zl > 1.645 AND zu > 1.645 AS INTEGER) AS equivalent
        |FROM z""".stripMargin,
    // same six exact per-arm moments (cents via DECIMAL(18,2)·100),
    // delta-method variance and z in one shared double tree
    "ev_ratio_delta" ->
      """WITH pu AS MATERIALIZED (
        |  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS k
        |  FROM events GROUP BY user_id),
        |arms AS (
        |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(k) AS BIGINT) AS sk,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(k AS HUGEINT) * k) AS skk,
        |    SUM(CAST(x AS HUGEINT) * k) AS sxk
        |  FROM pu GROUP BY variant),
        |m AS (
        |  SELECT variant, n,
        |    CAST(sx AS DOUBLE) / CAST(sk AS DOUBLE) AS r,
        |    CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) AS kbar,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS vx,
        |    (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS vk,
        |    (CAST(sxk AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sk AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS cxk
        |  FROM arms),
        |v AS (
        |  SELECT variant, n, r,
        |    (vx - 2.0 * r * cxk + r * r * vk)
        |      / (CAST(n AS DOUBLE) * kbar * kbar) AS vr
        |  FROM m),
        |wide AS (
        |  SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n_control,
        |    MAX(CASE WHEN variant = 1 THEN n END) AS n_treat,
        |    MAX(CASE WHEN variant = 0 THEN r END) AS r0,
        |    MAX(CASE WHEN variant = 1 THEN r END) AS r1,
        |    MAX(CASE WHEN variant = 0 THEN vr END) AS v0,
        |    MAX(CASE WHEN variant = 1 THEN vr END) AS v1
        |  FROM v),
        |zz AS (
        |  SELECT *, CASE WHEN v0 + v1 <= 0 THEN NULL
        |    ELSE (r1 - r0) / sqrt(v0 + v1) END AS z
        |  FROM wide)
        |SELECT n_control, n_treat,
        |  round(r0 / 100.0, 6) AS rpe_control,
        |  round(r1 / 100.0, 6) AS rpe_treat,
        |  round(sqrt(v0 + v1) / 100.0, 6) AS se,
        |  round(z, 6) AS z,
        |  CAST(abs(z) > 1.96 AS INTEGER) AS significant
        |FROM zz""".stripMargin,
    // same exact-integer rank algebra: 2·R = Σ ct(2p+c+1), tie term
    // Σ(c³−c), one shared double tree for varu and z
    "ev_ranksum" ->
      (s"""WITH $purchaseCentsCte,
        |vc AS (
        |  SELECT cents, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(trt) AS BIGINT) AS ct
        |  FROM ur GROUP BY cents),
        |rk AS (
        |  SELECT c, ct, CAST(COALESCE(SUM(c) OVER (ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)""" +
        """ AS BIGINT) AS p
        |  FROM vc),
        |agg AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS nn, CAST(SUM(ct) AS BIGINT) AS n1,
        |    CAST(SUM(ct * (2 * p + c + 1)) AS BIGINT) AS r2,
        |    CAST(SUM(c * c * c - c) AS BIGINT) AS ties
        |  FROM rk),
        |m AS (
        |  SELECT nn, n1, nn - n1 AS n0, r2 - n1 * (n1 + 1) AS u2, ties
        |  FROM agg),
        |v AS (
        |  SELECT *, CASE WHEN nn < 2 THEN NULL ELSE
        |    CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 12.0
        |    * (CAST(nn + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |    / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))) END AS varu
        |  FROM m),
        |zz AS (
        |  SELECT *, CASE WHEN varu IS NULL OR varu <= 0 THEN NULL ELSE
        |    (CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))
        |    / (2.0 * sqrt(varu)) END AS z
        |  FROM v)
        |SELECT n0 AS n_control, n1 AS n_treat,
        |  CAST(u2 AS DOUBLE) / 2.0 AS u_treat,
        |  round(z, 6) AS z,
        |  CAST(abs(z) > 1.96 AS INTEGER) AS significant
        |FROM zz""").stripMargin,
    // D·n1·n0 maxed as |cumt·n0 − cumc·n1| over exact inclusive
    // cumulatives; K and the 1.358 cut in the same final double tree
    "ev_kstest" ->
      (s"""WITH $purchaseCentsCte,
        |vc AS (
        |  SELECT cents, CAST(SUM(trt) AS BIGINT) AS ct,
        |    CAST(SUM(1 - trt) AS BIGINT) AS cc
        |  FROM ur GROUP BY cents),
        |tot AS (SELECT CAST(SUM(trt) AS BIGINT) AS n1,
        |    CAST(SUM(1 - trt) AS BIGINT) AS n0 FROM ur),
        |cum AS (
        |  SELECT CAST(SUM(ct) OVER w AS BIGINT) AS cumt,
        |    CAST(SUM(cc) OVER w AS BIGINT) AS cumc
        |  FROM vc WINDOW w AS (ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mx AS (
        |  SELECT CAST(MAX(abs(cumt * tot.n0 - cumc * tot.n1))""" +
        """ AS BIGINT) AS dmax,
        |    MAX(tot.n1) AS n1, MAX(tot.n0) AS n0
        |  FROM cum, tot),
        |dd AS (
        |  SELECT *, CASE WHEN n1 * n0 = 0 THEN NULL ELSE
        |    CAST(dmax AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) END AS d
        |  FROM mx)
        |SELECT n0 AS n_control, n1 AS n_treat, round(d, 6) AS d_stat,
        |  round(sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
        |    / CAST(n1 + n0 AS DOUBLE)) * d, 6) AS k_stat,
        |  CAST(sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
        |    / CAST(n1 + n0 AS DOUBLE)) * d > 1.358 AS INTEGER)
        |    AS significant
        |FROM dd""").stripMargin,
    // identical 1e-12-grid integer LLR walk: increments 405465108108 /
    // −57158413839, boundaries ±2944438979166 = ±ln 19
    "ev_sprt" ->
      """WITH pu AS MATERIALIZED (
        |  SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv,
        |    CAST(user_id % 2 AS INTEGER) AS variant
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT variant,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY variant
        |      ORDER BY user_id) AS BIGINT) AS t,
        |    CAST(SUM(conv) OVER (PARTITION BY variant ORDER BY user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS k
        |  FROM pu),
        |l AS (
        |  SELECT variant, t, k,
        |    k * 405465108108 - (t - k) * 57158413839 AS llr
        |  FROM c),
        |agg AS (
        |  SELECT variant, CAST(MAX(t) AS BIGINT) AS n_trials,
        |    CAST(MAX(k) AS BIGINT) AS n_conv,
        |    CAST(MIN(CASE WHEN llr >= 2944438979166 THEN t END)
        |      AS BIGINT) AS th1,
        |    CAST(MIN(CASE WHEN llr <= -2944438979166 THEN t END)
        |      AS BIGINT) AS th0,
        |    CAST(max_by(llr, t) AS BIGINT) AS llr_end
        |  FROM l GROUP BY variant)
        |SELECT variant, n_trials, n_conv,
        |  round(CAST(llr_end AS DOUBLE) / 1e12, 6) AS llr_final,
        |  CASE WHEN th1 IS NOT NULL AND (th0 IS NULL OR th1 <= th0)
        |    THEN th1 WHEN th0 IS NOT NULL THEN th0
        |    ELSE -1 END AS decision_t,
        |  CASE WHEN th1 IS NOT NULL AND (th0 IS NULL OR th1 <= th0)
        |    THEN 'accept_h1' WHEN th0 IS NOT NULL THEN 'accept_h0'
        |    ELSE 'continue' END AS decision
        |FROM agg ORDER BY variant""".stripMargin,
    // identical md5-replayed Poisson(1) weights, 1e-6-quantized
    // replicate means, order-statistic CI (rn 2 / rn 31 of 32)
    "ev_bootstrap" ->
      """WITH ur AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY user_id),
        |rep AS (
        |  SELECT ur.user_id, ur.cents, b.b,
        |    CAST('0x' || substr(md5(CAST(ur.user_id AS VARCHAR) || ':'
        |      || CAST(b.b AS VARCHAR)), 1, 8) AS BIGINT) AS hv
        |  FROM ur, (SELECT UNNEST(generate_series(0, 31)) AS b) b),
        |ww AS (
        |  SELECT user_id, cents, b,
        |    CASE WHEN u < 0.3678794412 THEN 0
        |      WHEN u < 0.7357588823 THEN 1 WHEN u < 0.9196986029 THEN 2
        |      WHEN u < 0.9810118431 THEN 3 WHEN u < 0.9963401532 THEN 4
        |      WHEN u < 0.9994058152 THEN 5 WHEN u < 0.9999167589 THEN 6
        |      ELSE 7 END AS w
        |  FROM (SELECT *, CAST(hv AS DOUBLE) / 4294967296.0 AS u
        |        FROM rep) h),
        |means AS (
        |  SELECT b, CAST(SUM(w * cents) AS BIGINT) AS swx,
        |    CAST(SUM(w) AS BIGINT) AS sw
        |  FROM ww GROUP BY b HAVING SUM(w) > 0),
        |q AS (
        |  SELECT b, CAST(round(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE)
        |    / 100.0, 6) AS DECIMAL(18,6)) AS qm
        |  FROM means),
        |r AS (
        |  SELECT qm, ROW_NUMBER() OVER (ORDER BY qm ASC, b ASC) AS rn,
        |    ROW_NUMBER() OVER (ORDER BY qm DESC, b DESC) AS rd
        |  FROM q),
        |base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(cents) AS BIGINT) AS sc FROM ur),
        |panel AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rep,
        |    SUM(CAST(qm AS DECIMAL(19,6))) AS sq,
        |    SUM(CAST(qm AS DECIMAL(19,6)) * CAST(qm AS DECIMAL(19,6)))
        |      AS sqq,
        |    MAX(CASE WHEN rn = 2 THEN qm END) AS qlo,
        |    MAX(CASE WHEN rd = 2 THEN qm END) AS qhi
        |  FROM r)
        |SELECT base.n_users, panel.n_rep,
        |  round(CAST(base.sc AS DOUBLE) / CAST(base.n_users AS DOUBLE)
        |    / 100.0, 6) AS est_mean,
        |  round(CASE WHEN n_rep < 2 THEN NULL ELSE
        |    sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)
        |    * CAST(sq AS DOUBLE) / CAST(n_rep AS DOUBLE))
        |    / CAST(n_rep - 1 AS DOUBLE)) END, 6) AS boot_se,
        |  CAST(qlo AS DOUBLE) AS ci_lo, CAST(qhi AS DOUBLE) AS ci_hi
        |FROM panel, base""".stripMargin,
    // identical nine rounded quantile_cont cuts, exact cell counts,
    // 1e-9-quantized Qini increments cumulated over the 10-row curve
    "ev_qini" ->
      """WITH pu AS MATERIALIZED (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ne,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv,
        |    CAST(user_id % 2 AS INTEGER) AS variant
        |  FROM events GROUP BY user_id),
        |cuts AS (
        |  SELECT round(quantile_cont(CAST(ne AS DOUBLE), 0.9), 6) AS q1,
        |    round(quantile_cont(CAST(ne AS DOUBLE), 0.8), 6) AS q2,
        |    round(quantile_cont(CAST(ne AS DOUBLE), 0.7), 6) AS q3,
        |    round(quantile_cont(CAST(ne AS DOUBLE), 0.6), 6) AS q4,
        |    round(quantile_cont(CAST(ne AS DOUBLE), 0.5), 6) AS q5,
        |    round(quantile_cont(CAST(ne AS DOUBLE), 0.4), 6) AS q6,
        |    round(quantile_cont(CAST(ne AS DOUBLE), 0.3), 6) AS q7,
        |    round(quantile_cont(CAST(ne AS DOUBLE), 0.2), 6) AS q8,
        |    round(quantile_cont(CAST(ne AS DOUBLE), 0.1), 6) AS q9
        |  FROM pu),
        |cells AS (
        |  SELECT CASE WHEN CAST(ne AS DOUBLE) > q1 THEN 1
        |      WHEN CAST(ne AS DOUBLE) > q2 THEN 2
        |      WHEN CAST(ne AS DOUBLE) > q3 THEN 3
        |      WHEN CAST(ne AS DOUBLE) > q4 THEN 4
        |      WHEN CAST(ne AS DOUBLE) > q5 THEN 5
        |      WHEN CAST(ne AS DOUBLE) > q6 THEN 6
        |      WHEN CAST(ne AS DOUBLE) > q7 THEN 7
        |      WHEN CAST(ne AS DOUBLE) > q8 THEN 8
        |      WHEN CAST(ne AS DOUBLE) > q9 THEN 9 ELSE 10 END AS decile,
        |    variant, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(conv) AS BIGINT) AS cv
        |  FROM pu, cuts GROUP BY 1, 2),
        |wide AS (
        |  SELECT decile,
        |    COALESCE(MAX(CASE WHEN variant = 1 THEN n END), 0)
        |      AS n_treat,
        |    COALESCE(MAX(CASE WHEN variant = 1 THEN cv END), 0)
        |      AS conv_treat,
        |    COALESCE(MAX(CASE WHEN variant = 0 THEN n END), 0)
        |      AS n_control,
        |    COALESCE(MAX(CASE WHEN variant = 0 THEN cv END), 0)
        |      AS conv_control
        |  FROM cells GROUP BY decile),
        |inc AS (
        |  SELECT *, CAST(round(CASE WHEN n_control = 0
        |    THEN CAST(conv_treat AS DOUBLE)
        |    ELSE CAST(conv_treat AS DOUBLE) - CAST(conv_control AS DOUBLE)
        |    * CAST(n_treat AS DOUBLE) / CAST(n_control AS DOUBLE) END, 9)
        |    AS DECIMAL(18,9)) AS inc
        |  FROM wide)
        |SELECT CAST(decile AS INTEGER) AS decile, n_treat, conv_treat,
        |  n_control, conv_control,
        |  round(CASE WHEN n_treat = 0 OR n_control = 0 THEN NULL
        |    ELSE CAST(conv_treat AS DOUBLE) / CAST(n_treat AS DOUBLE)
        |    - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE)
        |    END, 6) AS uplift,
        |  round(CAST(SUM(inc) OVER (ORDER BY decile ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE), 6) AS qini
        |FROM inc ORDER BY decile""".stripMargin,
    // same exact-DECIMAL cell sums, same midpoint split, same 1-row
    // double tree for the four means and the DiD contrast
    "ev_did" ->
      """WITH ev AS MATERIALIZED (
        |  SELECT user_id, epoch_us(ts) AS tu, value FROM events),
        |sp AS (SELECT (MIN(tu) + MAX(tu)) // 2 AS mid FROM ev),
        |cells AS (
        |  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
        |    CAST(tu > sp.mid AS INTEGER) AS post,
        |    COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM ev, sp GROUP BY 1, 2),
        |wide AS (
        |  SELECT
        |    MAX(CASE WHEN variant = 0 AND post = 0 THEN n END) AS n_c_pre,
        |    MAX(CASE WHEN variant = 0 AND post = 1 THEN n END) AS n_c_post,
        |    MAX(CASE WHEN variant = 1 AND post = 0 THEN n END) AS n_t_pre,
        |    MAX(CASE WHEN variant = 1 AND post = 1 THEN n END) AS n_t_post,
        |    MAX(CASE WHEN variant = 0 AND post = 0 THEN sv END) AS s_c_pre,
        |    MAX(CASE WHEN variant = 0 AND post = 1 THEN sv END) AS s_c_post,
        |    MAX(CASE WHEN variant = 1 AND post = 0 THEN sv END) AS s_t_pre,
        |    MAX(CASE WHEN variant = 1 AND post = 1 THEN sv END) AS s_t_post
        |  FROM cells),
        |m AS (
        |  SELECT *,
        |    CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE) AS m_c_pre,
        |    CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE) AS m_c_post,
        |    CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE) AS m_t_pre,
        |    CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE) AS m_t_post
        |  FROM wide)
        |SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
        |  round(m_c_pre, 6) AS mean_ctrl_pre,
        |  round(m_c_post, 6) AS mean_ctrl_post,
        |  round(m_t_pre, 6) AS mean_treat_pre,
        |  round(m_t_post, 6) AS mean_treat_post,
        |  round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6) AS did
        |FROM m""".stripMargin,
    // identical md5-hex bucket assignment, identical leave-one-out
    // ratios quantized to the 1e-9 grid before the variance sum
    "ev_jackknife" ->
      """WITH pu AS MATERIALIZED (
        |  SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 14 THEN 1 ELSE 0 END AS converted,
        |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 20 AS BIGINT) AS g
        |  FROM events GROUP BY user_id),
        |b AS (SELECT g, COUNT(*) AS n,
        |        CAST(SUM(converted) AS BIGINT) AS c
        |      FROM pu GROUP BY g),
        |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
        |         CAST(SUM(c) AS BIGINT) AS tc, COUNT(*) AS gg FROM b),
        |th AS (
        |  SELECT b.*, tt.tn, tt.tc, tt.gg,
        |    CAST(round(CASE WHEN tt.tn - b.n = 0 THEN NULL
        |      ELSE CAST(tt.tc - b.c AS DOUBLE)
        |        / CAST(tt.tn - b.n AS DOUBLE) END, 9)
        |      AS DECIMAL(18,9)) AS thq
        |  FROM b, tt),
        |agg AS (
        |  SELECT MAX(tn) AS n_users, MAX(tc) AS n_conv, MAX(gg) AS g,
        |    SUM(thq) AS sth,
        |    SUM(CAST(CAST(thq AS DECIMAL(19,9)) * CAST(thq AS DECIMAL(19,9))
        |      AS DECIMAL(38,18))) AS sthh
        |  FROM th),
        |fin AS (
        |  SELECT *,
        |    CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS rate,
        |    sqrt((CAST(g AS DOUBLE) - 1.0) / CAST(g AS DOUBLE)
        |      * (CAST(sthh AS DOUBLE) - CAST(sth AS DOUBLE)
        |        * CAST(sth AS DOUBLE) / CAST(g AS DOUBLE))) AS se
        |  FROM agg)
        |SELECT n_users, n_conv, round(rate, 6) AS rate,
        |  round(se, 6) AS se_jack,
        |  round(rate - 1.96 * se, 6) AS ci_lo,
        |  round(rate + 1.96 * se, 6) AS ci_hi
        |FROM fin""".stripMargin,
    // same cleared-rational-mean integer restatement: num_t = n*prefix
    // - (t+1)*s, S = (num - running min)/n; argmax ties to first day
    "ev_cusum" ->
      s"""WITH $dailyFilledCte,
        |st AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx
        |       FROM f GROUP BY 1),
        |pw AS (
        |  SELECT f.event_type, f.t, st.n, st.sx,
        |    SUM(f.x) OVER (PARTITION BY f.event_type ORDER BY f.t
        |      ROWS UNBOUNDED PRECEDING) AS px
        |  FROM f JOIN st USING (event_type)),
        |nm AS (
        |  SELECT event_type, t, n,
        |    n * px - (t + 1) * sx AS num
        |  FROM pw),
        |cu AS (
        |  SELECT event_type, t,
        |    round(CAST(num - MIN(num) OVER (PARTITION BY event_type
        |      ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |      / CAST(n AS DOUBLE), 6) AS s
        |  FROM nm),
        |top_ AS (
        |  SELECT event_type, s, t,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY s DESC, t ASC) AS rk
        |  FROM cu)
        |SELECT event_type, s AS cusum_max, CAST(t AS INTEGER) AS t_alarm
        |FROM top_ WHERE rk = 1 ORDER BY event_type""".stripMargin,
    // quantile_cont ≡ percentile fences (rounded 6 both sides), same
    // 1e-6 clamp quantization before the cross-user sums
    "ev_winsorized" ->
      """WITH ev AS MATERIALIZED (
        |  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events),
        |fen AS (
        |  SELECT variant,
        |    round(quantile_cont(v, 0.05), 6) AS lo,
        |    round(quantile_cont(v, 0.95), 6) AS hi
        |  FROM ev GROUP BY variant),
        |q AS (
        |  SELECT ev.variant, ev.v, fen.lo, fen.hi,
        |    CAST(round(least(greatest(ev.v, fen.lo), fen.hi), 6)
        |      AS DECIMAL(18,6)) AS wq,
        |    CAST(round(ev.v, 6) AS DECIMAL(18,6)) AS vq
        |  FROM ev JOIN fen USING (variant))
        |SELECT variant, COUNT(*) AS n, MAX(lo) AS lo, MAX(hi) AS hi,
        |  round(CAST(SUM(vq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS mean_raw,
        |  round(CAST(SUM(wq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS mean_winsor,
        |  CAST(SUM(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  round(CAST(SUM(CASE WHEN v >= lo AND v <= hi THEN vq END)
        |      AS DOUBLE)
        |    / CAST(SUM(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END)
        |      AS DOUBLE), 6) AS mean_trimmed
        |FROM q GROUP BY variant ORDER BY variant""".stripMargin,
    // exact quantile_cont ≡ percentile per arm; deltas on the rounded
    // values (exact operands both sides)
    "ev_qte" -> {
      val ps = Seq("0.10", "0.25", "0.50", "0.75", "0.90")
      val armCols = (v: Int, pfx: String) => ps.map(p =>
        s"round(quantile_cont(CAST(value AS DOUBLE), $p), 6)" +
          s" AS ${pfx}${p.replace(".", "")}").mkString(",\n        |    ")
      val rows = ps.map(p =>
        s"SELECT '$p' AS quantile, c.c${p.replace(".", "")} AS control," +
          s" t.t${p.replace(".", "")} AS treat FROM c, t")
        .mkString("\nUNION ALL\n")
      s"""WITH a AS MATERIALIZED (
        |  SELECT value, CAST(user_id % 2 AS INTEGER) AS v FROM events),
        |c AS (SELECT
        |    ${armCols(0, "c")}
        |  FROM a WHERE v = 0),
        |t AS (SELECT
        |    ${armCols(1, "t")}
        |  FROM a WHERE v = 1)
        |SELECT quantile, control, treat,
        |  round(treat - control, 6) AS qte
        |FROM ($rows) ORDER BY quantile""".stripMargin
    },
    // identical µs-midpoint split, exact-DECIMAL user sums, fixed
    // double theta tree, per-user decimal(18,6) quantization
    "ev_cuped" ->
      """WITH ev AS MATERIALIZED (
        |  SELECT user_id, epoch_us(ts) AS tu, value FROM events),
        |sp AS (SELECT (MIN(tu) + MAX(tu)) // 2 AS mid FROM ev),
        |pu AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN tu <= sp.mid
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS x,
        |    CAST(SUM(CASE WHEN tu > sp.mid
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS y,
        |    CAST(user_id % 2 AS INTEGER) AS variant
        |  FROM ev, sp GROUP BY user_id, variant),
        |st AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(CAST(x AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2))
        |      AS DECIMAL(38,6))) AS sxy,
        |    SUM(CAST(CAST(x AS DECIMAL(19,2)) * CAST(x AS DECIMAL(19,2))
        |      AS DECIMAL(38,6))) AS sxx
        |  FROM pu),
        |adj AS MATERIALIZED (
        |  SELECT pu.variant, pu.y,
        |    (CAST(st.n AS DOUBLE) * CAST(st.sxy AS DOUBLE)
        |      - CAST(st.sx AS DOUBLE) * CAST(st.sy AS DOUBLE))
        |      / (CAST(st.n AS DOUBLE) * CAST(st.sxx AS DOUBLE)
        |      - CAST(st.sx AS DOUBLE) * CAST(st.sx AS DOUBLE))
        |      AS theta,
        |    CAST(round(CAST(pu.y AS DOUBLE)
        |      - ((CAST(st.n AS DOUBLE) * CAST(st.sxy AS DOUBLE)
        |          - CAST(st.sx AS DOUBLE) * CAST(st.sy AS DOUBLE))
        |         / (CAST(st.n AS DOUBLE) * CAST(st.sxx AS DOUBLE)
        |          - CAST(st.sx AS DOUBLE) * CAST(st.sx AS DOUBLE)))
        |        * (CAST(pu.x AS DOUBLE)
        |           - CAST(st.sx AS DOUBLE) / CAST(st.n AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS adjq
        |  FROM pu, st)
        |SELECT variant, COUNT(*) AS n_users,
        |  round(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS mean_y,
        |  round(CAST(SUM(adjq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
        |    6) AS mean_adj,
        |  round(MAX(theta), 6) AS theta,
        |  round(1.0 - (CAST(SUM(CAST(CAST(adjq AS DECIMAL(19,6))
        |      * CAST(adjq AS DECIMAL(19,6)) AS DECIMAL(38,12)))
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    - pow(CAST(SUM(adjq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
        |        2))
        |    / (CAST(SUM(CAST(CAST(y AS DECIMAL(19,2))
        |      * CAST(y AS DECIMAL(19,2)) AS DECIMAL(38,6))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE)
        |    - pow(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
        |        2)), 6) AS var_reduction
        |FROM adj GROUP BY variant ORDER BY variant""".stripMargin,
    // same exact-DECIMAL sufficient stats, same fixed double std/
    // weight tree, same 1e-6 quantization and largest-remainder split
    "sample_neyman" ->
      """WITH st AS MATERIALIZED (
        |  SELECT event_type, COUNT(*) AS nh,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS sx,
        |    SUM(CAST(value * value AS DECIMAL(28,12))) AS sxx
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT event_type, nh,
        |    round(CAST(sx AS DOUBLE) / CAST(nh AS DOUBLE), 6) AS mean_v,
        |    CASE WHEN nh < 2 THEN 0.0 ELSE
        |      sqrt((CAST(nh AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE))) END
        |      AS std_v
        |  FROM st),
        |q AS (
        |  SELECT event_type, nh, mean_v, std_v,
        |    CAST(floor(CAST(nh AS DOUBLE) * std_v * 1000000.0 + 0.5)
        |      AS BIGINT) AS wq
        |  FROM w),
        |q2 AS (
        |  SELECT q.*, CASE WHEN t0.wsum = 0 THEN nh ELSE wq END AS ew,
        |    CASE WHEN t0.wsum = 0 THEN t0.nsum ELSE t0.wsum END
        |      AS sumwq
        |  FROM q, (SELECT CAST(SUM(wq) AS BIGINT) AS wsum,
        |             CAST(SUM(nh) AS BIGINT) AS nsum FROM q) t0),
        |t AS (SELECT CAST(SUM((1000 * ew) % sumwq) AS BIGINT) AS rsum,
        |             MAX(sumwq) AS sumwq
        |      FROM q2),
        |rk AS (
        |  SELECT q2.*, t.rsum,
        |    (1000 * ew) // q2.sumwq AS base,
        |    (1000 * ew) % q2.sumwq AS fr,
        |    row_number() OVER (ORDER BY (1000 * ew) % q2.sumwq DESC,
        |      event_type ASC) AS rn
        |  FROM q2, t)
        |SELECT event_type, CAST(nh AS BIGINT) AS n_rows, mean_v,
        |  round(std_v, 6) AS std_v, wq,
        |  CAST(base + CASE WHEN rn <= rsum // rk.sumwq THEN 1 ELSE 0
        |    END AS BIGINT) AS alloc
        |FROM rk ORDER BY event_type""".stripMargin,
    // same parity split, identical fixed chi-square expression
    // common-spine zero-fill + the same six windowed integer sums;
    // every windowed SUM cast to BIGINT (HUGEINT->float64 trap)
    "ev_rolling_corr" ->
      """WITH ev AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS xr,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS yr
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |spine AS (
        |  SELECT CAST(UNNEST(generate_series(s.d0, s.d1,
        |      INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span s),
        |f AS (
        |  SELECT sp.day, COALESCE(e.xr, 0) AS x, COALESCE(e.yr, 0) AS y
        |  FROM spine sp LEFT JOIN ev e ON e.day = sp.day),
        |r AS (
        |  SELECT day, x, y,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
        |    CAST(SUM(x) OVER w AS BIGINT) AS sx,
        |    CAST(SUM(y) OVER w AS BIGINT) AS sy,
        |    CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
        |    CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
        |  FROM f
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |dd AS (
        |  SELECT *,
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den
        |  FROM r)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  x AS n_clicks, y AS n_purchases,
        |  CAST(n AS INTEGER) AS win_days,
        |  round(CASE WHEN den <= 0 THEN NULL ELSE
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt(den) END, 6) AS corr14
        |FROM dd ORDER BY day""".stripMargin,
    // ev_ab_srm's fixed chi-square tree per event_type slice
    "ev_srm_segments" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        |c AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM u GROUP BY event_type),
        |e AS (SELECT event_type, n_a, n_b,
        |        CAST(n_a + n_b AS DOUBLE) / 2.0 AS e FROM c)
        |SELECT event_type, n_a, n_b,
        |  round((CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e
        |    + (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e,
        |    6) AS chi2,
        |  CAST(CASE WHEN
        |    round((CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e
        |      + (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e,
        |      6) > 3.841459 THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
        |FROM e ORDER BY event_type""".stripMargin,
    "ev_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM u),
        |e AS (SELECT n_a, n_b,
        |        CAST(n_a + n_b AS DOUBLE) / 2.0 AS e FROM c)
        |SELECT n_a, n_b,
        |  round((CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e
        |    + (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e,
        |    6) AS chi2,
        |  CAST(CASE WHEN
        |    round((CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e
        |      + (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e,
        |      6) > 3.841459 THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
        |FROM e""".stripMargin,
    // recursive-CTE replay of the identical fold: same init (week-1
    // mean level, zero trend, x - l0 seasonals), same per-step double
    // expression order, list state updated by slice-concat
    "ev_holtwinters" ->
      s"""WITH RECURSIVE $dailyFilledCte,
         |a AS (
         |  SELECT event_type,
         |    list_transform(list_sort(list(struct_pack(t := t, x := x))),
         |      e -> CAST(e.x AS DOUBLE)) AS xs
         |  FROM f GROUP BY 1),
         |i0 AS (
         |  SELECT event_type, xs, list_sum(xs[1:7]) / 7.0 AS l0 FROM a),
         |r AS (
         |  SELECT event_type, xs, 7 AS i, l0 AS l,
         |    CAST(0.0 AS DOUBLE) AS b,
         |    list_transform(xs[1:7], v -> v - l0) AS s
         |  FROM i0
         |  UNION ALL
         |  SELECT event_type, xs, i + 1,
         |    0.3 * (xs[i + 1] - s[(i % 7) + 1]) + 0.7 * (l + b),
         |    0.1 * ((0.3 * (xs[i + 1] - s[(i % 7) + 1]) + 0.7 * (l + b))
         |        - l) + 0.9 * b,
         |    list_concat(list_concat(
         |      s[1:(i % 7)],
         |      [0.2 * (xs[i + 1]
         |          - (0.3 * (xs[i + 1] - s[(i % 7) + 1]) + 0.7 * (l + b)))
         |        + 0.8 * s[(i % 7) + 1]]),
         |      s[(i % 7) + 2:7])
         |  FROM r WHERE i < len(xs))
         |SELECT event_type, CAST(len(xs) AS INTEGER) AS n_days,
         |  round(l, 6) AS level, round(b, 6) AS trend,
         |  round(l + b + s[(len(xs) % 7) + 1], 6) AS forecast_next
         |FROM r WHERE i = len(xs) ORDER BY event_type""".stripMargin,
    // same pair expansion over the filled daily series, identical
    // rank-pick median with the full (sl, t1, t2) tie-break
    "ev_theilsen" ->
      s"""WITH $dailyFilledCte,
         |sl AS (
         |  SELECT a.event_type, a.t AS t1, b.t AS t2,
         |    CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS sl
         |  FROM f a JOIN f b
         |    ON a.event_type = b.event_type AND b.t > a.t),
         |r AS (
         |  SELECT event_type, sl,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY sl, t1, t2) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS m
         |  FROM sl),
         |d AS (SELECT event_type, CAST(COUNT(*) AS INTEGER) AS n_days
         |      FROM f GROUP BY 1)
         |SELECT r.event_type AS event_type, d.n_days,
         |  CAST(MAX(m) AS BIGINT) AS n_pairs,
         |  round(SUM(sl) / COUNT(*), 6) AS ts_slope
         |FROM r JOIN d ON r.event_type = d.event_type
         |WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "ev_abtest_power" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 14 THEN 1 ELSE 0 END AS converted,
        |    CAST(user_id % 2 AS INT) AS variant
        |  FROM events GROUP BY user_id),
        |w AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_control,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(SUM(converted) AS BIGINT) AS conv_all,
        |    COUNT(*) AS n_all
        |  FROM pu),
        |p AS (
        |  SELECT *, CAST(conv_all AS DOUBLE) / CAST(n_all AS DOUBLE)
        |    AS p_pool
        |  FROM w),
        |n AS (
        |  SELECT *, CAST(ceil((1.96 + 0.84) * (1.96 + 0.84) * 2.0 * p_pool
        |    * (1.0 - p_pool) / (0.1 * 0.1)) AS BIGINT) AS n_needed
        |  FROM p)
        |SELECT n_control, n_treat, round(p_pool, 6) AS p_pool,
        |  0.1 AS mde, n_needed,
        |  CAST(least(n_control, n_treat) >= n_needed AS INT) AS powered
        |FROM n""".stripMargin,
    // same per-user split and pooled rate; the 5-point size panel is a
    // literal UNNEST; both engines fold the identical closed form on
    // exact integers cast to double (the ev_abtest_power precedent)
    "ev_mde_curve" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 14 THEN 1 ELSE 0 END AS converted,
        |    CAST(user_id % 2 AS INT) AS variant
        |  FROM events GROUP BY user_id),
        |w AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_control,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(SUM(converted) AS BIGINT) AS conv_all,
        |    COUNT(*) AS n_all
        |  FROM pu),
        |p AS (
        |  SELECT *,
        |    CASE WHEN n_all = 0 THEN NULL
        |      ELSE CAST(conv_all AS DOUBLE) / CAST(n_all AS DOUBLE) END
        |      AS p_pool,
        |    greatest(least(n_control, n_treat) // 4, 1) AS n_base
        |  FROM w),
        |m AS (SELECT UNNEST([1, 2, 4, 8, 16]) AS mult)
        |SELECT CAST(mult AS INT) AS mult,
        |  CAST(n_base * mult AS BIGINT) AS n_per_arm,
        |  round(p_pool, 6) AS p_pool,
        |  round((1.96 + 0.84) * sqrt(2.0 * p_pool * (1.0 - p_pool)
        |    / CAST(n_base * mult AS DOUBLE)), 6) AS mde
        |FROM p CROSS JOIN m ORDER BY mult""".stripMargin,
    "ev_decompose" ->
      s"""WITH $dailyFilledCte,
        |tr AS (
        |  SELECT event_type, t, x,
        |    CAST(SUM(x) OVER w7 AS DOUBLE)
        |      / CAST(COUNT(*) OVER w7 AS DOUBLE) AS trend,
        |    CAST(t % 7 AS INT) AS phase7
        |  FROM f
        |  WINDOW w7 AS (PARTITION BY event_type ORDER BY t
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |qd AS (
        |  SELECT *, CAST(floor((CAST(x AS DOUBLE) - trend)
        |    * 1000000000.0 + 0.5) AS BIGINT) AS q
        |  FROM tr),
        |se AS (
        |  SELECT event_type, phase7,
        |    CAST(SUM(q) AS DOUBLE) / 1000000000.0
        |      / CAST(COUNT(*) AS DOUBLE) AS seasonal
        |  FROM qd GROUP BY 1, 2)
        |SELECT q.event_type, CAST(q.t AS INT) AS t, q.x,
        |  round(q.trend, 6) AS trend,
        |  round(s.seasonal, 6) AS seasonal,
        |  round(CAST(q.x AS DOUBLE) - q.trend - s.seasonal, 6) + 0.0
        |    AS residual
        |FROM qd q JOIN se s
        |  ON q.event_type = s.event_type AND q.phase7 = s.phase7
        |ORDER BY q.event_type, t""".stripMargin,
    "ev_lag_features" ->
      s"""WITH $dailyFilledCte
        |SELECT event_type, CAST(t AS INT) AS t, x,
        |  lag(x, 1) OVER w AS lag1,
        |  lag(x, 7) OVER w AS lag7,
        |  round(CAST(SUM(x) OVER w7 AS DOUBLE)
        |    / CAST(COUNT(*) OVER w7 AS DOUBLE), 6) AS ma7
        |FROM f
        |WINDOW w AS (PARTITION BY event_type ORDER BY t),
        |  w7 AS (PARTITION BY event_type ORDER BY t
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, t""".stripMargin,
    "dim_dates" ->
      """WITH span AS (
        |  SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
        |    MAX(CAST(date_trunc('day', ts) AS DATE)) AS d1
        |  FROM events),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day
        |  FROM span)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(year(day) AS INT) AS year,
        |  CAST(quarter(day) AS INT) AS quarter,
        |  CAST(month(day) AS INT) AS month,
        |  CAST(weekofyear(day) AS INT) AS iso_week,
        |  CAST(isodow(day) AS INT) AS isodow,
        |  CAST(isodow(day) >= 6 AS INT) AS is_weekend
        |FROM days ORDER BY day""".stripMargin,
    "ev_abtest" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 14 THEN 1 ELSE 0 END AS converted,
        |    CAST(user_id % 2 AS INT) AS variant
        |  FROM events GROUP BY user_id),
        |panel AS (
        |  SELECT variant, COUNT(*) AS n,
        |    CAST(SUM(converted) AS BIGINT) AS conv
        |  FROM pu GROUP BY 1),
        |wide AS (
        |  SELECT
        |    MAX(CASE WHEN variant = 0 THEN n END) AS n_control,
        |    MAX(CASE WHEN variant = 0 THEN conv END) AS conv_control,
        |    MAX(CASE WHEN variant = 1 THEN n END) AS n_treat,
        |    MAX(CASE WHEN variant = 1 THEN conv END) AS conv_treat
        |  FROM panel),
        |rates AS (
        |  SELECT *,
        |    CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE)
        |      AS rate_control,
        |    CAST(conv_treat AS DOUBLE) / CAST(n_treat AS DOUBLE) AS rate_treat,
        |    CAST(conv_control + conv_treat AS DOUBLE)
        |      / CAST(n_control + n_treat AS DOUBLE) AS pool
        |  FROM wide),
        |zz AS (
        |  SELECT *, CASE WHEN pool * (1.0 - pool) = 0 THEN NULL
        |    ELSE (rate_treat - rate_control)
        |    / sqrt(pool * (1.0 - pool) * (1.0 / CAST(n_control AS DOUBLE)
        |      + 1.0 / CAST(n_treat AS DOUBLE))) END AS z
        |  FROM rates)
        |SELECT n_control, conv_control, round(rate_control, 6) AS rate_control,
        |  n_treat, conv_treat, round(rate_treat, 6) AS rate_treat,
        |  round(z, 6) AS z, CAST(abs(z) > 1.96 AS INT) AS significant
        |FROM zz""".stripMargin,
    "ev_acf" ->
      s"""WITH $dailyFilledCte,
        |stats AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS ss
        |  FROM f GROUP BY 1),
        |probe AS (
        |  SELECT event_type, UNNEST([1, 2, 3, 7]) AS lag, t, x FROM f),
        |lagged AS (
        |  SELECT a.event_type, p.lag, COUNT(*) AS m, SUM(a.x) AS sa,
        |    SUM(p.x) AS sb, SUM(a.x * p.x) AS sab
        |  FROM f a JOIN probe p
        |    ON a.event_type = p.event_type AND a.t = p.t - p.lag
        |  GROUP BY 1, 2),
        |panel AS (
        |  SELECT l.event_type, l.lag,
        |    CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE) AS mu,
        |    l.m, l.sa, l.sb, l.sab, s.n, s.ss
        |  FROM lagged l JOIN stats s ON l.event_type = s.event_type),
        |fin AS (
        |  SELECT event_type, lag,
        |    CAST(sab AS DOUBLE) - mu * CAST(sa + sb AS DOUBLE)
        |      + CAST(m AS DOUBLE) * mu * mu AS num,
        |    CAST(ss AS DOUBLE) - CAST(n AS DOUBLE) * mu * mu AS den
        |  FROM panel)
        |SELECT event_type, CAST(lag AS INT) AS lag,
        |  round(CASE WHEN den = 0 THEN NULL ELSE num / den END, 6) AS acf
        |FROM fin ORDER BY event_type, lag""".stripMargin,
    // identical 1e-6 ln grid + DECIMAL(38,0) exact cross/square sums
    "ev_elasticity" ->
      """WITH q AS (
        |  SELECT CAST(floor(ln(CAST(l_extendedprice AS DOUBLE)
        |      / CAST(l_quantity AS DOUBLE)) * 1000000.0 + 0.5)
        |      AS BIGINT) AS qx,
        |    CAST(floor(ln(CAST(l_quantity AS DOUBLE)) * 1000000.0
        |      + 0.5) AS BIGINT) AS qy
        |  FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0),
        |sums AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
        |    SUM(CAST(qx AS DECIMAL(19,0)) * CAST(qy AS DECIMAL(19,0)))
        |      AS sxy,
        |    SUM(CAST(qx AS DECIMAL(19,0)) * CAST(qx AS DECIMAL(19,0)))
        |      AS sxx,
        |    SUM(CAST(qy AS DECIMAL(19,0)) * CAST(qy AS DECIMAL(19,0)))
        |      AS syy
        |  FROM q),
        |fin AS (
        |  SELECT m, sx, sy,
        |    CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
        |    CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
        |  FROM sums),
        |sl AS (SELECT *, CASE WHEN den = 0 THEN NULL ELSE num / den END
        |  AS slope FROM fin)
        |SELECT m AS n_items, round(slope, 6) AS elasticity,
        |  round((CAST(sy AS DOUBLE) / 1000000.0 - slope *
        |    (CAST(sx AS DOUBLE) / 1000000.0)) / CAST(m AS DOUBLE), 6)
        |    AS ln_intercept,
        |  round(CASE WHEN den * deny = 0 THEN NULL
        |    ELSE (num * num) / (den * deny) END, 6) AS r2
        |FROM sl""".stripMargin,
    // the literal 0.5^k ladder over the same zero-filled spine
    "ev_adstock" ->
      s"""WITH $dailyFilledCte,
        |a AS (
        |  SELECT event_type, t, x,
        |    COALESCE(lag(x, 1) OVER w, 0) AS l1,
        |    COALESCE(lag(x, 2) OVER w, 0) AS l2,
        |    COALESCE(lag(x, 3) OVER w, 0) AS l3,
        |    COALESCE(lag(x, 4) OVER w, 0) AS l4,
        |    COALESCE(lag(x, 5) OVER w, 0) AS l5,
        |    COALESCE(lag(x, 6) OVER w, 0) AS l6,
        |    COALESCE(lag(x, 7) OVER w, 0) AS l7
        |  FROM f
        |  WINDOW w AS (PARTITION BY event_type ORDER BY t))
        |SELECT event_type, CAST(t AS BIGINT) AS t,
        |  CAST(x AS BIGINT) AS n_events,
        |  round(CAST(x * 1.0 + l1 * 0.5 + l2 * 0.25 + l3 * 0.125
        |    + l4 * 0.0625 + l5 * 0.03125 + l6 * 0.015625
        |    + l7 * 0.0078125 AS DOUBLE), 6) AS adstock
        |FROM a ORDER BY event_type, t""".stripMargin,
    "ev_regression" ->
      s"""WITH $dailyFilledCte,
        |sums AS (
        |  SELECT event_type, COUNT(*) AS m, SUM(t) AS sx, SUM(x) AS sy,
        |    SUM(t * x) AS sxy, SUM(t * t) AS sxx, SUM(x * x) AS syy
        |  FROM f GROUP BY 1),
        |fin AS (
        |  SELECT event_type, m, sx, sy,
        |    CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
        |    CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
        |  FROM sums),
        |sl AS (
        |  SELECT *, CASE WHEN den = 0 THEN NULL ELSE num / den END AS slope
        |  FROM fin)
        |SELECT event_type, CAST(m AS INT) AS n_days,
        |  round(slope, 6) AS slope,
        |  round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |    / CAST(m AS DOUBLE), 6) AS intercept,
        |  round(CASE WHEN den * deny = 0 THEN NULL
        |    ELSE (num * num) / (den * deny) END, 6) AS r2
        |FROM sl ORDER BY event_type""".stripMargin,
    "ev_forecast_eval" ->
      s"""WITH $dailyFilledCte,
        |j AS (
        |  SELECT a.event_type, a.x, p.x AS fv
        |  FROM f a JOIN f p
        |    ON a.event_type = p.event_type AND a.t = p.t + 7),
        |agg AS (
        |  SELECT event_type, COUNT(*) AS m,
        |    SUM(abs(x - fv)) AS ae,
        |    SUM((x - fv) * (x - fv)) AS se,
        |    SUM(CAST(round(CASE WHEN x + fv = 0 THEN 0.0
        |      ELSE 2.0 * CAST(abs(x - fv) AS DOUBLE)
        |        / CAST(x + fv AS DOUBLE) END, 9) AS DECIMAL(28,9))) AS sq
        |  FROM j GROUP BY 1)
        |SELECT event_type, CAST(m AS INT) AS n_scored,
        |  round(CAST(ae AS DOUBLE) / CAST(m AS DOUBLE), 6) AS mae,
        |  round(sqrt(CAST(se AS DOUBLE) / CAST(m AS DOUBLE)), 6) AS rmse,
        |  round(CAST(sq AS DOUBLE) / CAST(m AS DOUBLE), 6) AS smape
        |FROM agg ORDER BY event_type""".stripMargin,
    "ev_seasonality" ->
      """WITH dow AS (
        |  SELECT event_type,
        |    isodow(CAST(date_trunc('day', ts) AS DATE)) AS isodow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, g.isodow, COALESCE(d.n, 0) AS x
        |  FROM (SELECT DISTINCT event_type FROM dow) t
        |  CROSS JOIN (SELECT UNNEST(generate_series(1, 7)) AS isodow) g
        |  LEFT JOIN dow d
        |    ON t.event_type = d.event_type AND g.isodow = d.isodow),
        |tot AS (SELECT event_type, SUM(x) AS tot FROM grid GROUP BY 1),
        |rows_ AS (
        |  SELECT g.event_type, g.isodow, g.x, t.tot,
        |    CAST(t.tot AS DOUBLE) / 7.0 AS e
        |  FROM grid g JOIN tot t ON g.event_type = t.event_type),
        |terms AS (
        |  SELECT *, CAST(round((CAST(x AS DOUBLE) - e) * (CAST(x AS DOUBLE) - e)
        |    / e, 9) AS DECIMAL(28,9)) AS term
        |  FROM rows_),
        |chi AS (SELECT event_type, SUM(term) AS chi2q FROM terms GROUP BY 1)
        |SELECT r.event_type, CAST(r.isodow AS INT) AS isodow, r.x AS n,
        |  round(CAST(r.x AS DOUBLE) / CAST(r.tot AS DOUBLE), 6) AS share,
        |  round(CAST(c.chi2q AS DOUBLE), 6) AS chi2
        |FROM rows_ r JOIN chi c ON r.event_type = c.event_type
        |ORDER BY r.event_type, r.isodow""".stripMargin,
    "ev_survival" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |maxd AS (SELECT MAX(day) AS maxd FROM ev),
        |users AS (
        |  SELECT CAST(date_diff('day', MIN(day), MAX(day)) AS BIGINT) AS dur,
        |    CASE WHEN date_diff('day', MAX(day), (SELECT maxd FROM maxd)) >= 1
        |      THEN 1 ELSE 0 END AS died
        |  FROM ev GROUP BY user_id),
        |n AS (SELECT COUNT(*) AS n_users FROM users),
        |lifetab AS (
        |  SELECT dur, COUNT(*) AS c, SUM(died) AS dth FROM users GROUP BY 1),
        |atrisk AS (
        |  SELECT dur, dth,
        |    (SELECT n_users FROM n)
        |      - COALESCE(SUM(c) OVER (ORDER BY dur
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM lifetab),
        |steps AS (SELECT * FROM atrisk WHERE dth > 0),
        |terms AS (
        |  SELECT dur, n_risk, dth,
        |    CASE WHEN dth = n_risk THEN CAST(0.0 AS DECIMAL(28,9))
        |      ELSE CAST(round(ln(1.0 - CAST(dth AS DOUBLE)
        |        / CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(28,9)) END AS term,
        |    MAX(CASE WHEN dth = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY dur
        |      ROWS UNBOUNDED PRECEDING) AS anyzero
        |  FROM steps),
        |fin AS (
        |  SELECT dur, n_risk, dth, anyzero,
        |    SUM(term) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS cuml
        |  FROM terms)
        |SELECT CAST(dur AS INT) AS t_days,
        |  CAST(n_risk AS BIGINT) AS n_risk, CAST(dth AS BIGINT) AS d_deaths,
        |  CASE WHEN anyzero = 1 THEN 0.0
        |    ELSE round(exp(CAST(cuml AS DOUBLE)), 6) END AS survival
        |FROM fin ORDER BY t_days""".stripMargin,
    "ev_cohort_ltv" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
        |  FROM events GROUP BY 1),
        |sizes AS (SELECT cw, COUNT(*) AS n_cohort FROM u GROUP BY 1),
        |aged AS (
        |  SELECT u.cw,
        |    date_diff('day', u.cw,
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS age_weeks,
        |    e.user_id, e.value
        |  FROM events e JOIN u ON e.user_id = u.user_id),
        |g AS (
        |  SELECT cw, age_weeks,
        |    COALESCE(SUM(CAST(value AS DECIMAL(18,2))),
        |      CAST(0 AS DECIMAL(18,2))) AS rev,
        |    COUNT(DISTINCT user_id) AS n_active
        |  FROM aged GROUP BY 1, 2),
        |c AS (
        |  SELECT *, SUM(rev) OVER (PARTITION BY cw ORDER BY age_weeks
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM g)
        |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
        |  CAST(c.age_weeks AS INT) AS age_weeks, s.n_cohort, c.n_active,
        |  CAST(c.cum AS DOUBLE) AS cum_value,
        |  round(CAST(c.cum AS DOUBLE) / CAST(s.n_cohort AS DOUBLE), 6)
        |    AS ltv_per_user
        |FROM c JOIN sizes s ON c.cw = s.cw
        |ORDER BY cohort_week, age_weeks""".stripMargin,
    "o12_pareto" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS s,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT SUM(rev) AS tot FROM rev),
        |c AS (
        |  SELECT s, rev, SUM(rev) OVER (ORDER BY rev DESC, s ASC
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM rev),
        |cls AS (
        |  SELECT s, rev,
        |    CASE WHEN CAST(cum AS DOUBLE) / CAST(t.tot AS DOUBLE) <= 0.80
        |      THEN 'A'
        |    WHEN CAST(cum AS DOUBLE) / CAST(t.tot AS DOUBLE) <= 0.95
        |      THEN 'B' ELSE 'C' END AS abc_class,
        |    t.tot
        |  FROM c, t)
        |SELECT abc_class, COUNT(*) AS n_suppliers,
        |  CAST(SUM(rev) AS DOUBLE) AS revenue,
        |  round(CAST(SUM(rev) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 6)
        |    AS share
        |FROM cls GROUP BY 1 ORDER BY abc_class""".stripMargin,
    "o13_rankfusion" ->
      """WITH base AS (
        |  SELECT l_suppkey AS s,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev,
        |    COUNT(DISTINCT l_orderkey) AS nord
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT s,
        |    row_number() OVER (ORDER BY rev DESC, s ASC) AS r_rev,
        |    row_number() OVER (ORDER BY nord DESC, s ASC) AS r_ord
        |  FROM base)
        |SELECT s AS suppkey, r_rev, r_ord,
        |  round(1.0 / (60.0 + CAST(r_rev AS DOUBLE))
        |    + 1.0 / (60.0 + CAST(r_ord AS DOUBLE)), 6) AS rrf
        |FROM r ORDER BY rrf DESC, suppkey ASC LIMIT 25""".stripMargin,
    "basket_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM items),
        |pairs AS (
        |  SELECT a.b AS b1, x.b AS b2, COUNT(*) AS n_pair
        |  FROM items a JOIN items x ON a.o = x.o AND a.b < x.b
        |  GROUP BY 1, 2),
        |bc AS (SELECT b, COUNT(*) AS nb FROM items GROUP BY 1)
        |SELECT p.b1, p.b2, p.n_pair,
        |  round(CAST(p.n_pair AS DOUBLE) / CAST(n.n_orders AS DOUBLE), 6)
        |    AS support,
        |  round(CAST(p.n_pair AS DOUBLE) / CAST(c1.nb AS DOUBLE), 6)
        |    AS conf_12,
        |  round(CAST(p.n_pair AS DOUBLE) / CAST(c2.nb AS DOUBLE), 6)
        |    AS conf_21,
        |  round(CAST(p.n_pair AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
        |    / (CAST(c1.nb AS DOUBLE) * CAST(c2.nb AS DOUBLE)), 6) AS lift
        |FROM pairs p
        |JOIN bc c1 ON p.b1 = c1.b
        |JOIN bc c2 ON p.b2 = c2.b
        |CROSS JOIN n
        |ORDER BY lift DESC, p.b1 ASC, p.b2 ASC LIMIT 25""".stripMargin,
    "a18_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS return_flag,
        |  COALESCE(l_linestatus, 'ALL') AS line_status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY return_flag, line_status""".stripMargin,
    "sample_balanced" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT MIN(n) AS m FROM c),
        |r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, rk FROM r, m
        |WHERE rk <= m.m ORDER BY doc_id""".stripMargin)
}

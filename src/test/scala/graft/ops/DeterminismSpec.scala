package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame

/** Partition-order-proofness, proven: every FP-carrying statistic in
  * the stats/LM/PCA panel must produce BIT-IDENTICAL rows when the
  * shuffle fan-out (and with it the partial-aggregation merge order)
  * changes. This is the property the exact-decimal / scaled-long
  * quantization idioms buy; a raw double Σ would flicker here. */
class DeterminismSpec extends SparkFunSuite {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  private val queries: Seq[(String, () => DataFrame)] = Seq(
    "ev_holt"          -> (() => EventOps.evHolt(spark, sfDir)),
    "ev_ewma"          -> (() => EventOps.evEwma(spark, sfDir)),
    "ev_survival"      -> (() => StatsOps.evSurvival(spark, sfDir)),
    "ev_acf"           -> (() => StatsOps.evAcf(spark, sfDir)),
    "ev_forecast_eval" -> (() => StatsOps.evForecastEval(spark, sfDir)),
    "ev_seasonality"   -> (() => StatsOps.evSeasonality(spark, sfDir)),
    "o12_pareto"       -> (() => StatsOps.paretoAbc(spark, sfDir)),
    "basket_rules"     -> (() => StatsOps.basketRules(spark, sfDir)),
    "emb_pca"          -> (() => SimOps.embPca(spark, sfDir)),
    "text_bigram_lm"   -> (() => TrainOps.textBigramLm(spark, sfDir)),
    "ev_holtwinters"   -> (() => StatsOps.evHoltWinters(spark, sfDir)),
    "ev_theilsen"      -> (() => StatsOps.evTheilSen(spark, sfDir)),
    "ev_attrib_markov" -> (() => EventOps.evAttribMarkov(spark, sfDir)),
    "ev_markov_stationary" ->
      (() => EventOps.evMarkovStationary(spark, sfDir)),
    "text_jsd_sources" -> (() => TextOps.textJsdSources(spark, sfDir)),
    "emb_cluster_quality" ->
      (() => SimOps.embClusterQuality(spark, sfDir)),
    // round-10: the GK sketch's merge order varies with fan-out — the
    // rank_bounded booleans (and the sort-based exact side) must not
    "a23_approx_quantile" ->
      (() => LayoutOlap.a23ApproxQuantile(spark, sfDir)),
    "dq_contribution_cap" ->
      (() => Profiling.dqContributionCap(spark, sfDir)),
    "text_compress" -> (() => TextOps.textCompress(spark, sfDir)))

  test("quantized statistics are bit-identical across shuffle fan-outs") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val results = Seq("2", "9", "17").map { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        queries.map { case (name, q) => name -> rows(q()) }.toMap
      }
      queries.foreach { case (name, _) =>
        assert(results(0)(name) == results(1)(name) &&
          results(1)(name) == results(2)(name),
          s"$name differs across shuffle fan-outs — an accumulation " +
            "order leaked into the result")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}

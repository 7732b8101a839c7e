package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.{BloomSketch, BpeTokenCount, CharEntropy, CosineSimilarity, CountMinSketch, GramStats, HilbertIndex, JaroWinkler, KmvDistinct, MinHashBandKeys, MisraGries, SimHash64}

/** Config-only injection point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` registers the engine's
  * native Catalyst expressions in every new session with no code —
  * the path for pure-SQL users (JDBC/Thrift, spark-sql shell).
  * Programmatic users call [[Graft.init]] instead, which additionally
  * registers the scalar UDF library (UDFs can't be injected here:
  * SparkSessionExtensions carries Expression builders only).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // exprs(i) on a wrong-arity call would surface as an
  // IndexOutOfBoundsException out of the analyzer (and extra args
  // would be silently dropped) — fail with a real message instead
  private def arity(name: String, n: Int,
      exprs: Seq[Expression]): Seq[Expression] = {
    require(exprs.length == n,
      s"$name expects exactly $n argument(s), got ${exprs.length}")
    exprs
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: the native as-of join's planner rule
    // and its column-pruning/filter-pushdown optimizer rule
    // (programmatic users get both lazily via graft.plans.Asof.join)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinPruning)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim_native"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_sim_native"),
      (exprs: Seq[Expression]) => {
        val a = arity("cosine_sim_native", 2, exprs)
        CosineSimilarity(a.head, a(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands_native"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName,
        "minhash_bands_native"),
      (exprs: Seq[Expression]) => MinHashBandKeys(
        arity("minhash_bands_native", 1, exprs).head,
        MinHashBandKeys.DefaultK, MinHashBandKeys.DefaultBands)))
    ext.injectFunction((
      FunctionIdentifier("simhash64_native"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64_native"),
      (exprs: Seq[Expression]) =>
        SimHash64(arity("simhash64_native", 1, exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("char_entropy_native"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy_native"),
      (exprs: Seq[Expression]) =>
        CharEntropy(arity("char_entropy_native", 1, exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("gram_stats_native"),
      new ExpressionInfo(classOf[GramStats].getName, "gram_stats_native"),
      (exprs: Seq[Expression]) =>
        GramStats(arity("gram_stats_native", 1, exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct_native"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct_native"),
      (exprs: Seq[Expression]) => KmvDistinct(
        arity("kmv_distinct_native", 1, exprs).head, KmvDistinct.DefaultK)))
    ext.injectFunction((
      FunctionIdentifier("mg_topk_native"),
      new ExpressionInfo(classOf[MisraGries].getName, "mg_topk_native"),
      (exprs: Seq[Expression]) => MisraGries(
        arity("mg_topk_native", 1, exprs).head, MisraGries.DefaultK)))
    ext.injectFunction((
      FunctionIdentifier("bloom_sketch_native"),
      new ExpressionInfo(classOf[BloomSketch].getName, "bloom_sketch_native"),
      (exprs: Seq[Expression]) => BloomSketch(
        arity("bloom_sketch_native", 1, exprs).head, BloomSketch.DefaultK)))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch_native"),
      new ExpressionInfo(classOf[CountMinSketch].getName,
        "cms_sketch_native"),
      (exprs: Seq[Expression]) =>
        CountMinSketch(arity("cms_sketch_native", 1, exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count_native"),
      new ExpressionInfo(classOf[BpeTokenCount].getName,
        "bpe_token_count_native"),
      (exprs: Seq[Expression]) =>
        BpeTokenCount(arity("bpe_token_count_native", 1, exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler_native"),
      new ExpressionInfo(classOf[JaroWinkler].getName,
        "jaro_winkler_native"),
      (exprs: Seq[Expression]) => {
        val a = arity("jaro_winkler_native", 2, exprs)
        JaroWinkler(a.head, a(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hilbert_native"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_native"),
      (exprs: Seq[Expression]) => {
        val a = arity("hilbert_native", 2, exprs)
        HilbertIndex(a.head, a(1))
      }))
  }
}

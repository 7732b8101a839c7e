package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.{MinHashBandKeys, SimHash64}
import org.apache.spark.sql.functions._

/** The fused native sketch expressions must be byte-identical to the
  * Scala reference functions (the oracles replay those), and must
  * actually run through the codegen path. */
class TextSketchExpressionSpec extends SparkFunSuite {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "completely different text about campaign finance data today"),
    (3L, ""),
    (4L, "short"))

  test("minhash band keys: native expression == UDF composition") {
    val df = texts.toDF("id", "text")
    val out = df.select($"id",
      MinHashBandKeys.bands_native(spark, $"text").as("native"),
      MinHash.band_keys(MinHash.minhash_signature($"text"), 16).as("viaUdf"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
      assert(r.getSeq[Long](1).length == 16)
    }
  }

  test("simhash64: native expression == UDF, null-safe") {
    val df = texts.toDF("id", "text")
    val out = df.select($"id",
      SimHash64.simhash_native(spark, $"text").as("native"),
      SimHash.simhash($"text").as("viaUdf")).collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}")
    }
    // null text sketches as the empty document (0L) — the legacy UDF
    // contract, and what keeps the expression non-nullable so no
    // isnotnull(sketch) filter gets inferred below the projection
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(SimHash64.simhash_native(spark, $"text").as("s"),
        MinHashBandKeys.bands_native(spark, $"text").as("b")).head()
    assert(n.getLong(0) == 0L)
    assert(n.getSeq[Long](1).length == 16)
  }

  test("non-string arguments are rejected at analysis time") {
    SimHash64.register(spark)
    MinHashBandKeys.register(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64_native(123)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_bands_native(array(1, 2))").collect()
    }
  }

  test("the sketch projection stays inside whole-stage codegen") {
    // a local Seq would be ConvertToLocalRelation-folded at plan time;
    // a parquet scan forces the real codegen'd projection
    val df = graft.Tables.documents(spark, sfDir)
      .select(SimHash64.simhash_native(spark, $"text").as("sh"),
        MinHashBandKeys.bands_native(spark, $"text").as("bands"))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; the Project carrying both sketches must be starred
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.next().startsWith("*(1) Project"),
      p.linesIterator.take(4).mkString("\n"))
    // and the generated code compiles/executes WITHOUT the silent
    // interpreted fallback: CODEGEN_ONLY + fallback off turns a Janino
    // compile failure of the doGenCode template into a test failure
    // instead of an identical-result interpreted run
    withSQLConf(
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback" -> "false") {
      assert(df.select(countDistinct($"sh")).head().getLong(0) > 1)
      assert(df.select(countDistinct($"bands".cast("string"))).head()
        .getLong(0) > 1)
    }
  }

  /** Set SQL confs for the duration of `f`, restoring prior values. */
  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

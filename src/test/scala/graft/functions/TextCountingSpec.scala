package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.{CharEntropy, GramStats}
import org.apache.spark.sql.functions._

/** The native single-pass counting expressions must reproduce the HOF
  * formulations bit-for-bit (the oracles replay those), run inside
  * whole-stage codegen, and beat the quadratic HOFs superlinearly on a
  * long document. */
class TextCountingSpec extends SparkFunSuite {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "aaaaaaa"),
    (3L, ""),
    (4L, "héllo wörld — mixed ünïcode, punctuation!! 12345"),
    (5L, "the the the the the the quick quick brown"),
    // supplementary-plane code points: split(text,'') keeps surrogate
    // pairs together, so the native code-point pass must agree
    (6L, "math 𝕏 and emoji 😀😀 beyond the BMP 𝄞"))

  private def hofEntropy = {
    // the pre-native HOF formulation, verbatim
    val n = size(col("chars")).cast("double")
    when(length(col("text")) === 0, lit(0.0))
      .otherwise(-aggregate(col("cnt"), lit(0.0),
        (acc, c) => acc + (c / n) * log2(c / n)))
  }

  test("char entropy: native == HOF fold, bit-for-bit") {
    val out = texts.toDF("id", "text")
      .withColumn("chars", split(col("text"), ""))
      .withColumn("cnt", transform(array_sort(array_distinct(col("chars"))),
        c => size(filter(col("chars"), x => x === c)).cast("double")))
      .select($"id",
        CharEntropy.char_entropy(spark, $"text").as("native"),
        hofEntropy.as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id=${r.getLong(0)}")
    }
    // null text counts as the empty doc: entropy 0.0, non-null
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(CharEntropy.char_entropy(spark, $"text")).head()
    assert(n.getDouble(0) == 0.0)
  }

  test("gram stats: native == HOF count array on every width") {
    val toks = TextAnalysis.wordTokens(col("text"))
    val df = texts.toDF("id", "text").select($"id",
      TextAnalysis.wordGrams(toks, 2).as("g2"))
      .withColumn("c2", TextAnalysis.gram_counts($"g2"))
      .select($"id",
        GramStats.gram_stats(spark, $"g2").as("s"),
        when(size($"c2") === 0, 0).otherwise(array_max($"c2")).as("hof_max"),
        aggregate(filter($"c2", c => c >= 2), lit(0),
          (acc, c) => acc + c).as("hof_dup"))
      .collect()
    df.foreach { r =>
      val s = r.getStruct(1)
      assert(s.getInt(0) == r.getInt(2), s"max id=${r.getLong(0)}")
      assert(s.getInt(1) == r.getInt(3), s"dup id=${r.getLong(0)}")
    }
  }

  test("bpe token count: native == regexp_count on adversarial strings and the corpus") {
    val adversarial = texts ++ Seq(
      (7L, "abcd"), (8L, "abcde"), (9L, "abcdefgh"),   // run boundaries 4/5/8
      (10L, "a_b__cd3 4567_"),                          // _ and digits are word chars
      (11L, "!!!...,,,"),                               // pure punct: 1 each
      (12L, "a\tbc\fd\re\nf"),                    // all five \s chars
      (13L, "tab\tsep  double  space"),
      (14L, null: String))
    val out = adversarial.toDF("id", "text").select($"id",
        graft.functions.expressions.BpeTokenCount
          .bpe_token_count(spark, $"text").as("native"),
        coalesce(TextAnalysis.token_count_bpe_regex($"text"), lit(0))
          .as("re"))
      .collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}"))
    // whole corpus: identical counts row-for-row
    val mismatches = graft.Tables.documents(spark, sfDir)
      .select(graft.functions.expressions.BpeTokenCount
          .bpe_token_count(spark, col("text")).as("native"),
        TextAnalysis.token_count_bpe_regex(col("text")).as("re"))
      .filter(col("native") =!= col("re")).count()
    assert(mismatches === 0)
  }

  test("bpe token count runs under CODEGEN_ONLY (no silent fallback)") {
    val keys = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = graft.Tables.documents(spark, sfDir)
        .select(graft.functions.expressions.BpeTokenCount
          .bpe_token_count(spark, col("text")).as("t"))
      assert(out.select(countDistinct($"t")).head().getLong(0) > 1)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("both expressions run under CODEGEN_ONLY (no silent fallback)") {
    // fallback=false matters: factoryMode alone doesn't stop
    // WholeStageCodegenExec from swallowing a Janino compile failure
    // and re-executing interpreted with identical results
    val keys = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = graft.Tables.documents(spark, sfDir)
        .select(CharEntropy.char_entropy(spark, col("text")).as("e"),
          GramStats.gram_stats(spark,
            TextAnalysis.wordGrams(TextAnalysis.wordTokens(col("text")), 2))
            .as("s"))
      assert(out.select(countDistinct($"e")).head().getLong(0) > 1)
      assert(out.select(countDistinct($"s.max_count")).head().getLong(0) >= 1)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("superlinear win over the HOF on a 5k-token document") {
    // 5,000 tokens, ~2,500 distinct → the HOF's distinct×length is
    // ~12M string comparisons per gram width; the native pass is one
    // hash-count. Generous 2x bar keeps the assertion timing-robust.
    val words = (0 until 5000).map(i => s"w${i % 2500}").mkString(" ")
    val doc = Seq.fill(2)((1L, words)).toDF("id", "text")
      .withColumn("g2", TextAnalysis.wordGrams(
        TextAnalysis.wordTokens(col("text")), 2))
      .localCheckpoint(true)
    // min-of-2 runs each, native measured AFTER its codegen warmup:
    // robust to a one-off GC pause / scheduling stall
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = math.min(time(f), time(f))
    val tNative = minOf2 {
      doc.select(GramStats.gram_stats(spark, $"g2").as("s"))
        .agg(sum($"s.dup_occ")).head()
    }
    val tHof = minOf2 {
      doc.withColumn("c2", TextAnalysis.gram_counts($"g2"))
        .select(aggregate(filter($"c2", c => c >= 2), lit(0),
          (acc, c) => acc + c).as("d"))
        .agg(sum($"d")).head()
    }
    assert(tHof > 2 * tNative,
      f"expected superlinear win: hof=$tHof%.2fs native=$tNative%.2fs")
  }
}

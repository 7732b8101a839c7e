package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass counting expressions for the quality gates that
  * would otherwise be quadratic-per-row higher-order functions.
  *
  * `transform(array_distinct(xs), d -> size(filter(xs, x -> x = d)))`
  * is O(distinct × length) per row — a 5,000-token document costs tens
  * of millions of comparisons. These expressions compute the SAME
  * statistics in one sort-and-run-scan (entropy) or one hash-count
  * pass (gram stats) over unboxed input, stay inside whole-stage
  * codegen (plain static call in doGenCode), and reproduce the HOF
  * arithmetic bit-for-bit so the DuckDB oracles hold unchanged.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = DoubleType

  // non-nullable: null/empty text has entropy 0.0 (the empty-doc gate
  // value) — and the TextSketches nullability lesson applies: a
  // nullable derivation invites an inferred isnotnull recompute
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CharEntropy.compute(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      double ${ev.value} = graft.functions.expressions.CharEntropy.compute(
        ${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}

object CharEntropy {

  private val Log2 = Math.log(2.0)

  /** Shannon entropy over the text's CODE POINTS — the exact replay of
    * the HOF form `-aggregate(counts_of_sorted_distinct, 0.0,
    * (acc, c) -> acc + (c/n)*log2(c/n))` where the char array is
    * `split(text, '')`: Java's regex splits between code points (a
    * surrogate pair stays one element), ascending-code-point fold
    * order ≡ UTF-8 binary sort of the one-char strings (UTF-8 byte
    * order preserves code point order, supplementary planes included),
    * same `(c/n)*log2(c/n)` term shape with log2 = log(x)/log(2)
    * (Spark's Log2), and n = code point count ≡ Spark `length()`.
    * Null text counts as the empty doc (entropy 0.0, non-nullable).
    * Sort + run-scan: O(L log L) per row instead of O(distinct × L). */
  def compute(text: UTF8String): Double = {
    if (text == null) return 0.0
    val a = text.toString.codePoints().toArray
    val n = a.length
    if (n == 0) return 0.0
    java.util.Arrays.sort(a)
    val nd = n.toDouble
    var acc = 0.0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && a(j) == a(i)) j += 1
      val p = (j - i) / nd
      acc += p * (Math.log(p) / Log2)
      i = j
    }
    -acc
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy_native",
      exprs => {
        require(exprs.length == 1,
          s"char_entropy_native expects exactly 1 argument, got ${exprs.length}")
        CharEntropy(exprs.head)
      }, "built-in")

  def char_entropy(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("char_entropy_native", text)
  }
}

case class GramStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = GramStats.schema

  // non-nullable: a null/empty gram array yields (0, 0), the zero-gram
  // document the fraction gates map to 0.0
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    GramStats.compute(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.functions.expressions.GramStats.compute(
          ${c.isNull} ? null : (org.apache.spark.sql.catalyst.util.ArrayData) ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GramStats = copy(child = newChild)
}

object GramStats {

  val schema: StructType = StructType(Seq(
    StructField("max_count", IntegerType, nullable = false),
    StructField("dup_occ", IntegerType, nullable = false)))

  /** One hash-count pass over the gram array: the occurrence count of
    * the most frequent gram (`array_max(gram_counts)`) and the total
    * occurrences of grams appearing ≥ 2 times (the dup-fraction
    * numerator). Pure integer arithmetic — identical values to the
    * HOF formulation, with no distinct × length blowup. Null elements
    * are skipped (the HOF's `x = d` comparison never matches null). */
  def compute(grams: ArrayData): InternalRow = {
    if (grams == null || grams.numElements() == 0)
      return new GenericInternalRow(Array[Any](0, 0))
    val n = grams.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Int]](n * 2)
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val g = grams.getUTF8String(i)
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1)) else c(0) += 1
      }
      i += 1
    }
    var max = 0
    var dup = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > max) max = c
      if (c >= 2) dup += c
    }
    new GenericInternalRow(Array[Any](max, dup))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_stats_native",
      exprs => {
        require(exprs.length == 1,
          s"gram_stats_native expects exactly 1 argument, got ${exprs.length}")
        GramStats(exprs.head)
      }, "built-in")

  def gram_stats(spark: SparkSession, grams: Column): Column = {
    register(spark)
    call_function("gram_stats_native", grams)
  }
}

/** Native single-pass replay of
  * `regexp_count(text, '\w{1,4}|[^\w\s]')` — the BPE-ish subword
  * token-count proxy. The alternation makes Java's regex engine try
  * `\w{1,4}` (greedy, with backtracking bookkeeping) at EVERY
  * position, so the regex form costs several engine transitions per
  * byte on a corpus scan; the closed form below is one branch per
  * UTF-8 byte. Counting rule (exactly the regex's leftmost-greedy
  * match sequence): each maximal run of word chars [A-Za-z0-9_]
  * contributes ceil(len/4) matches, and every other non-whitespace
  * CODE POINT contributes 1 (Java regex character classes match per
  * code point; `\w`/`\s` are ASCII-only without UNICODE_CHARACTER_
  * CLASS, so any non-ASCII code point is a 1-match "other"). */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = IntegerType

  // non-nullable: null text counts 0 tokens, the empty-doc gate value
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    BpeTokenCount.compute(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = graft.functions.expressions.BpeTokenCount.compute(
        ${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenCount = copy(child = newChild)
}

object BpeTokenCount {

  /** One pass over the RAW UTF-8 bytes — both regex classes are
    * ASCII-only, so byte inspection decides everything: ASCII word
    * byte extends the current word run (flushed as ceil(run/4)), the
    * five ASCII whitespace chars (Java `\s` = space \t \n \x0B \f \r)
    * close it, any other ASCII byte is one "other" match, a UTF-8
    * LEAD byte (>= 0xC0) is one "other" match per code point, and
    * continuation bytes (0x80–0xBF) are skipped. No string decode, no
    * regex engine, no per-row allocation. */
  def compute(text: UTF8String): Int = {
    if (text == null) return 0
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    var count = 0
    var run = 0
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      val isWord = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == '_'
      if (isWord) {
        run += 1
      } else {
        if (run > 0) { count += (run + 3) / 4; run = 0 }
        val isSpace = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r'
        // non-space ASCII punct (b >= 0), or a UTF-8 lead byte
        // (0xC0–0xFF sign-extends to [-64,-1] — one count per code
        // point); continuation bytes (0x80–0xBF → [-128,-65]) skip
        if (!isSpace && b >= -64) count += 1
      }
      i += 1
    }
    if (run > 0) count += (run + 3) / 4
    count
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count_native",
      exprs => {
        require(exprs.length == 1,
          s"bpe_token_count_native expects exactly 1 argument, got ${exprs.length}")
        BpeTokenCount(exprs.head)
      }, "built-in")

  def bpe_token_count(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("bpe_token_count_native", text)
  }
}

package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{MinHash, SimHash}

/** Native Catalyst expressions for the two text sketches that run over
  * every document of the corpus (the near-dup hot paths).
  *
  * The UDF forms cross the Tungsten boundary twice per doc — the text
  * deserializes to java.lang.String, the signature reserializes to a
  * Catalyst array, and the band-key UDF then re-boxes it as Seq[Long].
  * These expressions compute text → band keys (resp. text → sketch) in
  * ONE step over UTF8String input, return unboxed Catalyst values, and
  * generate a plain static call in `doGenCode`, so the sketch stays
  * inside whole-stage codegen. The arithmetic is byte-identical to
  * [[MinHash.signature]]/[[MinHash.bandKeys]]/[[SimHash.simhash64]] —
  * the DuckDB oracles and every existing spec hold unchanged.
  */
case class MinHashBandKeys(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  // reject non-string arguments at ANALYSIS time (a SQL user can reach
  // this through the registry; without the contract a bad argument
  // only fails at execution, inside generated code)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Non-nullable, like the UDF it replaces (null text sketches as the
  // empty document). This matters for PLANS, not just semantics: a
  // nullable sketch in a join-key derivation makes
  // InferFiltersFromConstraints push `isnotnull(sketch(text))` BELOW
  // the projection — and the sketch then runs twice per row.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    MinHashBandKeys.compute(
      if (v == null) null else v.asInstanceOf[UTF8String], k, bands)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.expressions.MinHashBandKeys.compute(
          ${c.isNull} ? null : ${c.value}, $k, $bands);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandKeys = copy(child = newChild)
}

object MinHashBandKeys {

  /** The one place the signature width / band count live — the column
    * helper, the SQL registration, and GraftExtensions all read these,
    * so the two registration paths can never drift apart. */
  val DefaultK = 64
  val DefaultBands = 16

  /** Static entry the generated code calls (Scala emits a static
    * forwarder on the companion class). Null text = empty document
    * (the [[MinHash.signature]] null path), matching the legacy UDF.
    * fromPrimitiveArray keeps the band keys unboxed end-to-end. */
  def compute(text: UTF8String, k: Int, bands: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      MinHash.bandKeys(
        MinHash.signature(if (text == null) null else text.toString, k),
        bands))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_bands_native",
      exprs => {
        require(exprs.length == 1,
          s"minhash_bands_native expects exactly 1 argument, got ${exprs.length}")
        MinHashBandKeys(exprs.head, DefaultK, DefaultBands)
      }, "built-in")

  /** text → 16 LSH band keys of the 64-hash signature, fused. */
  def bands_native(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("minhash_bands_native", text)
  }
}

case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  // non-nullable: null text sketches to 0L (the legacy UDF contract);
  // see the MinHashBandKeys note — this keeps the inferred isnotnull
  // filter from recomputing the sketch below the projection
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    SimHash64.compute(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = graft.functions.expressions.SimHash64.compute(
        ${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHash64 {

  /** simhash64 of the text; null = 0L ([[SimHash.simhash64]]'s guard). */
  def compute(text: UTF8String): Long =
    SimHash.simhash64(if (text == null) null else text.toString)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_native",
      exprs => {
        require(exprs.length == 1,
          s"simhash64_native expects exactly 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }, "built-in")

  def simhash_native(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("simhash64_native", text)
  }
}

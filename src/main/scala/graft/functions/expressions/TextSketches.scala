package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
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
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[UTF8String], k, bands)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashBandKeys.compute($c, $k, $bands)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandKeys = copy(child = newChild)
}

object MinHashBandKeys {

  /** Static entry the generated code calls (Scala emits a static
    * forwarder on the companion class). */
  def compute(text: UTF8String, k: Int, bands: Int): ArrayData =
    new GenericArrayData(
      MinHash.bandKeys(MinHash.signature(text.toString, k), bands))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_bands_native",
      exprs => MinHashBandKeys(exprs.head, 64, 16), "built-in")

  /** text → 16 LSH band keys of the 64-hash signature, fused. */
  def bands_native(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("minhash_bands_native", text)
  }
}

case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHash64 {

  def compute(text: UTF8String): Long = SimHash.simhash64(text.toString)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_native",
      exprs => SimHash64(exprs.head), "built-in")

  def simhash_native(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("simhash64_native", text)
  }
}

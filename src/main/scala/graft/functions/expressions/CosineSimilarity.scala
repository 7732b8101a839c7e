package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two float-array
  * columns, computed over the unboxed primitive arrays.
  *
  * A Scala UDF on `array<float>` receives `Seq[Float]` — every element
  * is boxed on deserialization, and the row leaves the Tungsten format.
  * This expression reads `ArrayData.toFloatArray()` (one primitive copy,
  * no boxing) and generates straight-line Java in `doGenCode`, so it
  * stays inside whole-stage codegen. On the ANN scan this is the hot
  * inner loop — at 100 TB the difference between this and the UDF is
  * the difference between scan-bound and serialization-bound.
  *
  * Zero-norm inputs yield 0.0 (matching [[graft.functions.Vectors]]);
  * null if either side is null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toFloatArray()
    val b = r.asInstanceOf[ArrayData].toFloatArray()
    CosineSimilarity.cosine(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        float[] $a = $l.toFloatArray();
        float[] $b = $r.toFloatArray();
        int $n = java.lang.Math.min($a.length, $b.length);
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double x = (double) $a[$i]; double y = (double) $b[$i];
          $dot += x * y; $na += x * x; $nb += y * y;
        }
        ${ev.value} = ($na == 0.0 || $nb == 0.0)
          ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** SQL/Column registration; idempotent. Column access goes through
    * the public `call_function` path (Spark 4 keeps Expression
    * construction behind the function registry). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_native",
      exprs => {
        require(exprs.length == 2,
          s"cosine_sim_native expects exactly 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }, "built-in")

  /** Column form (requires register(spark) once per session). */
  def cosine_native(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("cosine_sim_native", a, b)
  }
}

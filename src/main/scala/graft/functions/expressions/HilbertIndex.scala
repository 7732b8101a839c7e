package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Hilbert-curve index of an (x, y) cell on the 256×256 grid — the
  * data-layout clustering key with strictly better locality than the
  * Morton/Z-order weave (`layout_zorder`): consecutive indexes are
  * always grid-neighbors (no Z-shape jumps across tile boundaries), so
  * parquet min/max stats stay tight in BOTH dimensions with no
  * worst-case seam. This is the published Hilbert xy2d bit transform
  * (the curve Databricks liquid clustering and Amazon Ion/QLDB layouts
  * use) as a native codegen expression: a Column-composition version
  * would need 8 rounds of conditional rotate/flip whose expression
  * tree grows multiplicatively per round — here it is one 8-iteration
  * loop, still inside WholeStageCodegen.
  *
  * Inputs are clamped to [0, 255] (the normalization upstream already
  * guarantees the range; clamping makes the expression total). Null in
  * → null out (standard binary-expression rule). */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.compute(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.expressions.HilbertIndex.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** Standard xy2d walk: per bit plane s = 128..1, add the quadrant
    * contribution s²·(3·rx XOR ry) and rotate/flip the frame. */
  def compute(x0: Int, y0: Int): Int = {
    var x = if (x0 < 0) 0 else if (x0 > 255) 255 else x0
    var y = if (y0 < 0) 0 else if (y0 > 255) 255 else y0
    var d = 0
    var s = 128
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_native",
      exprs => {
        require(exprs.length == 2,
          s"hilbert_native expects exactly 2 arguments, got ${exprs.length}")
        HilbertIndex(exprs(0), exprs(1))
      }, "built-in")

  def hilbert(spark: SparkSession, x: Column, y: Column): Column = {
    register(spark)
    call_function("hilbert_native", x, y)
  }
}

package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** One-pass first/second-moment (Gram) accumulator over an embedding
  * column, as a custom Catalyst aggregate — the distributed substrate
  * of PCA/whitening/anisotropy analytics ([[graft.ops.SimOps.embPca]]).
  *
  * Per input vector x it accumulates, in 1e-9-scaled exact LONG
  * arithmetic (⌊v·10⁹+0.5⌋ — the quantized-sum idiom, so partition
  * and merge order cannot flip a bit):
  *
  *  - n (count),
  *  - s1ᵢ = Σ ⌊xᵢ·10⁹+0.5⌋ for each dimension,
  *  - s2ᵢⱼ = Σ ⌊xᵢxⱼ·10⁹+0.5⌋ for the upper triangle i ≤ j,
  *
  * returned as ONE flat long array [n, s1(d), s2(d(d+1)/2)]. The
  * buffer is O(d²) — constant in the row count — at every stage:
  * partial aggregation, shuffle payload, merge. The DataFrame
  * alternative (explode d(d+1)/2 pair structs per row into a hash
  * agg) generates 10⁸+ intermediate rows at even toy scale; this is
  * the same single pass a BLAS syrk would make. Dimension is inferred
  * from the first vector; ragged inputs are rejected loudly. */
case class GramMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramMoments.Buf]
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): GramMoments.Buf =
    new GramMoments.Buf(-1, null)

  override def update(buf: GramMoments.Buf, input: InternalRow)
      : GramMoments.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData].toFloatArray()
    val d = arr.length
    val b =
      if (buf.d < 0) new GramMoments.Buf(d, new Array[Long](1 + d + d * (d + 1) / 2))
      else buf
    require(b.d == d,
      s"gram_moments: ragged embedding dims (${b.d} vs $d)")
    val a = b.a
    a(0) += 1L
    var i = 0
    var t = 1 + d // triangle cursor: walks s2 in (i, j≥i) lex order
    while (i < d) {
      val xi = arr(i).toDouble
      a(1 + i) += math.floor(xi * 1000000000.0 + 0.5).toLong
      var j = i
      while (j < d) {
        a(t) += math.floor(xi * arr(j).toDouble * 1000000000.0 + 0.5).toLong
        t += 1; j += 1
      }
      i += 1
    }
    b
  }

  override def merge(buf: GramMoments.Buf, other: GramMoments.Buf)
      : GramMoments.Buf = {
    if (other.d < 0) return buf
    if (buf.d < 0) return other
    require(buf.d == other.d,
      s"gram_moments: ragged embedding dims (${buf.d} vs ${other.d})")
    var i = 0
    while (i < buf.a.length) { buf.a(i) += other.a(i); i += 1 }
    buf
  }

  override def eval(buf: GramMoments.Buf): Any =
    new GenericArrayData(
      if (buf.d < 0) Array(0L) else buf.a)

  override def serialize(buf: GramMoments.Buf): Array[Byte] = {
    if (buf.d < 0) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(4 + buf.a.length * 8)
    bb.putInt(buf.d)
    var i = 0
    while (i < buf.a.length) { bb.putLong(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramMoments.Buf = {
    if (bytes.isEmpty) return new GramMoments.Buf(-1, null)
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val a = new Array[Long](1 + d + d * (d + 1) / 2)
    var i = 0
    while (i < a.length) { a(i) = bb.getLong; i += 1 }
    new GramMoments.Buf(d, a)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMoments =
    copy(child = newChildren.head)
  override def prettyName: String = "gram_moments"
}

object GramMoments {

  /** Mutable moment buffer: d = -1 until the first vector fixes the
    * dimension (so empty partitions serialize as zero bytes). */
  final class Buf(val d: Int, val a: Array[Long]) extends Serializable

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_moments_native",
      exprs => {
        require(exprs.length == 1,
          s"gram_moments_native expects exactly 1 argument, got ${exprs.length}")
        GramMoments(exprs.head)
      }, "built-in")

  /** embedding array<float> → flat [n, s1(d), s2(upper triangle)]. */
  def gram_native(spark: SparkSession, emb: Column): Column = {
    register(spark)
    call_function("gram_moments_native", emb)
  }
}

package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a custom Catalyst aggregate — the frequency
  * companion to the three existing sketch aggregates ([[KmvDistinct]]
  * counts distincts, [[BloomSketch]] answers membership,
  * [[MisraGries]] finds heavy hitters; this answers "about how often
  * does X occur" for ANY x, in fixed memory, with a one-sided error:
  * estimates never undercount (Cormode–Muthukrishnan 2005). At 100 TB
  * the sketch replaces a full (token → count) table wherever an upper
  * bound suffices — rate limiting, candidate pruning, join-size
  * estimation — and BROADCASTS at 96 KB.
  *
  * Buffer is a FIXED d×w = 3×4096 long-counter grid at every stage;
  * merge is element-wise addition, so the sketch is associative,
  * commutative, and identical under any partitioning or merge order —
  * the same exactness-under-reordering argument as the other sketches,
  * which is what makes a hash-compared oracle possible at all.
  *
  * Determinism/replay: row j's bucket for element e is the 12-bit
  * integer at hex nibbles 3j..3j+2 of md5(e) (w = 4096 = 16³ — the
  * [[BloomSketch]] addressing scheme verbatim), so a SQL oracle
  * rebuilds every counter with substr(md5(e)) nibble arithmetic and a
  * GROUP BY, and the point estimate min_j(counter[j][h_j(e)]) is
  * exact integer arithmetic in both engines. */
case class CountMinSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](CountMinSketch.Depth * CountMinSketch.Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMinSketch.add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  /** The full d×w counter grid, row-major (row j at offset j·w) — the
    * broadcastable probe artifact: est(e) = min_j grid[j·w + h_j(e)]. */
  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](CountMinSketch.Depth * CountMinSketch.Width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_sketch"
}

object CountMinSketch {

  /** d = 3 rows × w = 4096 = 16³ counters: row j addressed by hex
    * nibbles 3j..3j+2 of md5(e) — 9 of md5's 32 nibbles used. */
  val Depth = 3
  val Width = 4096

  private val md5tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def add(buf: Array[Long], s: UTF8String): Unit = {
    val md = md5tl.get(); md.reset()
    val dig = md.digest(s.getBytes)
    var j = 0
    while (j < Depth) {
      var pos = 0
      var n = 3 * j
      val end = n + 3
      while (n < end) {
        val nib = if ((n & 1) == 0) (dig(n >> 1) >> 4) & 0xf
                  else dig(n >> 1) & 0xf
        pos = (pos << 4) | nib
        n += 1
      }
      buf(j * Width + pos) += 1
      j += 1
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch_native",
      exprs => {
        require(exprs.length == 1,
          s"cms_sketch_native expects exactly 1 argument, got ${exprs.length}")
        CountMinSketch(exprs.head)
      }, "built-in")

  /** value (string) → the row-major 3×4096 long counter grid. */
  def cms_native(spark: SparkSession, value: Column): Column = {
    register(spark)
    call_function("cms_sketch_native", value)
  }
}

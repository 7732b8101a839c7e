package graft.functions.expressions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a custom Catalyst
  * aggregate — the bounded-memory alternative to `countDistinct`
  * (full dedup shuffle) and `collect_set` (unbounded buffer) when the
  * per-group cardinality is huge.
  *
  * Estimator: hash every value to a uniform fraction in (0,1], keep
  * only the k smallest DISTINCT hashes per group; with fewer than k
  * hashes the count is exact (= set size), otherwise
  * D ≈ (k−1) / h_k where h_k is the k-th smallest hash. Buffer is
  * O(k) per group AT EVERY STAGE — partial aggregation, shuffle
  * payload (serialized as k doubles), and merge — so a group with a
  * billion members costs the same 8·k bytes as one with a thousand.
  *
  * Unlike `approx_count_distinct` (HLL++, whose sketch is not
  * reproducible outside Spark), KMV over an md5-derived fraction is
  * fully DETERMINISTIC and engine-independent: the fraction is the
  * first 52 md5 bits scaled by 2⁻⁵², built from exact double
  * arithmetic both here (bit shifts) and in SQL (digit·16^i sums are
  * exact below 2⁵³), so an oracle can replay the estimate to the last
  * bit. Same merge-safety as HLL: the k-smallest-set union is
  * associative and commutative, so partial aggregation and arbitrary
  * merge orders give identical results.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]]
  with ExpectsInputTypes with Serializable {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  override def update(buf: java.util.TreeSet[java.lang.Double],
      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null)
      KmvDistinct.add(buf, KmvDistinct.frac(v.asInstanceOf[UTF8String]), k)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Double],
      other: java.util.TreeSet[java.lang.Double])
      : java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) KmvDistinct.add(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Double]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble / buf.last()

  override def serialize(buf: java.util.TreeSet[java.lang.Double])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val t = new java.util.TreeSet[java.lang.Double]()
    var i = 0
    while (i < n) { t.add(bb.getDouble); i += 1 }
    t
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {

  val DefaultK = 64

  // per-row hot path: one ThreadLocal digest, not an instance per row
  // (the SimHash.hash64 pattern)
  private val md5tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The first 52 bits of md5(value) as an exact double in [0, 1).
    * 52 bits (13 hex nibbles) — not 64 — so the integer is exactly
    * representable and the SQL replay (Σ digit·16^(12−i), all terms
    * and the sum < 2⁵³) is bit-identical. */
  def frac(s: UTF8String): Double = {
    val md = md5tl.get(); md.reset()
    val dig = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v = (v << 4) | ((dig(6) & 0xffL) >> 4)
    v.toDouble / 4503599627370496.0 // 2^52
  }

  /** Bounded insert: keep the k smallest distinct fractions.
    * TreeSet.add dedups, so a duplicate never evicts anything. */
  def add(buf: java.util.TreeSet[java.lang.Double], d: Double,
      k: Int): Unit = {
    if (buf.size < k) { buf.add(d); () }
    else if (d < buf.last() && buf.add(d)) { buf.pollLast(); () }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct_native",
      exprs => {
        require(exprs.length == 1,
          s"kmv_distinct_native expects exactly 1 argument, got ${exprs.length}")
        KmvDistinct(exprs.head, DefaultK)
      }, "built-in")

  /** value (string) → KMV distinct estimate with the default k. */
  def kmv_native(spark: SparkSession, value: Column): Column = {
    register(spark)
    call_function("kmv_distinct_native", value)
  }
}

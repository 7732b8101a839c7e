package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership sketch as a custom Catalyst aggregate — the
  * KMV companion ([[KmvDistinct]] answers "how many distinct", this
  * answers "is X possibly among them") and the scale mechanism behind
  * cross-run corpus dedup (T32): instead of shuffling a 100 TB probe
  * side against the stored-fingerprint table, build this fixed-size
  * sketch over the stored keys, BROADCAST it, and pre-filter the probe
  * narrowly; only the sketch's "maybe" survivors pay the exact
  * verification join. The reference's equivalent is the per-document
  * `es.exists` insert-only guard (e.g. news articles ingest checks the
  * index before writing) — restated as one bounded-memory aggregate
  * plus a map-side filter.
  *
  * Buffer is a FIXED 4096-bit (512-byte) word array at every stage —
  * update, shuffle payload, merge — regardless of input cardinality;
  * merge is a word-wise OR, so the sketch is associative, commutative,
  * and therefore identical under any partitioning/merge order.
  *
  * Determinism/replay: element e sets `kHashes` bit positions, hash j
  * reading hex nibbles 3j..3j+2 of md5(e) as a 12-bit integer (m =
  * 4096 = 16³, so three nibbles address the whole array). A SQL oracle
  * replays positions with substr(md5(e)) nibble arithmetic and the
  * final bit set is list-identical; no false negatives by
  * construction. Production sizing: m must grow ∝ n to hold the FP
  * rate ((1−e^(−kn/m))^k) — the 4096-bit default is the
  * oracle-replayable demo size, not the 100 TB size.
  */
case class BloomSketch(
    child: Expression,
    kHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with Serializable {

  // md5 has 32 hex nibbles; 3 nibbles per hash -> at most 10 hashes
  require(kHashes >= 1 && kHashes <= 10,
    s"bloom_sketch needs 1 <= k <= 10, got $kHashes")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomSketch.Words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomSketch.add(buf, v.asInstanceOf[UTF8String], kHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < BloomSketch.Words) { buf(i) |= other(i); i += 1 }
    buf
  }

  /** Ascending positions of the set bits (the oracle-comparable form;
    * also what a probe-side `array_contains` filter consumes). */
  override def eval(buf: Array[Long]): Any = {
    var n = 0
    var i = 0
    while (i < BloomSketch.Words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    val out = new Array[Int](n)
    var o = 0
    var p = 0
    while (p < BloomSketch.Bits) {
      if ((buf(p >> 6) & (1L << (p & 63))) != 0) { out(o) = p; o += 1 }
      p += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(BloomSketch.Words * 8)
    var i = 0
    while (i < BloomSketch.Words) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](BloomSketch.Words)
    var i = 0
    while (i < BloomSketch.Words) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_sketch"
}

object BloomSketch {

  /** m = 4096 = 16^3: three md5 hex nibbles address one position. */
  val Bits = 4096
  val Words: Int = Bits / 64
  val DefaultK = 3

  private val md5tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Set the k bit positions of value s: hash j = the 12-bit integer
    * at hex nibbles 3j, 3j+1, 3j+2 of md5(s) (nibble n = high/low
    * half of digest byte n/2) — exactly what a SQL replay reads with
    * substr(md5(s), 3j+1, 3). */
  def add(buf: Array[Long], s: UTF8String, k: Int): Unit = {
    val md = md5tl.get(); md.reset()
    val dig = md.digest(s.getBytes)
    var j = 0
    while (j < k) {
      var pos = 0
      var n = 3 * j
      val end = n + 3
      while (n < end) {
        val nib = if ((n & 1) == 0) (dig(n >> 1) >> 4) & 0xf
                  else dig(n >> 1) & 0xf
        pos = (pos << 4) | nib
        n += 1
      }
      buf(pos >> 6) |= 1L << (pos & 63)
      j += 1
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_sketch_native",
      exprs => {
        require(exprs.length == 1,
          s"bloom_sketch_native expects exactly 1 argument, got ${exprs.length}")
        BloomSketch(exprs.head, DefaultK)
      }, "built-in")

  /** value (string) → ascending set-bit positions of the 4096-bit
    * Bloom sketch with the default k=3 hashes. */
  def bloom_native(spark: SparkSession, value: Column): Column = {
    register(spark)
    call_function("bloom_sketch_native", value)
  }
}

package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter candidate sketch as a custom Catalyst
  * aggregate — the bounded-memory frequency companion to
  * [[KmvDistinct]] (distinct count) and [[BloomSketch]] (membership).
  *
  * The summary holds at most k (key, residual-count) entries at every
  * stage — partial aggregation, shuffle payload, merge — so finding
  * the frequent members of a billion-key Zipf-distributed column
  * never shuffles the full vocabulary. Merge follows the mergeable-
  * summaries construction (Agarwal et al., PODS'12): combine counts,
  * then subtract the (k+1)-th largest count from every entry and drop
  * the non-positives.
  *
  * Guarantee (order- and partitioning-independent): every value with
  * true frequency f > n/(k+1) survives to the final summary, because
  * each decrement step destroys k+1 counts at once and only n total
  * count exists to destroy. The RETAINED SET beyond that floor varies
  * with merge order, and residual counts undercount — which is why
  * the operator contract is candidates-then-exact-recount: the sketch
  * prunes the key space, a second pass recounts candidates exactly,
  * and the final thresholded output is deterministic no matter how
  * partials merged.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
  with ExpectsInputTypes with Serializable {

  require(k >= 1, s"mg_topk needs k >= 1, got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) MisraGries.offer(buf, v.asInstanceOf[UTF8String].toString, 1L, k)
    buf
  }

  override def merge(buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    MisraGries.shrink(buf, k)
    buf
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new Array[String](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_): Any))
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long])
      : Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      bytes += 4 + 8 +
        it0.next().getKey.getBytes(StandardCharsets.UTF_8).length
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_topk"
}

object MisraGries {

  val DefaultK = 200

  /** Classic MG step: resident key increments; a non-resident key
    * either fills a free slot or decrements EVERY resident count by
    * one (dropping zeros) — k+1 units of mass destroyed together. */
  def offer(buf: java.util.HashMap[String, java.lang.Long], key: String,
      inc: Long, k: Int): Unit = {
    val cur = buf.get(key)
    if (cur != null) { buf.put(key, cur + inc); () }
    else if (buf.size < k) { buf.put(key, inc); () }
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove()
        else e.setValue(e.getValue - 1L)
      }
      if (inc > 1L) offer(buf, key, inc - 1L, k)
    }
  }

  /** Mergeable-summaries shrink: if more than k entries, subtract the
    * (k+1)-th largest count from all and drop the non-positives. */
  def shrink(buf: java.util.HashMap[String, java.lang.Long], k: Int): Unit = {
    if (buf.size > k) {
      val counts = new Array[Long](buf.size)
      val it0 = buf.values().iterator()
      var i = 0
      while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(counts)
      // counts ascending: the (k+1)-th largest sits at size-(k+1)
      val t = counts(buf.size - (k + 1))
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= t) it.remove()
        else e.setValue(e.getValue - t)
      }
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_topk_native",
      exprs => {
        require(exprs.length == 1,
          s"mg_topk_native expects exactly 1 argument, got ${exprs.length}")
        MisraGries(exprs.head, DefaultK)
      }, "built-in")

  /** value (string) → array of heavy-hitter CANDIDATE keys (sorted);
    * callers must recount exactly — see the class doc. */
  def mg_native(spark: SparkSession, value: Column): Column = {
    register(spark)
    call_function("mg_topk_native", value)
  }
}

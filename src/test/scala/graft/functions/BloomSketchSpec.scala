package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.BloomSketch
import org.apache.spark.sql.functions._

/** Properties of the Bloom membership sketch aggregate (custom
  * TypedImperativeAggregate; the catalog row dedup_bloom proves the
  * oracle replay — this proves the sketch contract). */
class BloomSketchSpec extends SparkFunSuite {
  import spark.implicits._

  private def bits(values: Seq[String], parts: Int = 1): Seq[Int] =
    values.toDF("v").repartition(parts)
      .agg(BloomSketch.bloom_native(spark, col("v")))
      .first().getSeq[Int](0)

  private def positions(v: String): Seq[Int] = {
    val buf = new Array[Long](BloomSketch.Words)
    BloomSketch.add(buf, org.apache.spark.unsafe.types.UTF8String.fromString(v),
      BloomSketch.DefaultK)
    (0 until BloomSketch.Bits).filter(p => (buf(p >> 6) & (1L << (p & 63))) != 0)
  }

  test("no false negatives: every inserted value's positions are all set") {
    val vals = (1 to 300).map(i => s"doc$i")
    val got = bits(vals).toSet
    vals.foreach { v =>
      assert(positions(v).forall(got.contains), s"missing bits for $v")
    }
  }

  test("merge order is irrelevant: any partitioning ORs to the identical bit set") {
    val vals = (1 to 2000).map(i => s"k$i")
    assert(bits(vals) == bits(vals, parts = 17)) // word-OR is order-free
  }

  test("positions match the SQL nibble arithmetic the oracle replays") {
    val df = Seq("alpha", "beta", "gamma").toDF("v")
      .withColumn("pos", expr(
        "transform(sequence(0, 2), j -> " +
          "cast(conv(substring(md5(v), j * 3 + 1, 3), 16, 10) as int))"))
    df.collect().foreach { r =>
      val sql = r.getSeq[Int](1).toSet
      assert(sql == positions(r.getString(0)).toSet)
    }
  }

  test("a 4096-bit sketch at n=300 stays sparse and duplicates add nothing") {
    val vals = (1 to 300).map(i => s"doc$i")
    val a = bits(vals)
    assert(a.size <= 900 && a.size > 800) // ~k*n minus collisions
    assert(bits(vals ++ vals.take(150)) == a)
  }
}

package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.GramMoments
import org.apache.spark.sql.functions._

/** The one-pass Gram/first-moment aggregate: exact scaled-long sums,
  * partition-order-proof merge, empty input, ragged rejection. */
class GramMomentsSpec extends SparkFunSuite {
  import spark.implicits._

  private def flat(vs: Seq[Array[Float]], parts: Int): Seq[Long] = {
    val df = vs.map(Tuple1(_)).toDF("embedding").repartition(parts)
    df.agg(GramMoments.gram_native(spark, col("embedding")).as("g"))
      .collect().head.getSeq[Long](0)
  }

  test("hand-traced moments over 2-dim vectors, stable across partitioning") {
    val vs = Seq(Array(1.0f, 2.0f), Array(3.0f, -1.0f), Array(0.5f, 0.25f))
    val expected = {
      // n, s1_0, s1_1, s2_00, s2_01, s2_11 — ⌊v·1e9+0.5⌋ exact longs
      def q(v: Double) = math.floor(v * 1e9 + 0.5).toLong
      Seq(3L,
        q(1.0) + q(3.0) + q(0.5), q(2.0) + q(-1.0) + q(0.25),
        q(1.0) + q(9.0) + q(0.25), q(2.0) + q(-3.0) + q(0.125),
        q(4.0) + q(1.0) + q(0.0625))
    }
    assert(flat(vs, 1) == expected)
    // merge path: many partitions → identical exact sums
    assert(flat(vs, 3) == expected)
  }

  test("negative products quantize by ⌊v+0.5⌋, not round-half-away") {
    // x·y = -0.75e-9 scaled → ⌊-0.75+0.5⌋ = -1 (floor, not -1→0 trunc)
    val vs = Seq(Array(-0.000015f, 0.00005f))
    val g = flat(vs, 1)
    val prod = (-0.000015f).toDouble * (0.00005f).toDouble
    assert(g(4) == math.floor(prod * 1e9 + 0.5).toLong)
  }

  test("empty input evals to the [0] sentinel") {
    val g = flat(Seq.empty, 1)
    assert(g == Seq(0L))
  }

  test("ragged dimensions are rejected loudly") {
    val vs = Seq(Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))
    val ex = intercept[Exception] {
      flat(vs, 1)
    }
    assert(ex.getMessage.contains("ragged") ||
      Option(ex.getCause).exists(_.getMessage.contains("ragged")))
  }
}

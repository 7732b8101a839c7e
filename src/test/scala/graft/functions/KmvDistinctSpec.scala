package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.KmvDistinct
import org.apache.spark.sql.functions._

/** Properties of the KMV distinct-count sketch aggregate
  * (custom TypedImperativeAggregate; the catalog row a15_kmv proves
  * the oracle replay — this proves the sketch semantics). */
class KmvDistinctSpec extends SparkFunSuite {
  import spark.implicits._

  test("below k the count is exact") {
    val df = (1 to 40).map(i => s"v$i").toDF("v")
    val est = df.agg(KmvDistinct.kmv_native(spark, col("v"))).first().getDouble(0)
    assert(est == 40.0)
  }

  test("duplicates never move the estimate") {
    val uniq = (1 to 500).map(i => s"u$i")
    val dup = uniq ++ uniq ++ uniq.take(250)
    val a = uniq.toDF("v").agg(KmvDistinct.kmv_native(spark, col("v")))
      .first().getDouble(0)
    val b = dup.toDF("v").agg(KmvDistinct.kmv_native(spark, col("v")))
      .first().getDouble(0)
    assert(a == b)
  }

  test("merge order is irrelevant: any partitioning gives the identical sketch") {
    val df = (1 to 5000).map(i => s"x$i").toDF("v")
    val one = df.repartition(1)
      .agg(KmvDistinct.kmv_native(spark, col("v"))).first().getDouble(0)
    val many = df.repartition(13)
      .agg(KmvDistinct.kmv_native(spark, col("v"))).first().getDouble(0)
    assert(one == many) // bitwise: k-smallest-set union is order-free
  }

  test("estimate lands near truth (rel err std ≈ 1/sqrt(k-2) ≈ 13%)") {
    val est = (1 to 5000).map(i => s"x$i").toDF("v")
      .agg(KmvDistinct.kmv_native(spark, col("v"))).first().getDouble(0)
    assert(est > 5000 * 0.6 && est < 5000 * 1.4, s"estimate $est vs 5000")
  }

  test("SQL registration path (grouped, via spark.sql)") {
    graft.Graft.init(spark)
    (1 to 150).map(i => (s"g${i % 3}", s"m$i")).toDF("g", "v")
      .createOrReplaceTempView("kmv_in")
    val rows = spark.sql(
      "SELECT g, kmv_distinct_native(v) AS est FROM kmv_in GROUP BY g ORDER BY g")
      .collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getDouble(1) == 50.0)) // 50 < k=64 → exact
  }
}

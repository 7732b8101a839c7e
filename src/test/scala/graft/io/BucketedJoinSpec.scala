package graft.io

import graft.SparkFunSuite

/** Evidence for the "co-locate repeated joins via bucketing" 100 TB
  * claim: two tables bucketed by the join key join with ZERO shuffle
  * exchanges — the physical plan reads each bucket pair directly into
  * the sort-merge join. At cluster scale this is the difference
  * between an O(corpus) network shuffle per join and none. */
class BucketedJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("bucketed-by-key tables sort-merge join with no shuffle exchange") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the join planner's hand: no broadcast shortcut (at real
    // scale neither side would fit), so a shuffle would be visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n = 1000
      (1 to n).map(i => (i.toLong, s"a$i")).toDF("k", "va")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable("bj_left")
      (1 to n).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable("bj_right")
      val j = spark.table("bj_left").join(spark.table("bj_right"), "k")
      val physical = j.queryExecution.sparkPlan.toString
      assert(physical.contains("SortMergeJoin"), physical.take(500))
      assert(!physical.contains("Exchange"),
        s"bucketed join still shuffles:\n${physical.take(800)}")
      assert(j.count() == n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bj_left")
      spark.sql("DROP TABLE IF EXISTS bj_right")
    }
  }
}

package graft.io

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Bucketing evidence for the scale posture: two tables bucketed on
  * the merge key join WITHOUT a shuffle on either side — this is what
  * the Graph/Doc stores buy by keeping their tables bucketed at real
  * scale (every incremental merge is map-side co-located). */
class BucketedJoinSpec extends SparkFunSuite {

  test("bucketed-by-key tables join with no exchange") {
    val bdir = java.nio.file.Files.createTempDirectory("buckets").toString
    val old = Tables.ordersDf(spark, sfDir)
    old.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$bdir/store_t1").saveAsTable("store_t1")
    old.withColumn("o_totalprice", col("o_totalprice") * 2)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$bdir/store_t2").saveAsTable("store_t2")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("store_t1").as("a")
        .join(spark.table("store_t2").as("b"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles")
      assert(joined.count() == old.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS store_t1")
      spark.sql("DROP TABLE IF EXISTS store_t2")
    }
  }

  private object Tables {
    def ordersDf(s: org.apache.spark.sql.SparkSession, d: String) =
      graft.Tables.orders(s, d)
  }
}

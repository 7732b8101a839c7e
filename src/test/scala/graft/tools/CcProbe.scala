package graft.tools
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val t00 = System.nanoTime()
    val ord = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, d)
      .filter(col("l_quantity") >= 50 && col("l_discount") >= 0.08)
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst"))).persist()
    edges.count()
    // iterate with AQE off: fixed tiny plans, no per-stage re-opt
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    var changed = 1L; var round = 0
    while (changed > 0 && round < 20) {
      round += 1
      val t0 = System.nanoTime()
      val prop = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
        .union(labels)
        .groupBy("node").agg(min(col("label")).as("label"))
      val next = prop.as("a")
        .join(prop.select(col("node").as("ln"), col("label").as("ll")), col("a.label") === col("ln"))
        .select(col("a.node").as("node"), col("ll").as("label")).localCheckpoint()
      changed = next.as("n")
        .join(labels.select(col("node"), col("label").as("old")), "node")
        .filter(col("label") =!= col("old")).count()
      labels = next
      println(f"[probe] round=$round changed=$changed ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println(f"[probe] TOTAL ${(System.nanoTime()-t00)/1e9}%.2f s")
    spark.stop()
  }
}

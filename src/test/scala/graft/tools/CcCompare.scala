package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the graph_cc convergence-check variants (dev probe,
  * test scope only): r5's join-based changed count vs r6's carried
  * old-label flag. Run: sbt "Test/runMain graft.tools.CcCompare". */
object CcCompare {
  def edgesOf(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, d)
      .filter(col("l_quantity") >= 50 && col("l_discount") >= 0.08)
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  def oldLoop(spark: SparkSession, d: String): Long = {
    val edges = edgesOf(spark, d).persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < 20) {
      round += 1
      val prop = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
        .union(labels)
        .groupBy("node").agg(min(col("label")).as("label"))
      val next = prop.as("a")
        .join(prop.select(col("node").as("ln"), col("label").as("ll")),
          col("a.label") === col("ln"))
        .select(col("a.node").as("node"), col("ll").as("label"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.select(col("node"), col("label").as("old")), "node")
        .filter(col("label") =!= col("old")).count()
      labels = next
    }
    edges.unpersist()
    val n = labels.count()
    println(s"[old] rounds=$round nodes=$n")
    n
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // warm-up both paths once
    oldLoop(spark, d)
    graft.ops.GraphOps.graphComponents(spark, d).count()
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      oldLoop(spark, d)
      println(f"[old] rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      graft.ops.GraphOps.graphComponents(spark, d).count()
      println(f"[new] rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

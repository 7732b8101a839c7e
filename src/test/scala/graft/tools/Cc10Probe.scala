package graft.tools
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe: time the CURRENT graphComponents phases and a
  * 4-hop-accelerated variant, to size the remaining job-latency tail. */
object Cc10Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val variant = if (args.nonEmpty) args(0) else "hop2"

    def run(): Unit = {
      val t00 = System.nanoTime()
      val ord = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(spark, d)
        .filter(col("l_quantity") >= 50 && col("l_discount") >= 0.08)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst"))).persist()
      val t1 = System.nanoTime()
      if (variant == "noaqe")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      val hop2 =
        if (variant == "narrow" || variant == "noaqe")
          edges.union(graft.ops.GraphOps.twoHopCapped(edges, 32))
            .distinct().repartition(4, col("dst")).localCheckpoint()
        else
          edges.union(graft.ops.GraphOps.twoHopCapped(edges, 32))
            .distinct().localCheckpoint()
      val hopEdges = if (variant == "hop4") {
        val h = hop2.union(graft.ops.GraphOps.twoHopCapped(hop2, 32))
          .distinct().localCheckpoint()
        h
      } else hop2
      val t2 = System.nanoTime()
      println(f"[cc10] hopEdges n=${hopEdges.count()} build=${(t2 - t1) / 1e9}%.2f s")
      var labels =
        if (variant == "narrow" || variant == "noaqe")
          hopEdges.select(col("src").as("node")).distinct()
            .withColumn("label", col("node"))
            .repartition(4, col("node")).localCheckpoint()
        else
          hopEdges.select(col("src").as("node")).distinct()
            .withColumn("label", col("node")).localCheckpoint()
      val t3 = System.nanoTime()
      var changed = true; var round = 0
      while (changed && round < 20) {
        round += 1
        val r0 = System.nanoTime()
        val prop = hopEdges
          .join(labels, hopEdges("dst") === labels("node"))
          .select(hopEdges("src").as("node"), col("label"),
            lit(null).cast("string").as("old"))
          .union(labels.select(col("node"), col("label"),
            col("label").as("old")))
          .groupBy("node")
          .agg(min(col("label")).as("label"), max(col("old")).as("old"))
          .localCheckpoint(false)
        changed = prop.agg(
          max((col("label") =!= col("old")).cast("int")).as("c"))
          .head().getInt(0) > 0
        if (changed) {
          labels = prop.as("a")
            .join(prop.select(col("node").as("ln"), col("label").as("ll")),
              col("a.label") === col("ln"))
            .select(col("a.node").as("node"), col("ll").as("label"))
            .localCheckpoint(false)
        } else {
          labels = prop.select(col("node"), col("label"))
        }
        println(f"[cc10] round=$round ${(System.nanoTime() - r0) / 1e9}%.2f s")
      }
      val t4 = System.nanoTime()
      val n = labels.groupBy(col("label")).agg(count(lit(1))).count()
      edges.unpersist()
      println(f"[cc10] variant=$variant components=$n rounds=$round " +
        f"edgebuild=${(t1 - t00) / 1e9}%.2f hop=${(t2 - t1) / 1e9}%.2f " +
        f"init=${(t3 - t2) / 1e9}%.2f loop=${(t4 - t3) / 1e9}%.2f " +
        f"total=${(System.nanoTime() - t00) / 1e9}%.2f s")
    }
    run(); run() // second run = steady-state (memo-free op, JIT warm)
    spark.stop()
  }
}

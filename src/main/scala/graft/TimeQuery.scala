package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one catalog query at a given SF, repeated, after
  * a warm-up run — isolates a single query's steady-state cost without
  * a full Bench pass. Usage: `runMain graft.TimeQuery <sfDir> <name> [reps]`. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up: codegen/JIT + memoized artifacts
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[time] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}

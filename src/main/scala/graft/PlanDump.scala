package graft

import java.nio.file.{Files, Paths}

/** Dev utility (optimization rounds): dump `explain("formatted")` for a
  * list of catalog queries into a directory, one `<name><suffix>.txt`
  * per query — the before/after plan evidence the optimization report
  * cites. Queries run once first (so memoized artifacts exist and AQE
  * facts are real), then the formatted plan is written.
  *
  * Usage: `runMain graft.PlanDump <sfDir> <outDir> <suffix> <n1,n2,...>`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, list) = args.take(4)
    val names = list.split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Bench's scan-split sizing so dumped plans are the benched ones
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      try df.count() catch { case _: Throwable => () }
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"$n$suffix.txt"),
        (s"-- $n @ $sfDir (cpus=$cpus)\n" + txt).getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/$n$suffix.txt")
    }
    spark.stop()
  }
}

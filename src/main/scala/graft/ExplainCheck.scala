package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    // does count() eliminate the presentation sort?
    val q = ops.CoreRelational.j01Enrich(spark, d)
    val countPlan = q.groupBy().count().queryExecution.executedPlan.toString
    println("=== j01 count plan has Sort: " + countPlan.contains("Sort"))
    // pushdown check on p01
    val p = ops.CoreRelational.p06Range(spark, d)
    val pe = p.queryExecution.executedPlan.toString
    println("=== p06 PushedFilters: " +
      pe.linesIterator.filter(_.contains("PushedFilters")).take(2).mkString("; "))
    println("=== p06 ReadSchema: " +
      pe.linesIterator.filter(_.contains("ReadSchema")).take(1).mkString)
    // broadcast check on j01
    val je = q.queryExecution.executedPlan.toString
    println("=== j01 uses BroadcastHashJoin: " + je.contains("BroadcastHashJoin"))
    println("=== j01 WholeStageCodegen spans: " +
      je.linesIterator.count(_.contains("WholeStageCodegen")))
    spark.stop()
  }
}

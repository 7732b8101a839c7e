package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator catalog module; each key has a
  * DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (UDF/sketch-based), in which case the driver records
  * a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Enriched classification aggregate: fact scan → broadcast dim joins →
    * classify → hash agg (the §7.3 minimum-slice shape). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d)
    val cust = Tables.customer(spark, d)
    val nat = Tables.nation(spark, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"), "left")
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
      .withColumn("class",
        when(col("o_totalprice") > 150000.0, "high").otherwise("low"))
      .groupBy(col("n_name"), col("class"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("n_name"), col("class"))
  }

  private val modules: Seq[QueryModule] = Seq(
    QueryModule(ops.CoreRelational.queries, ops.CoreRelational.oracles),
    QueryModule(ops.PlanCensus.queries, ops.PlanCensus.oracles),
    QueryModule(ops.Profiling.queries, ops.Profiling.oracles),
    QueryModule(ops.LayoutOlap.queries, ops.LayoutOlap.oracles),
    QueryModule(ops.TextOps.queries, ops.TextOps.oracles),
    QueryModule(ops.DedupOps.queries, ops.DedupOps.oracles),
    QueryModule(ops.SimOps.queries, ops.SimOps.oracles),
    QueryModule(ops.EventOps.queries, ops.EventOps.oracles),
    QueryModule(ops.MultimodalOps.queries, ops.MultimodalOps.oracles),
    QueryModule(ops.FuncOps.queries, ops.FuncOps.oracles),
    QueryModule(ops.DocOps.queries, ops.DocOps.oracles),
    QueryModule(ops.TrainOps.queries, ops.TrainOps.oracles),
    QueryModule(ops.StatsOps.queries, ops.StatsOps.oracles),
    QueryModule(ops.GraphOps.queries, ops.GraphOps.oracles),
    QueryModule(ops.Headline.queries, ops.Headline.oracles),
    QueryModule(fec.FecFunnel.queries, fec.FecFunnel.oracles),
    QueryModule(ops.StreamOps.queries, ops.StreamOps.oracles))

  /** One entry per implemented operator from SURVEY.md §2. (lazy val,
    * r14: the harness loops resolve queries hundreds of times per run —
    * rebuilding the 387-entry map each call was avoidable driver work.) */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

final case class QueryModule(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracles: Map[String, String])

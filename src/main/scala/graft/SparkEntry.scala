package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Analytics

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Analytics.q1Agg _)
  )

  /** DuckDB-runnable ANSI SQL twin for each oracle-able query; keys
    * absent here get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Analytics.q1AggSql
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Analytics
import graft.ingest.Ingest

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A: ingestion (reference surface)
    "ingest_manifest"  -> (Ingest.ingestManifest _),
    "zipcsv_read"      -> (Ingest.zipcsvRead _),
    "decision_parse"   -> (Ingest.decisionParse _),
    "snowflake_decode" -> (Ingest.snowflakeDecode _),
    "dedup_upsert"     -> (Ingest.dedupUpsert _),
    "ingest_stats"     -> (Ingest.ingestStats _),
    // B: query surface
    "q1_agg"           -> (Analytics.q1Agg _)
  )

  /** DuckDB-runnable ANSI SQL twin for each oracle-able query; keys
    * absent here get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "ingest_manifest"  -> Ingest.ingestManifestSql,
    "zipcsv_read"      -> Ingest.zipcsvReadSql,
    "decision_parse"   -> Ingest.decisionParseSql,
    "snowflake_decode" -> Ingest.snowflakeDecodeSql,
    "dedup_upsert"     -> Ingest.dedupUpsertSql,
    "ingest_stats"     -> Ingest.ingestStatsSql,
    "q1_agg"           -> Analytics.q1AggSql
  )
}

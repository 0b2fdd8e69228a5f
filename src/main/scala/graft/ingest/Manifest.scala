package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Daily dump-file manifest (main.go:146-154): one
  * `sor-discord-netherlands-bv-YYYY-MM-DD-full.zip` name per day of
  * the range. Generated as a plan (`sequence` + `explode`), not a
  * driver loop, so a multi-year range parallelizes and can join
  * against already-ingested bookkeeping tables.
  */
object Manifest {
  val UrlPrefix = "sor-discord-netherlands-bv-"

  def daily(spark: SparkSession, from: String, to: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit(from).cast("date"), lit(to).cast("date"))).as("d"))
      .select(col("d"), dumpFile(col("d")).as("file"))

  /** Manifest spanning a DataFrame's event-time extent: agg to
    * (min,max) then expand — still a single declarative plan. */
  def spanning(df: DataFrame, tsCol: String): DataFrame =
    df.agg(min(to_date(col(tsCol))).as("d0"), max(to_date(col(tsCol))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .select(col("d"), dumpFile(col("d")).as("file"))

  private def dumpFile(d: org.apache.spark.sql.Column) =
    concat(lit(UrlPrefix), date_format(d, "yyyy-MM-dd"), lit("-full.zip"))
}

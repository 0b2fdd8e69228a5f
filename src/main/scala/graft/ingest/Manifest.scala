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

  /** First day the dump exists (main.go:102, `startDateWarn`):
    * requesting earlier days "is pointless and may result in excess
    * 404 errors" — the reference's only input validation. */
  val DumpEpoch = "2024-08-21"

  def daily(spark: SparkSession, from: String, to: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit(from).cast("date"), lit(to).cast("date"))).as("d"))
      .select(col("d"), dumpFile(col("d")).as("file"))

  /** Manifest spanning a DataFrame's event-time extent: agg to
    * (min,max) then expand — still a single declarative plan. Each
    * day carries `before_epoch` — the reference's pre-dump-epoch
    * warning (main.go:102-106) as a per-row flag a pipeline can
    * filter or alert on instead of a stdout warning + sleep. */
  def spanning(df: DataFrame, tsCol: String): DataFrame =
    df.agg(min(to_date(col(tsCol))).as("d0"), max(to_date(col(tsCol))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .select(col("d"), dumpFile(col("d")).as("file"),
        (col("d") < lit(DumpEpoch).cast("date")).as("before_epoch"))

  /** The reference's full range sanity check (main.go:102-112) as
    * flag columns: days before the dump epoch, and days on/after
    * `today` ("in the future or in today. This may result in excess
    * 404 errors"). `today` is injectable so specs (and backfills
    * replaying a past clock) stay deterministic; production passes
    * current_date(). */
  def validated(manifest: DataFrame,
                today: org.apache.spark.sql.Column = current_date()): DataFrame =
    manifest
      .withColumn("before_epoch", col("d") < lit(DumpEpoch).cast("date"))
      .withColumn("not_yet_published", col("d") >= today)

  private def dumpFile(d: org.apache.spark.sql.Column) =
    concat(lit(UrlPrefix), date_format(d, "yyyy-MM-dd"), lit("-full.zip"))
}

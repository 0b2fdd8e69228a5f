package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.functions.Snowflake

/** Typed parsing of the reference's Decision CSV fields
  * (utils.go:184-297), as pure column expressions (codegen'd, no
  * UDFs) so the whole parse stage fuses into one codegen span over
  * the extracted CSV strings.
  */
object DecisionParser {

  /** `yyyy-MM-dd HH:mm:ss` → timestamp, null on empty/malformed
    * (utils.go:193-202). */
  def parseTs(c: Column): Column =
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss"))

  /** Array field: JSON array when it parses as one, else singleton
    * fallback; empty → null (utils.go:248-261). */
  def parseArray(c: Column): Column =
    when(c.isNull || c === "", lit(null).cast(ArrayType(StringType)))
      .otherwise(coalesce(from_json(c, ArrayType(StringType)), array(c)))

  /** Tri-state bool: yes/no (case-insensitive) else null
    * (utils.go:263-272). */
  def parseBool(c: Column): Column =
    when(lower(c) === "yes", lit(true))
      .when(lower(c) === "no", lit(false))
      .otherwise(lit(null).cast("boolean"))

  /** platform_uid `snowflake-entityid-entitytype` →
    * (snowflake_ms, entity_id, entity_type); fewer than 3 parts →
    * all null; unparseable snowflake → null time, id/type kept
    * (utils.go:274-288 — the Go zero time is represented as null).
    */
  def platformUidCols(c: Column): (Column, Column, Column) = {
    val parts = split(c, "-")
    val ok = size(parts) >= 3
    val ms = when(ok, Snowflake.snowflakeMs(element_at(parts, 1).try_cast("long")))
    val id = when(ok, element_at(parts, 2))
    val tp = when(ok, element_at(parts, 3))
    (ms, id, tp)
  }
}

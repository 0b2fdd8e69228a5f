package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Bounded-range (interval) join — the other join Spark has no
  * native efficient form of: a raw `t BETWEEN x AND y` condition
  * plans as a nested-loop. Spark-first shape: quantize time into
  * buckets as wide as the range, explode the probe side to the
  * (few) buckets its window can touch, equi-join on (key, bucket) —
  * hash shuffle, AQE-friendly — then refine with the exact range
  * predicate. Each candidate pair meets in exactly one bucket (the
  * build row's own), so no dedup pass is needed.
  */
object RangeJoin {

  val WindowSec = 3600L // 1-hour correlation window

  /** Driver query: per error event, how many clicks the same user
    * made in the preceding hour (burst correlation). */
  def rangeJoinQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"),
        floor(col("ts").cast("long") / WindowSec).as("bucket"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("ets"), col("event_id").as("error_id"),
        explode(array(
          floor(col("ts").cast("long") / WindowSec) - 1,
          floor(col("ts").cast("long") / WindowSec))).as("bucket"))
    errors
      .join(clicks, Seq("user_id", "bucket"), "left_outer")
      .withColumn("hit",
        col("click_id").isNotNull &&
          col("cts") > col("ets") - expr(s"INTERVAL $WindowSec SECOND") &&
          col("cts") <= col("ets"))
      .groupBy(col("error_id"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_clicks"))
  }

  val rangeJoinSql: String =
    s"""SELECT e.event_id AS error_id, count(c.event_id) AS n_clicks
       |FROM (SELECT * FROM events WHERE event_type = 'error') e
       |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
       |  ON c.user_id = e.user_id
       |  AND CAST(c.ts AS TIMESTAMP) > CAST(e.ts AS TIMESTAMP) - INTERVAL $WindowSec SECOND
       |  AND CAST(c.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
       |GROUP BY 1""".stripMargin
}

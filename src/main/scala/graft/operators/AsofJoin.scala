package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** As-of (nearest-earlier) join — an operator Spark has no native
  * form of (DuckDB/kdb ASOF JOIN). Implemented Spark-first via the
  * union + last-non-null-window trick:
  *
  *   1. tag right rows 0, left rows 1; union by name
  *   2. one shuffle on the join key; within each key partition sort
  *      by (time, tag) — a right row at the same instant sorts first,
  *      giving ASOF's `<=` semantics
  *   3. running `last(right_cols, ignoreNulls)` over rows
  *      unbounded-preceding..current carries the newest right row
  *      forward; keep the tag-1 rows
  *
  * Cost: ONE hash shuffle + sort of |L|+|R| — the same partitioning a
  * plain equi-join would need; no range explosion, no per-key
  * collect, skew handled by AQE like any other shuffle.
  */
object AsofJoin {

  /** Generic as-of: for each row of `left`, append the newest `right`
    * row with the same `key` and `rightTime <= leftTime`. `right`
    * must be unique per (key, time) — pre-aggregate if not. */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val r = right.select(col(key) +: col(rightTime).as("_t") +:
      payload.map(col): _*).withColumn("_tag", lit(0))
    val l = left.withColumn("_t", col(leftTime)).withColumn("_tag", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(when(col("_tag") === 0, col(c)), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1)
      .drop((payload :+ "_t" :+ "_tag"): _*)
  }

  /** Driver query: click→purchase attribution — each purchase joined
    * to the same user's latest prior click (clicks deduped to one
    * per (user, ts) by max event_id, so ties are deterministic). */
  def asofJoinQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"),
        max_by(col("value"), col("event_id")).as("click_value"))
      .withColumn("click_ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .select("user_id", "ts", "click_id", "click_ts", "click_value")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    asof(purchases, clicks, "user_id", "ts", "ts",
      Seq("click_id", "click_ts", "click_value"))
      .select(col("purchase_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
        col("asof_click_id").as("click_id"),
        col("asof_click_ts").as("click_ts"),
        graft.Portable.pround(col("asof_click_value"), 4).as("click_value"))
  }

  /** DuckDB's native ASOF JOIN is the oracle. */
  val asofJoinSql: String =
    """WITH c AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS cts,
      |    max(event_id) AS click_id,
      |    arg_max(value, event_id) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (
      |  SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS pts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id,
      |  strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS p_ts,
      |  c.click_id,
      |  strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
      |  floor((c.click_value) * 10000.0 + 0.5) / 10000.0 AS click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.cts <= p.pts""".stripMargin
}

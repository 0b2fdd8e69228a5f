package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J-line: streaming top-K — hourly event-type leaders maintained as
  * a live windowed aggregate. The COUNTS are streaming state
  * (complete-mode windowed aggregation, the dashboard-feeding shape);
  * the rank is a batch view over the sink table, because top-K is a
  * consumer-side read of the maintained state, not more stream state
  * (ranking inside the stream would force per-trigger global sorts).
  * At scale the aggregate shuffles one row per (window, type) per
  * trigger. Complete mode re-emits (and retains) every window — the
  * right shape for a bounded dashboard horizon; an unbounded
  * deployment switches to update mode + a watermark so expired
  * windows age out of state, with the same consumer-side rank.
  *
  * All verify input arrives in one wave, so the result is the exact
  * relational windowed-count + rank — the oracle recomputes it. */
object StreamTopk {

  val K = 3

  def run(s: SparkSession, dir: String): DataFrame = {
    val mem = "stream_topk_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val counts = StreamIngest.readEvents(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"))
    val q = counts.writeStream.format("memory").queryName(mem)
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val w = Window.partitionBy(col("hour")).orderBy(col("n").desc, col("event_type"))
    s.table(mem)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
  }

  val sql: String =
    s"""WITH c AS (
       |  SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
       |           '%Y-%m-%d %H:%M:%S') AS hour,
       |    event_type, count(*) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT hour, event_type, n, rk FROM (
       |  SELECT hour, event_type, n,
       |    row_number() OVER (PARTITION BY hour ORDER BY n DESC, event_type) AS rk
       |  FROM c)
       |WHERE rk <= $K""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Robust/distribution analytics (SURVEY.md §2 I-line): equi-depth
  * histograms and median-absolute-deviation outlier detection — the
  * two distribution probes a data pipeline runs on numeric columns
  * before trusting them.
  */
object Robust {

  val Bins = 10

  /** I6: equi-depth histogram of lineitem prices. Bin EDGES come from
    * one exact interpolated-percentile aggregate (a single one-row
    * frame, broadcast via cross join — never a global sort window);
    * each row then counts the edges below it, so binning is map-side
    * and the only shuffle is the final per-bin aggregate. The same
    * shape holds at 100 TB: percentile → approx sketch, everything
    * else unchanged. */
  def quantileBins(s: SparkSession, dir: String): DataFrame = {
    val ps = (1 until Bins).map(i => i.toDouble / Bins)
    val edges = lineitem(s, dir)
      .agg(expr(s"percentile(l_extendedprice, array(${ps.mkString(",")}))").as("edges"))
    lineitem(s, dir).select(col("l_extendedprice")).crossJoin(broadcast(edges))
      .withColumn("bin", size(filter(col("edges"), e => col("l_extendedprice") > e)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("l_extendedprice")), 4).as("lo"),
        round(max(col("l_extendedprice")), 4).as("hi"))
      .orderBy(col("bin"))
  }

  val quantileBinsSql: String = {
    val ps = (1 until Bins).map(i => i.toDouble / Bins).mkString(",")
    s"""WITH e AS (SELECT quantile_cont(l_extendedprice, [$ps]) AS edges FROM lineitem)
       |SELECT bin, count(*) AS n_rows,
       |  round(min(l_extendedprice), 4) AS lo, round(max(l_extendedprice), 4) AS hi
       |FROM (SELECT l_extendedprice,
       |        len(list_filter(e.edges, x -> l_extendedprice > x)) AS bin
       |      FROM lineitem, e)
       |GROUP BY bin ORDER BY bin""".stripMargin
  }

  /** MAD multiplier: |x - median| > 3·MAD flags an outlier. */
  val MadK = 3

  /** I9: median-absolute-deviation outlier counts per event type —
    * the robust alternative to z-scores (median and MAD ignore the
    * outliers being hunted). Two group-keyed percentile aggregates
    * joined back; deviations are single subtractions of doubles, so
    * the result is engine-exact. */
  def outlierMad(s: SparkSession, dir: String): DataFrame = {
    val med = events(s, dir).groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = events(s, dir).join(med, "event_type")
      .select(col("event_type"), col("med"), abs(col("value") - col("med")).as("dev"))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(mad, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > col("mad") * MadK, 1L).otherwise(0L)).as("n_outliers"),
        round(max(col("med")), 4).as("med"),
        round(max(col("mad")), 4).as("mad"))
  }

  val outlierMadSql: String =
    s"""WITH med AS (
       |  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1),
       |dev AS (
       |  SELECT e.event_type, med, abs(value - med) AS dev
       |  FROM events e JOIN med USING (event_type)),
       |mad AS (
       |  SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1)
       |SELECT d.event_type, count(*) AS n,
       |  sum(CASE WHEN dev > $MadK * mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       |  round(max(d.med), 4) AS med, round(max(mad), 4) AS mad
       |FROM dev d JOIN mad USING (event_type)
       |GROUP BY d.event_type""".stripMargin
}

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

  /** Drift-alert threshold on total-variation distance. */
  val DriftMax = 0.05

  /** J-line: distribution-drift monitor — total-variation distance
    * between two event cohorts (even vs odd epoch-day, the
    * yesterday-vs-today stand-in) per event type, over shared
    * equi-depth bins. TVD is computed as an EXACT-INTEGER sum,
    *   Σ|a_i·N_B − b_i·N_A| / (2·N_A·N_B),
    * so the cross-engine result is one correctly-rounded division of
    * exact BIGINTs, never a float accumulation (PSI/KL need logs — a
    * 1-ulp cross-engine hash risk; TVD ranks drift the same way).
    * Shape: one map-side binning pass against a broadcast edge row +
    * two small aggregates — the same plan at any scale. */
  def distDrift(s: SparkSession, dir: String): DataFrame = {
    val ps = (1 until Bins).map(i => i.toDouble / Bins)
    val edges = events(s, dir)
      .agg(expr(s"percentile(value, array(${ps.mkString(",")}))").as("edges"))
    val cell = events(s, dir)
      .select(col("event_type"), col("value"),
        (expr("unix_timestamp(ts) div 86400") % 2).as("cohort"))
      .crossJoin(broadcast(edges))
      .withColumn("bin", size(filter(col("edges"), e => col("value") > e)))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("b"))
    val tot = cell.groupBy(col("event_type"))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    val tvd = col("num").cast("double") / (lit(2L) * col("na") * col("nb"))
    cell.join(tot, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(abs(col("a") * col("nb") - col("b") * col("na"))).as("num"))
      .select(col("event_type"), col("na"), col("nb"),
        round(tvd, 6).as("tvd"), (tvd > DriftMax).as("drift"))
  }

  val distDriftSql: String = {
    val ps = (1 until Bins).map(i => i.toDouble / Bins).mkString(",")
    s"""WITH e AS (SELECT quantile_cont(value, [$ps]) AS edges FROM events),
       |cell AS (
       |  SELECT event_type,
       |    len(list_filter(e.edges, x -> value > x)) AS bin,
       |    sum(CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 % 2 = 0
       |             THEN 1 ELSE 0 END)::BIGINT AS a,
       |    sum(CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 % 2 = 1
       |             THEN 1 ELSE 0 END)::BIGINT AS b
       |  FROM events, e GROUP BY 1, 2),
       |tot AS (
       |  SELECT event_type, sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb
       |  FROM cell GROUP BY 1),
       |agg AS (
       |  SELECT cell.event_type, max(na) AS na, max(nb) AS nb,
       |    sum(abs(a * nb - b * na))::BIGINT AS num
       |  FROM cell JOIN tot USING (event_type) GROUP BY 1)
       |SELECT event_type, na, nb,
       |  round(num::DOUBLE / (2 * na * nb), 6) AS tvd,
       |  num::DOUBLE / (2 * na * nb) > $DriftMax AS drift
       |FROM agg""".stripMargin
  }

  /** Winsorization percentiles: clamp below p05 / above p95. */
  val WinsLo = 0.05
  val WinsHi = 0.95

  /** J-line: winsorized robust means per event type — values clamped
    * to the [p05, p95] band before averaging, the standard trim that
    * keeps a corrupted tail from dragging a monitored mean. One
    * group-keyed percentile aggregate broadcast back, then one
    * aggregate; clamping is map-side column algebra. */
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    val lims = events(s, dir).groupBy(col("event_type"))
      .agg(expr(s"percentile(value, $WinsLo)").as("lo"),
        expr(s"percentile(value, $WinsHi)").as("hi"))
    val clamped = least(greatest(col("value"), col("lo")), col("hi"))
    events(s, dir).join(broadcast(lims), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clamped_hi"),
        round(avg(col("value")), 4).as("mean_raw"),
        round(avg(clamped), 4).as("mean_wins"),
        round(max(col("lo")), 4).as("lo"),
        round(max(col("hi")), 4).as("hi"))
  }

  val winsorizeSql: String =
    s"""WITH lims AS (
       |  SELECT event_type, quantile_cont(value, $WinsLo) AS lo,
       |    quantile_cont(value, $WinsHi) AS hi
       |  FROM events GROUP BY 1)
       |SELECT event_type, count(*) AS n,
       |  sum(CASE WHEN value < lo THEN 1 ELSE 0 END)::BIGINT AS n_clamped_lo,
       |  sum(CASE WHEN value > hi THEN 1 ELSE 0 END)::BIGINT AS n_clamped_hi,
       |  round(avg(value), 4) AS mean_raw,
       |  round(avg(least(greatest(value, lo), hi)), 4) AS mean_wins,
       |  round(max(lo), 4) AS lo, round(max(hi), 4) AS hi
       |FROM events JOIN lims USING (event_type)
       |GROUP BY event_type""".stripMargin
}

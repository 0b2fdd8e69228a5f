package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  test("asof on crafted frame: picks newest earlier row, <= at equal instants, null before any") {
    import spark.implicits._
    val right = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100L),
      (1L, Timestamp.valueOf("2024-01-01 12:00:00"), 101L),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 200L)
    ).toDF("user_id", "ts", "rid")
    val left = Seq(
      (10L, 1L, Timestamp.valueOf("2024-01-01 11:00:00")), // between r100, r101 → 100
      (11L, 1L, Timestamp.valueOf("2024-01-01 12:00:00")), // equal instant → 101 (<=)
      (12L, 2L, Timestamp.valueOf("2024-01-01 10:30:00")), // before any → null
      (13L, 3L, Timestamp.valueOf("2024-01-01 10:00:00"))  // key with no right rows → null
    ).toDF("lid", "user_id", "ts")
    val out = AsofJoin.asof(left, right, "user_id", "ts", "ts", Seq("rid"))
      .select("lid", "asof_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(10L -> Some(100L), 11L -> Some(101L), 12L -> None, 13L -> None))
  }

  test("range_join: bucketed count equals direct inequality-join count") {
    val out = SparkEntry.queries("range_join")(spark, sf)
    val errors = Tables.events(spark, sf).filter(col("event_type") === "error")
    assert(out.count() == errors.count())
    // independent check: plain (slow) inequality join on a sample user
    val e = Tables.events(spark, sf)
    val direct = e.filter(col("event_type") === "error").as("x")
      .join(e.filter(col("event_type") === "click").as("y"),
        col("y.user_id") === col("x.user_id") &&
          col("y.ts") > col("x.ts") - expr("INTERVAL 3600 SECOND") &&
          col("y.ts") <= col("x.ts"), "left_outer")
      .groupBy(col("x.event_id").as("error_id"))
      .agg(count(col("y.event_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      assert(direct(r.getLong(0)) == r.getLong(1), s"error ${r.getLong(0)}")
    }
    assert(out.agg(sum("n_clicks")).collect()(0).getLong(0) > 0)
  }

  test("asof_join query: every matched click precedes its purchase; match is the max prior click") {
    val out = SparkEntry.queries("asof_join")(spark, sf)
    val purchases = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases)
    val rows = out.filter(col("click_ts").isNotNull).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[String]("click_ts") <= r.getAs[String]("p_ts")))
    // cross-check one user against an independent computation
    val u = rows.head.getAs[Long]("user_id")
    val independent = Tables.events(spark, sf)
      .filter(col("event_type") === "click" && col("user_id") === u)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("cts"))
      .collect().map(_.getString(0)).sorted
    out.filter(col("user_id") === u && col("click_ts").isNotNull).collect().foreach { r =>
      val best = independent.takeWhile(_ <= r.getAs[String]("p_ts")).lastOption
      assert(best.contains(r.getAs[String]("click_ts")))
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.sinks.JdbcUpsertSink
import graft.streaming.StreamIngest

class SinkStreamSpec extends SparkSpec {

  test("upsertSql: every non-key column gets EXCLUDED, key drives conflict") {
    val sql = JdbcUpsertSink.upsertSql("decisions", Seq("uuid", "reason", "ts"), "uuid")
    assert(sql == "INSERT INTO decisions (uuid, reason, ts) VALUES (?, ?, ?) " +
      "ON CONFLICT (uuid) DO UPDATE SET reason = EXCLUDED.reason, ts = EXCLUDED.ts")
    assertThrows[IllegalArgumentException] {
      JdbcUpsertSink.upsertSql("t", Seq("a", "b"), "missing")
    }
  }

  test("batchSizes: 1000-row chunking matches the reference's batching") {
    assert(JdbcUpsertSink.batchSizes(2500, 1000) == Seq(1000L, 1000L, 500L))
    assert(JdbcUpsertSink.batchSizes(1000, 1000) == Seq(1000L))
    assert(JdbcUpsertSink.batchSizes(0, 1000).isEmpty)
  }

  test("jdbc_sink query: per-writer batch sizes sum to row count, all full but last") {
    val rows = SparkEntry.queries("jdbc_sink")(spark, sf)
      .orderBy("writer", "batch_id").collect()
    val byWriter = rows.groupBy(_.getAs[Long]("writer"))
    assert(byWriter.nonEmpty && byWriter.size <= Ingest.JdbcShards)
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables.documents(spark, sf).count())
    byWriter.values.foreach { ws =>
      val sizes = ws.sortBy(_.getAs[Long]("batch_id")).map(_.getAs[Long]("n_rows"))
      assert(sizes.init.forall(_ == Ingest.JdbcBatch))
      assert(sizes.last <= Ingest.JdbcBatch)
    }
  }

  test("stream_ingest: real streaming run equals the batch twin") {
    val streamed = SparkEntry.queries("stream_ingest")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() == batch.count())
    assert(streamed.agg(sum("n")).collect()(0).getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("stream_sessionize: stateful streaming sessions equal the batch query") {
    val streamed = SparkEntry.queries("stream_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    val batch = SparkEntry.queries("sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    assert(streamed.size == batch.size)
    batch.foreach { case (k, v) => assert(streamed(k) == v, s"session $k") }
  }

  private object Ingest {
    val JdbcBatch = graft.ingest.Ingest.JdbcBatch
    val JdbcShards = graft.ingest.Ingest.JdbcShards
  }
}

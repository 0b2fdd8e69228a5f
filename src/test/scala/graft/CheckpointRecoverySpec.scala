package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.{StreamDecisions, StreamDedup}

/** Checkpoint RECOVERY — the production contract of "Structured
  * Streaming + JDBC sink" (BASELINE's north star): a query that
  * stops (deploy, crash, rescale) must restart from the SAME
  * checkpoint and neither re-deliver what it already committed nor
  * lose what arrived while it was down. Each test runs wave 1,
  * STOPS the query, restarts it from the same checkpointLocation,
  * stages wave 2, and proves exactly-once output across the restart
  * — under the session's RocksDB state store, like production.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("stream_decisions: restart from the same checkpoint re-offers nothing committed; a replayed dump is LWW-idempotent") {
    val root = Files.createTempDirectory("sd_restart")
    val in = root.resolve("in"); Files.createDirectories(in)
    val ckpt = root.resolve("ckpt").toString
    Files.copy(Paths.get(s"$sf/events.parquet"), in.resolve("w1.parquet"))
    StreamDecisions.Store.rows.clear()
    StreamDecisions.Store.commits.set(0)
    StreamDecisions.Store.merges.set(0)

    val q1 = StreamDecisions.startQuery(spark, in.toString,
      glob = "*.parquet", checkpoint = ckpt)
    q1.processAllAvailable(); q1.stop()
    val after1 = StreamDecisions.Store.rows.readOnlySnapshot().toMap
    val merges1 = StreamDecisions.Store.merges.get()
    assert(after1.nonEmpty && merges1 > 0, "wave 1 must reach the sink")

    // wave 2: the SAME dump under a new name — an at-least-once
    // replay arriving after a restart
    Files.copy(Paths.get(s"$sf/events.parquet"), in.resolve("w2.parquet"))
    val q2 = StreamDecisions.startQuery(spark, in.toString,
      glob = "*.parquet", checkpoint = ckpt)
    q2.processAllAvailable(); q2.stop()

    // recovery read the file-source log: ONLY the new file was offered
    // to the sink (3× would mean wave 1 was reprocessed after restart)
    assert(StreamDecisions.Store.merges.get() == 2 * merges1,
      s"expected ${2 * merges1} attempted merges, got ${StreamDecisions.Store.merges.get()}" +
        " — the restarted query re-offered already-committed files")
    // and the LWW guard made the byte-identical replay a no-op: the
    // stored table is EXACTLY the wave-1 state
    val after2 = StreamDecisions.Store.rows.readOnlySnapshot().toMap
    assert(after2.keySet == after1.keySet)
    after1.foreach { case (k, row) =>
      assert(after2(k) == row, s"uuid $k changed across an identical replay")
    }
  }

  test("stream_dedup: dedup state survives restart — wave-2 duplicates of wave-1 ids still drop; file sink stays exactly-once") {
    import spark.implicits._
    val root = Files.createTempDirectory("sdd_restart")
    val in = root.resolve("in"); Files.createDirectories(in)
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val base = java.sql.Timestamp.valueOf("2025-01-01 12:00:00").getTime
    def stage(ids: Seq[Long], name: String): Unit =
      ids.map(i => (i, new java.sql.Timestamp(base + i * 60000L), "click"))
        .toDF("event_id", "ts", "event_type")
        .coalesce(1).write.mode("append").parquet(in.resolve(name).toString)
    def start() = {
      val src = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, event_type STRING")
        .parquet(s"$in/*")
      StreamDedup.dedup(src).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
    }

    stage(1L to 10L, "w1")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val out1 = spark.read.parquet(out).select("event_id").as[Long].collect().sorted
    assert(out1.toSeq == (1L to 10L), s"wave 1 output wrong: ${out1.toSeq}")

    // ids 6-10 are duplicates of wave-1 ids INSIDE the 1 h horizon:
    // only a restored RocksDB state can know to drop them
    stage(6L to 15L, "w2")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val counts = spark.read.parquet(out)
      .groupBy("event_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n")).toMap
    assert(counts.keySet == (1L to 15L).toSet,
      s"missing or phantom ids after restart: ${counts.keySet.toSeq.sorted}")
    val dups = counts.filter(_._2 > 1)
    assert(dups.isEmpty,
      s"ids delivered more than once across the restart: $dups — state or sink manifest lost")
  }
}

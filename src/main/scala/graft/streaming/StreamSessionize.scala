package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md G6): the
  * `flatMapGroupsWithState` form of the batch `sessionize` query —
  * per-user gap-based sessions with explicit keyed state.
  *
  * State per user = (last event time, current session id): a batch's
  * events sort in event-time order, continue the open session if the
  * first event is within the gap, and roll the id on every gap.
  * Sessions are (re-)emitted as they grow — Update-mode semantics; a
  * downstream upsert sink keyed on (user_id, sess_id) keeps the final
  * row per session (the same LWW shape as
  * [[graft.sinks.JdbcUpsertSink]]). State size is O(users), not
  * O(events) — the scale property that makes this work on an
  * unbounded stream.
  *
  * With all input in one micro-batch (the verify harness), emitted
  * sessions are exactly the batch query's — oracle-checked against
  * the same SQL as B6.
  */
object StreamSessionize {

  val GapSec = 1800L

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  case class SessState(lastTsMs: Long, sessId: Long)
  case class Sess(user_id: Long, sess_id: Long, n_events: Long,
                  sess_start: String, sess_value: Double)

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  def sessionize(user: Long, events: Iterator[Ev],
                 state: GroupState[SessState]): Iterator[Sess] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var (lastMs, sid) = state.getOption
      .map(s => (s.lastTsMs, s.sessId)).getOrElse((Long.MinValue, -1L))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Ev)]
    sorted.foreach { e =>
      val ms = e.ts.getTime
      // gap test on floor-seconds, exactly like the batch query's
      // ts.cast(long) - lag(ts).cast(long) > 1800
      if (lastMs == Long.MinValue || ms / 1000 - lastMs / 1000 > GapSec) sid += 1
      lastMs = ms
      out += ((sid, e))
    }
    state.update(SessState(lastMs, sid))
    val sdf = new java.text.SimpleDateFormat(fmt)
    sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    out.groupBy(_._1).map { case (s, evs) =>
      Sess(user, s, evs.size.toLong,
        sdf.format(new java.util.Date(evs.map(_._2.ts.getTime).min)),
        // per-value DECIMAL(18,4) cast then exact decimal sum — the
        // same arithmetic as the batch query's
        // sum(value.cast(decimal(18,4))).cast(double)
        evs.map(e => BigDecimal(e._2.value)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    }.iterator
  }

  def transform(events: DataFrame): Dataset[Sess] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "ts", "event_id", "value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(sessionize)
  }

  /** Run to a memory sink, block until input drains (verify/spec). */
  def runToMemory(s: SparkSession, dir: String, name: String): Unit = {
    val q = transform(StreamIngest.readEvents(s, dir))
      .writeStream.format("memory").queryName(name).outputMode("update")
      .start()
    q.processAllAvailable()
    q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the `events` table.
  *
  * The reference has NO streaming (SURVEY §2.10) — these are the
  * forward-looking ingestion operators a production crawl feed needs:
  * watermarked tumbling-window aggregation and stateful gap-based
  * sessionization via flatMapGroupsWithState. Each has a batch twin
  * (q6_events_hourly / q7_sessionize) whose DuckDB oracle pins the
  * semantics; the streaming specs assert stream == batch on the same data.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long, nSessions: Long)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  val SessionGapSecs = 1800L

  /** Watermarked hourly aggregation (streaming twin of q6_events_hourly). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      // parquet TIMESTAMP_NTZ → TIMESTAMP: watermarks require an instant;
      // session tz is UTC so the wall-clock value is unchanged
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_c"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("value_c"))

  /** Stateful gap sessionization (streaming twin of q7_sessionize).
    * State per user: running session count with a 30-minute gap rule.
    * Emits one final row per user on state timeout / stream end. */
  def sessionize(events: Dataset[Event], spark: SparkSession): Dataset[UserSessions] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // events within one micro-batch arrive unordered: sort by (ts, id)
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(SessionState(0, Long.MinValue, 0, 0))
          for (e <- sorted) {
            val t = e.ts.getTime / 1000
            val newSession = s.nEvents == 0 || t - s.lastTs > SessionGapSecs
            s = SessionState(
              if (newSession) t else s.sessionStart, t,
              s.nEvents + 1, s.nSessions + (if (newSession) 1 else 0))
          }
          state.update(s)
          // emit the running totals (append mode: latest row per batch)
          Iterator(UserSessions(userId, s.nEvents, s.nSessions))
      }
  }

  /** Drive a streaming query synchronously over a bounded parquet dir and
    * return the result table (memory sink). */
  def runBounded(spark: SparkSession, dir: String,
                 build: DataFrame => DataFrame, name: String,
                 outputMode: String = "append"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = build(stream).writeStream
      .outputMode(outputMode)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events table shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no streaming surface (its only asynchrony is a
  * detached conversion thread, src/cattle_process.py:31-35), and the
  * north rule is batch+resume — so streaming here is deliberately
  * thin: the SAME expressions that power the batch queries
  * (Queries.qEventsWindow / qEventsSessions), usable behind
  * `readStream`. Correctness of the expressions is carried by the
  * batch DuckDB oracles; the streaming specs check the incremental
  * plumbing (watermark + append/update modes) produces the same rows.
  */
object EventStream {

  /** Watermarked tumbling-window counts. Batch DataFrames accept the
    * same plan (withWatermark is a no-op in batch), so the batch oracle
    * checks the aggregation itself.
    */
  def windowedCounts(events: DataFrame,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))

  final case class Ev(user_id: Long, event_id: Long, us: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)
  private final case class SessState(lastUs: Long, sessions: Long, events: Long)

  /** Stateful sessionization (gap > gapSec starts a new session) via
    * mapGroupsWithState — the custom-state path for streams. In batch
    * mode each group arrives complete, so the result matches the
    * lag-window formulation (Queries.qEventsSessions), which the specs
    * assert.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapSec: Long = 1800L): Dataset[UserSessions] = {
    import spark.implicits._
    val evs = events.select(
      col("user_id").cast("long"),
      col("event_id").cast("long"),
      unix_micros(col("ts").cast("timestamp")).as("us")).as[Ev]
    evs.groupByKey(_.user_id).mapGroupsWithState(GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
        val sorted = it.toSeq.sortBy(e => (e.us, e.event_id))
        var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
        for (e <- sorted) {
          val newSession = st.lastUs == Long.MinValue || e.us - st.lastUs > gapSec * 1000000L
          st = SessState(e.us, st.sessions + (if (newSession) 1 else 0), st.events + 1)
        }
        state.update(st)
        UserSessions(uid, st.sessions, st.events)
    }
  }
}

package graft.streaming

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
    *
    * The grouping key must be the `window(...)` struct ITSELF — taking
    * `.getField("start")` in the groupBy severs the watermark from the
    * aggregation key, and Spark then rejects append mode ("streaming
    * aggregation without watermark"); `ws` is projected AFTER the agg.
    * Caught by the late-data spec (VERDICT round 2, item 5).
    */
  def windowedCounts(events: DataFrame,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("win.start").as("ws"), col("event_type"), col("n"), col("sum_value_c"))

  final case class Ev(user_id: Long, event_id: Long, us: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)
  // public: the flatMapGroupsWithState state encoder codegens a
  // constructor call, which a private nested case class breaks
  final case class SessState(lastUs: Long, sessions: Long, events: Long)

  private def toEvs(events: DataFrame): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      col("user_id").cast("long"),
      col("event_id").cast("long"),
      unix_micros(col("ts").cast("timestamp")).as("us")).as[Ev]
  }

  private def advance(st: SessState, e: Ev, gapUs: Long): SessState = {
    val newSession = st.lastUs == Long.MinValue || e.us - st.lastUs > gapUs
    SessState(e.us, st.sessions + (if (newSession) 1 else 0), st.events + 1)
  }

  /** Stateful sessionization (gap > gapSec starts a new session) via
    * mapGroupsWithState — the custom-state path for streams. Each
    * micro-batch's per-user slice is sorted before folding into state
    * (event order within a batch is not guaranteed); memory is bounded
    * by the per-user BATCH size, not the user's history — the state
    * itself is three longs. In batch mode each group arrives complete
    * (one "batch" = everything), so the result matches the lag-window
    * formulation (Queries.qEventsSessions), which the oracle asserts;
    * for batch-at-scale use [[sessionizeBatch]], which buffers nothing.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapSec: Long = 1800L): Dataset[UserSessions] = {
    import spark.implicits._
    toEvs(events).groupByKey(_.user_id).mapGroupsWithState(GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
        val sorted = it.toArray.sortBy(e => (e.us, e.event_id))
        var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
        for (e <- sorted) st = advance(st, e, gapSec * 1000000L)
        state.update(st)
        UserSessions(uid, st.sessions, st.events)
    }
  }

  /** flatMapGroupsWithState variant (update mode): emits the running
    * per-user totals each micro-batch a user appears in — the
    * streaming-native shape (ADVICE round 1: incremental state instead
    * of whole-group buffering). Late/duplicate batches fold into the
    * same three-long state.
    */
  def sessionizeUpdates(spark: SparkSession, events: DataFrame,
      gapSec: Long = 1800L): Dataset[UserSessions] = {
    import spark.implicits._
    toEvs(events).groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = it.toArray.sortBy(e => (e.us, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
            for (e <- sorted) st = advance(st, e, gapSec * 1000000L)
            state.update(st)
            Iterator.single(UserSessions(uid, st.sessions, st.events))
          }
      }
  }

  /** The checkpointed file-to-file stream: parquet source → the same
    * cents-exact enrichment the batch queries use → parquet sink, with
    * offsets + sink metadata under `checkpointDir`. `AvailableNow`
    * drains everything present then stops, so a caller can run it,
    * land more input files, and run it AGAIN with the same checkpoint —
    * the restart reprocesses NOTHING (exactly-once file sink), which is
    * the streaming analogue of the batch pipeline's bucket-level
    * lineage resume. The spec kills/restarts it across three runs and
    * asserts output ≡ the one-shot batch result.
    */
  def runFilePipe(spark: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    enriched(spark.readStream.schema(schema).parquet(inDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The tier dimension rows shared by [[tierEnriched]]'s engine
    * query, the MemoryStream spec, and the SQL oracle (which
    * interpolates them as a VALUES list — ONE definition, three
    * consumers): (tier_id, tier_name, mult_bp basis-point multiplier).
    */
  val tierRows: Seq[(Long, String, Long)] =
    Seq((0L, "bronze", 10000L), (1L, "silver", 10500L), (2L, "gold", 11000L))

  def tierDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tierRows.toDF("tier_id", "tier_name", "mult_bp")
  }

  /** Stream-static dimension enrichment — the classic streaming shape:
    * a fact stream joined to a small static dimension (broadcast — the
    * stream side never shuffles for the join) then aggregated per
    * dimension attribute. The SAME plan runs in batch (the harness
    * oracle `q_stream_enrich` checks the arithmetic) and behind a
    * MemoryStream in complete mode (the replay spec checks the
    * incremental plumbing converges to the batch rows). The stream-
    * static join is stateless: no watermark on the dim side, dim rows
    * re-broadcast per micro-batch at current values.
    *
    * All measures are exact integers (cents × basis points), so the
    * oracle reproduces them bit-for-bit.
    */
  def tierEnriched(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .filter(col("event_type").isNotNull)
      .withColumn("tier_id", pmod(col("user_id").cast("long"), lit(3L)))
      .join(broadcast(dim), "tier_id")
      .groupBy(col("tier_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long") * col("mult_bp")).as("sum_c"))

  /** Stream-STREAM interval join — the attribution shape: every
    * purchase joined to the same user's views in the hour before it.
    * The last classic Structured Streaming operator class the surface
    * lacked: both sides are unbounded, so Spark buffers each side in
    * state and the WATERMARKS + the time-range condition are what let
    * it evict — a view older than (purchase watermark − window) can
    * never match again and is dropped; without the range bound the
    * state grows forever and Spark rejects append mode.
    *
    * The SAME plan runs in batch (withWatermark is a no-op there),
    * which is what the harness oracle `q_stream_join` checks as a
    * plain inequality join; the MemoryStream spec feeds both sides
    * out of order and asserts the appended matches converge to the
    * batch twin's rows.
    *
    * At scale this is a (user_id)-keyed stateful join: state per key
    * is bounded by window × event rate, skewed users split via AQE on
    * the batch face and by state-store partitioning on the stream
    * face.
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      window: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val v = views.select(col("event_id").cast("long").as("view_id"),
        col("user_id").cast("long").as("v_user"),
        col("ts").cast("timestamp").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val p = purchases.select(col("event_id").cast("long").as("purchase_id"),
        col("user_id").cast("long").as("p_user"),
        col("ts").cast("timestamp").as("p_ts"))
      .withWatermark("p_ts", watermark)
    v.join(p, col("v_user") === col("p_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
        col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("view_id"),
        col("p_user").as("user_id"))
  }

  /** Stateless per-event enrichment (shared by the batch oracle and the
    * file pipe): exact integer cents + a null-type guard. Narrow, so
    * the streaming plan is pure pipelined codegen per micro-batch.
    */
  def enriched(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isNotNull)
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"),
        col("event_type"),
        floor(col("value") * 100).cast("long").as("value_c"))

  /** Exactly-once-per-key event stream: watermarked duplicate drop —
    * the STREAMING face of exact dedup (D1). At-least-once sources
    * (Kafka replays, file re-lands) re-deliver events;
    * `dropDuplicatesWithinWatermark` drops re-deliveries whose key was
    * seen within the watermark horizon while keeping state BOUNDED by
    * that horizon — a plain streaming dropDuplicates would grow state
    * with every key forever. Spark only accepts the within-watermark
    * operator on streaming frames, so a BATCH input takes the global
    * `dropDuplicates` twin (a superset of the horizon guarantee —
    * batch sees all keys at once); the harness oracle checks that
    * batch twin, the MemoryStream spec checks the incremental path.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val ts = events.withColumn("ts", col("ts").cast("timestamp"))
    if (events.isStreaming)
      ts.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else ts.dropDuplicates("event_id")
  }

  /** Batch-scale sessionization with ZERO per-user buffering: shuffle
    * once on user_id, sort within partitions by (user_id, us,
    * event_id), then stream-fold each user's run in a mapPartitions —
    * the sort is Spark's external (spillable) sort, so a pathological
    * single user never materializes in memory (ADVICE round 1 on
    * `it.toSeq.sortBy`). Same three-long state machine as the
    * streaming paths.
    */
  def sessionizeBatch(spark: SparkSession, events: DataFrame,
      gapSec: Long = 1800L): Dataset[UserSessions] = {
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    toEvs(events)
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "us", "event_id")
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[UserSessions] {
          def hasNext: Boolean = in.hasNext
          def next(): UserSessions = {
            val uid = in.head.user_id
            var st = SessState(Long.MinValue, 0L, 0L)
            while (in.hasNext && in.head.user_id == uid) st = advance(st, in.next(), gapUs)
            UserSessions(uid, st.sessions, st.events)
          }
        }
      }
  }
}

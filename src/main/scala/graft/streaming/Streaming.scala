package graft.streaming

import graft.core.Exact
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming layer. The reference is purely batch (SURVEY
  * §2.10) — this extends the engine with the incremental path: the same
  * events table consumed as a file stream (`Trigger.AvailableNow` replays
  * it as a bounded stream), windowed aggregation with watermarks, and
  * stateful sessionization via `flatMapGroupsWithState`.
  *
  * Design rule: every streaming operator has a batch twin
  * (eventsWindowed ↔ Relational.eventsHourly, sessionize ↔
  * Relational.sessionize) and must produce identical results on a replay
  * — which is exactly what the oracle checks.
  */
object Streaming {

  /** The events table as a bounded file stream with the same
    * nanos→micros normalisation as the batch loader. */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // the file-stream source wants a directory: stream the sf dir with a
    // glob filter selecting just the events table
    // NOTE: watermarks require TIMESTAMP (LTZ), so the stream keeps epoch
    // time and the batch-twin parity (which uses TIMESTAMP_NTZ) holds
    // under the engine's pinned UTC session zone — the harness sets
    // spark.sql.session.timeZone=UTC everywhere.
    s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Hourly tumbling-window aggregate with a 1-hour watermark, run to
    * completion with AvailableNow and surfaced as a DataFrame. Complete
    * output mode so the trailing (still-open) windows are emitted on the
    * final batch — matching the batch twin exactly. */
  def eventsWindowed(s: SparkSession, d: String, name: String = "stream_hourly"): DataFrame = {
    val agg = eventsStream(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.sumd(col("value")).as("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    s.table(name)
      .select(col("window.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Stream-static enrichment: the event stream joined against a static
    * dimension (broadcast — no stream-side shuffle), then aggregated.
    * The standard "enrich a firehose with a dim table" shape. */
  def enrichedBySegment(s: SparkSession, d: String, name: String): DataFrame = {
    val customers = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = eventsStream(s, d)
      .join(broadcast(customers), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exact.sumd(col("value")).as("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    s.table(name)
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** Streaming exactly-once dedup: the stream is unioned with itself
    * (every event arrives twice) and `dropDuplicates` on the event id
    * restores one-row-per-event — the idempotent-ingest shape of a
    * training-data firehose. Bounded replay; production pairs this with
    * `dropDuplicatesWithinWatermark` to bound state. */
  def dedupedCounts(s: SparkSession, d: String, name: String): DataFrame = {
    val ev = eventsStream(s, d)
    val doubled = ev.unionByName(ev)
    val q = doubled.dropDuplicates("event_id")
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    s.table(name)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Per-user session state for streaming sessionization. */
  final case class SessionState(lastUs: Long, nEvents: Long, nSessions: Long)
  final case class SessionOut(user_id: Long, n_events: Long, n_sessions: Long)

  /** Stateful streaming sessionization (30-min gap), the
    * `flatMapGroupsWithState` path (SURVEY §2.10 → Spark
    * `KeyValueGroupedDataset`). Events must be fed in event-time order
    * per user within a batch — the replay sorts; a production deployment
    * would pair this with a watermark + EventTimeTimeout. */
  def sessionize(s: SparkSession, d: String, name: String = "stream_sessions"): DataFrame = {
    import s.implicits._
    val ev = eventsStream(s, d)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)]
    val gap = 30L * 60 * 1000000
    val out = ev.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0, 0))
          sorted.foreach { case (_, _, us) =>
            val newSession = st.lastUs == Long.MinValue || us - st.lastUs > gap
            st = SessionState(us, st.nEvents + 1,
              st.nSessions + (if (newSession) 1 else 0))
          }
          state.update(st)
          Iterator(SessionOut(user, st.nEvents, st.nSessions))
      }
    val q = out.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // last emission per user = final state
    s.table(name)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("n_sessions")).as("n_sessions"))
      .orderBy(col("user_id"))
  }
}

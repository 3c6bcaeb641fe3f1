package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events table: the same logical
  * computations as the batch `stream_*` queries, expressed as
  * readStream → watermark → window / stateful-session plans.
  *
  * Batch/stream parity is the design point: `windowAggBatch` and
  * `windowAggStream` share the aggregation expression, so correctness is
  * oracle-checked on the batch plan while the streaming plan is spec-run
  * with a file source feeding the same parquet.
  */
object EventStreams {

  /** Shared tumbling-window aggregation over any events frame. */
  private def windowAggPlan(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  def windowAggBatch(events: DataFrame): DataFrame =
    windowAggPlan(events).orderBy("hour_start", "event_type")

  /** Streaming variant: 2h watermark bounds state; append mode emits each
    * hour bucket once its watermark passes.
    */
  def windowAggStream(spark: SparkSession, eventsDir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    windowAggPlan(
      spark.readStream.schema(schema).parquet(eventsDir)
        .withWatermark("ts", "2 hours"))

  /** Batch sessionization (30-min inactivity gap) via gaps-and-islands:
    * lag → new-session flag → running sum. Same result as the stateful
    * streaming version below.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 0)
          .when(col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** Streaming exact dedup: first event per key wins; the watermark
    * bounds state retention (keys older than the horizon are dropped).
    * The streaming face of Dedup.exact for at-least-once sources.
    *
    * Keys on `keyCols` ONLY — a redelivered event with the same key but a
    * different timestamp (e.g. ingestion-time stamping on retry) is still
    * deduplicated, which `dropDuplicates(key :+ ts)` would miss.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      watermarkCol: String = "ts", horizon: String = "2 hours"): DataFrame =
    events.withWatermark(watermarkCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  // ---- stateful streaming sessionization ----

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** flatMapGroupsWithState sessionization: per-user state holds the open
    * session; a processing-time timeout flushes idle sessions. State is
    * O(active users), partitioned by user_id — the standard scalable shape.
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }
  }
}

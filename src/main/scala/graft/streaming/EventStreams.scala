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

  /** Batch face of `streamingDedup`, made deterministic: the EARLIEST
    * event per key (by event time, then id) is the survivor, which is
    * what first-wins streaming dedup converges to once the source drains.
    * One hash shuffle on the key; the per-key window is a streaming
    * top-1, so no partition ever holds more than one key's events.
    */
  def dedupBatch(events: DataFrame, keyCols: Seq[String] = Seq("user_id", "event_type")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("ts").asc, col("event_id").asc)
    events.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select((keyCols.map(col) :+ col("event_id").as("first_event_id") :+
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts")): _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** Per-type value weights for the stream-static enrichment join — a
    * stand-in reference table (decimal strings so both engines do exact
    * decimal arithmetic). Mirrored as VALUES in the DuckDB oracle.
    */
  val TypeWeights: Seq[(String, String)] = Seq(
    "click" -> "0.10", "error" -> "0.00", "purchase" -> "1.00",
    "signup" -> "0.50", "view" -> "0.05")

  private def weightsDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TypeWeights.toDF("event_type", "w")
      .select(col("event_type"), col("w").cast("decimal(4,2)").as("weight"))
  }

  /** Stream-static enrichment: events joined to a broadcast reference
    * dim, then aggregated per day+type. `window()` works identically on
    * batch and streaming frames, so the one plan serves both faces; at
    * scale the static side stays broadcast (it is a reference table) and
    * the only shuffle is the final aggregation.
    */
  private def enrichPlan(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    events.join(broadcast(weightsDim(spark)), Seq("event_type"))
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)") * col("weight"))
          .cast("double").as("weighted_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("weighted_value"))
  }

  def enrichBatch(events: DataFrame): DataFrame =
    enrichPlan(events).orderBy("day", "event_type")

  /** Streaming face: file stream → watermark → stream-static join →
    * windowed agg. Complete/append both valid; spec runs complete.
    */
  def enrichStream(spark: SparkSession, eventsDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    enrichPlan(
      spark.readStream.schema(schema).parquet(eventsDir)
        .withWatermark("ts", "2 hours"))

  /** Shared condition of the stream-stream interval join: a purchase
    * matches the same user's clicks within the preceding `windowMinutes`.
    */
  private def intervalCond(windowMinutes: Int) =
    col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
      col("c_ts") <= col("p_ts")

  /** Batch face of the stream-stream interval join. The equi-key
    * (user_id) drives one hash shuffle per side — Catalyst plans a hash
    * join with the time band as a post-join filter, so there is no
    * per-key nested loop; the streaming face below bounds its join state
    * with the same band + watermark.
    */
  def intervalJoinBatch(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
    p.join(c, Seq("user_id")).filter(intervalCond(windowMinutes))
      .select(col("user_id"), col("p_id"), col("c_id"))
      .orderBy("p_id", "c_id")
  }

  /** Streaming face: two watermarked slices of the same event stream,
    * joined on user_id within the time band. State is bounded by
    * watermark + band (Spark evicts rows whose event time can no longer
    * match), the scalable stream-stream join shape.
    */
  def intervalJoinStream(spark: SparkSession, eventsDir: String,
      schema: org.apache.spark.sql.types.StructType,
      windowMinutes: Int = 30, horizon: String = "1 hour",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // maxFilesPerTrigger bounds each micro-batch so the watermark
    // actually advances across a backlog (a single giant batch would
    // admit every late row and evict nothing until the end)
    def side(tpe: String, idAs: String, tsAs: String) = {
      val r0 = spark.readStream.schema(schema)
      val r = maxFilesPerTrigger.fold(r0)(n => r0.option("maxFilesPerTrigger", n))
      r.parquet(eventsDir)
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(idAs), col("user_id"), col("ts").as(tsAs))
    }
    val p = side("purchase", "p_id", "p_ts").withWatermark("p_ts", horizon)
    val c = side("click", "c_id", "c_ts").withWatermark("c_ts", horizon)
    p.join(c, p("user_id") === c("user_id") && intervalCond(windowMinutes))
      .select(p("user_id"), col("p_id"), col("c_id"))
  }

  /** Batch face of the native session-window operator: same semantics as
    * [[sessionizeBatch]] (inactivity gap), but computed by Spark's
    * `session_window` aggregate — one shuffle on user_id, sessions merged
    * inside the aggregate instead of a lag + running-sum window pair.
    * This is the operator the streaming sessionization runs on a stream;
    * `session_window` accepts streaming frames unchanged.
    */
  def sessionWindowBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")

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

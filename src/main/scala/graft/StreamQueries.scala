package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{EventStreams, SketchRollup}

/** §2-D: batch-equivalent plans of the streaming operators, so the DuckDB
  * oracle applies; the readStream/state variants live in graft.streaming
  * and are spec-run against the same parquet.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> ((s, dir) =>
      EventStreams.windowAggBatch(Tables.load(s, dir, "events"))),
    "stream_session" -> ((s, dir) =>
      EventStreams.sessionizeBatch(Tables.load(s, dir, "events"))),
    "stream_dedup" -> ((s, dir) =>
      EventStreams.dedupBatch(Tables.load(s, dir, "events"))),
    "stream_static_join" -> ((s, dir) =>
      EventStreams.enrichBatch(Tables.load(s, dir, "events"))),
    "stream_interval_join" -> ((s, dir) =>
      EventStreams.intervalJoinBatch(Tables.load(s, dir, "events"))),
    "stream_session_window" -> ((s, dir) =>
      EventStreams.sessionWindowBatch(Tables.load(s, dir, "events"))),

    "stream_sketch_rollup" -> ((s, dir) => {
      // incremental sketch-store maintenance (streaming.SketchRollup):
      // the corpus ARRIVES in 3 batches (event_id mod 3 — deterministic),
      // each merged into the persisted per-day HLL store without
      // rescanning earlier arrivals; the served answers must then equal
      // the one-shot truth — mergeability makes arrival batching
      // invisible. n_events (exact through the store's counters) rides
      // cross-engine; est tolerance-checked per the q50 scheme. The
      // foreachBatch streaming face of the same maintainer is spec-run
      // in StreamingSpec.
      val store = s"${Scratch.dir}/stream_sk_store"
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(store), true) // idempotent gate
      val ev = Tables.load(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("user_id"), col("event_id"))
      (0 until 3).foreach { b =>
        SketchRollup.mergeInto(s,
          ev.filter(pmod(col("event_id"), lit(3)) === b), store)
      }
      val served = SketchRollup.serve(s, store)
      val exact = ev.groupBy("day")
        .agg(count_distinct(col("user_id")).as("exact_users"))
        .unionByName(ev.agg(count_distinct(col("user_id")).as("exact_users"))
          .select(lit("ALL").as("day"), col("exact_users")))
      served.join(exact, "day")
        .select(col("day"), col("n_events"), col("exact_users"),
          (abs(col("est_users") - col("exact_users"))
            / col("exact_users") <= 0.05).as("ok"))
        .orderBy("day")
    }),
  )

  /** VALUES list for the enrichment oracle, generated from the same
    * TypeWeights the Spark plan broadcasts — one source of truth.
    */
  private val WeightValuesSql = EventStreams.TypeWeights
    .map { case (t, w) => s"('$t', CAST($w AS DECIMAL(4,2)))" }
    .mkString(", ")

  val oracleSql: Map[String, String] = Map(
    // exact counts cross-engine; `ok` follows the q50 scheme (each engine
    // inside its own sketch's 5% band). The one-shot DuckDB truth is
    // exactly what the 3-batch incremental store must reproduce.
    "stream_sketch_rollup" ->
      """WITH ev AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
        |d AS (
        |  SELECT day, count(*) AS n_events,
        |    count(DISTINCT user_id) AS exact_users,
        |    abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |      / count(DISTINCT user_id) <= 0.05 AS ok
        |  FROM ev GROUP BY day),
        |a AS (
        |  SELECT 'ALL' AS day, count(*) AS n_events,
        |    count(DISTINCT user_id) AS exact_users,
        |    abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |      / count(DISTINCT user_id) <= 0.05 AS ok
        |  FROM ev)
        |SELECT * FROM d UNION ALL SELECT * FROM a ORDER BY day""".stripMargin,

    "stream_dedup" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id AS first_event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "stream_static_join" ->
      s"""WITH w AS (SELECT * FROM (VALUES $WeightValuesSql) AS t(event_type, weight))
         |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         |  count(*) AS n_events,
         |  CAST(sum(CAST("value" AS DECIMAL(18,4)) * weight) AS DOUBLE) AS weighted_value
         |FROM events JOIN w USING (event_type)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_interval_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS c_id, user_id, ts AS c_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT user_id, p_id, c_id
        |FROM p JOIN c USING (user_id)
        |WHERE c_ts >= p_ts - INTERVAL 30 MINUTE AND c_ts <= p_ts
        |ORDER BY p_id, c_id""".stripMargin,

    // native session_window face: identical sessions to stream_session's
    // gaps-and-islands (merge when gap <= 30 min), different output shape
    "stream_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 0
        |         WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    "stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 0
        |         WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
  )
}

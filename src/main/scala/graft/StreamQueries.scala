package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables
import graft.streaming.EventStreams

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
  )

  val oracleSql: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

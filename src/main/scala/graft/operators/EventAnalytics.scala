package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an events table — ordered funnels and
  * cohort retention, the classic product-analytics operators — expressed
  * as declarative single-shuffle Spark plans (no self-joins, no UDFs).
  */
object EventAnalytics {

  /** Ordered funnel: how deep each user gets through `steps` IN ORDER —
    * step k counts only events at or after the event that completed
    * step k-1 (the strict-sequence semantics product funnels mean, not
    * "did all types ever occur"). Returns one row per depth 0..k with
    * the number of users whose deepest completed step is EXACTLY that
    * depth; users with no funnel-step events at all do not appear.
    *
    * Plan shape: the scan keeps only the funnel's event types (so the
    * per-user array is the user's FUNNEL events, not their whole
    * history), ONE groupBy(user) shuffle collects (ts, id, type)
    * structs, and a codegen'd `aggregate()` fold over the time-sorted
    * array runs the linear state machine per user. The naive k-way
    * self-join formulation shuffles the events table k times and
    * explodes on skewed users; this shuffles once and is linear in each
    * user's funnel events. Ties in `ts` break by `idCol` — a total
    * order, so the fold is deterministic on any partitioning (and
    * engine-replayable: the oracle folds the same sorted list).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepsSql = steps
      .map(s => "'" + s.replace("'", "''") + "'")
      .mkString("array(", ", ", ")")
    events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user"),
        struct(col(tsCol).as("ts"), col(idCol).as("id"),
          col(typeCol).as("t")).as("ev"))
      .groupBy("user")
      .agg(collect_list("ev").as("evs"))
      .withColumn("depth", expr(
        s"""aggregate(
           |  transform(array_sort(evs), x -> array_position($stepsSql, x.t)),
           |  CAST(0 AS BIGINT),
           |  (st, x) -> IF(st < ${steps.length} AND x = st + 1, st + 1, st))"""
          .stripMargin))
      .groupBy("depth")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("depth")
  }

  /** Cohort retention: users bucketed by the DAY of their first event
    * (any type), then, per (cohort day, day offset), how many distinct
    * cohort members were active that many days later — the retention
    * triangle.
    *
    * Plan shape: first-touch rides a partition-only window
    * (`min(day) OVER (PARTITION BY user)`) so the events table is
    * SCANNED ONCE and shuffled once (by user) — the groupBy+self-join
    * formulation scans it twice and, when the per-user dimension
    * outgrows the broadcast threshold, shuffles it twice. The final
    * (cohort, offset) countDistinct is exact with the usual two-phase
    * partial — at 100 TB swap in approx_count_distinct or the persisted
    * HLL rollup ([[graft.streaming.SketchRollup]]) if cardinality cost
    * bites.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(userCol))
    events.select(col(userCol), to_date(col(tsCol)).as("day"))
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }
}

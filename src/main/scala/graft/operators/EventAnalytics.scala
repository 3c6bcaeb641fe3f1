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
    // the fold encodes each event as its step's position via
    // array_position, which maps a REPEATED type to its first index —
    // the machine could never advance past the repeat, silently capping
    // depth. Refuse loudly; a repeated-step funnel needs a positional
    // encoding (event type compared against steps[st+1] in the fold)
    // that the cross-engine replay cannot express today.
    require(steps.distinct == steps,
      s"funnel steps must be distinct event types, got $steps")
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

  /** Time-series RESAMPLE with gap fill: per `seriesCol`, hourly buckets
    * over the data's full time range — aggregated value where events
    * exist, an explicit empty bucket (n = 0) where they don't, and a
    * forward-filled value column (`last non-null` carried across gaps;
    * NULL before a series' first observation). The dashboard/feature
    * -engineering face every events store needs: a line chart or a
    * model join wants a dense, regular grid, not the sparse arrival
    * buckets.
    *
    * Plan shape: ONE scan + one (series, bucket) shuffle builds the
    * sparse aggregate; the dense spine derives from that already-small
    * frame (bounds + distinct series — no second scan of the events
    * table, and the identical agg subplan lets Catalyst reuse the
    * exchange), `sequence()` explodes the bucket range, a broadcast-
    * sized left join lands the values, and the forward fill is one
    * per-series window over the DENSE grid (buckets × series rows —
    * grid-sized, never event-sized). Determinism: the per-bucket mean
    * folds over the SORTED value list, so double addition happens in
    * one fixed order on any partitioning (the lmScore contract) and the
    * forward-filled copies are bit-identical too.
    */
  def resampleHourly(events: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val agg = events
      .select(col(seriesCol).as("series"),
        date_trunc("hour", col(tsCol)).as("bucket"),
        col(valueCol).cast("double").as("v"))
      .groupBy("series", "bucket")
      .agg(collect_list("v").as("vs"), count(lit(1)).as("n"))
      .select(col("series"), col("bucket"),
        (expr("aggregate(array_sort(vs), cast(0.0 as double), (a, x) -> a + x)")
          / col("n")).as("avg_v"),
        col("n"))
    val bounds = agg.agg(min("bucket").as("lo"), max("bucket").as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("bucket"))
      .crossJoin(broadcast(agg.select("series").distinct()))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("series").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(agg, Seq("series", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("avg_v_ff", last(col("avg_v"), ignoreNulls = true).over(w))
      .select("series", "bucket", "n", "avg_v", "avg_v_ff")
      .orderBy("series", "bucket")
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

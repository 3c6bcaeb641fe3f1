package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("funnel: strict-sequence depths on hand-computed users; input order irrelevant") {
    // u1 completes all three in order; u2 clicks BEFORE its first view
    // (click can't count, then view=1, purchase needs click after the
    // view -> depth 1); u3 views only; u4 has no step-1 event at all
    val rows = Seq(
      (1L, ts(1), "view", 10L), (1L, ts(2), "click", 11L), (1L, ts(3), "purchase", 12L),
      (2L, ts(1), "click", 20L), (2L, ts(2), "view", 21L), (2L, ts(3), "purchase", 22L),
      (3L, ts(1), "view", 30L), (3L, ts(2), "error", 31L),
      (4L, ts(1), "purchase", 40L), (4L, ts(2), "click", 41L))
    val df = rows.toDF("user_id", "ts", "event_type", "event_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      EventAnalytics.funnel(d, "user_id", "ts", "event_type", "event_id",
        Seq("view", "click", "purchase"))
        .as[(Long, Long)].collect().toMap
    val got = run(df)
    // u4 depth 0, u2/u3 depth 1, u1 depth 3
    assert(got == Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
    // arrival order must not matter: the fold runs over the SORTED list
    assert(run(df.orderBy(rand(7))) == got)
    // ts tie broken by event_id: view(id 50) then click(id 51) at the
    // same instant still completes in order
    val tie = Seq((9L, ts(1), "view", 50L), (9L, ts(1), "click", 51L))
      .toDF("user_id", "ts", "event_type", "event_id")
    assert(run(tie) == Map(2L -> 1L))
  }

  test("funnel with REPEATED step types: the bitmask fold advances through the repeat") {
    // steps view→click→view→purchase (view fills positions 1 AND 3 —
    // mask 5): u1 walks all four in order → depth 4; u2 has no second
    // view, so its purchase cannot fire (position 3 unfilled) → depth
    // 2; u3's SECOND view does not fill position 2 (click needed — the
    // greedy fold stays put), then click/view/purchase complete → 4
    val rows = Seq(
      (1L, ts(1), "view", 10L), (1L, ts(2), "click", 11L),
      (1L, ts(3), "view", 12L), (1L, ts(4), "purchase", 13L),
      (2L, ts(1), "view", 20L), (2L, ts(2), "click", 21L), (2L, ts(3), "purchase", 22L),
      // u3: view view click view purchase — greedy: 1st view=step1, the
      // 2nd view does NOT fill step 2 (click needed), click=step2,
      // 3rd view=step3, purchase=step4
      (3L, ts(1), "view", 30L), (3L, ts(2), "view", 31L), (3L, ts(3), "click", 32L),
      (3L, ts(4), "view", 33L), (3L, ts(5), "purchase", 34L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.funnel(rows, "user_id", "ts", "event_type",
      "event_id", Seq("view", "click", "view", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 4L -> 2L), s"$got")
  }

  test("funnel conversion window: steps 2..k must land within `withinDays` of step 1") {
    def d(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val rows = Seq(
      // u1 converts inside the 7-day window
      (1L, d("2024-01-01"), "view", 10L), (1L, d("2024-01-03"), "click", 11L),
      (1L, d("2024-01-07"), "purchase", 12L),
      // u2's click lands on day 9 — outside the window → depth 1; its
      // later purchase can't fire either (click never completed)
      (2L, d("2024-01-01"), "view", 20L), (2L, d("2024-01-10"), "click", 21L),
      (2L, d("2024-01-11"), "purchase", 22L),
      // u3: click inside, purchase outside → depth 2
      (3L, d("2024-01-01"), "view", 30L), (3L, d("2024-01-02"), "click", 31L),
      (3L, d("2024-01-20"), "purchase", 32L),
      // boundary: exactly +7 days (same wall time) is INSIDE (<=)
      (4L, d("2024-01-01"), "view", 40L), (4L, d("2024-01-08"), "click", 41L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.funnel(rows, "user_id", "ts", "event_type",
      "event_id", Seq("view", "click", "purchase"), withinDays = Some(7))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L), s"$got")
    // no window: u2 and u3 convert fully
    val loose = EventAnalytics.funnel(rows, "user_id", "ts", "event_type",
      "event_id", Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(loose == Map(3L -> 3L, 2L -> 1L), s"$loose")
  }

  test("funnel whale user: 10^6 step events, O(1) per-user state (no collected array in the plan)") {
    // the skewed-key shape that kills fold-over-collect_list plans: ONE
    // user holding a million funnel-type events. The state-machine
    // formulation sorts (spill-backed) and streams — no task ever
    // materializes the user's events as a single aggregation buffer.
    val whale = spark.range(1000000).select(
      lit(7L).as("user_id"),
      expr("timestamp_micros(1704067200000000 + id * 1000000)").as("ts"),
      when(pmod(col("id"), lit(2L)) === 0L, "view").otherwise("click")
        .as("event_type"),
      col("id").as("event_id"))
    val tail = Seq(
      (7L, Timestamp.valueOf("2024-02-01 00:00:00"), "purchase", 2000000L),
      (8L, ts(1), "view", 2000001L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val q = EventAnalytics.funnel(whale.unionByName(tail),
      "user_id", "ts", "event_type", "event_id",
      Seq("view", "click", "purchase"))
    assert(q.as[(Long, Long)].collect().toMap == Map(1L -> 1L, 3L -> 1L))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      s"funnel must not materialize per-user event arrays:\n$plan")
  }

  test("funnel greedy binding reaches arbitrarily deep in a type's timeline (earliest-N prune would be wrong)") {
    // steps A->B->A: the second A binds at ts(20) — the type's FOURTH
    // occurrence. Any per-(user, type) earliest-N prefix prune with
    // N = the type's repeat count (here 2) drops it and under-reports
    // the depth; the streaming pass needs no prune and gets 3.
    val rows = Seq(
      (1L, ts(1), "A", 1L), (1L, ts(2), "A", 2L), (1L, ts(3), "A", 3L),
      (1L, ts(10), "B", 4L), (1L, ts(20), "A", 5L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.funnel(rows, "user_id", "ts", "event_type",
      "event_id", Seq("A", "B", "A"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 1L), s"$got")
  }

  test("cohort retention: first-touch day buckets, distinct actives per offset") {
    def d(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val rows = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-01")), (1L, d("2024-01-03")),
      (2L, d("2024-01-02")),
      (3L, d("2024-01-01")), (3L, d("2024-01-03")))
    val got = EventAnalytics.cohortRetention(
      rows.toDF("user_id", "ts"), "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect().toSeq
    assert(got == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0, 2L), // u1+u3 day 0
      (java.sql.Date.valueOf("2024-01-01"), 2, 2L), // u1+u3 back on day 2
      (java.sql.Date.valueOf("2024-01-02"), 0, 1L)))
  }

  test("resampleHourly: dense spine, empty buckets, forward fill, leading NULLs") {
    def t(s: String) = Timestamp.valueOf(s)
    // series A: values at 00 and 03 (gap at 01, 02); series B first
    // appears at 02 (leading NULLs at 00, 01)
    val rows = Seq(
      ("A", t("2024-01-01 00:10:00"), 2.0),
      ("A", t("2024-01-01 00:50:00"), 4.0),
      ("A", t("2024-01-01 03:05:00"), 10.0),
      ("B", t("2024-01-01 02:30:00"), 7.0))
    val got = EventAnalytics.resampleHourly(
      rows.toDF("series", "ts", "value"), "series", "ts", "value")
      .as[(String, Timestamp, Long, Option[Double], Option[Double])]
      .collect().toSeq
    val h = (0 to 3).map(i => t(f"2024-01-01 $i%02d:00:00"))
    assert(got == Seq(
      ("A", h(0), 2L, Some(3.0), Some(3.0)),
      ("A", h(1), 0L, None, Some(3.0)),      // gap: ffill carries 3.0
      ("A", h(2), 0L, None, Some(3.0)),
      ("A", h(3), 1L, Some(10.0), Some(10.0)),
      ("B", h(0), 0L, None, None),           // before B's first obs: NULL
      ("B", h(1), 0L, None, None),
      ("B", h(2), 1L, Some(7.0), Some(7.0)),
      ("B", h(3), 0L, None, Some(7.0))), got.mkString("\n"))
  }

  test("funnel matches a per-user brute-force replay on real events") {
    val ev = graft.sources.Tables.load(spark, TestSpark.sf, "events")
    val steps = Seq("view", "click", "purchase")
    val got = EventAnalytics.funnel(ev, "user_id", "ts", "event_type", "event_id", steps)
      .as[(Long, Long)].collect().toMap
    val rows = ev.filter(col("event_type").isin(steps: _*))
      .select("user_id", "ts", "event_id", "event_type")
      .as[(Long, Timestamp, Long, String)].collect()
    val brute = rows.groupBy(_._1).map { case (_, es) =>
      var st = 0
      es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).foreach { e =>
        if (st < steps.length && e._4 == steps(st)) st += 1
      }
      st.toLong
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(got == brute, s"got=$got brute=$brute")
  }
  test("sessionize: hand-computed gap splits, 1-based numbering, singleton sessions") {
    // u1: events at 0, 10, 50, 61 min with a 30-min gap -> sessions
    // {0,10} (gap 40 > 30 splits), {50, 61} (gap 11 keeps); u2: one event
    val rows = Seq(
      (1L, ts(0), 10L), (1L, ts(10), 11L), (1L, ts(50), 12L), (1L, Timestamp.valueOf("2024-01-01 01:01:00"), 13L),
      (2L, ts(5), 20L))
    val df = rows.toDF("user_id", "ts", "event_id")
    val got = EventAnalytics.sessionize(df, "user_id", "ts", "event_id",
      gapSeconds = 1800L)
      .orderBy("user_id", "session_idx")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    def us(t: Timestamp) = t.getTime * 1000L
    assert(got == Seq(
      (1L, 1L, 2L, us(ts(0)), 600L * 1000000L),
      (1L, 2L, 2L, us(ts(50)), 660L * 1000000L),
      (2L, 1L, 1L, us(ts(5)), 0L)), s"got $got")
    // a gap of EXACTLY the threshold does NOT split (strict >)
    val edge = Seq((1L, ts(0), 1L), (1L, ts(30), 2L)).toDF("user_id", "ts", "event_id")
    assert(EventAnalytics.sessionize(edge, "user_id", "ts", "event_id", 1800L)
      .count() == 1L)
  }

  test("attributeLastTouch: latest prior touch wins, window bounds, self-type excluded") {
    val rows = Seq(
      // u1: view@1, click@2, purchase@3 -> attributed to click (latest)
      (1L, ts(1), "view", 10L), (1L, ts(2), "click", 11L), (1L, ts(3), "purchase", 12L),
      // u2: touch AFTER the purchase only -> unattributed (dropped)
      (2L, ts(5), "purchase", 20L), (2L, ts(6), "view", 21L),
      // u3: view 8 days before purchase -> outside the 7-day window
      (3L, Timestamp.valueOf("2024-01-01 00:00:00"), "view", 30L),
      (3L, Timestamp.valueOf("2024-01-09 00:00:00"), "purchase", 31L),
      // u4: two purchases share the same earlier view
      (4L, ts(1), "view", 40L), (4L, ts(2), "purchase", 41L), (4L, ts(3), "purchase", 42L))
    val df = rows.toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.attributeLastTouch(df, "user_id", "ts",
      "event_id", "event_type", Seq("view", "click"), "purchase", windowDays = 7)
      .orderBy("conversion_id")
      .select("conversion_id", "touch_type", "touch_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((12L, "click", 11L), (41L, "view", 40L), (42L, "view", 40L)),
      s"got $got")
    // a purchase is never its own touch (guarded at the API)
    intercept[IllegalArgumentException] {
      EventAnalytics.attributeLastTouch(df, "user_id", "ts", "event_id",
        "event_type", Seq("purchase"), "purchase", 7)
    }
  }

  test("SQL table-valued faces equal the Dataset API on real events") {
    // the reference's own interface is SQL — every event operator must
    // be reachable as a FROM-clause table function, and the SQL path
    // must be the SAME plan the Scala path builds (one code path, two
    // faces)
    GraftExtensions.register(spark)
    val ev = graft.sources.Tables.load(spark, TestSpark.sf, "events")
    ev.createOrReplaceTempView("events_sqlface")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(spark.sql(
      """SELECT * FROM graft_funnel('events_sqlface', 'user_id', 'ts',
        |'event_type', 'event_id', 'view,click,purchase')""".stripMargin))
      == rows(EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        "event_id", Seq("view", "click", "purchase"))))
    assert(rows(spark.sql(
      """SELECT * FROM graft_funnel('events_sqlface', 'user_id', 'ts',
        |'event_type', 'event_id', 'view,click,view,purchase', 14)""".stripMargin))
      == rows(EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        "event_id", Seq("view", "click", "view", "purchase"), Some(14))))
    assert(rows(spark.sql(
      """SELECT * FROM graft_sessionize('events_sqlface', 'user_id', 'ts',
        |'event_id', 1800)""".stripMargin))
      == rows(EventAnalytics.sessionize(ev, "user_id", "ts", "event_id", 1800L)))
    assert(rows(spark.sql(
      """SELECT * FROM graft_attribution('events_sqlface', 'user_id', 'ts',
        |'event_id', 'event_type', 'view,click', 'purchase', 7)""".stripMargin))
      == rows(EventAnalytics.attributeLastTouch(ev, "user_id", "ts",
        "event_id", "event_type", Seq("view", "click"), "purchase", 7)))
    assert(rows(spark.sql(
      """SELECT * FROM graft_path_transitions('events_sqlface', 'user_id',
        |'ts', 'event_id', 'event_type')""".stripMargin))
      == rows(EventAnalytics.pathTransitions(ev, "user_id", "ts",
        "event_id", "event_type")))
    assert(rows(spark.sql(
      "SELECT * FROM graft_cohort('events_sqlface', 'user_id', 'ts')"))
      == rows(EventAnalytics.cohortRetention(ev, "user_id", "ts")))
    assert(rows(spark.sql(
      """SELECT * FROM graft_resample('events_sqlface', 'event_type',
        |'ts', 'value')""".stripMargin))
      == rows(EventAnalytics.resampleHourly(ev, "event_type", "ts", "value")))
    // TVFs compose with ordinary SQL around them
    val filtered = spark.sql(
      """SELECT from_type, n FROM graft_path_transitions('events_sqlface',
        |'user_id', 'ts', 'event_id', 'event_type')
        |WHERE to_type = 'purchase' ORDER BY n DESC""".stripMargin)
    assert(filtered.count() > 0)
    // non-literal argument: the designed error, not a ClassCastException
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_sessionize('events_sqlface', 'user_id', 'ts', 'event_id', 1800 + 1)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("pathTransitions: consecutive pairs only, per-user timelines never cross") {
    val rows = Seq(
      (1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L), (1L, ts(3), "a", 3L),
      (2L, ts(1), "b", 4L), (2L, ts(2), "b", 5L))
    val df = rows.toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.pathTransitions(df, "user_id", "ts",
      "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long)].collect().toSeq
    // u1: a->b, b->a ; u2: b->b — u1's last event never pairs with u2's
    assert(got == Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "b", 1L)), s"got $got")
  }
}

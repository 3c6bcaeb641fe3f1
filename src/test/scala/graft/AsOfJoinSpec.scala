package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the most recent right row at or before each left time, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),
      (2L, 100L, ts("2024-01-01 10:00:10")),
      (3L, 200L, ts("2024-01-01 10:00:03")),
      (4L, 300L, ts("2024-01-01 10:00:10"))) // key with no quotes at all
      .toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (11L, 100L, ts("2024-01-01 10:00:01")),
      (12L, 100L, ts("2024-01-01 10:00:07")),
      (13L, 100L, ts("2024-01-01 10:00:10")), // exactly at trade 2 time -> visible
      (14L, 200L, ts("2024-01-01 10:00:04"))) // after trade 3 -> invisible
      .toDF("event_id", "user_id", "ts")

    val res = AsOfJoin.leftAsOf(trades, quotes,
      keyCols = Seq("user_id"), timeCol = "ts",
      rightOrder = "event_id", payload = Seq("event_id"))
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(res == Map(1L -> 11L, 2L -> 13L, 3L -> -1L, 4L -> -1L))
  }

  test("toleranceSeconds: stale matches null out; the window is inclusive at exactly -T") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:10:00")), // match 10 min old, T=600 -> inclusive keep
      (2L, 100L, ts("2024-01-01 10:30:00")), // latest match 20 min old -> stale, null
      (3L, 200L, ts("2024-01-01 10:00:30"))) // match 30 s old -> keep
      .toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (11L, 100L, ts("2024-01-01 10:00:00")),
      (12L, 100L, ts("2024-01-01 10:10:00")),
      (13L, 200L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    def run(tol: Option[Long]) = AsOfJoin.leftAsOf(trades, quotes,
      keyCols = Seq("user_id"), timeCol = "ts",
      rightOrder = "event_id", payload = Seq("event_id"),
      toleranceSeconds = tol)
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // trade 1's latest quote is 12 (same instant); trade 2's is 12
    // (20 min earlier — outside T=600); trade 3's is 13 (30 s, inside).
    assert(run(Some(600L)) == Map(1L -> 12L, 2L -> -1L, 3L -> 13L))
    // boundary: quote exactly T seconds old stays (inclusive >=)
    assert(run(Some(1200L)) == Map(1L -> 12L, 2L -> 12L, 3L -> 13L))
    // no tolerance: plain as-of
    assert(run(None) == Map(1L -> 12L, 2L -> 12L, 3L -> 13L))
    // zero tolerance: only exact-time matches survive
    assert(run(Some(0L)) == Map(1L -> 12L, 2L -> -1L, 3L -> -1L))
  }

  test("left row count is preserved (left-join semantics)") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = spark.emptyDataset[(Long, Long, Timestamp)]
      .toDF("event_id", "user_id", "ts")
    val res = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "event_id", Seq("event_id"))
    assert(res.count() == 1)
    assert(res.first().isNullAt(res.columns.indexOf("asof_event_id")))
  }

  test("native Catalyst exec matches the union+window plan on real data") {
    // the custom LogicalPlan/Strategy/merge-exec path (plans.AsOfJoinNative)
    // must produce exactly the union+window result, including the self-
    // as-of case where both sides are carved from the same scan
    val ev = graft.sources.Tables.load(spark, TestSpark.sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("asof_event_id"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(_._1).toSeq
    val viaWindow = canon(AsOfJoin.leftAsOf(purchases, clicks,
      Seq("user_id"), "ts", "event_id", Seq("event_id", "ts")))
    val viaNative = canon(graft.plans.AsOfJoinNative.leftAsOf(purchases, clicks,
      Seq("user_id"), "ts", "event_id", Seq("event_id", "ts")))
    assert(viaNative.nonEmpty)
    assert(viaNative == viaWindow)
  }

  test("native exec: ties at equal time are visible, largest order wins") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),
      (2L, 100L, ts("2024-01-01 10:00:10")),
      (3L, 200L, ts("2024-01-01 10:00:03"))).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (11L, 100L, ts("2024-01-01 10:00:05")), // tie with trade 1 time
      (12L, 100L, ts("2024-01-01 10:00:05")), // same time, larger id wins
      (14L, 200L, ts("2024-01-01 10:00:04"))).toDF("event_id", "user_id", "ts")
    val res = graft.plans.AsOfJoinNative.leftAsOf(trades, quotes,
      Seq("user_id"), "ts", "event_id", Seq("event_id"))
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(res == Map(1L -> 12L, 2L -> 12L, 3L -> -1L))
  }

  test("NULL keys match nothing, like a SQL equality join (both impls)") {
    import spark.implicits._
    val trades = Seq(
      (1L, Some(100L), ts("2024-01-01 10:00:05")),
      (2L, None, ts("2024-01-01 10:00:10"))) // null-key left row
      .toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (11L, Some(100L), ts("2024-01-01 10:00:01")),
      (12L, None, ts("2024-01-01 10:00:02"))) // null-key right row
      .toDF("event_id", "user_id", "ts")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("event_id", "asof_event_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val expected = Map(1L -> 11L, 2L -> -1L) // null never matches null
    assert(run(AsOfJoin.leftAsOf(trades, quotes,
      Seq("user_id"), "ts", "event_id", Seq("event_id"))) == expected)
    assert(run(graft.plans.AsOfJoinNative.leftAsOf(trades, quotes,
      Seq("user_id"), "ts", "event_id", Seq("event_id"))) == expected)
  }

  test("native exec plans one exchange per side, no union blow-up") {
    val ev = graft.sources.Tables.load(spark, TestSpark.sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    val df = graft.plans.AsOfJoinNative.leftAsOf(purchases, clicks,
      Seq("user_id"), "ts", "event_id", Seq("event_id"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(plan.collect { case e: graft.plans.AsOfJoinExec => e }.nonEmpty, plan.toString)
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.size == 2, s"one shuffle per side expected:\n$plan")
      assert(!plan.toString.contains("Union"), "native path must not union the sides")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}

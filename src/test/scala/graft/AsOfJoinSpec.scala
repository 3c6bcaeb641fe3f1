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

  test("left row count is preserved (left-join semantics)") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = spark.emptyDataset[(Long, Long, Timestamp)]
      .toDF("event_id", "user_id", "ts")
    val res = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "event_id", Seq("event_id"))
    assert(res.count() == 1)
    assert(res.first().isNullAt(res.columns.indexOf("asof_event_id")))
  }
}

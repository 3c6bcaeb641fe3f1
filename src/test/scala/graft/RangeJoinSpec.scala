package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval endpoints are inclusive; bucket boundaries don't lose matches") {
    import spark.implicits._
    val gap = 600L // 10 min buckets
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:20:00")), // exactly on a bucket boundary
      (2L, 7L, ts("2024-01-01 10:25:30")),
      (3L, 8L, ts("2024-01-01 10:25:30"))) // other key
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (11L, 7L, ts("2024-01-01 10:10:00")), // == left1.ts - gap  -> inclusive
      (12L, 7L, ts("2024-01-01 10:20:00")), // == left1.ts        -> inclusive
      (13L, 7L, ts("2024-01-01 10:09:59")), // 1s before the window -> out
      (14L, 7L, ts("2024-01-01 10:25:30")), // == left2.ts
      (15L, 9L, ts("2024-01-01 10:20:00"))) // wrong key
      .toDF("event_id", "user_id", "ts")

    val counts = RangeJoin.countPreceding(left, right, "user_id", "ts", gap, "event_id")
      .select("event_id", "n_matches").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 0L))

    val pairs = RangeJoin.withinPreceding(left, right, "user_id", "ts", gap, Seq("event_id"))
      .select(col("event_id"), col("r_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 11L), (1L, 12L), (2L, 12L), (2L, 14L)))
  }

  test("no duplicate pairs from the two-bucket explode") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts("2024-01-01 10:20:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((11L, 7L, ts("2024-01-01 10:15:00"))).toDF("event_id", "user_id", "ts")
    val res = RangeJoin.withinPreceding(left, right, "user_id", "ts", 600L, Seq("event_id"))
    assert(res.count() == 1)
  }
}

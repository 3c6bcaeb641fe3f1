package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("latestWins: updates win, deletes remove, change side wins version ties") {
    val base = Seq(
      (1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L), (3L, "c", 30.0, 1L), (4L, "d", 40.0, 1L))
      .toDF("k", "payload", "amount", "version")
    val changes = Seq(
      (2L, "b2", 21.0, 2L, false), // plain update
      (3L, "c", 30.0, 2L, true),   // delete tombstone
      (1L, "a9", 11.0, 1L, false), // SAME version as base: change side wins
      (5L, "e", 50.0, 1L, false))  // brand-new key (insert)
      .toDF("k", "payload", "amount", "version", "_deleted")
    val out = Upsert.latestWins(base, changes, Seq("k"), "version", "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a9", 11.0), (2L, "b2", 21.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("latestWins without a delete column is pure upsert") {
    val base = Seq((1L, "a", 1L)).toDF("k", "v", "version")
    val changes = Seq((1L, "a2", 2L), (2L, "b", 1L)).toDF("k", "v", "version")
    val out = Upsert.latestWins(base, changes, Seq("k"), "version", "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a2"), (2L, "b")))
  }

  test("latestWins picks a stable winner even on full (version, tie) ties") {
    val base = Seq((1L, "a", 1L)).toDF("k", "v", "version")
    // two changes tying on key, version AND tieCol (tieCol == key): the
    // content-hash tiebreak must make the winner run-independent
    val changes = Seq((1L, "x", 2L), (1L, "y", 2L)).toDF("k", "v", "version")
    val winners = (1 to 3).map { _ =>
      Upsert.latestWins(base, changes.repartition(3), Seq("k"), "version", "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    assert(winners.distinct.size == 1, s"winner must be stable, got $winners")
    assert(winners.head.length == 1)
  }

  test("latestWins: tombstone vs same-content update tie resolves identically") {
    val base = Seq((1L, "a", 1L)).toDF("k", "v", "version")
    // identical in every hashed column except the delete flag: the flag
    // must participate in the content-hash tiebreak, or keep-vs-delete
    // depends on input order
    val mk = (rows: Seq[(Long, String, Long, Boolean)]) =>
      Upsert.latestWins(base,
        rows.toDF("k", "v", "version", "_deleted").repartition(3),
        Seq("k"), "version", "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ab = mk(Seq((1L, "x", 2L, false), (1L, "x", 2L, true)))
    val ba = mk(Seq((1L, "x", 2L, true), (1L, "x", 2L, false)))
    assert(ab == ba, s"winner must not depend on input order: $ab vs $ba")
  }

  test("latestWins resolves multiple changes per key to the highest version") {
    val base = Seq((1L, "a", 1L)).toDF("k", "v", "version")
    val changes = Seq((1L, "a2", 2L), (1L, "a3", 3L), (1L, "a2b", 2L))
      .toDF("k", "v", "version")
    val out = Upsert.latestWins(base, changes, Seq("k"), "version", "k").collect()
    assert(out.length == 1 && out.head.getString(1) == "a3")
  }
}

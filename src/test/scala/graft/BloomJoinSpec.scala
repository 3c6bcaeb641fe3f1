package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin
import graft.sources.Tables

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pruned join result equals the plain join exactly") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
    val dim = Tables.load(spark, TestSpark.sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val got = BloomJoin.prunedJoin(orders, "o_custkey", dim, "c_custkey")
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = orders.join(dim, orders("o_custkey") === dim("c_custkey"))
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == plain)
    assert(plain.nonEmpty)
  }

  test("bloom probe prunes fact rows before the join and keeps all matches") {
    val fact = spark.range(0, 10000).select(col("id").as("k"), (col("id") % 100).as("payload"))
    val dim = spark.range(0, 10000, 100).select(col("id").as("dk")) // 1% selective
    val bloom = BloomJoin.buildBloom(dim, "dk", expectedItems = 200, numBits = 4096)
    assert(bloom != null)
    val pruned = fact.filter(BloomJoin.mightContain(bloom, col("k")))
    val kept = pruned.count()
    // no false negatives: every true match survives the probe
    assert(pruned.join(dim, pruned("k") === dim("dk")).count() == 100)
    // the probe must actually prune (fp rate bounded well under 50%)
    assert(kept < 5000, s"bloom kept $kept of 10000 — not pruning")
    assert(kept >= 100)
  }

  test("mismatched key types are rejected loudly (hash is type-sensitive)") {
    val fact = Seq(1, 2, 3).toDF("k") // int
    val dim = Seq(1L, 2L).toDF("dk")  // long: 1 and 1L hash differently
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(fact, "k", dim, "dk")
    }
    assert(e.getMessage.contains("identical types"))
  }

  test("empty dim side yields the empty join, not a crash") {
    val fact = Seq((1L, "a")).toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("dk", "w").filter(col("dk") < 0)
    assert(BloomJoin.prunedJoin(fact, "k", dim, "dk").count() == 0)
  }

  test("the might_contain filter sits below the join in the executed plan") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
    val dim = Tables.load(spark, TestSpark.sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val plan = BloomJoin.prunedJoin(orders, "o_custkey", dim, "c_custkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }
}

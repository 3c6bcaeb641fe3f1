package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting
import graft.sources.Tables

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted aggregation equals direct aggregation") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
    val salted = Salting.saltedSumCount(orders, "o_orderstatus", "o_totalprice", "o_orderkey", 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val direct = orders.groupBy("o_orderstatus")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals direct join") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
    val customer = Tables.load(spark, TestSpark.sf, "customer")
    val salted = Salting.saltedJoin(orders, customer, "o_custkey", "c_custkey", "o_orderkey", 8)
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val direct = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(salted == direct)
  }
}

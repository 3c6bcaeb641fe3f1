package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.{FreqFunctions, FreqSketchOps}

class FreqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed stream: item i appears (1000 - i) times for i in 0..99 plus a
  // long tail of singletons -> heavy hitters are 0, 1, 2, ...
  private lazy val stream: Seq[Long] =
    (0 until 100).flatMap(i => Seq.fill(1000 - i)(i.toLong)) ++
      (10000L until 12000L)
  private lazy val exact: Map[Long, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("small-map sketch still brackets EVERY item's true count (deterministic guarantee)") {
    val blob = stream.toDF("x").repartition(8)
      .agg(FreqFunctions.freqAgg($"x", maxMapSize = 64).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val sk = FreqSketchOps.fromBytes(blob)
    assert(sk.getStreamLength == stream.size.toLong)
    exact.foreach { case (item, n) =>
      assert(sk.getLowerBound(item) <= n && n <= sk.getUpperBound(item),
        s"bracket must hold for item $item (true $n)")
    }
    // the top hitters are identified with tight estimates
    for (i <- 0L until 10L) {
      assert(math.abs(sk.getEstimate(i) - exact(i)) <= sk.getMaximumError)
    }
  }

  test("merging per-group sketches preserves the bracket and the exact stream length") {
    val perGroup = stream.zipWithIndex
      .map { case (v, i) => (i % 13, v) }.toDF("g", "x")
      .groupBy("g").agg(FreqFunctions.freqAgg($"x", 64).as("sk"))
    val blob = perGroup.agg(FreqFunctions.freqMerge($"sk", 64).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val sk = FreqSketchOps.fromBytes(blob)
    assert(sk.getStreamLength == stream.size.toLong)
    exact.foreach { case (item, n) =>
      assert(sk.getLowerBound(item) <= n && n <= sk.getUpperBound(item))
    }
  }

  test("readout expressions over a persisted blob column") {
    val out = TestSpark.scratch("freq_blob")
    stream.toDF("x").agg(FreqFunctions.freqAgg($"x", 512).as("sk"))
      .write.mode("overwrite").parquet(out)
    val r = spark.read.parquet(out)
      .select(FreqFunctions.freqN($"sk").as("n"),
        FreqFunctions.freqBounds($"sk", lit(0L)).as("b"))
      .select($"n", $"b.estimate", $"b.lb", $"b.ub")
      .collect()(0)
    assert(r.getAs[Long]("n") == stream.size.toLong)
    assert(r.getAs[Long]("lb") <= 1000L && 1000L <= r.getAs[Long]("ub"))
  }

  test("SQL surface: graft_freq_* registered via extensions") {
    GraftExtensions.register(spark)
    stream.toDF("x").createOrReplaceTempView("freq_in")
    val r = spark.sql(
      """SELECT graft_freq_n(m) AS n,
        |  graft_freq_bounds(m, 5L).lb AS lb, graft_freq_bounds(m, 5L).ub AS ub
        |FROM (SELECT graft_freq_merge(sk) AS m
        |      FROM (SELECT x % 4 AS g, graft_freq_agg(x) AS sk
        |            FROM freq_in GROUP BY x % 4))
        |""".stripMargin).collect()(0)
    assert(r.getAs[Long]("n") == stream.size.toLong)
    assert(r.getAs[Long]("lb") <= exact(5L) && exact(5L) <= r.getAs[Long]("ub"),
      "the certified bracket survives group-wise build + SQL merge")
  }
}

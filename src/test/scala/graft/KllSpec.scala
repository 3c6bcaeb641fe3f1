package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.{KllFunctions, KllSketchOps}

class KllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val values: Seq[Double] = (1 to 5000).map(_.toDouble)
  private lazy val df = values.zipWithIndex
    .map { case (v, i) => (i % 7, v) }.toDF("g", "v")
    .repartition(8)

  test("sketch quantile estimate lands within the KLL rank bound") {
    val blob = df.agg(KllFunctions.kllAgg($"v").as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val sk = KllSketchOps.fromBytes(blob)
    assert(sk.getN == 5000L, "KLL tracks the exact stream length")
    for (rank <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = sk.getQuantile(rank, KllSketchOps.Criteria)
      val trueRank = values.count(_ <= est).toDouble / values.size
      assert(math.abs(trueRank - rank) <= 0.0165 * 2,
        s"rank $rank: estimate $est has true rank $trueRank")
    }
  }

  test("mergeable summaries: union of per-group sketches == sketch of the whole stream") {
    val perGroup = df.groupBy("g").agg(KllFunctions.kllAgg($"v").as("sk"))
    val merged = perGroup.agg(KllFunctions.kllMerge($"sk").as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val sk = KllSketchOps.fromBytes(merged)
    assert(sk.getN == 5000L, "merge preserves the exact count")
    val est = sk.getQuantile(0.5, KllSketchOps.Criteria)
    val trueRank = values.count(_ <= est).toDouble / values.size
    assert(math.abs(trueRank - 0.5) <= 0.0165 * 2,
      "merged sketch answers within the same bound as a direct one")
  }

  test("readout expressions: quantile/rank/n over a persisted blob column") {
    val out = TestSpark.scratch("kll_blob")
    df.groupBy("g").agg(KllFunctions.kllAgg($"v").as("sk"))
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    val rows = back.select($"g",
        KllFunctions.kllN($"sk").as("n"),
        KllFunctions.kllQuantile($"sk", lit(0.5)).as("p50"),
        KllFunctions.kllRank($"sk", KllFunctions.kllQuantile($"sk", lit(0.5))).as("r"))
      .collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 5000L)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("r") - 0.5) <= 0.05,
        "the sketch's own rank of its p50 estimate is ~0.5")
    }
  }

  test("small sketches are exact (no compaction below capacity)") {
    val small = (1 to 100).map(_.toDouble)
    val blob = small.toDF("v").agg(KllFunctions.kllAgg($"v").as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val sk = KllSketchOps.fromBytes(blob)
    assert(sk.getQuantile(0.5, KllSketchOps.Criteria) == 50.0)
    assert(sk.getQuantile(1.0, KllSketchOps.Criteria) == 100.0)
  }

  test("SQL surface: graft_kll_agg/merge/quantile/n registered via extensions") {
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("kll_in")
    val r = spark.sql(
      """SELECT graft_kll_n(m) AS n, graft_kll_quantile(m, 0.5d) AS p50
        |FROM (SELECT graft_kll_merge(sk) AS m
        |      FROM (SELECT g, graft_kll_agg(v) AS sk FROM kll_in GROUP BY g))
        |""".stripMargin).collect()(0)
    assert(r.getAs[Long]("n") == 5000L)
    assert(math.abs(r.getAs[Double]("p50") - 2500.0) <= 200.0)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkippingIndex
import graft.sources.Tables

class SkippingIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Hadoop Path, Spark's _metadata.file_path and df.inputFiles render the
  // same local file as file:/p, file:///p or /p — compare the path part
  private def norm(s: String): String = s.replaceFirst("^file:/+", "/")

  private lazy val (dataDir, statsDir): (String, String) = {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val data = TestSpark.scratch("skip_ranged_li")
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(data)
    val stats = TestSpark.scratch("skip_stats")
    SkippingIndex.buildStats(spark, data, Seq("l_partkey"), stats)
    (data, stats)
  }

  test("stats table: one row per file, footer min/max covers the data exactly") {
    val stats = spark.read.parquet(statsDir).collect()
    val files = new java.io.File(dataDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(stats.length == files.length)
    // footer stats equal the actual per-file min/max (read back and check)
    val actual = spark.read.parquet(dataDir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min("l_partkey").as("amin"), max("l_partkey").as("amax"),
        count(lit(1)).as("an"))
      .collect().map(r => (norm(r.getString(0)),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    stats.foreach { r =>
      val (amin, amax, an) = actual(norm(r.getAs[String]("file")))
      assert(r.getAs[Long]("l_partkey_min") == amin)
      assert(r.getAs[Long]("l_partkey_max") == amax)
      assert(r.getAs[Long]("n_rows") == an)
    }
  }

  test("pruned read skips most files on a range-clustered layout and equals the full scan") {
    // partkey domain at sf0.001 is [0,199]; a 10% band must prune hard
    val (lo, hi) = (10L, 30L)
    val (pruned, p) = SkippingIndex.prunedRead(spark, statsDir, "l_partkey", lo, hi)
    // a narrow band over 16 range-partitioned files must skip most of them
    assert(p.filesTotal == 16)
    assert(p.filesKept <= 4,
      s"expected heavy skipping on a range layout, kept ${p.filesKept}/16")
    // the scan reads ONLY the kept files
    assert(pruned.inputFiles.map(norm).toSet == p.kept.map(norm).toSet)
    // and the result is exactly the full-scan filter
    val full = spark.read.parquet(dataDir)
      .filter(col("l_partkey").between(lo, hi))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("attached index: scanBetween consults it automatically, invisibly to plain readers") {
    val data = TestSpark.scratch("skip_auto_li")
    Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(data)
    val plainBefore = spark.read.parquet(data).count()
    SkippingIndex.attachStats(spark, data, Seq("l_partkey"))
    // the _-prefixed index dir is ignored by a plain directory read
    assert(spark.read.parquet(data).count() == plainBefore,
      "attaching the index must not change what a plain reader sees")
    val (lo, hi) = (10L, 30L)
    val (auto, pr) = SkippingIndex.scanBetween(spark, data, "l_partkey", lo, hi)
    assert(pr.isDefined && pr.get.filesTotal == 16 && pr.get.filesKept <= 4,
      s"auto path must prune like the explicit one: $pr")
    // the scan's actual input files ARE the pruned list (plan-level proof)
    assert(auto.inputFiles.map(norm).toSet == pr.get.kept.map(norm).toSet)
    val full = spark.read.parquet(data).filter(col("l_partkey").between(lo, hi))
    assert(auto.exceptAll(full).isEmpty && full.exceptAll(auto).isEmpty)
    // column not covered by the index -> plain scan, no pruning decision
    val (fallback, none) = SkippingIndex.scanBetween(spark, data, "l_orderkey", 0L, 10L)
    assert(none.isEmpty)
    assert(fallback.exceptAll(spark.read.parquet(data)
      .filter(col("l_orderkey").between(0L, 10L))).isEmpty)
    // a band no file can contain -> correctly-empty plain scan
    val (empty, zero) = SkippingIndex.scanBetween(spark, data, "l_partkey",
      100000000L, 100000001L)
    assert(zero.exists(_.filesKept == 0) && empty.count() == 0)
  }

  test("pruning is conservative: every row of the band is inside some kept file's interval") {
    val (lo, hi) = (50L, 52L)
    val p = SkippingIndex.prune(spark, statsDir, "l_partkey", lo, hi)
    val stats = spark.read.parquet(statsDir)
      .collect().map(r => r.getAs[String]("file") ->
        (r.getAs[Long]("l_partkey_min"), r.getAs[Long]("l_partkey_max"))).toMap
    // kept = exactly the intersecting intervals — no file with data in
    // the band is dropped, no provably-disjoint file is kept
    val expected = stats.filter { case (_, (mn, mx)) => mn <= hi && mx >= lo }.keySet
    assert(p.kept.toSet == expected)
  }

  test("a random (unclustered) layout keeps everything - the layout, not the index, is the lever") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_partkey")
    val data = TestSpark.scratch("skip_random_li")
    li.repartition(8).write.mode("overwrite").parquet(data)
    val stats = TestSpark.scratch("skip_random_stats")
    SkippingIndex.buildStats(spark, data, Seq("l_partkey"), stats)
    val p = SkippingIndex.prune(spark, stats, "l_partkey", 100L, 300L)
    assert(p.filesKept == p.filesTotal,
      "hash-partitioned files all span the whole domain - nothing can be skipped")
  }
}

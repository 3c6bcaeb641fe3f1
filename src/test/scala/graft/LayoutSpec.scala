package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.Tables

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Morton interleave: known bit patterns") {
    // min=0, max=3 with bits=2: bucket(x) = x, so z is the raw interleave
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (1L, 2L), (0L, 0L))
      .toDF("x", "y")
      .union(Seq((0L, 0L)).toDF("x", "y")) // keep observed min at 0
    val z = Layout.withZValue(df, "x", "y", bits = 2)
      .select("x", "y", "z").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((3L, 0L)) == 5L)  // 0b0101: x bits at even positions
    assert(z((0L, 3L)) == 10L) // 0b1010: y bits at odd positions
    assert(z((3L, 3L)) == 15L)
    assert(z((1L, 2L)) == 9L)  // x bit0 -> bit0 (1), y bit1 -> bit3 (8)
    assert(z((0L, 0L)) == 0L)
  }

  test("z-order files: disjoint contiguous z-ranges, tight 2-D bounding boxes") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val out = TestSpark.scratch("layout_zorder")
    Layout.zOrderWrite(li, "l_partkey", "l_suppkey", bits = 8, out, numFiles = 8)

    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("zmin"), max("z").as("zmax"),
        min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"),
        count(lit(1)).as("n"))
      .collect()
    assert(perFile.length >= 4, "range partitioning should spread files")

    // range partitioning on z => files hold disjoint contiguous z-intervals
    val sorted = perFile.sortBy(_.getAs[Long]("zmin"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("zmax") <= b.getAs[Long]("zmin"),
          "file z-ranges must not overlap")
      case _ =>
    }

    // data-skipping effectiveness: per-file bounding box area (normalized
    // by the global partkey x suppkey area) must be far below 1 — a
    // row-order/random layout gives ~1.0 per file (every file spans the
    // whole domain), so footer stats prune nothing there
    val g = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect()(0)
    val area = ((g.getLong(1) - g.getLong(0) + 1).toDouble
      * (g.getLong(3) - g.getLong(2) + 1))
    val boxFrac = sorted.map { r =>
      ((r.getAs[Long]("pmax") - r.getAs[Long]("pmin") + 1).toDouble
        * (r.getAs[Long]("smax") - r.getAs[Long]("smin") + 1)) / area
    }
    val mean = boxFrac.sum / boxFrac.length
    assert(mean < 0.5, f"mean per-file box area fraction $mean%.3f should be << 1.0")

    // content is preserved exactly
    assert(spark.read.parquet(out).count() == li.count())
  }

  test("compaction: bounded file count and row caps, content preserved") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text", "source", "n_chars")
    val frag = TestSpark.scratch("layout_frag")
    docs.repartition(32).write.mode("overwrite").parquet(frag)
    val nFragFiles = new java.io.File(frag).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nFragFiles == 32, "fragmented input should be 32 files")

    val out = TestSpark.scratch("layout_compacted")
    val n = docs.count()
    val target = 500L
    Layout.compact(spark.read.parquet(frag), target, out)

    val expectFiles = math.max(1L, (n + target - 1) / target)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f")).count().collect()
    assert(perFile.length.toLong == expectFiles,
      s"expected $expectFiles compacted files, got ${perFile.length}")
    assert(perFile.forall(_.getLong(1) <= target),
      "maxRecordsPerFile cap must hold")

    // content identical: same ids, same per-id checksum
    val before = docs.agg(count(lit(1)),
      sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))).collect()(0)
    val after = spark.read.parquet(out).agg(count(lit(1)),
      sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))).collect()(0)
    assert(before == after)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for the write side of a 100 TB lakehouse: z-order
  * clustering (multi-column data skipping) and small-file compaction.
  *
  * Neither has a counterpart in the reference (it reads files as-is;
  * reference src/duckdb-backend.ts opens whatever layout it is given) —
  * these are the operations the PRODUCER of those files needs so that
  * min/max footer stats actually prune at scale. Both are expressed as
  * plain DataFrame transforms: Catalyst keeps the bucket/interleave math
  * in whole-stage codegen and `repartitionByRange` gives the range
  * shuffle that makes file k hold the k-th z-interval.
  *
  * Z-ordering (Morton order): bucket each clustering column into
  * `2^bits` equal-width integer buckets over its [min,max], then
  * interleave the bucket bits so nearby (x,y) cells land in nearby
  * z-values. Files written in z-order have tight per-file bounding boxes
  * in BOTH columns, so a range predicate on either column (or both)
  * skips most files via footer stats — the property a single-column sort
  * only provides for its leading column.
  *
  * All math is integer/floor arithmetic on values whose products stay
  * far below 2^53, so the same computation is replayable bit-for-bit in
  * any engine (the q48_zorder oracle recomputes it in DuckDB SQL).
  */
object Layout {

  /** Equal-width bucket of `x` into [0, 2^bits) over [xmin, xmin+span).
    * Floor double division is exact here: operands are integers far
    * below 2^53, and a non-integral rational p/q (q < 2^31) is at least
    * 1/q > 1e-10 away from any integer — 6 orders of magnitude above
    * double rounding error, so the floor cannot land on the wrong side.
    */
  def zBucket(x: Column, xmin: Column, span: Column, bits: Int): Column =
    floor(((x - xmin) * lit((1L << bits).toDouble)) / span).cast("long")

  /** Morton interleave of two bucket values: bit i of `bx` goes to bit
    * 2i, bit i of `by` to bit 2i+1. Pure shift/mask column arithmetic —
    * stays in whole-stage codegen, no UDF.
    */
  def zInterleave(bx: Column, by: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(by, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** `df` plus a `z` column: the Morton code of (xCol, yCol) bucketed
    * over their observed [min,max]. The bounds ride in via a broadcast
    * one-row aggregate crossJoin (same shape as the scalar-subquery
    * gates) — no driver collect, and at 100 TB the bounds aggregate is a
    * footer-cheap column-pruned scan.
    */
  def withZValue(df: DataFrame, xCol: String, yCol: String, bits: Int): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).as("zx_min"), max(col(xCol)).as("zx_max"),
      min(col(yCol)).as("zy_min"), max(col(yCol)).as("zy_max"))
    val j = df.crossJoin(broadcast(bounds))
    val bx = zBucket(col(xCol), col("zx_min"), col("zx_max") - col("zx_min") + 1, bits)
    val by = zBucket(col(yCol), col("zy_min"), col("zy_max") - col("zy_min") + 1, bits)
    j.withColumn("z", zInterleave(bx, by, bits))
      .drop("zx_min", "zx_max", "zy_min", "zy_max")
  }

  /** Write `df` z-ordered on (xCol, yCol): range-partition on the Morton
    * code into `numFiles` contiguous z-intervals and sort within each, so
    * every output file covers a small spatial tile and its footer min/max
    * on BOTH columns prune under either predicate.
    */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  out: String, numFiles: Int): Unit =
    withZValue(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(out)

  /** Small-file compaction: rewrite `df` as ~`ceil(n / targetRecords)`
    * files of at most `targetRecords` rows each — the maintenance pass
    * that keeps a 100 TB table's file count bounded after many
    * incremental appends (thousands of KB-sized files turn a scan into a
    * task-scheduling and footer-reading bottleneck). The row count is a
    * cheap count-star aggregate (footer-only for parquet inputs);
    * `maxRecordsPerFile` caps stragglers if the repartition is uneven.
    */
  def compact(df: DataFrame, targetRecords: Long, out: String): Unit = {
    val n = df.count()
    val files = math.max(1L, (n + targetRecords - 1) / targetRecords).toInt
    df.repartition(files)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecords)
      .parquet(out)
  }

  /** DuckDB replay of `zBucket` for oracle SQL — the identical floor
    * arithmetic rendered over SQL expressions (kept HERE, next to the
    * Scala math it mirrors, so the two cannot drift apart silently).
    */
  def zBucketSql(x: String, xmin: String, span: String, bits: Int): String =
    s"CAST(floor((($x - $xmin) * ${(1L << bits).toDouble}) / $span) AS BIGINT)"

  /** DuckDB replay of `zInterleave` over two (pre-computed) bucket
    * expressions.
    */
  def zInterleaveSql(bx: String, by: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($bx >> $i) & 1) << ${2 * i}) + ((($by >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}

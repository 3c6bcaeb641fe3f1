package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level min/max data-skipping index — the read-side complement of
  * [[Layout]]'s clustered writes (no reference counterpart: the reference
  * opens single files as-is, src/duckdb-backend.ts; this is what the
  * OPERATOR of a 100 TB table needs so selective queries touch a handful
  * of its files).
  *
  * The index is a tiny stats table (one row per data file: row count plus
  * per-column min/max) built from parquet FOOTERS only — column-chunk
  * statistics are already in every footer, so building the index costs
  * O(files) KB-sized footer reads distributed over the cluster, never a
  * data scan. Query time, the stats table prunes to the files whose
  * [min,max] interval intersects the predicate and reads only those,
  * with the predicate re-applied as a residual filter (pruning is
  * file-granular; correctness never depends on it).
  *
  * This is exactly the mechanism behind lakehouse "data skipping"
  * (Delta/Iceberg file stats, Snowflake micro-partition pruning): on a
  * range-clustered or z-ordered layout a selective predicate keeps
  * files_kept ≈ selectivity × files_total; on a random layout it keeps
  * everything — which is why [[Layout.zOrderWrite]] exists.
  */
object SkippingIndex {

  /** One pruning decision, for callers that want the evidence (specs,
    * query logs): how many files the stats table held and how many
    * survived the interval test.
    */
  final case class Prune(filesTotal: Int, filesKept: Int, kept: Seq[String])

  private def statsSchema(cols: Seq[String]): StructType =
    StructType(
      StructField("file", StringType, nullable = false) +:
      StructField("n_rows", LongType, nullable = false) +:
      cols.flatMap(c => Seq(
        StructField(s"${c}_min", LongType, nullable = true),
        StructField(s"${c}_max", LongType, nullable = true))))

  /** Build the stats table for integer-typed `cols` over every
    * `*.parquet` file under `dir`, and write it to `statsOut` (one small
    * parquet file — the index itself). Footer-only I/O, parallelized
    * across the cluster via a paths RDD like
    * [[graft.query.MetadataInspector.directoryMetadata]].
    *
    * Min/max are the footer's column-chunk statistics folded across row
    * groups. Columns must be INT32/INT64 (stored as long) — the gate
    * surface; a chunk without statistics yields NULL min/max, which
    * [[prune]] treats as "cannot skip" (conservative, never wrong).
    */
  def buildStats(spark: SparkSession, dir: String, cols: Seq[String],
      statsOut: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(new Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.toSeq
    require(files.nonEmpty, s"no parquet files under $dir")
    statsRows(spark, files, cols)
      .coalesce(1).write.mode("overwrite").parquet(statsOut)
  }

  /** The stats table for an EXPLICIT file list (no directory listing) —
    * the form a manifest-based table ([[SnapshotTable]]) consumes, since
    * its live files span several commit directories. Same footer-only
    * distributed build.
    */
  def statsRows(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(files.nonEmpty, "statsRows needs at least one file")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val colsB = cols.toArray
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.length, 64)))
      .map { p =>
        val in = HadoopInputFile.fromPath(new Path(p), conf.value)
        val reader = ParquetFileReader.open(in)
        try {
          val f = reader.getFooter
          val blocks = f.getBlocks.asScala.toSeq
          val nRows = blocks.map(_.getRowCount).sum
          val minMax: Seq[(Any, Any)] = colsB.toSeq.map { c =>
            val chunks = blocks.flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == c)
            require(chunks.nonEmpty, s"column $c not found in $p")
            val stats = chunks.map(_.getStatistics)
            if (stats.exists(s => s == null || !s.hasNonNullValue)) (null, null)
            else {
              val mins = stats.map(s => (s.genericGetMin: Any) match {
                case i: java.lang.Integer => i.longValue
                case l: java.lang.Long => l.longValue
                case other => throw new IllegalArgumentException(
                  s"$c: unsupported stats type ${other.getClass.getName} " +
                    "(INT32/INT64 columns only)")
              })
              val maxs = stats.map(s => (s.genericGetMax: Any) match {
                case i: java.lang.Integer => i.longValue
                case l: java.lang.Long => l.longValue
                case other => throw new IllegalArgumentException(
                  s"$c: unsupported stats type ${other.getClass.getName}")
              })
              (mins.min, maxs.max)
            }
          }
          Row.fromSeq(p +: nRows +: minMax.flatMap { case (a, b) => Seq(a, b) })
        } finally reader.close()
      }
    spark.createDataFrame(rows, statsSchema(cols))
  }

  /** [[statsRows]] for STRING (parquet BINARY/UTF8) columns: min/max are
    * the footer's unsigned-lexicographic byte-order statistics rendered
    * as UTF-8 strings. Comparisons against them must happen in Spark
    * plans (UTF8String compares unsigned byte-wise, matching the footer's
    * stats order) — driver-side java.lang.String compareTo is UTF-16
    * code-unit order and disagrees on supplementary characters.
    */
  def statsRowsString(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(files.nonEmpty, "statsRowsString needs at least one file")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val colsB = cols.toArray
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.length, 64)))
      .map { p =>
        val in = HadoopInputFile.fromPath(new Path(p), conf.value)
        val reader = ParquetFileReader.open(in)
        try {
          val f = reader.getFooter
          val blocks = f.getBlocks.asScala.toSeq
          val nRows = blocks.map(_.getRowCount).sum
          val minMax: Seq[(Any, Any)] = colsB.toSeq.map { c =>
            val chunks = blocks.flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == c)
            require(chunks.nonEmpty, s"column $c not found in $p")
            val stats = chunks.map(_.getStatistics)
            if (stats.exists(s => s == null || !s.hasNonNullValue)) (null, null)
            else {
              def bin(v: Any): Array[Byte] = v match {
                case b: org.apache.parquet.io.api.Binary => b.getBytes
                case other => throw new IllegalArgumentException(
                  s"$c: unsupported stats type ${other.getClass.getName} " +
                    "(BINARY/UTF8 columns only)")
              }
              // fold across row groups in the SAME unsigned byte order the
              // footer stats are computed in (java String compareTo is
              // UTF-16 code-unit order and disagrees past the BMP)
              val ord = new Ordering[Array[Byte]] {
                def compare(a: Array[Byte], b: Array[Byte]): Int = {
                  var i = 0
                  val n = math.min(a.length, b.length)
                  while (i < n) {
                    val d = (a(i) & 0xff) - (b(i) & 0xff)
                    if (d != 0) return d
                    i += 1
                  }
                  a.length - b.length
                }
              }
              (new String(stats.map(s => bin(s.genericGetMin)).min(ord), "UTF-8"),
                new String(stats.map(s => bin(s.genericGetMax)).max(ord), "UTF-8"))
            }
          }
          Row.fromSeq(p +: nRows +: minMax.flatMap { case (a, b) => Seq(a, b) })
        } finally reader.close()
      }
    val schema = StructType(
      StructField("file", StringType, nullable = false) +:
      StructField("n_rows", LongType, nullable = false) +:
      cols.flatMap(c => Seq(
        StructField(s"${c}_min", StringType, nullable = true),
        StructField(s"${c}_max", StringType, nullable = true))))
    spark.createDataFrame(rows, schema)
  }

  /** [[statsRows]] for TIMESTAMP (parquet INT64 with a Timestamp logical
    * annotation) columns: min/max normalized to EPOCH MICROS whatever
    * unit the writer annotated (MILLIS×1000; MICROS as-is; NANOS
    * floor-divided for min and ceil-divided for max, so the interval can
    * only widen — conservative). INT96 timestamps (Spark's legacy
    * default output) carry no usable ordered statistics and THROW —
    * [[SnapshotTable.upsert]] catches that and degrades to
    * all-files-affected; writers who want timestamp-key pruning set
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS`.
    */
  def statsRowsMicros(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(files.nonEmpty, "statsRowsMicros needs at least one file")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val colsB = cols.toArray
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.length, 64)))
      .map { p =>
        val in = HadoopInputFile.fromPath(new Path(p), conf.value)
        val reader = ParquetFileReader.open(in)
        try {
          val f = reader.getFooter
          val blocks = f.getBlocks.asScala.toSeq
          val nRows = blocks.map(_.getRowCount).sum
          val minMax: Seq[(Any, Any)] = colsB.toSeq.map { c =>
            val chunks = blocks.flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == c)
            require(chunks.nonEmpty, s"column $c not found in $p")
            val unit = chunks.head.getPrimitiveType.getLogicalTypeAnnotation match {
              case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                t.getUnit
              case other => throw new IllegalArgumentException(
                s"$c: not a Timestamp-annotated column (annotation=$other; " +
                  "INT96 legacy timestamps have no usable ordered stats)")
            }
            import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
            def toMicros(v: Long, ceil: Boolean): Long = unit match {
              case TimeUnit.MILLIS => Math.multiplyExact(v, 1000L)
              case TimeUnit.MICROS => v
              case TimeUnit.NANOS =>
                // addExact: a max stat within 999ns of Long.MaxValue must
                // throw (landing in the caller's all-files-affected
                // degrade) rather than wrap negative and shrink the
                // interval into a wrong prune — same contract as the
                // MILLIS path's multiplyExact
                if (ceil) Math.floorDiv(Math.addExact(v, 999L), 1000L)
                else Math.floorDiv(v, 1000L)
            }
            val stats = chunks.map(_.getStatistics)
            if (stats.exists(s => s == null || !s.hasNonNullValue)) (null, null)
            else {
              def asLong(v: Any): Long = v match {
                case l: java.lang.Long => l.longValue
                case other => throw new IllegalArgumentException(
                  s"$c: unsupported stats type ${other.getClass.getName} " +
                    "(INT64 timestamp columns only)")
              }
              (stats.map(s => toMicros(asLong(s.genericGetMin), ceil = false)).min,
                stats.map(s => toMicros(asLong(s.genericGetMax), ceil = true)).max)
            }
          }
          Row.fromSeq(p +: nRows +: minMax.flatMap { case (a, b) => Seq(a, b) })
        } finally reader.close()
      }
    spark.createDataFrame(rows, statsSchema(cols))
  }

  /** Evaluate the interval test over the stats table: keep files whose
    * [min,max] on `column` intersects [lo, hi], plus files with NULL
    * stats (unknown ⇒ cannot skip). The collect is the FILE LIST — the
    * same driver-side footprint every file index (Spark's own
    * InMemoryFileIndex, a Delta snapshot) carries; data rows never leave
    * the executors.
    */
  def prune(spark: SparkSession, statsPath: String, column: String,
      lo: Long, hi: Long): Prune = {
    val stats = spark.read.parquet(statsPath)
    val total = stats.count().toInt
    val kept = stats.filter(
        col(s"${column}_min").isNull || col(s"${column}_max").isNull ||
        (col(s"${column}_min") <= hi && col(s"${column}_max") >= lo))
      .select("file").collect().map(_.getString(0)).sorted.toSeq
    Prune(total, kept.length, kept)
  }

  /** Read only the files the stats table cannot rule out for
    * `column BETWEEN lo AND hi`, with the predicate re-applied as a
    * residual filter — result is ALWAYS exactly the full-scan filter,
    * whatever the layout did (pruning is an I/O optimization, not a
    * semantic one).
    */
  def prunedRead(spark: SparkSession, statsPath: String, column: String,
      lo: Long, hi: Long): (DataFrame, Prune) = {
    val p = prune(spark, statsPath, column, lo, hi)
    require(p.filesKept > 0,
      s"no file can contain $column in [$lo,$hi] — empty result; " +
        "read one file to keep the schema")
    val df = spark.read.parquet(p.kept: _*)
      .filter(col(column).between(lo, hi))
    (df, p)
  }

  /** One keyset page over a KEY-CLUSTERED table with an attached stats
    * index: the `size` smallest `column` values STRICTLY ABOVE `after`
    * (unique-key cursor contract — the serving layout clusters by a
    * unique key), reading ONLY the file prefix that provably holds them.
    *
    * Why this exists: [[graft.query.Paginator.pageWithCursor]]'s seek
    * filter (`column >= cursor`) row-group-prunes everything BELOW the
    * cursor, but the top-k still scans the whole suffix above it — a
    * per-page cost that grows with table size even though the page
    * doesn't. With per-file [min, max, n_rows] the page becomes
    * file-bounded: walk candidate files in min order and stop as soon
    * as the included set PROVABLY contains `size` rows in
    * `(after, nextMin)` — every excluded file has min ≥ nextMin, so no
    * excluded file can hold any of the page's rows (they are the
    * smallest keys above the cursor, all < nextMin once enough rows
    * certainly precede it). Files without usable stats always qualify
    * (unknown ⇒ cannot skip). Per-page cost is then
    * O(page ÷ rows-per-file) FILES at any table size — the probe
    * evidence for flat pages across a 10× corpus (tools/ScaleProbe).
    *
    * The residual `column > after` filter and the final
    * `orderBy limit size` make the result exactly the full-sort page
    * whatever the stats said; returns the pruning decision as evidence.
    */
  def keysetPage(spark: SparkSession, dir: String, column: String,
      after: Long, size: Int): (DataFrame, Prune) = {
    require(size > 0, "page size must be positive")
    val stats = spark.read.parquet(statsPathFor(dir))
      .select(col("file"), col("n_rows"),
        col(s"${column}_min"), col(s"${column}_max"))
      .collect()
    def unknown(r: Row) = r.isNullAt(2) || r.isNullAt(3)
    // candidates: could contain a key above the cursor
    val cand = stats.filter(r => unknown(r) || r.getLong(3) > after)
    val (blind, known) = cand.partition(unknown)
    val sorted = known.sortBy(_.getLong(2))
    val included = scala.collection.mutable.ArrayBuffer.empty[Row]
    var i = 0
    var done = sorted.isEmpty
    while (!done) {
      included += sorted(i)
      i += 1
      if (i >= sorted.length) done = true
      else {
        val nextMin = sorted(i).getLong(2)
        // rows certainly in (after, nextMin): files entirely inside it
        // contribute all their rows (a lower bound — boundary-straddling
        // files contribute an unknown share and count as zero)
        val certain = included.iterator
          .filter(r => r.getLong(2) > after && r.getLong(3) < nextMin)
          .map(_.getLong(1)).sum
        if (certain >= size) done = true
      }
    }
    val kept = (included ++ blind).map(_.getString(0)).sorted.toSeq
    val p = Prune(stats.length, kept.length, kept)
    if (kept.isEmpty)
      // nothing above the cursor: the correctly-empty page, schema kept
      (spark.read.parquet(dir).filter(col(column) > after)
        .orderBy(col(column).asc).limit(size), p)
    else
      (spark.read.parquet(kept: _*).filter(col(column) > after)
        .orderBy(col(column).asc).limit(size), p)
  }

  /** Conventional in-table location of the stats index: an
    * underscore-prefixed subdirectory, which Spark's file listing (like
    * every parquet reader's) IGNORES — so a plain
    * `spark.read.parquet(dir)` of the data is never polluted by its own
    * index, exactly how `_delta_log`/`_metadata` side-files coexist with
    * data.
    */
  def statsPathFor(dir: String): String = s"$dir/_graft_stats"

  /** Build the stats index AT the table — after this, [[scanBetween]]
    * consults it automatically.
    */
  def attachStats(spark: SparkSession, dir: String, cols: Seq[String]): Unit =
    buildStats(spark, dir, cols, statsPathFor(dir))

  /** Scan `dir` for `column BETWEEN lo AND hi`, consulting an attached
    * stats index AUTOMATICALLY when one exists and covers `column`:
    * pruned file list + residual filter (the q51 machinery with the
    * explicit statsPath removed from the call site). Without a usable
    * index — none attached, or attached for other columns — it is a
    * plain filtered scan; and an index that prunes EVERYTHING yields the
    * correctly-empty plain scan (parquet row-group stats make it
    * footer-cheap). Returns the frame plus the pruning decision (None =
    * no index consulted). Results are ALWAYS the full-scan filter.
    */
  def scanBetween(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long): (DataFrame, Option[Prune]) = {
    val statsPath = new Path(statsPathFor(dir))
    val hasStats = statsPath.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(statsPath)
    val covered = hasStats && {
      val s = spark.read.parquet(statsPath.toString)
      s.columns.contains(s"${column}_min") && s.columns.contains(s"${column}_max")
    }
    if (!covered)
      (spark.read.parquet(dir).filter(col(column).between(lo, hi)), None)
    else {
      val p = prune(spark, statsPath.toString, column, lo, hi)
      if (p.filesKept == 0)
        (spark.read.parquet(dir).filter(col(column).between(lo, hi)), Some(p))
      else
        (spark.read.parquet(p.kept: _*).filter(col(column).between(lo, hi)), Some(p))
    }
  }
}

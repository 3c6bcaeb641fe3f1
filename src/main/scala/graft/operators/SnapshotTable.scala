package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot table: the manifest layer that unifies
  * [[Upsert]] (CDC merge), [[Layout]] (compaction) and [[SkippingIndex]]
  * (file stats) into a table a reader can PIN while writers rewrite it —
  * the Delta/Iceberg snapshot-isolation shape re-expressed over plain
  * parquet + Spark plans.
  *
  * Layout:
  * {{{
  *   <dir>/data/v<N>/part-*.parquet   immutable data files, one subdir per commit
  *   <dir>/manifest/v<N>.manifest     newline-separated list of the files
  *                                    that ARE version N (may span many
  *                                    data/v* dirs — upserts reuse
  *                                    untouched files)
  * }}}
  *
  * Commit protocol (single writer, like every incremental maintainer
  * here): write the new data files FIRST, then the manifest to a tmp
  * path, then one atomic rename into `manifest/` — the version exists
  * exactly when its manifest does. A crash mid-commit leaves orphan data
  * files (invisible; removed by [[vacuum]]) but never a corrupt or
  * half-visible version. Readers resolve `currentVersion` = max manifest
  * and read a FIXED file list, so a concurrent compaction — which only
  * ADDS files and a new manifest — cannot disturb them; old versions
  * stay readable until vacuum. (Rename-as-commit assumes an atomic-rename
  * filesystem — HDFS/local; an object store needs a pointer swap or
  * catalog on top, the same caveat every lakehouse format documents.)
  *
  * Scale design: the interesting path is [[upsert]] — it does NOT
  * rewrite the table. Per-file key min/max stats (footer-only, via
  * [[SkippingIndex.statsRows]]) select the files whose key range
  * intersects the incoming change keys; ONLY those files' rows enter the
  * latest-wins merge, and the new manifest is (untouched files) ++ (new
  * files). On a key-clustered layout the cost is
  * O(affected files + changes), not O(table) — the file-level
  * copy-on-write MERGE every lakehouse implements, here as a Spark plan
  * (broadcast range semi-join for the file selection, one key shuffle
  * for the merge).
  */
object SnapshotTable {

  /** One committed version: its number, full live-file list, and how
    * many of those files were REUSED from the previous version (the
    * copy-on-write evidence — a full rewrite has filesReused == 0).
    */
  final case class Commit(version: Long, files: Seq[String], filesReused: Int)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(dir: String, v: Long) =
    new Path(s"$dir/manifest/" + f"v$v%05d.manifest")

  private val ManifestRe = """v(\d+)\.manifest""".r

  /** All committed versions, ascending. A data/v* dir without a manifest
    * (crashed commit) is NOT a version.
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val md = new Path(s"$dir/manifest")
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq.flatMap(_.getPath.getName match {
      case ManifestRe(n) => Some(n.toLong)
      case _ => None
    }).sorted
  }

  def currentVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  /** The live files of `version` (default: current). */
  def files(spark: SparkSession, dir: String, version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $dir"))
    val p = manifestPath(dir, v)
    val f = fs(spark, dir)
    require(f.exists(p), s"version $v does not exist under $dir")
    val len = f.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = f.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, "UTF-8").split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Read a PINNED snapshot (default: current). The plan scans a fixed
    * file list, so later commits/compactions are invisible to it.
    */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame =
    spark.read.parquet(files(spark, dir, version): _*)

  /** Write `df` as the data files of version `v` and return their paths. */
  private def writeData(spark: SparkSession, df: DataFrame, dir: String,
      v: Long): Seq[String] = {
    val out = s"$dir/data/" + f"v$v%05d"
    df.write.mode("overwrite").parquet(out)
    val f = fs(spark, dir)
    f.listStatus(new Path(out))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.toSeq
  }

  /** Atomically publish `fileList` as version `v`: tmp write + rename. */
  private def commitManifest(spark: SparkSession, dir: String, v: Long,
      fileList: Seq[String]): Unit = {
    val f = fs(spark, dir)
    val target = manifestPath(dir, v)
    f.mkdirs(target.getParent)
    require(!f.exists(target), s"version $v already committed (single-writer contract)")
    val tmp = new Path(target.toString + "__tmp")
    val out = f.create(tmp, true)
    try out.write((fileList.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"cannot publish manifest for version $v")
  }

  /** Create version 1 from `df`. Pre-shape the frame for later pruning
    * (e.g. `df.repartitionByRange(n, col(key))` for tight per-file key
    * ranges) — create writes it as given.
    */
  def create(spark: SparkSession, df: DataFrame, dir: String): Commit = {
    require(currentVersion(spark, dir).isEmpty, s"table already exists under $dir")
    val fl = writeData(spark, df, dir, 1L)
    commitManifest(spark, dir, 1L, fl)
    Commit(1L, fl, 0)
  }

  /** File-pruned latest-wins MERGE of `changes` (tombstones honored via
    * `deleteCol`) into the current version, committed as version n+1:
    *
    *  1. per-file [min,max] of `keyCol` from footers only
    *     ([[SkippingIndex.statsRows]]);
    *  2. a file is AFFECTED iff some change key falls inside its range
    *     (stats × distinct-keys broadcast range join; files with no
    *     stats are conservatively affected);
    *  3. merge = [[Upsert.latestWins]] over (affected files' rows ∪
    *     changes) with versions kept, written as new files;
    *  4. manifest n+1 = untouched files ++ new files.
    *
    * Change rows whose keys land in NO existing file (pure inserts) are
    * in the merge input by construction. `keyCol` must be INT32/INT64
    * (the footer-stats surface).
    */
  def upsert(spark: SparkSession, dir: String, changes: DataFrame,
      keyCol: String, versionCol: String, tieCol: String,
      deleteCol: String = "_deleted"): Commit = {
    val v = currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no table under $dir — create() first"))
    val live = files(spark, dir, Some(v))
    val stats = SkippingIndex.statsRows(spark, live, Seq(keyCol))
    val keys = changes.select(col(keyCol).cast("long").as("__k")).distinct()
    // the STATS side is the small one (a row per file) — broadcast it and
    // stream the change keys through, so the file selection scales with
    // changes, not files × keys; distinct file paths are the collected
    // FILE LIST (the standard driver-side index footprint)
    val affected = keys.join(broadcast(stats),
        col(s"${keyCol}_min").isNull || col(s"${keyCol}_max").isNull ||
          (col("__k") >= col(s"${keyCol}_min") && col("__k") <= col(s"${keyCol}_max")))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val untouched = live.filterNot(affected.contains)
    val base =
      if (affected.isEmpty)
        // no file intersects: inserts only — merge over an empty base
        // with the table's schema
        read(spark, dir, Some(v)).limit(0)
      else spark.read.parquet(affected.toSeq.sorted: _*)
    val merged = Upsert.latestWins(base, changes, Seq(keyCol),
      versionCol, tieCol, deleteCol, keepVersionCol = true)
    val fl = writeData(spark, merged, dir, v + 1)
    val all = (untouched ++ fl).sorted
    commitManifest(spark, dir, v + 1, all)
    Commit(v + 1, all, untouched.length)
  }

  /** Rewrite the CURRENT version's rows into ~ceil(n/targetRecords)
    * bounded files ([[Layout.compact]]'s arithmetic), committed as a new
    * version. Readers pinned to older versions are untouched — their
    * files are still on disk until [[vacuum]].
    *
    * `zOrderOn = Some((x, y, bits))` makes the rewrite a
    * [[Layout]] z-order CLUSTERING pass: files become contiguous Morton
    * intervals with tight per-file bounding boxes in both columns — the
    * layout maintenance that makes [[attachStats]]/[[scanBetween]]
    * actually skip.
    */
  def compact(spark: SparkSession, dir: String, targetRecords: Long,
      zOrderOn: Option[(String, String, Int)] = None): Commit = {
    val v = currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no table under $dir"))
    val df = read(spark, dir, Some(v))
    val n = df.count()
    val nf = math.max(1L, (n + targetRecords - 1) / targetRecords).toInt
    val shaped = zOrderOn match {
      case Some((x, y, bits)) =>
        Layout.withZValue(df, x, y, bits)
          .repartitionByRange(nf, col("z"))
          .sortWithinPartitions("z")
          .drop("z")
      case None => df.repartition(nf)
    }
    val out = s"$dir/data/" + f"v${v + 1}%05d"
    shaped.write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecords).parquet(out)
    val f = fs(spark, dir)
    val fl = f.listStatus(new Path(out))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.toSeq
    commitManifest(spark, dir, v + 1, fl)
    Commit(v + 1, fl, 0)
  }

  private def statsDir(dir: String, v: Long): String =
    s"$dir/stats/" + f"v$v%05d"

  /** Build the [[SkippingIndex]] stats table for a version's live files
    * (footer-only) at the version-scoped stats location — each snapshot
    * gets its own index, because each snapshot is a different file set.
    */
  def attachStats(spark: SparkSession, dir: String, cols: Seq[String],
      version: Option[Long] = None): Unit = {
    val v = version.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"no table under $dir"))
    SkippingIndex.statsRows(spark, files(spark, dir, Some(v)), cols)
      .coalesce(1).write.mode("overwrite").parquet(statsDir(dir, v))
  }

  /** Range scan of a pinned snapshot, consulting its attached stats
    * index automatically when present (file prune + residual filter —
    * [[SkippingIndex.scanBetween]]'s contract on a versioned file set).
    * Results always equal the full-snapshot filter.
    */
  def scanBetween(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long,
      version: Option[Long] = None): (DataFrame, Option[SkippingIndex.Prune]) = {
    val v = version.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"no table under $dir"))
    val sp = new Path(statsDir(dir, v))
    val f = fs(spark, dir)
    val covered = f.exists(sp) && {
      val s = spark.read.parquet(sp.toString)
      s.columns.contains(s"${column}_min") && s.columns.contains(s"${column}_max")
    }
    if (!covered)
      (read(spark, dir, Some(v)).filter(col(column).between(lo, hi)), None)
    else {
      val p = SkippingIndex.prune(spark, sp.toString, column, lo, hi)
      if (p.filesKept == 0)
        (read(spark, dir, Some(v)).filter(col(column).between(lo, hi)).limit(0), Some(p))
      else
        (spark.read.parquet(p.kept: _*).filter(col(column).between(lo, hi)), Some(p))
    }
  }

  /** Keep the table current from a CDC change stream: every micro-batch
    * is applied as one [[upsert]] commit (the change rows carry
    * key/payload/version and optionally `_deleted` tombstones) — the
    * foreachBatch face, like [[DedupStore.maintainStream]] for the hash
    * store and SketchRollup's for the sketch stores.
    *
    * Crash contract: application is at-least-once but CONTENT-IDEMPOTENT
    * — latest-wins over the same (key, version) change rows re-applied
    * against the already-updated table selects the same winners (updates
    * and inserts reproduce themselves; a tombstone re-deletes an absent
    * key, a no-op), so a replayed batch can only burn a version number,
    * never produce a wrong row. Spec'd by applying one batch twice and
    * hashing the table. Single maintainer, like every incremental-view
    * maintainer here.
    */
  def maintainStream(spark: SparkSession, changesDir: String,
      schema: org.apache.spark.sql.types.StructType,
      tableDir: String, keyCol: String, versionCol: String, tieCol: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 1): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(changesDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          upsert(batch.sparkSession, tableDir, batch, keyCol, versionCol, tieCol)
        ()
      }
      .start()

  /** Drop every version but the last `keepLast`, and delete data files no
    * retained manifest references (orphans from crashed commits
    * included). Returns the deleted file paths. Run only when no reader
    * is pinned below the retention horizon — the same contract as every
    * lakehouse VACUUM.
    */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[String] = {
    require(keepLast >= 1, "keepLast >= 1")
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepLast))
    val referenced = keep.flatMap(k => files(spark, dir, Some(k))).toSet
    val f = fs(spark, dir)
    val dataDir = new Path(s"$dir/data")
    val onDisk =
      if (!f.exists(dataDir)) Seq.empty[String]
      else f.listStatus(dataDir).filter(_.isDirectory).toSeq
        .flatMap(d => f.listStatus(d.getPath).toSeq)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    val doomed = onDisk.filterNot(referenced.contains).sorted
    doomed.foreach(p => f.delete(new Path(p), false))
    drop.foreach { v =>
      f.delete(manifestPath(dir, v), false)
      f.delete(new Path(statsDir(dir, v)), true) // version-scoped index goes with it
    }
    doomed
  }
}

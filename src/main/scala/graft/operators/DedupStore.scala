package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental exact-dedup maintenance over a persisted content-hash
  * store — the continuous-ingest face of [[Dedup.exact]], and the
  * relational sibling of [[graft.streaming.SketchRollup]]'s
  * incremental-view pattern: a corpus that arrives in batches is
  * deduplicated against everything seen so far WITHOUT ever rescanning
  * history.
  *
  * The store is a MANIFEST-VERSIONED parquet table ([[FilesetLog]] — the
  * [[ManifestCommit]] pattern [[SnapshotTable]] and [[PqIndex]] use) of
  * (content_hash, keep_id, arrival_batch): one row per distinct content
  * hash ever seen, its keeper (first arrival wins; lowest id within the
  * arriving batch), and the batch that first contributed it. Each ingest
  * costs one anti-join of the NEW batch's hashes against the store plus
  * one new fileset + manifest commit — O(batch + store-join), never
  * O(history) raw-text rescans, and committed filesets are immutable
  * (a crash before the manifest publish leaves an invisible orphan for
  * [[vacuumStore]], never a half-visible append).
  *
  * Scale notes (100 TB): the store carries 40-byte hash rows, ~1/1000th
  * of the raw corpus; the per-batch anti-join is hash-keyed, so each
  * fileset is written hash-partitioned by content_hash and the batch
  * pre-partitions the same way. One fileset lands per ingest, so a
  * long-lived store accumulates small files — [[compactStore]] rewrites
  * the CURRENT version into ceil(n/target) hash-partitioned files as a
  * new commit (readers pinned to older versions undisturbed; old
  * filesets reclaimed by [[vacuumStore]]). Single-maintainer (one writer
  * at a time), like every incremental-view maintainer; a streaming
  * source plugs in through `foreachBatch(ingest(_, _, tag = batchId))`
  * exactly as SketchRollup.maintainStream does for sketches.
  */
object DedupStore {

  private val Kind = "D"

  /** Ingest one arrival batch: survivors are the rows whose content hash
    * has never been seen (first-arrival-wins; within the batch the
    * lowest id wins), committed to the store as a new version tagged
    * with `tag`. Returns the batch's survivor rows (content_hash,
    * keep_id, arrival_batch), MATERIALIZED (localCheckpoint) before the
    * store commit so the returned frame cannot observe its own write.
    *
    * Replay contract (crash-recovery at-least-once): history EXCLUDES
    * any fileset already committed under this `tag`, and the commit
    * supersedes those lines — so a replayed batch recomputes the same
    * survivors and the store content stays exactly-once, whatever the
    * crash point (the superseded fileset becomes a vacuumable orphan).
    */
  def ingest(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, storePath: String, tag: Long): DataFrame = {
    require(tag >= 0, s"ingest tags are >= 0 (got $tag); " +
      s"${FilesetLog.CompactedTag} is reserved for compaction")
    val intra = batch
      .select(col(idCol).cast("long").as("keep_id"),
        sha2(col(textCol), 256).as("content_hash"))
      .groupBy("content_hash").agg(min("keep_id").as("keep_id"))
    val cur = FilesetLog.current(spark, storePath)
    val all = cur.map(FilesetLog.entries(spark, storePath, _)).getOrElse(Seq.empty)
    val hist = all.filterNot(_.tag == tag) // replay: own earlier commit superseded
    val fresh =
      (if (hist.nonEmpty)
         intra.join(FilesetLog.read(spark, hist.map(_.file)).select("content_hash"),
           Seq("content_hash"), "left_anti")
       else intra)
        .withColumn("arrival_batch", lit(tag))
        .localCheckpoint(true)
    // hash-partitioned fileset: at scale this is the bucketed-by-hash
    // layout that keeps the next ingest's anti-join co-located
    val v = cur.getOrElse(0L)
    val files = FilesetLog.writeFileset(
      fresh.repartition(col("content_hash")),
      s"$storePath/data/" + f"v${v + 1}%05d" + s"_${FilesetLog.nonce()}")
    if (files.nonEmpty || hist.length != all.length)
      FilesetLog.commit(spark, storePath, v + 1,
        hist ++ files.map(FilesetLog.Entry(Kind, tag, _)))
    fresh
  }

  /** The store as a frame: one (content_hash, keep_id, arrival_batch)
    * row per distinct content ever ingested — the CURRENT committed
    * version's fixed file list (later commits invisible to this frame).
    */
  def read(spark: SparkSession, storePath: String): DataFrame = {
    val es = FilesetLog.currentEntries(spark, storePath)
    require(es.nonEmpty, s"no committed store under $storePath — ingest first")
    FilesetLog.read(spark, es.map(_.file))
  }

  /** Survivor view of a full corpus against the store: rows whose id is
    * a keeper. The serving-side join is hash-keyed and narrow.
    */
  def survivors(spark: SparkSession, corpus: DataFrame, idCol: String,
      storePath: String): DataFrame =
    corpus.join(read(spark, storePath).select(col("keep_id").as(idCol)), idCol)

  /** Rewrite the CURRENT version's rows into ceil(n/targetRecords)
    * files, still hash-partitioned by content_hash (the next ingest's
    * anti-join stays co-located), committed as a new version — the
    * small-file maintenance a per-batch-fileset store needs after ~10³
    * ingests. Content-invisible (spec'd: identical store rows and
    * survivors); crash-safe like every commit here (new fileset first,
    * atomic manifest publish second, old files live until
    * [[vacuumStore]]). Run by the single maintainer between ingests.
    */
  def compactStore(spark: SparkSession, storePath: String,
      targetRecords: Long): Long = {
    val v = FilesetLog.current(spark, storePath).getOrElse(
      throw new IllegalArgumentException(s"no store under $storePath"))
    val df = FilesetLog.read(spark,
      FilesetLog.entries(spark, storePath, v).map(_.file))
    val n = df.count()
    val nf = math.max(1L, (n + targetRecords - 1) / targetRecords).toInt
    val files = FilesetLog.writeFileset(
      df.repartition(nf, col("content_hash")),
      s"$storePath/data/" + f"v${v + 1}%05d" + s"_${FilesetLog.nonce()}")
    FilesetLog.commit(spark, storePath, v + 1,
      files.map(FilesetLog.Entry(Kind, FilesetLog.CompactedTag, _)))
    v + 1
  }

  /** Drop old store versions and their unreferenced filesets (crashed or
    * superseded ingests included) — [[FilesetLog.vacuum]]'s grace-period
    * contract. Returns deleted paths.
    */
  def vacuumStore(spark: SparkSession, storePath: String, keepLast: Int = 1,
      graceMs: Long = SnapshotTable.DefaultVacuumGraceMs): Seq[String] =
    FilesetLog.vacuum(spark, storePath, Seq("data"), keepLast, graceMs)

  /** Keep the store current from a file-arrival document stream: every
    * micro-batch dedups against the store and commits its genuinely-new
    * hashes, tagged with the checkpointed batch id (arrival order is
    * recorded in the store). Replay-safe: a re-run batch's history
    * excludes and supersedes its own earlier commit (see [[ingest]]), so
    * a committed batch is never double-recorded — the relational sibling
    * of SketchRollup.maintainStream's crash contract.
    */
  def maintainStream(spark: SparkSession, docsDir: String,
      schema: org.apache.spark.sql.types.StructType,
      idCol: String, textCol: String,
      storePath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId rides through as-is: arrival_batch is BIGINT in the
        // store, so checkpoints with large batch ids never wrap negative
        ingest(batch.sparkSession, batch, idCol, textCol, storePath, batchId)
        ()
      }
      .start()
}

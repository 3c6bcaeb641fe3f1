package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental exact-dedup maintenance over a persisted content-hash
  * store — the continuous-ingest face of [[Dedup.exact]], and the
  * relational sibling of [[graft.streaming.SketchRollup]]'s
  * incremental-view pattern: a corpus that arrives in batches is
  * deduplicated against everything seen so far WITHOUT ever rescanning
  * history.
  *
  * The store is a parquet table of (content_hash, keep_id,
  * arrival_batch): one row per distinct content hash ever seen, its
  * keeper (first arrival wins; lowest id within the arriving batch),
  * and the batch that first contributed it. Each ingest costs one
  * anti-join of the NEW batch's hashes against the store plus an append
  * of the genuinely-new rows — O(batch + store-join), never O(history)
  * raw-text rescans, and the store is never rewritten (append-only, so
  * a crash between job attempts leaves at worst a committed prefix).
  *
  * Scale notes (100 TB): the store carries 40-byte hash rows, ~1/1000th
  * of the raw corpus; the per-batch anti-join is hash-keyed, so writing
  * the store bucketed by content_hash (the q44 `writeBucketed` layout)
  * and pre-partitioning the batch the same way makes it shuffle-free on
  * the store side. Single-maintainer (one writer at a time), like every
  * incremental-view maintainer; a streaming source plugs in through
  * `foreachBatch(ingest(_, _, tag = batchId))` exactly as
  * SketchRollup.maintainStream does for sketches.
  */
object DedupStore {

  /** Ingest one arrival batch: survivors are the rows whose content hash
    * has never been seen (first-arrival-wins; within the batch the
    * lowest id wins), appended to the store tagged with `tag`. Returns
    * the batch's survivor rows (content_hash, keep_id, arrival_batch),
    * MATERIALIZED (localCheckpoint) before the store append so the
    * returned frame cannot observe its own write.
    */
  def ingest(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, storePath: String, tag: Long): DataFrame = {
    val intra = batch
      .select(col(idCol).cast("long").as("keep_id"),
        sha2(col(textCol), 256).as("content_hash"))
      .groupBy("content_hash").agg(min("keep_id").as("keep_id"))
    val live = new Path(storePath)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val fresh =
      (if (fs.exists(live))
         intra.join(spark.read.parquet(storePath).select("content_hash"),
           Seq("content_hash"), "left_anti")
       else intra)
        .withColumn("arrival_batch", lit(tag))
        .localCheckpoint(true)
    // hash-partitioned append: at scale this is the bucketed-by-hash
    // layout that keeps the next ingest's anti-join co-located
    fresh.repartition(col("content_hash"))
      .write.mode("append").parquet(storePath)
    fresh
  }

  /** The store as a frame: one (content_hash, keep_id, arrival_batch)
    * row per distinct content ever ingested.
    */
  def read(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)

  /** Survivor view of a full corpus against the store: rows whose id is
    * a keeper. The serving-side join is hash-keyed and narrow.
    */
  def survivors(spark: SparkSession, corpus: DataFrame, idCol: String,
      storePath: String): DataFrame =
    corpus.join(read(spark, storePath).select(col("keep_id").as(idCol)), idCol)

  /** Keep the store current from a file-arrival document stream: every
    * micro-batch dedups against the store and appends its genuinely-new
    * hashes, tagged with the checkpointed batch id (arrival order is
    * recorded in the store). Replay-safe: a re-run batch finds its
    * hashes already present and the anti-join appends nothing, so a
    * committed batch is never double-recorded — the relational sibling
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

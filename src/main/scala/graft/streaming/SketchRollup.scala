package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental maintenance of a persisted sketch table — the streaming
  * half of the mergeable-summaries story (q50/q52/q53 build and merge
  * sketches in one batch job; this keeps the SAME store current as data
  * ARRIVES, without ever rescanning old raw data).
  *
  * The store is a tiny parquet table (day, sk, n_events): one
  * DataSketches HLL blob per day. Each incoming batch contributes its
  * own per-day partial sketches, which merge into the store by
  * hll_union_agg — mergeability makes arrival batching invisible: the
  * final store is the same whether the corpus arrived in 1 batch or
  * 1000 (the stream_sketch_rollup gate proves exactly that against the
  * one-shot DuckDB truth).
  *
  * At 100 TB the raw history is append-only and cold; the store is
  * KB-per-day and answers "distinct users over any day range" by
  * merging a handful of blobs. Each update costs one scan of the NEW
  * batch only — O(batch + store), never O(history).
  *
  * Store updates use the same crash-safe swap as
  * [[graft.sources.Tables.compact]] (write tmp → move live aside →
  * promote → drop old): a crash at any point leaves a complete store on
  * disk. Single-maintainer (one writer), like every incremental-view
  * maintainer.
  */
object SketchRollup {

  /** Merge one arrival batch (must carry `day` and `user_id`) into the
    * store at `storePath`. Reads the store (KB-sized), unions the
    * batch's partial sketches, re-merges per day, swaps.
    */
  def mergeInto(spark: SparkSession, batch: DataFrame, storePath: String): Unit =
    mergeKeyedInto(spark, batch, Seq("day"), "user_id", storePath)

  /** The general per-KEYS form of [[mergeInto]]: one HLL sketch of
    * `valueCol` per distinct `keyCols` tuple (e.g. (cohort_day,
    * day_offset) for a retention triangle —
    * [[graft.operators.EventAnalytics.cohortRetentionFromSketches]]).
    * Same crash-safe swap, same mergeability contract: the final store
    * is the same whether the activity arrived in 1 batch or 1000.
    */
  def mergeKeyedInto(spark: SparkSession, batch: DataFrame,
      keyCols: Seq[String], valueCol: String, storePath: String): Unit = {
    require(keyCols.nonEmpty, "mergeKeyedInto needs at least one key column")
    val incoming = batch.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sk"),
        count(lit(1)).as("n_events"))
    mergeStore(spark, incoming, storePath) { existing =>
      existing.groupBy(keyCols.map(col): _*)
        .agg(hll_union_agg(col("sk")).as("sk"),
          sum("n_events").as("n_events"))
    }
  }

  /** KLL-quantile sibling of [[mergeInto]] — the QUANTILE member of the
    * mergeable trio kept current as data arrives (q52 builds the same
    * store in one batch job). `batch` must carry `day` and `v`.
    */
  def mergeQuantilesInto(spark: SparkSession, batch: DataFrame,
      storePath: String): Unit = {
    import graft.functions.expr.KllFunctions
    val incoming = batch.groupBy("day")
      .agg(KllFunctions.kllAgg(col("v")).as("sk"),
        count(lit(1)).as("n_events"))
    mergeStore(spark, incoming, storePath) { existing =>
      existing.groupBy("day")
        .agg(KllFunctions.kllMerge(col("sk")).as("sk"),
          sum("n_events").as("n_events"))
    }
  }

  /** Frequent-items sibling of [[mergeInto]] — the FREQUENCY member of
    * the trio (q53 builds the same store in one batch job). `batch` must
    * carry `day` and `user_id`.
    */
  def mergeTopkInto(spark: SparkSession, batch: DataFrame,
      storePath: String): Unit = {
    import graft.functions.expr.FreqFunctions
    val incoming = batch.groupBy("day")
      .agg(FreqFunctions.freqAgg(col("user_id")).as("sk"),
        count(lit(1)).as("n_events"))
    mergeStore(spark, incoming, storePath) { existing =>
      existing.groupBy("day")
        .agg(FreqFunctions.freqMerge(col("sk")).as("sk"),
          sum("n_events").as("n_events"))
    }
  }

  /** Shared store-update shape: union the incoming per-day partials with
    * the live store (when one exists), re-merge via `remerge`, then
    * crash-safe swap (write tmp → move live aside → promote → drop old —
    * a crash at any point leaves a complete store on disk).
    */
  private def mergeStore(spark: SparkSession, incoming: DataFrame,
      storePath: String)(remerge: DataFrame => DataFrame): Unit = {
    val live = new Path(storePath)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val merged =
      if (!fs.exists(live)) incoming
      else remerge(spark.read.parquet(storePath).unionByName(incoming))
    val tmp = new Path(storePath + "__tmp")
    val old = new Path(storePath + "__old")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(live) && !fs.rename(live, old))
      throw new java.io.IOException(s"sketch store: cannot move $live aside")
    if (!fs.rename(tmp, live)) {
      if (fs.exists(old) && !fs.rename(old, live))
        throw new java.io.IOException(
          s"sketch store: cannot promote $tmp AND rollback failed — " +
            s"original intact at $old, restore manually")
      throw new java.io.IOException(s"sketch store: cannot promote $tmp (rolled back)")
    }
    fs.delete(old, true)
  }

  /** Read the store and answer per-day estimates plus the merged-range
    * row — the serving query: merges persisted blobs, no raw scan.
    */
  def serve(spark: SparkSession, storePath: String): DataFrame = {
    val sk = spark.read.parquet(storePath)
    val perDay = sk.select(col("day"), col("n_events"),
      hll_sketch_estimate(col("sk")).as("est_users"))
    val all = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
        sum("n_events").as("n_events"))
      .select(lit("ALL").as("day"), col("n_events"), col("est_users"))
    perDay.unionByName(all).orderBy("day")
  }

  /** Keep the store current from a file-arrival stream: every micro-batch
    * merges into the store via foreachBatch — exactly-once per batch is
    * inherited from the store swap being idempotent-at-rest plus Spark's
    * checkpointed batch IDs (a replayed batch re-merges the same rows —
    * HLL union is NOT idempotent per duplicate insert, but replay only
    * happens when the previous attempt failed BEFORE the swap promoted,
    * so the store never double-counts a promoted batch).
    */
  def maintainStream(spark: SparkSession, eventsDir: String,
      schema: org.apache.spark.sql.types.StructType,
      storePath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeInto(batch.sparkSession, batch, storePath)
      }
      .start()
}

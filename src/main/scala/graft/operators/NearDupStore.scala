package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H}
import graft.functions.expr.GraftFunctions

/** Incremental NEAR-dup maintenance over a persisted MinHash-LSH store —
  * the near-duplicate sibling of [[DedupStore]] (which is exact-hash
  * only): a corpus arriving in batches is checked for near-duplicates
  * against everything seen so far WITHOUT rescanning history.
  *
  * The store is two append-only parquet tables:
  *  - `buckets` (band, key, id): the LSH band index, written
  *    hash-partitioned by (band, key) so the per-batch candidate join is
  *    co-located at scale (the q44 bucketed-layout argument);
  *  - `sigs` (id, sh, sz): each document's sorted 8-byte shingle hashes —
  *    ~a tenth of the raw text, and the ONLY thing verification needs,
  *    so raw history is never re-read.
  *
  * Each ingest: band the NEW docs with the same deterministic
  * (shingle → minhash → band) scheme as [[Dedup.minhashLsh]], join the
  * new band rows against old + new band rows (old-old pairs were
  * emitted by earlier ingests; a pair is emitted exactly once, by the
  * batch its LATER member arrives in), verify candidates by exact
  * shingle-set Jaccard, and append the new rows to the store. Cost is
  * O(batch + matched buckets), never O(history). Because the banding is
  * a pure function of the text, the UNION of per-batch outputs equals
  * the one-shot [[Dedup.minhashLsh]] result on the full corpus (gated:
  * dedup_incremental_minhash against the brute-force Jaccard oracle).
  *
  * `maxBucket` caps candidate generation per (band, key) at the bucket's
  * CURRENT combined size — under incremental arrival a bucket crosses
  * the cap at some batch, so capped runs are arrival-dependent (the cap
  * exists to bound degenerate keys, not for exact parity; the gate runs
  * uncapped like dedup_simhash's).
  *
  * Id contract: ids must be unique WITHIN a batch (they are document
  * keys); across batches the store is FIRST-ARRIVAL-WINS like
  * [[DedupStore]] — an id already present in history is dropped from the
  * incoming batch (anti-join against the stored signature ids, an
  * id-only column-pruned read), so a re-delivered document can neither
  * store a second signature row nor duplicate verify-join output for
  * later pairs involving it.
  *
  * Crash contract: the store is written into BATCH-SCOPED partition
  * directories (`buckets/batch=<tag>/`, `sigs/batch=<tag>/`) with
  * per-directory overwrite, so a REPLAYED batch rewrites exactly its own
  * rows — the store can never hold duplicate signature rows (which would
  * duplicate verify-join output for every later pair). Single
  * maintainer; [[maintainStream]] is the foreachBatch face with the
  * checkpointed batch id as the tag, emitting each batch's pairs into a
  * batch-scoped pairs directory the same overwrite-idempotent way.
  */
object NearDupStore {

  private def prep(batch: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int): DataFrame =
    batch.select(
      col(idCol).cast("long").as("id"),
      H.shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sz", size(col("sh")))
      .withColumn("sig", GraftFunctions.minhashSignature(col("sh"), numHashes))

  /** Ingest one arrival batch; returns the batch's verified near-dup
    * pairs (a, b, jaccard) — all (new, new) and (new, old) pairs, a < b,
    * MATERIALIZED (localCheckpoint) before the store append so the
    * returned frame cannot observe its own write.
    */
  def ingest(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, storePath: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucket: Int = Int.MaxValue,
      tag: Long = -1L): DataFrame = {
    val rows = numHashes / bands
    val bucketsDir = s"$storePath/buckets"
    val sigsDir = s"$storePath/sigs"
    val fs = new Path(storePath).getFileSystem(spark.sessionState.newHadoopConf())
    val hasStore = fs.exists(new Path(sigsDir))
    // batch tag: explicit (streaming batch id) or the next sequential one —
    // the batch-scoped directory it names is what makes replay idempotent
    val batchTag =
      if (tag >= 0L) tag
      else if (!hasStore) 0L
      else fs.listStatus(new Path(sigsDir)).toSeq
        .flatMap(_.getPath.getName match {
          case s if s.startsWith("batch=") => Some(s.drop(6).toLong)
          case _ => None
        }).foldLeft(-1L)(math.max) + 1L

    // first-arrival-wins: drop ids already in history (own replayed
    // partition excluded) — a re-delivered document must not add a second
    // signature row, which would duplicate every later verify join it
    // participates in. Id-only column-pruned read of the sig store. The
    // join key is the EXPLICIT long cast on BOTH sides (prep's id
    // normalization): a raw string idCol against the store's bigint
    // would coerce to double and silently collide ids above 2^53.
    val fresh =
      if (hasStore)
        batch.join(spark.read.parquet(sigsDir)
            .filter(col("batch") =!= batchTag)
            .select(col("id").cast("long").as("__seen_id")),
          batch(idCol).cast("long") === col("__seen_id"), "left_anti")
      else batch
    val newDocs = prep(fresh, idCol, textCol, shingleSize, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBuckets = newDocs.select(col("id"),
      explode(H.lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("id"))
    // history EXCLUDES this batch's own partition: a replayed batch may
    // have written it before crashing, and counting those rows again
    // would duplicate candidates and verify rows (partition-pruned read)
    val oldBuckets =
      if (hasStore) Some(spark.read.parquet(bucketsDir)
        .filter(col("batch") =!= batchTag).select("band", "key", "id"))
      else None
    val allBuckets = oldBuckets.fold(newBuckets)(_ unionByName newBuckets)
    // cap degenerate keys at their current combined size
    val capped =
      if (maxBucket == Int.MaxValue) allBuckets
      else {
        val small = allBuckets.groupBy("band", "key")
          .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= maxBucket)
          .select("band", "key")
        allBuckets.join(small, Seq("band", "key"), "left_semi")
      }
    // candidates: one side NEW, the other side anything — old-old pairs
    // were already emitted by the batch their later member arrived in
    val cand = newBuckets.select(col("band"), col("key"), col("id").as("na"))
      .join(capped.select(col("band"), col("key"), col("id").as("nb")),
        Seq("band", "key"))
      .filter(col("na") =!= col("nb"))
      .select(least(col("na"), col("nb")).as("a"),
        greatest(col("na"), col("nb")).as("b"))
      .distinct()
    val allSigs =
      if (hasStore) spark.read.parquet(sigsDir)
        .filter(col("batch") =!= batchTag)
        .select("id", "sh", "sz").unionByName(newDocs.select("id", "sh", "sz"))
      else newDocs.select("id", "sh", "sz")
    val pairs = cand
      .join(allSigs.select(col("id").as("a"), col("sh").as("a_sh"), col("sz").as("a_sz")), "a")
      .join(allSigs.select(col("id").as("b"), col("sh").as("b_sh"), col("sz").as("b_sz")), "b")
      .withColumn("inter",
        GraftFunctions.sortedIntersectSize(col("a_sh"), col("b_sh")).cast("double"))
      .withColumn("jaccard", col("inter") / (col("a_sz") + col("b_sz") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
      .localCheckpoint(true)
    // store write AFTER the pairs materialized, into the batch-scoped
    // partition dirs with OVERWRITE (replay rewrites its own rows only);
    // buckets co-located by (band, key)
    newBuckets.repartition(col("band"), col("key"))
      .write.mode("overwrite").parquet(s"$bucketsDir/batch=$batchTag")
    newDocs.select("id", "sh", "sz")
      .write.mode("overwrite").parquet(s"$sigsDir/batch=$batchTag")
    newDocs.unpersist()
    pairs
  }

  /** Keep the store current from a file-arrival document stream: every
    * micro-batch runs one [[ingest]] tagged with the checkpointed batch
    * id, and its verified pairs land in `<storePath>/pairs/batch=<id>/`.
    * Replay-safe end to end: a re-run batch recomputes against history
    * that EXCLUDES its own partition and overwrites exactly its own
    * store and pairs directories — at-least-once execution, exactly-once
    * store and pair content.
    */
  def maintainStream(spark: SparkSession, docsDir: String,
      schema: org.apache.spark.sql.types.StructType,
      idCol: String, textCol: String, storePath: String, checkpoint: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8,
      maxFilesPerTrigger: Int = 1): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingest(batch.sparkSession, batch, idCol, textCol, storePath,
          shingleSize, numHashes, bands, threshold, tag = batchId)
          .write.mode("overwrite").parquet(s"$storePath/pairs/batch=$batchId")
        ()
      }
      .start()

  /** Every verified pair the maintainer has emitted so far. */
  def pairs(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(s"$storePath/pairs")
      .select("a", "b", "jaccard")
}

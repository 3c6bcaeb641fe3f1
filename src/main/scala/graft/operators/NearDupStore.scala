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
  * uncapped like dedup_simhash's). Single-maintainer batch API; wire a
  * stream through `foreachBatch(ingest(...))` with an idempotent
  * pair-sink if at-least-once emission is acceptable.
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
      threshold: Double = 0.8, maxBucket: Int = Int.MaxValue): DataFrame = {
    val rows = numHashes / bands
    val bucketsDir = s"$storePath/buckets"
    val sigsDir = s"$storePath/sigs"
    val fs = new Path(storePath).getFileSystem(spark.sessionState.newHadoopConf())
    val hasStore = fs.exists(new Path(sigsDir))

    val newDocs = prep(batch, idCol, textCol, shingleSize, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBuckets = newDocs.select(col("id"),
      explode(H.lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("id"))
    val allBuckets =
      if (hasStore) spark.read.parquet(bucketsDir).unionByName(newBuckets)
      else newBuckets
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
    // append AFTER the pairs materialized; buckets co-located by (band,key)
    newBuckets.repartition(col("band"), col("key"))
      .write.mode("append").parquet(bucketsDir)
    newDocs.select("id", "sh", "sz")
      .write.mode("append").parquet(sigsDir)
    newDocs.unpersist()
    pairs
  }
}

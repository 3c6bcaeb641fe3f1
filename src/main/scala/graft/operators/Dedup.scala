package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every near-dup variant is LSH-blocked — candidates come
  * from a groupBy/join on band keys (O(n) shuffle on small keys), never an
  * all-pairs cross join. Bucket sizes are capped (`maxBucket`) so one
  * degenerate key (e.g. the empty document) cannot produce a quadratic
  * bucket on a 100 TB corpus; at that scale the capped buckets are exactly
  * the boilerplate/spam you'd drop anyway.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per sha2(content) group. Hash-based
    * groupBy shuffles only (hash, id) pairs, not the documents.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol), 256).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Survivor set of exact dedup: all rows whose id is a keeper. */
  def exactSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exact(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, idCol) // broadcast-able when dup rate is high
  }

  /** Candidate pairs sharing >=1 LSH band of a MinHash signature, verified
    * by exact shingle-set Jaccard >= `threshold`. Returns (a, b, jaccard)
    * with a < b, deterministic.
    */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    val docs = df.select(
      col(idCol).as("id"),
      H.shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", H.minhashSignature(col("sh"), numHashes))
    val banded = docs.select(col("id"), col("sh"),
      explode(H.lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.key"))
    pairsFromBuckets(banded, maxBucket)
      .withColumn("jaccard", jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
      .distinct()
      .orderBy("a", "b")
  }

  /** SimHash near-dup: 64-bit signatures, banded into `bands` bit-slices
    * (two docs within hamming < bands MUST share a band — pigeonhole), then
    * exact hamming <= maxHamming verification via one codegen'd
    * bit_count(xor).
    */
  def simhash(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4, maxBucket: Int = 1000): DataFrame = {
    val docs = df.select(col(idCol).as("id"), H.simhash64(col(textCol)).as("sig"))
    val banded = docs.select(col("id"), col("sig"),
      explode(H.simhashBands(col("sig"), bands)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("id").as("a"), col("sig").as("a_sig"))
    val b = banded.select(col("band"), col("key"), col("id").as("b"), col("sig").as("b_sig"))
    a.join(b, Seq("band", "key")).filter(col("a") < col("b"))
      .withColumn("hamming", H.hamming64(col("a_sig"), col("b_sig")))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
      .distinct()
      .orderBy("a", "b")
  }

  /** n-gram Jaccard similarity join without LSH approximation: explode
    * distinct shingles, join on shingle (inverted index), count
    * co-occurrences, Jaccard = |∩| / (|A|+|B|-|∩|). `maxDocFreq` drops
    * stop-shingles (present in > that many docs) — the standard prefix
    * filter that keeps the inverted index join linear on skewed corpora.
    */
  def ngramJaccard(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Long = 10000L): DataFrame = {
    val docs = df.select(col(idCol).as("id"), H.shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = docs.select(col("id"), col("sz"), explode(col("sh")).as("shingle"))
    val keepShingle = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq && col("df") >= 2)
      .select("shingle")
    val filtered = inv.join(keepShingle, "shingle")
    val a = filtered.select(col("shingle"), col("id").as("a"), col("sz").as("a_sz"))
    val b = filtered.select(col("shingle"), col("id").as("b"), col("sz").as("b_sz"))
    a.join(b, Seq("shingle")).filter(col("a") < col("b"))
      .groupBy("a", "b", "a_sz", "b_sz")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("a", "b")
  }

  /** Embedding near-dup: random-hyperplane LSH buckets (vectors agreeing
    * on all `nPlanes` signs land together), cosine-verified pairs.
    */
  def embeddingNearDup(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nPlanes: Int = 12, threshold: Double = 0.95, seed: Long = 42L,
      maxBucket: Int = 1000): DataFrame = {
    val docs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", V.hyperplaneSignature(col("v"), dim, nPlanes, seed))
    val a = docs.select(col("bucket"), col("id").as("a"), col("v").as("a_v"))
    val b = docs.select(col("bucket"), col("id").as("b"), col("v").as("b_v"))
    a.join(b, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cosine", V.cosine(col("a_v"), col("b_v")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), round(col("cosine"), 4).as("cosine"))
      .distinct()
      .orderBy("a", "b")
  }

  /** Exact Jaccard of two string-array columns via codegen'd set builtins. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** Shared candidate-pair generation from (id, payload, band, key) rows
    * with a bucket-size cap: buckets larger than `maxBucket` are dropped
    * (degenerate keys) before the within-bucket self-join.
    */
  private def pairsFromBuckets(banded: DataFrame, maxBucket: Int): DataFrame = {
    val sized = banded.withColumn("bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "key")))
      .filter(col("bsz") <= maxBucket)
    val a = sized.select(col("band"), col("key"), col("id").as("a"), col("sh").as("a_sh"))
    val b = sized.select(col("band"), col("key"), col("id").as("b"), col("sh").as("b_sh"))
    a.join(b, Seq("band", "key")).filter(col("a") < col("b"))
  }
}

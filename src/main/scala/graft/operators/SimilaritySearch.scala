package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set is the small side — it broadcasts; the
  * corpus never shuffles for brute force (score + per-query top-k via
  * window over broadcast-joined pairs). The LSH variant prunes the corpus
  * to matching buckets first, turning a full scan into a hash-join on
  * bucket ids — the 100 TB path (IVF-style: buckets ≈ coarse cells).
  */
object SimilaritySearch {

  /** Brute-force cosine top-k: exact baseline. `queries` must be small
    * (it is broadcast to every corpus partition).
    */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10): DataFrame = {
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))))
      .withColumn("cosine", V.cosine(col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rk"))
      .orderBy("qid", "rk")
  }

  /** LSH-bucketed ANN: corpus and queries hashed to hyperplane-sign
    * buckets; each query searches only its bucket (plus `probes`
    * single-bit-flip neighbor buckets — multiprobe — to recover recall).
    * At 100 TB the corpus side is pre-bucketed once (write partitioned by
    * bucket) and each query touches a handful of partitions.
    */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dim: Int, k: Int = 10, nPlanes: Int = 8, probes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", V.hyperplaneSignature(col("v"), dim, nPlanes, seed))
    // query buckets: own bucket + single-bit flips (multiprobe)
    val qSig = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("sig", V.hyperplaneSignature(col("qv"), dim, nPlanes, seed))
    val probeBits = Seq(lit(0L)) ++ (0 until math.min(probes, nPlanes)).map(i => lit(1L << i))
    val q = qSig.withColumn("bucket", explode(array(probeBits.map(b => col("sig").bitwiseXOR(b)): _*)))
      .dropDuplicates("qid", "bucket")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("cosine", V.cosine(col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rk"))
      .orderBy("qid", "rk")
  }
}

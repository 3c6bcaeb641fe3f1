package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.RandomPlanes
import graft.functions.expr.GraftFunctions

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
      .withColumn("cosine", GraftFunctions.cosine(col("v"), col("qv")))
    TopK.perKey(scored, "qid", Seq(col("cosine").desc, col("id").asc), k, "rk")
      // long-typed rank: row_number is int32 in Spark, BIGINT in DuckDB
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }

  /** Radius (range) search: every corpus vector within cosine >=
    * `threshold` of each query — the FAISS `range_search` counterpart,
    * and the query-batch sibling of [[Dedup.embeddingNearDup]]'s
    * all-pairs form. Exact: one broadcast of the (small) query batch,
    * one codegen'd scan of the corpus, no shuffle before the result —
    * result size is data-dependent (unlike top-k), which is the point:
    * "give me everything similar enough", e.g. near-dup lookup of a
    * candidate batch against a corpus. Self-matches (id == qid) are
    * excluded. For corpus-side pruning at scale, bucket the corpus with
    * the LSH/IVF machinery and range-search within probed buckets.
    *
    * Membership is decided on the 4-decimal-ROUNDED cosine: the emitted
    * score is rounded anyway (the dedup_embedding contract absorbing
    * last-ulp engine drift), and deciding the threshold on the same
    * rounded value pins boundary rows the same way the top-k queries pin
    * rank order — an unrounded compare could flip a row in/out when two
    * engines disagree in the last ulp exactly at the threshold.
    */
  def rangeSearch(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      threshold: Double): DataFrame =
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))))
      .withColumn("cosine", round(GraftFunctions.cosine(col("v"), col("qv")), 4))
      .filter(col("cosine") >= threshold && col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("cosine"))
      .orderBy("qid", "id")

  /** Multi-table LSH ANN (classic (L, k) random-hyperplane scheme: L
    * independent tables of k sign-bits each; a corpus vector is a
    * candidate if it collides with the query in ANY table). Collision
    * probability for angle θ is 1-(1-(1-θ/π)^k)^L, so recall is tuned by
    * (L, k) — k bounds bucket size, L recovers recall.
    *
    * Scale shape: the corpus is exploded ×L into (table, key) buckets and
    * joined by bucket hash — at 100 TB the bucketed corpus is materialized
    * once (partitioned by (table, key)) and each query batch is a
    * broadcast hash-join touching only its buckets; candidate pairs are
    * deduped before the one cosine evaluation per pair.
    */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dim: Int, k: Int = 10, nTables: Int = 16, bitsPerTable: Int = 4,
      seed: Long = 42L): DataFrame = {
    def buckets(v: org.apache.spark.sql.Column) = array((0 until nTables).map { t =>
      struct(lit(t).as("table"),
        GraftFunctions.hyperplaneSignature(v,
          RandomPlanes.planes(dim, bitsPerTable, seed + t)).as("key"))
    }: _*)
    // bucket streams carry ONLY ids and bucket keys: the corpus explode
    // never replicates vectors ×L, and the candidate dedup shuffles narrow
    // (qid, id) pairs — vectors are joined back exactly once afterwards
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("b", explode(buckets(col("v"))))
      .select(col("id"), col("b.table"), col("b.key"))
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("b", explode(buckets(col("qv"))))
      .select(col("qid"), col("b.table"), col("b.key"))
    val candidates = c.join(broadcast(q), Seq("table", "key"))
      .select("qid", "id")
      .dropDuplicates("qid", "id")
    val scored = candidates
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), Seq("id"))
      .join(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))), Seq("qid"))
      .withColumn("cosine", GraftFunctions.cosine(col("v"), col("qv")))
    TopK.perKey(scored, "qid", Seq(col("cosine").desc, col("id").asc), k, "rk")
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }
}

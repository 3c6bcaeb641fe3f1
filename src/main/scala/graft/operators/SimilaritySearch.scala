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
  /** Per-dimension 8-bit SCALAR QUANTIZATION calibration (FAISS's
    * SQ8-flat tier): the corpus's per-dimension [min, max] — one
    * posexplode + dim-sized aggregate, a dim-length driver array. SQ8
    * sits between brute force (exact, full-width) and PQ (8 codes for
    * 64 dims): 4× less memory bandwidth than float32 with near-exact
    * recall, the standard first compression tier of a serving stack.
    */
  def sq8Calibrate(corpus: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(transform(col(vecCol), x => x.cast("double")))
        .as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("i").collect()
    require(rows.nonEmpty, "sq8Calibrate: empty corpus")
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** SQ8-encode the corpus: code_d = floor(((x-mn_d)/(mx_d-mn_d))·255)
    * ∈ [0,255] (a constant dimension encodes 0). Codes ride as an int
    * array here for plan-level clarity; the at-scale layout packs them
    * into one BINARY column (4 bytes → 1 per dim) — the arithmetic and
    * the gate are identical either way. Every arithmetic step is
    * written in one fixed order so the DuckDB oracle computes the SAME
    * doubles (floor of an identical IEEE expression — no rounding-mode
    * drift possible).
    */
  def sq8Encode(corpus: DataFrame, idCol: String, vecCol: String,
      mn: Array[Double], mx: Array[Double]): DataFrame = {
    require(mn.length == mx.length, "calibration arrays must align")
    val mnA = array(mn.map(lit).toIndexedSeq: _*)
    val rgA = array(mn.indices.map(j => lit(mx(j) - mn(j))): _*)
    corpus.select(col(idCol).as("id"),
      zip_with(
        zip_with(transform(col(vecCol), x => x.cast("double")), mnA,
          (x, m) => x - m),
        rgA,
        (d, r) => when(r === 0.0, lit(0))
          .otherwise(floor(d / r * lit(255.0)).cast("int")))
        .as("codes"))
  }

  /** SQ8 search with exact re-rank: the ADC pass scores DEQUANTIZED
    * codes (xq_d = code_d·step_d + mn_d, step_d = (mx_d-mn_d)/255)
    * against each query — a corpus scan at 1/4 the memory bandwidth —
    * keeps the top `refine`·k per query, then re-ranks that shortlist
    * with exact cosines over the original vectors (an id join against
    * the corpus — O(refine·k·|queries|) full-width rows, never the
    * corpus). Both ranking passes order by score with id tiebreak; the
    * scores are bit-identical across engines (fixed-order folds over
    * fixed-order dequantization), so the shortlist and the final page
    * replay exactly in SQL.
    */
  def sq8Search(encoded: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, qidCol: String, qvecCol: String,
      mn: Array[Double], mx: Array[Double], k: Int = 10,
      refine: Int = 4): DataFrame = {
    require(k >= 1 && refine >= 1, "k and refine must be >= 1")
    val mnA = array(mn.map(lit).toIndexedSeq: _*)
    val stepA = array(mn.indices.map(j =>
      lit(if (mx(j) == mn(j)) 0.0 else (mx(j) - mn(j)) / 255.0)): _*)
    val dq = zip_with(
      zip_with(col("codes"), stepA, (c, st) => c.cast("double") * st),
      mnA, (a, m) => a + m)
    val q = queries.select(col(qidCol).as("qid"),
      transform(col(qvecCol), x => x.cast("double")).as("qv"))
    val approx = encoded.withColumn("vq", dq)
      .crossJoin(broadcast(q))
      .withColumn("ascore", GraftFunctions.cosine(col("vq"), col("qv")))
    val short = TopK.perKey(approx, "qid",
      Seq(col("ascore").desc, col("id").asc), refine * k, "ark")
      .select("qid", "id", "qv")
    val exact = short
      .join(corpus.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v")), "id")
      .withColumn("cosine", GraftFunctions.cosine(col("v"), col("qv")))
    TopK.perKey(exact, "qid", Seq(col("cosine").desc, col("id").asc), k, "rk")
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }
}

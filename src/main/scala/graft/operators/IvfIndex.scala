package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expr.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor: the corpus is
  * partitioned into `nCells` Voronoi cells around trained centroids;
  * queries score only the `nProbe` nearest cells.
  *
  * Training is distributed Lloyd's k-means (a few fixed iterations,
  * deterministic hash-seeded init). At 100 TB the train step runs on a
  * sample, the assignment is one narrow scan writing
  * `partitionBy(cell)` parquet, and each query batch is a broadcast join
  * touching nProbe/nCells of the data — the classic IVF cost model
  * (FAISS-style coarse quantizer, re-expressed as DataFrame plans).
  */
object IvfIndex {

  /** Train centroids with `iters` Lloyd iterations. Deterministic AND
    * engine-replayable: initial centroids are the vectors with the
    * `nCells` smallest `md5("ivf<seed>:<id>")` strings (a seeded
    * pseudo-random but stable choice whose ordering DuckDB reproduces
    * character-for-character — the ann_ivf oracle replays the whole
    * training in SQL), and every Lloyd mean is rounded to 6 decimals,
    * which makes the trained model bit-identical under ANY partial-
    * aggregation merge order (double addition is not associative; the
    * sub-ulp noise from shuffle-arrival order would otherwise leak into
    * the centroids) at a precision cost irrelevant to cell quality.
    * Residual boundary risk, accepted: Spark rounds via the decimal
    * string (HALF_UP) while DuckDB rounds the binary double
    * half-away-from-zero, so a mean landing within sub-ulp of a
    * .xxxxxx5 boundary could still round differently across engines —
    * probability ~1e-10 per mean (the avg must land within ~1 ulp of a
    * 6-decimal half-boundary), never observed on the gated fixtures.
    * Returns (cellId, centroid array<double>) — small, driver-collectable.
    *
    * `sampleFraction` < 1 trains on a seeded Bernoulli sample of the
    * corpus — the 100 TB shape: centroid quality needs only a
    * representative sample (FAISS trains coarse quantizers the same way),
    * so every Lloyd iteration scans `sampleFraction` of the data instead
    * of all of it. Assignment (`index`) still covers the full corpus.
    * (Bernoulli sampling is partitioning-dependent; a caller that needs
    * a cross-engine-replayable sample pre-filters deterministically, e.g.
    * `id % 2 = 0`, and passes sampleFraction = 1.0 — see the ann_ivf gate.)
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 3, seed: Long = 42L,
      sampleFraction: Double = 1.0): Array[(Int, Array[Double])] = {
    require(sampleFraction > 0 && sampleFraction <= 1.0, "sampleFraction in (0,1]")
    val base = if (sampleFraction < 1.0) corpus.sample(sampleFraction, seed) else corpus
    val v = base.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    var centroids: Array[(Int, Array[Double])] =
      v.withColumn("h", md5(concat(lit(s"ivf$seed:"), col("id").cast("string"))))
        .orderBy(col("h"), col("id")).limit(nCells)
        .collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    require(centroids.nonEmpty,
      "no centroids: corpus (or its training sample) is empty — " +
        "check the input frame / raise sampleFraction")
    val dim = centroids(0)._2.length
    var it = 0
    while (it < iters) {
      val assigned = assign(v, centroids)
      // new centroid = element-wise mean of member vectors, computed as
      // `dim` codegen'd avg(v[i]) aggregate columns: the partial (map-side)
      // aggregate reduces each input partition to one row per cell BEFORE
      // the exchange, so the per-iteration shuffle is O(cells × partitions
      // × dim) doubles — the posexplode formulation this replaces shuffled
      // n × dim element rows per iteration, the train-scan bottleneck at
      // corpus scale. round(6): see scaladoc (bit-deterministic training).
      val els = (0 until dim).map(i => round(avg(col("v")(i)), 6).as(s"m$i"))
      val means = assigned.groupBy("cell").agg(els.head, els.tail: _*).collect()
      val updated = means.map { r =>
        (r.getInt(0), Array.tabulate(dim)(i => r.getDouble(i + 1)))
      }
      // cells that lost all members keep their previous centroid
      val byId = updated.toMap
      centroids = centroids.map { case (c, old) => (c, byId.getOrElse(c, old)) }
      it += 1
    }
    centroids
  }

  /** The centroid MATRIX (cell == array index) a [[GraftFunctions
    * .nearestCells]] kernel consumes as one codegen reference object —
    * requires the dense 0..n-1 cell ids [[train]] produces, so the
    * kernel's returned array index IS the cell id.
    */
  private[operators] def denseCentroids(
      centroids: Array[(Int, Array[Double])]): Array[Array[Double]] = {
    val sorted = centroids.sortBy(_._1)
    require(sorted.iterator.map(_._1).zipWithIndex.forall(p => p._1 == p._2),
      s"cell ids must be dense 0..n-1: ${sorted.map(_._1).mkString(",")}")
    sorted.map(_._2)
  }

  /** Assign each vector to its nearest centroid (max cosine) — ONE
    * [[GraftFunctions.nearestCells]] kernel call per row over the
    * centroid matrix as a codegen reference object. The struct-array
    * formulation this replaces (`greatest(struct(cosine, cell), …)`)
    * built an nCells-wide expression tree — fine at 16-256 cells, a
    * plan-size bottleneck at FAISS-scale √n cells; the kernel is
    * bit-identical in scores and score-tie behavior (higher cell wins,
    * NaN greatest — see the kernel's parity contract). No shuffle.
    */
  def assign(vectors: DataFrame, centroids: Array[(Int, Array[Double])]): DataFrame = {
    require(centroids.nonEmpty,
      "no centroids: corpus (or its training sample) is empty — " +
        "check the input frame / raise sampleFraction")
    vectors.withColumn("cell",
      GraftFunctions.nearestCells(col("v"), denseCentroids(centroids), 1)(0))
  }

  /** Build the index: corpus annotated with its cell. At scale this is
    * written out `partitionBy("cell")` once and reused by all queries.
    */
  def index(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Double])]): DataFrame =
    assign(corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v")), centroids)

  /** Top-k per query, probing the `nProbe` best cells per query. */
  /** k-NN JOIN: EVERY row of `queries` gets its k nearest `indexed`
    * rows — the corpus-sized-query-side face of [[search]]. search()
    * broadcasts the probed query side, which is right for a handful of
    * interactive queries and fatally wrong when the query side IS a
    * corpus (kNN graph building, retrieval augmentation, SemDeDup-style
    * neighbor lists). Here the probed queries — exploded to
    * (cell, qid, qv), nProbe rows per query — meet the index in a
    * SHUFFLE hash join on `cell`: both sides hash-partition by cell, no
    * broadcast, no driver-side state; each task scores one cell
    * bucket's |index ∩ cell| × |queries probing it| pairs, and the same
    * two-stage [[TopK.perKey]] (partial per-partition top-k before the
    * key shuffle) bounds what moves. Hot cells skew the join — AQE's
    * skew-join split handles moderate skew; re-train with more cells
    * when one cell dominates (the FAISS guidance: nCells ~ √n keeps
    * buckets balanced). `excludeSelf` drops qid == id matches — a
    * corpus joined against itself wants neighbors, not identity.
    */
  def knnJoin(indexed: DataFrame, queries: DataFrame, qidCol: String,
      qvecCol: String, centroids: Array[(Int, Array[Double])], k: Int = 10,
      nProbe: Int = 4, excludeSelf: Boolean = false): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"),
      transform(col(qvecCol), x => x.cast("double")).as("qv"))
    val probed = q.withColumn("cell",
      explode(GraftFunctions.nearestCells(col("qv"),
        denseCentroids(centroids), nProbe)))
    val scored0 = indexed.join(probed.hint("shuffle_hash"), Seq("cell"))
      .withColumn("cosine", GraftFunctions.cosine(col("v"), col("qv")))
    val scored = if (excludeSelf) scored0.filter(col("qid") =!= col("id"))
      else scored0
    TopK.perKey(scored, "qid", Seq(col("cosine").desc, col("id").asc), k, "rk")
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }

  def search(indexed: DataFrame, queries: DataFrame, qidCol: String, qvecCol: String,
      centroids: Array[(Int, Array[Double])], k: Int = 10, nProbe: Int = 4): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"),
      transform(col(qvecCol), x => x.cast("double")).as("qv"))
    // rank cells per query, keep nProbe best — one kernel call, not an
    // nCells-wide sorted struct array (same ranking, see assign)
    val probed = q.withColumn("cell",
      explode(GraftFunctions.nearestCells(col("qv"),
        denseCentroids(centroids), nProbe)))
    val scored = indexed.join(broadcast(probed), Seq("cell"))
      .withColumn("cosine", GraftFunctions.cosine(col("v"), col("qv")))
    TopK.perKey(scored, "qid", Seq(col("cosine").desc, col("id").asc), k, "rk")
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expr.GraftFunctions

/** IVF-PQ approximate nearest neighbor (Jégou et al., "Product
  * quantization for nearest neighbor search", TPAMI 2011; the FAISS
  * IVFPQ design re-expressed as DataFrame plans).
  *
  * The corpus is coarse-quantized into IVF cells (reusing
  * [[IvfIndex]]), and each vector's RESIDUAL (v - cell centroid) is
  * product-quantized: split into `m` subspaces, each encoded as the index
  * of its nearest entry in a per-subspace codebook of `kCodes` entries.
  * The stored index row is (id, cell, m codes, norm) — m bytes-worth of
  * codes instead of dim floats, a ~32× compression at (dim=64, m=8).
  *
  * Search is asymmetric-distance (ADC): per query, one O(dim·kCodes) LUT
  * of subspace dot products, then every candidate row scores in O(m)
  * lookups — `approx_dot(q,v) ≈ dot(q, centroid_cell) + Σ_sub
  * lut(sub, code_sub)` (dot distributes over the residual decomposition).
  * The top `k·refine` by approximate cosine are re-ranked exactly by
  * joining the candidate ids (narrow) back to the raw vector table.
  *
  * Scale shape: training samples the corpus; encoding is one narrow scan
  * (at 100 TB the encoded index is written `partitionBy(cell)` once);
  * a query batch broadcasts (qid, lut, cell) rows and touches
  * nProbe/nCells of the CODES, never the vectors — only the re-rank
  * reads ~k·refine full vectors per query via an id shuffle join.
  */
object PqIndex {

  /** Trained model: IVF centroids (dense, cell == array index) plus flat
    * residual codebooks — codebooks(sub*kCodes + c) is entry c of
    * subspace sub. Small (nCells·dim + m·kCodes·dim doubles): rides into
    * codegen as reference objects.
    */
  case class Model(centroids: Array[(Int, Array[Double])],
      codebooks: Array[Array[Double]], m: Int, kCodes: Int) {
    require(centroids.nonEmpty && codebooks.length == m * kCodes,
      s"codebooks must hold m*kCodes entries, got ${codebooks.length}")
    val dim: Int = centroids(0)._2.length
    val d: Int = dim / m
  }

  private def centroidLit(centroids: Array[(Int, Array[Double])]) =
    typedLit(centroids.sortBy(_._1).map(_._2.toSeq).toSeq)

  private def asDouble(df: DataFrame, idCol: String, vecCol: String,
      id: String, v: String): DataFrame =
    df.select(col(idCol).as(id), transform(col(vecCol), x => x.cast("double")).as(v))

  /** Train coarse centroids + residual codebooks with `iters` Lloyd
    * iterations each, on a seeded `sampleFraction` of the corpus (the
    * 100 TB path — FAISS trains IVFPQ on a sample the same way).
    * Deterministic AND engine-replayable: md5-seeded init orderings and
    * 6-decimal-rounded Lloyd means (both coarse and codebook) make the
    * trained model bit-identical under any merge order and let the
    * ann_ivfpq oracle recompute it from scratch in DuckDB SQL.
    * (Bernoulli `sampleFraction` is partitioning-dependent; a caller
    * needing a cross-engine-replayable sample pre-filters
    * deterministically, e.g. `id % 2 = 0`, and passes 1.0.)
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, m: Int = 8, kCodes: Int = 16, iters: Int = 3,
      seed: Long = 42L, sampleFraction: Double = 1.0): Model = {
    val centroids = IvfIndex.train(corpus, idCol, vecCol, nCells, iters, seed, sampleFraction)
    val dim = centroids(0)._2.length
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subspaces")
    val d = dim / m

    val base = if (sampleFraction < 1.0) corpus.sample(sampleFraction, seed) else corpus
    val v = asDouble(base, idCol, vecCol, "id", "v")
    // residuals feed the init collect plus every Lloyd iteration —
    // materialize once
    val resid = IvfIndex.assign(v, centroids)
      .withColumn("r", zip_with(col("v"),
        element_at(centroidLit(centroids), col("cell") + 1), (x, c) => x - c))
      .select(col("id"), col("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // init: the kCodes residual vectors with the smallest seeded hash
    // seed entry c of EVERY subspace — any spread-out pick works for
    // Lloyd init, and one driver-side slice beats a per-subspace
    // row_number window. md5 (not xxhash64): the SAME stable pseudo-
    // random ordering is reproducible character-for-character in DuckDB,
    // which lets the ann_ivfpq oracle replay codebook training in SQL
    // (engine-portable hashing, same scheme as IvfIndex.train's init).
    val seeds = resid
      .withColumn("h", md5(concat(lit(s"pq$seed:"), col("id").cast("string"))))
      .orderBy(col("h").asc, col("id").asc).limit(kCodes)
      .select("r").collect()
      .map(_.getSeq[Double](0).toArray)
    val codebooks = Array.tabulate(m * kCodes) { i =>
      val sub = i / kCodes; val c = i % kCodes
      if (c < seeds.length) seeds(c).slice(sub * d, sub * d + d)
      else Array.fill(d)(0.0)
    }

    // Lloyd: assignment is ONE pqEncode kernel call per row (against a
    // zero coarse centroid — `r` is already the residual), so all m
    // subspaces train in the same pass with no per-candidate expression
    // trees; new entry = element-wise member mean, computed as `d`
    // codegen'd avg(sv[i]) aggregate columns so the map-side partial
    // aggregate reduces each partition to one row per (sub, code) BEFORE
    // the exchange — the shuffle is O(m·kCodes × partitions × d) doubles,
    // not the n·m·d element rows a posexplode formulation would move
    val zeroCentroid = lit(Array.fill(dim)(0.0))
    var it = 0
    while (it < iters) {
      val snapshot = codebooks.map(_.clone()) // plan-captured; never mutated
      // round(6) on every codebook mean, for the same two reasons as
      // IvfIndex.train: the trained model becomes bit-identical under any
      // partial-aggregation merge order, and both engines round their
      // sub-ulp-divergent avg() to the same decimal — which is what lets
      // the ann_ivfpq oracle replay the whole training in DuckDB SQL
      val els = (0 until d).map(i => round(avg(col("sv")(i)), 6).as(s"mu$i"))
      val means = resid
        .withColumn("codes",
          graft.functions.expr.GraftFunctions.pqEncode(col("r"), zeroCentroid, snapshot, m, kCodes))
        .select(explode(array((0 until m).map { s =>
          struct(lit(s).as("sub"), col("codes")(s).as("code"),
            slice(col("r"), s * d + 1, d).as("sv"))
        }: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.code").as("code"), col("e.sv").as("sv"))
        .groupBy("sub", "code").agg(els.head, els.tail: _*)
        .collect()
      means.foreach { r =>
        val entry = codebooks(r.getInt(0) * kCodes + r.getInt(1))
        var i = 0
        while (i < d) { entry(i) = r.getDouble(i + 2); i += 1 }
      }
      // entries that lost all members keep their previous value
      it += 1
    }
    resid.unpersist()
    Model(centroids, codebooks, m, kCodes)
  }

  /** Encode the FULL corpus: (id, cell, codes, norm). At scale this is the
    * one narrow pass whose output is written `partitionBy(cell)` and
    * reused by every query batch.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val v = asDouble(corpus, idCol, vecCol, "id", "v")
    IvfIndex.assign(v, model.centroids)
      .select(col("id"), col("cell"),
        GraftFunctions.pqEncode(col("v"),
          element_at(centroidLit(model.centroids), col("cell") + 1),
          model.codebooks, model.m, model.kCodes).as("codes"),
        sqrt(GraftFunctions.dot(col("v"), col("v"))).as("norm"))
  }

  /** Persist a trained model as one small parquet table: centroid rows
    * (kind='centroid', idx=cell) and codebook rows (kind='codebook',
    * idx=sub*kCodes+code), with (m, kCodes) on every row. At scale the
    * model is trained once and saved next to the encoded index; query
    * jobs load it instead of retraining.
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    val rows =
      model.centroids.toSeq.map { case (cell, c) =>
        ("centroid", cell, c.toSeq, model.m, model.kCodes) } ++
      model.codebooks.toSeq.zipWithIndex.map { case (e, i) =>
        ("codebook", i, e.toSeq, model.m, model.kCodes) }
    rows.toDF("kind", "idx", "vec", "m", "kCodes")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model saved by [[saveModel]] — the driver-side collect is
    * nCells + m·kCodes rows, the same small footprint train() returns.
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty, s"no model rows at $path")
    val m = rows.head.getAs[Int]("m")
    val kCodes = rows.head.getAs[Int]("kCodes")
    def vecs(kind: String): Array[(Int, Array[Double])] = rows
      .filter(_.getAs[String]("kind") == kind)
      .map(r => (r.getAs[Int]("idx"), r.getAs[Seq[Double]]("vec").toArray))
      .sortBy(_._1)
    Model(vecs("centroid"), vecs("codebook").map(_._2), m, kCodes)
  }

  /** Persist an encoded index `partitionBy(cell)` — the one-time write at
    * scale: each coarse cell becomes a directory, so a query batch's
    * probed-cell join touches nProbe/nCells of the files, not the corpus.
    */
  def writeIndex(encoded: DataFrame, path: String): Unit =
    encoded.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Append newly-ingested vectors to a persisted index WITHOUT
    * retraining: encode under the same model, append into the cell
    * directories. This is the daily-ingest path at scale — the coarse
    * centroids and codebooks stay fixed between offline retrains, so
    * appends are one narrow encode scan; quality for drifting
    * distributions degrades gracefully until the next retrain.
    *
    * An append SUPERSEDES any earlier delete of the same id: before the
    * new rows land, the superseded tombstones' (id, cell) rows are
    * PHYSICALLY purged from their cell directories (a mini-compaction
    * scoped to the affected cells) and their tombstone rows dropped —
    * so delete-then-reinsert, the usual update path, serves exactly the
    * new row instead of either staying masked or reviving the old copy
    * next to it. Appends with no superseded delete (the common case)
    * detect that with one small sidecar-side semi-join and skip the
    * rewrite entirely. Like compaction, the cell/sidecar swaps are a
    * maintenance-window op: not atomic vs a concurrently-planning reader.
    */
  def appendToIndex(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model, path: String): Unit = {
    val spark = corpus.sparkSession
    val enc = encode(corpus, idCol, vecCol, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val fs = fsOf(spark, path)
      val tomb = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
      if (fs.exists(tomb)) {
        val masked = spark.read.parquet(tomb.toString)
          .select(col("id"), col("cell"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val superseded = masked.join(enc.select(col("id"), col("cell")),
            Seq("id", "cell"), "left_semi")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // bounded by nCells, a model constant
            val cells = superseded.select("cell").distinct().collect().map(_.getInt(0))
            if (cells.nonEmpty) {
              rewriteCells(spark, fs, path, cells, superseded)
              swapSidecar(spark, fs, path, tomb,
                masked.join(enc.select(col("id"), col("cell")),
                  Seq("id", "cell"), "left_anti"))
            }
          } finally { superseded.unpersist(); () }
        } finally { masked.unpersist(); () }
      }
      enc.write.mode("append").partitionBy("cell").parquet(path)
    } finally { enc.unpersist(); () }
  }

  /** Rewrite `cells`' directories keeping only rows NOT matching `drop`
    * on (id, cell): stage survivors to an underscore-prefixed dir
    * (invisible to plain readers), then per-cell delete+rename swap. A
    * cell whose every row dropped stages nothing and simply disappears
    * from the partition listing.
    */
  private def rewriteCells(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      cells: Array[Int], drop: DataFrame): Unit = {
    val raw = spark.read.parquet(path)
      .select(col("id"), col("cell"), col("codes"), col("norm"))
    val survivors = raw.filter(col("cell").isin(cells.map(Integer.valueOf).toSeq: _*))
      .join(drop, Seq("id", "cell"), "left_anti")
    val staging = new org.apache.hadoop.fs.Path(s"$path/_compact_staging")
    survivors.write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    cells.foreach { c =>
      val live = new org.apache.hadoop.fs.Path(s"$path/cell=$c")
      val staged = new org.apache.hadoop.fs.Path(s"$staging/cell=$c")
      fs.delete(live, true)
      if (fs.exists(staged)) { fs.rename(staged, live); () }
    }
    fs.delete(staging, true)
    ()
  }

  /** Rewrite the tombstone sidecar to hold exactly `kept`, via an
    * underscore-prefixed staging dir (invisible to plain readers) and a
    * delete+rename swap; an empty `kept` just drops the sidecar.
    */
  private def swapSidecar(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      tomb: org.apache.hadoop.fs.Path, kept: DataFrame): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_tombstones_staging")
    kept.write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
    val anyKept = fs.listStatus(tmp).exists(_.getPath.getName.startsWith("cell="))
    fs.delete(tomb, true)
    if (anyKept) { fs.rename(tmp, tomb); () } else { fs.delete(tmp, true); () }
  }

  private def fsOf(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Compact tombstones away — the "periodic re-encode" the delete path
    * promises, made a real operator. Only the cells that actually carry
    * tombstones are rewritten (survivor rows staged to an underscore-
    * prefixed dir, then swapped in per cell-directory), and the sidecar
    * is cleared, so a compacted index serves identical results through a
    * plan with NO anti-join and no per-query tombstone cost. The
    * affected-cell collect is bounded by nCells (a model constant).
    * Directory swaps are per-cell delete+rename — run compaction in a
    * maintenance window, not concurrently with serving (the lakehouse
    * MERGE/OPTIMIZE contract; same caveat as [[SnapshotTable]] vacuum).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val tomb = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    if (!fs.exists(tomb)) return
    val masked = spark.read.parquet(tomb.toString).select(col("id"), col("cell"))
    val cells = masked.select("cell").distinct().collect().map(_.getInt(0))
    if (cells.nonEmpty) rewriteCells(spark, fs, path, cells, masked)
    fs.delete(tomb, true)
    ()
  }

  /** DELETE vectors from a persisted index WITHOUT rewriting it: a
    * tombstone sidecar (the [[SnapshotTable]] pattern — an
    * underscore-prefixed subdir every plain reader's file listing
    * ignores) records the masked (id, cell) rows, and [[readIndex]]
    * anti-joins them out at serve time. The deleted ids' cells are
    * resolved by one narrow join against the index itself, so tombstones
    * land `partitionBy(cell)` NEXT TO the codes they mask — the serve-
    * time anti-join is cell-co-partitioned and a probed-cell query only
    * ever reads the probed cells' tombstones. This closes the CRUD loop
    * (takedowns, dedup survivors) without retrain or rebuild;
    * [[compactIndex]] periodically rewrites the affected cells and
    * clears the sidecar like any lakehouse MERGE, and a later
    * [[appendToIndex]] of a deleted id drops its tombstone (re-insert
    * serves the new row). Ids not in the index tombstone nothing
    * (idempotent; a re-delete is a no-op row).
    */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession,
      ids: DataFrame, idCol: String, path: String): Unit = {
    val idx = spark.read.parquet(path).select(col("id"), col("cell"))
    idx.join(ids.select(col(idCol).cast("long").as("id")).distinct(), Seq("id"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/_tombstones")
  }

  /** Read a persisted index back into the `search` input shape. `cell`
    * returns as a partition column, so joining it against the broadcast
    * probed-cells side dynamic-partition-prunes the unprobed directories
    * (the on-disk analogue of the in-memory cell filter). Tombstoned
    * rows ([[deleteFromIndex]]) are anti-joined out on (id, cell) — both
    * sides cell-partitioned — so a served search equals one over an
    * index rebuilt from the survivors (gated: ann_ivfpq_delete).
    */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    // no cast on `cell`: partition-type inference already yields int, and
    // keeping the raw partition attribute is what lets the probed-cell
    // join plant a dynamic partition-pruning filter on the scan
    val raw = spark.read.parquet(path)
      .select(col("id"), col("cell"), col("codes"), col("norm"))
    val tomb = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    if (tomb.getFileSystem(spark.sessionState.newHadoopConf()).exists(tomb))
      raw.join(spark.read.parquet(tomb.toString).select(col("id"), col("cell")),
        Seq("id", "cell"), "left_anti")
    else raw
  }

  /** Top-k per query: ADC scan over the `nProbe` best cells' codes, then
    * exact cosine re-rank of the top `k * refine` shortlist against the
    * raw vectors (`corpus` — joined by candidate id only).
    */
  def search(encoded: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, model: Model,
      k: Int = 10, nProbe: Int = 4, refine: Int = 4): DataFrame = {
    val centLit = centroidLit(model.centroids)
    val q = asDouble(queries, qidCol, qvecCol, "qid", "qv")
      .withColumn("qnorm", sqrt(GraftFunctions.dot(col("qv"), col("qv"))))
      .withColumn("lut", GraftFunctions.pqLut(col("qv"), model.codebooks, model.m, model.kCodes))
    val cellScores = model.centroids.map { case (cellId, c) =>
      struct(GraftFunctions.cosine(col("qv"), lit(c)).as("score"), lit(cellId).as("cell"))
    }
    // per probed cell the query carries only (lut, qnorm, qdotc) — the
    // broadcast side never ships query vectors into the ADC scan
    val probed = q.withColumn("cells",
      slice(reverse(array_sort(array(cellScores.toSeq: _*))), 1, nProbe))
      .withColumn("cell", explode(transform(col("cells"), _.getField("cell"))))
      .withColumn("qdotc", GraftFunctions.dot(col("qv"), element_at(centLit, col("cell") + 1)))
      .select("qid", "qnorm", "lut", "cell", "qdotc")
    val denom = col("qnorm") * col("norm")
    val cand = encoded.join(broadcast(probed), Seq("cell"))
      .withColumn("approx", when(denom === 0.0, -1.0).otherwise(
        (col("qdotc") + GraftFunctions.pqAdc(col("codes"), col("lut"), model.kCodes)) / denom))
    val shortlist = TopK.perKey(cand, "qid",
        Seq(col("approx").desc, col("id").asc), k * refine, "rka")
      .select("qid", "id")
    val cv = asDouble(corpus, idCol, vecCol, "id", "v")
    val qv = asDouble(queries, qidCol, qvecCol, "qid", "qv")
    val exact = shortlist.join(cv, "id").join(broadcast(qv), "qid")
      .withColumn("cosine", GraftFunctions.cosine(col("v"), col("qv")))
    TopK.perKey(exact, "qid", Seq(col("cosine").desc, col("id").asc), k, "rk")
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }
}

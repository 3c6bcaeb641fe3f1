package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scaling probe (dev tool, not part of the driver contract): builds
  * a 10×-replica corpus of the sf0.1 `documents`/`embeddings`/`events`
  * tables under `target/sf1` and times the most expensive gate queries
  * at both scales, printing per-query `[scale]` lines.
  *
  * The replicas are DECORRELATED so outputs scale ~linearly and the
  * ratio measures input scaling, not planted-duplicate explosion:
  *  - documents: every word in replica k>0 gets the digit suffix k, so
  *    replica shingle sets are pairwise disjoint (10 disjoint sf0.1
  *    corpora; natural intra-replica duplicates preserved);
  *  - embeddings: replica k>0 is sign-flipped per element by a
  *    deterministic Rademacher pattern (xxhash64(k, i) parity). Sign
  *    flips are an isometry WITHIN a replica (s_i² = 1 preserves every
  *    inner product, so natural near-dup structure is exact), while
  *    cross-replica cosines collapse to ~N(0, 1/dim);
  *  - events: user/event ids offset per replica — 10× users with the
  *    same per-user session/component structure.
  */
object ScaleProbe {
  private val Reps = 10
  private val Queries = Seq(
    "ann_ivfpq_persisted", "ann_ivfpq", "ann_ivf",
    // (dedup_ngram_jaccard runs as a DEDICATED probe below so its row
    // carries candidate-pair counts — the adjudication evidence)
    "dedup_minhash", "dedup_simhash", "dedup_substring",
    "dedup_embedding", "dedup_semantic",
    "dedup_cluster", "dedup_cluster_survivors",
    // bounded-face control: the gate fixes its corpus with doc_id < 2000,
    // so its sf1 time should be ~flat — that boundedness is the design
    "pipeline_embed_dedup",
    // layout maintenance at 10x input (documents-based; q48 uses lineitem,
    // which the replica corpus does not carry)
    "q49_compaction",
    // incremental hash-store ingest: 3 arrival batches over 10x docs —
    // cost should track corpus hashing + anti-join, not history size
    "dedup_incremental",
    // incremental NEAR-dup ingest (NearDupStore): 3 arrival batches,
    // each banded + joined against the persisted LSH bucket store —
    // cost should track O(batch + matched buckets), not history size
    "dedup_incremental_minhash",
    // BPE training: corpus tokenize scan is 10x, the 8 merge rounds run
    // on the cached vocabulary (~10x entries from the digit suffixes)
    "pipeline_bpe",
    // (dedup_containment runs as a DEDICATED probe below so its row
    // carries candidate-pair counts — same adjudication as ngram)
    // event analytics at 10x events (10x users, same time range): each
    // is ONE scan + one shuffle — funnel/cohort fold or window per user,
    // resample's grid is time-range-sized (constant) so its cost is the
    // scan+aggregate alone
    "q71_funnel", "q72_cohort", "q74_resample", "q75_funnel_repeat",
    // r15 event analytics: sessionize/attribution/transitions are each
    // ONE hash shuffle on user + window passes — wall should track the
    // 10x scan, never blow up on per-user state
    "q80_sessionize", "q81_attribution", "q82_path_transitions",
    // r15 SQ8: calibration + dequantized corpus scan + re-rank — the
    // scan is the cost, linear in corpus; shortlist/re-rank constant
    "ann_sq8_rerank",
    // r15 PMI collocations: two vocab-sized aggregates over a 10x token
    // stream (vocab ~10x from the digit suffixes)
    "text_collocations")

  private def loadavg(): String =
    scala.util.Try(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim.split("\\s+").take(3).mkString(","))
      .getOrElse("n/a")

  def main(args: Array[String]): Unit = {
    // [srcDir [outDir]] — defaults match this container's layout
    val src = if (args.length >= 1) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length >= 2) args(1) else "/root/repo/target/sf1"
    val loadBefore = loadavg()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$out/documents.parquet").exists())
      build(spark, src, out)
    val qs = graft.SparkEntry.queries
    // force FULL evaluation: .count() lets Catalyst prune deterministic
    // projections and eliminate count-preserving left joins (it timed
    // dedup_substring as a bare scan) — hashing every column of every
    // row keeps the whole query in the measured path
    def force(df: DataFrame): Long =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)"), count(lit(1))).collect()(0).getLong(1)
    // min-of-2 per scale: a single sample is at the mercy of a transient
    // contention window (the round-7/8 driver benches recorded 5-10x
    // phantoms exactly that way); the min of two cache-cleared runs is
    // the reproducible cost
    def timedMin(fn: (SparkSession, String) => DataFrame, dir: String): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      var i = 0
      while (i < 2) {
        graft.operators.Dedup.releaseCaches()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        rows = force(fn(spark, dir))
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      (best, rows)
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    // SPARK_GRAFT_PROBE_ONLY=a,b,c re-probes a subset (outlier
    // re-adjudication on a host with intermittent external load); the
    // non-query probes below only run on a full sweep
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val fullSweep = only.isEmpty
    // dedicated probe blocks (not plain gate reruns) subset-selectable too
    val dedicated = Set("dedup_ngram_jaccard", "dedup_containment",
      "mv_refresh", "colloc_inc")
    only.foreach { f =>
      val unknown = f -- Queries.toSet -- dedicated
      require(unknown.isEmpty, s"unknown probe names: $unknown")
    }
    def wants(name: String): Boolean = fullSweep || only.exists(_.contains(name))
    Queries.filter(n => only.forall(_.contains(n))).foreach { name =>
      val fn = qs(name)
      force(fn(spark, src)) // warmup: codegen/JIT on the sf0.1 shape
      val (tSmall, rowsSmall) = timedMin(fn, src)
      val (tBig, rowsBig) = timedMin(fn, out)
      graft.operators.Dedup.releaseCaches()
      spark.catalog.clearCache()
      println(f"[scale] $name%-24s sf0.1=$tSmall%6.2fs ($rowsSmall%d rows)  " +
        f"sf1=$tBig%7.2fs ($rowsBig%d rows)  ratio=${tBig / tSmall}%5.1fx")
      results += f"""  "$name": {"sf01_sec": $tSmall%.3f, "sf1_sec": $tBig%.3f, """ +
        f""""sf01_rows": $rowsSmall, "sf1_rows": $rowsBig, "ratio": ${tBig / tSmall}%.2f}"""
    }
    // ngram-Jaccard probe WITH candidate accounting: the PPJoin claim is
    // that prefix + length + positional filters keep the candidate set
    // tracking the true-pair set, not the quadratic bucket blowup. The
    // row carries the candidate-pair count at both scales so a wall-time
    // outlier is adjudicable: candidates ~ output (the replicas are
    // shingle-disjoint, so true pairs scale ~10x) means the filter holds
    // and the wall ratio is host noise; candidates >> output means
    // prefix-filter degradation and the width/threshold needs tuning.
    if (wants("dedup_ngram_jaccard")) locally {
      def probe(dir: String): (Double, Long, Long) = {
        var cand = 0L
        var best = Double.MaxValue; var rows = 0L
        (0 until 2).foreach { _ =>
          graft.operators.Dedup.releaseCaches()
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          rows = force(graft.operators.Dedup.ngramJaccard(
            graft.sources.Tables.load(spark, dir, "documents"),
            "doc_id", "text", shingleSize = 3, threshold = 0.5,
            onJoinStats = Some(s => cand = s.candidatePairs)))
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        graft.operators.Dedup.releaseCaches()
        spark.catalog.clearCache()
        (best, rows, cand)
      }
      probe(src) // warmup shapes
      val (tS, rowsS, candS) = probe(src)
      val (tB, rowsB, candB) = probe(out)
      val candRatio = if (candS == 0) 0.0 else candB.toDouble / candS
      println(f"[scale] dedup_ngram_jaccard sf0.1=$tS%6.2fs ($rowsS rows, $candS cand)  " +
        f"sf1=$tB%7.2fs ($rowsB rows, $candB cand)  ratio=${tB / tS}%5.1fx " +
        f"(candidates ${candRatio}%4.2fx)")
      results += f"""  "dedup_ngram_jaccard": {"sf01_sec": $tS%.3f, "sf1_sec": $tB%.3f, """ +
        f""""sf01_rows": $rowsS, "sf1_rows": $rowsB, "ratio": ${tB / tS}%.2f, """ +
        f""""candidates_sf01": $candS, "candidates_sf1": $candB, """ +
        f""""candidate_ratio": $candRatio%.2f, """ +
        f""""note": "candidate_ratio ~ rows ratio = prefix filter holds; wall outliers beyond it are host noise"}"""
    }

    // directed-containment probe with the same candidate accounting:
    // replica shingle sets are pairwise disjoint, so candidates should
    // track the 10x corpus (not 100x pairs) — the probe-side prefix
    // filter's boundedness, now measurable per run
    if (wants("dedup_containment")) locally {
      def probe(dir: String): (Double, Long, Long) = {
        var cand = 0L
        var best = Double.MaxValue; var rows = 0L
        (0 until 2).foreach { _ =>
          graft.operators.Dedup.releaseCaches()
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          rows = force(graft.operators.Dedup.ngramContainment(
            graft.sources.Tables.load(spark, dir, "documents"),
            "doc_id", "text", shingleSize = 3, threshold = 0.8,
            onJoinStats = Some(s => cand = s.candidatePairs)))
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        graft.operators.Dedup.releaseCaches()
        spark.catalog.clearCache()
        (best, rows, cand)
      }
      probe(src) // warmup
      val (tS, rowsS, candS) = probe(src)
      val (tB, rowsB, candB) = probe(out)
      val candRatio = if (candS == 0) 0.0 else candB.toDouble / candS
      println(f"[scale] dedup_containment sf0.1=$tS%6.2fs ($rowsS rows, $candS cand)  " +
        f"sf1=$tB%7.2fs ($rowsB rows, $candB cand)  ratio=${tB / tS}%5.1fx " +
        f"(candidates ${candRatio}%4.2fx)")
      results += f"""  "dedup_containment": {"sf01_sec": $tS%.3f, "sf1_sec": $tB%.3f, """ +
        f""""sf01_rows": $rowsS, "sf1_rows": $rowsB, "ratio": ${tB / tS}%.2f, """ +
        f""""candidates_sf01": $candS, "candidates_sf1": $candB, """ +
        f""""candidate_ratio": $candRatio%.2f, """ +
        f""""note": "candidate_ratio ~ rows ratio = probe prefix filter holds"}"""
    }

    // MV-refresh probe: MaterializedView.refresh's claim is O(delta +
    // view) per refresh, independent of TABLE size — a fixed 500-key
    // delta against a fixed 997-group view must cost ~FLAT from sf0.1 to
    // sf1 (files scale 10x, the touched band and the view do not).
    if (wants("mv_refresh")) locally {
      import graft.operators.{MaterializedView, SnapshotTable}
      def probe(dir: String, nFiles: Int, tag: String): (Double, Long) = {
        val tdir = s"${out}_mvtab_$tag"
        val mdir = s"${out}_mvview_$tag"
        for (d <- Seq(tdir, mdir)) {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
        }
        // value = len(text)/100 keeps the <=2-decimal cents contract
        SnapshotTable.create(spark, spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            (length(col("text")).cast("double") / 100.0).as("v"),
            pmod(col("doc_id"), lit(997L)).as("grp"))
          .withColumn("commit_v", lit(0L))
          .repartitionByRange(nFiles, col("doc_id")), tdir)
        MaterializedView.create(spark, tdir, mdir, "grp", "v")
        // two fixed-width deltas -> min-of-2 refresh timings
        var best = Double.MaxValue
        Seq((1000L, 1499L, 1L), (5000L, 5499L, 2L)).foreach {
          case (lo, hi, cv) =>
            val ch = SnapshotTable.read(spark, tdir)
              .filter(col("doc_id").between(lo, hi))
              .withColumn("v", col("v") + lit(1.0))
              .withColumn("commit_v", lit(cv)).withColumn("_deleted", lit(false))
            SnapshotTable.upsert(spark, tdir, ch, "doc_id", "commit_v", "v")
            val t0 = System.nanoTime()
            MaterializedView.refresh(spark, tdir, mdir, "doc_id", "grp",
              Seq("v"), Seq("commit_v"))
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (best, MaterializedView.serve(spark, mdir).count())
      }
      val (tS, viewS) = probe(src, 32, "01")
      val (tB, viewB) = probe(out, 320, "1")
      println(f"[scale] mv_refresh sf0.1=$tS%6.2fs ($viewS view keys)  " +
        f"sf1=$tB%6.2fs ($viewB view keys)  ratio=${tB / tS}%5.2fx")
      results += f"""  "mv_refresh": {"sf01_sec": $tS%.3f, "sf1_sec": $tB%.3f, """ +
        f""""ratio": ${tB / tS}%.2f, "view_keys_sf01": $viewS, """ +
        f""""view_keys_sf1": $viewB, "delta_keys": 500, """ +
        f""""note": "fixed delta + fixed view domain - flat-or-view-tracking is the O(delta + view) claim"}"""
    }

    // count-store incremental probe: appendToCountStore's claim is that
    // an append is O(batch) — the SAME fixed 500-doc batch appended to a
    // store built over the 10x corpus must cost ~FLAT (the batch
    // tokenize + its count tables + a bounded bucket write, never a
    // store rescan); collocationsFromStore's serve cost tracks the
    // STORED COUNT TABLES (vocab-sized — ~3x on the decorrelated
    // replica corpus, the text_collocations precedent), never the raw
    // corpus.
    if (wants("colloc_inc")) locally {
      import graft.operators.TextAnalysis
      def probe(dir: String, tag: String): (Double, Double, Long) = {
        val store = s"${out}_colloc_$tag"
        val p = new org.apache.hadoop.fs.Path(store)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
        TextAnalysis.buildCountStore(
          spark.read.parquet(s"$dir/documents.parquet"), "text", store,
          nBuckets = 64)
        // the FIXED batch: the same 500 src docs at both scales, so the
        // append's work is scale-independent by construction
        val batch = spark.read.parquet(s"$src/documents.parquet")
          .filter(col("doc_id").between(1000, 1499))
        var bestApp = Double.MaxValue
        Seq(1L, 2L).foreach { t =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          TextAnalysis.appendToCountStore(batch, "text", store, tag = t)
          bestApp = math.min(bestApp, (System.nanoTime() - t0) / 1e9)
        }
        var bestServe = Double.MaxValue
        var rows = 0L
        (0 until 2).foreach { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          rows = force(TextAnalysis.collocationsFromStore(spark, store,
            minCount = 5L, k = 50))
          bestServe = math.min(bestServe, (System.nanoTime() - t0) / 1e9)
        }
        (bestApp, bestServe, rows)
      }
      probe(src, "warm") // warmup shapes
      val (aS, sS, _) = probe(src, "01")
      val (aB, sB, _) = probe(out, "1")
      println(f"[scale] colloc_inc append sf0.1=$aS%6.2fs sf1=$aB%6.2fs " +
        f"ratio=${aB / aS}%5.2fx; serve sf0.1=$sS%6.2fs sf1=$sB%6.2fs " +
        f"ratio=${sB / sS}%5.2fx")
      results += f"""  "colloc_inc": {"append_sf01_sec": $aS%.3f, """ +
        f""""append_sf1_sec": $aB%.3f, "append_ratio": ${aB / aS}%.2f, """ +
        f""""serve_sf01_sec": $sS%.3f, "serve_sf1_sec": $sB%.3f, """ +
        f""""serve_ratio": ${sB / sS}%.2f, "batch_docs": 500, """ +
        f""""note": "fixed 500-doc batch - flat-or-batch-tracking append is the O(batch) claim; serve tracks stored vocab (~3x on the replica corpus), not raw corpus"}"""
    }

    // keyset-paging probe: SkippingIndex.KeysetWalk's claim is that a
    // page over a key-clustered table costs O(page / rows-per-file)
    // FILES whatever the table size — so per-page wall time must be
    // ~FLAT from sf0.1 to sf1 when rows-per-file is held constant (files
    // scale 10x with the corpus, the 100 TB model). Contrast: the plain
    // seek top-k (Paginator.pageAfter) scans the whole remainder past
    // the cursor, which grows 10x.
    if (fullSweep) locally {
      // layouts derive from the probe's out arg (no hardcoded checkout
      // path) and ALWAYS rebuild — a stale layout from an earlier corpus
      // or nFiles choice would silently skew the flatness measurement,
      // and the rebuild is two bounded writes in a dev tool
      def buildKeyset(docsDir: String, outDir: String, nFiles: Int): Unit = {
        spark.read.parquet(docsDir).select(col("doc_id"), col("text"))
          .repartitionByRange(nFiles, col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(outDir)
        graft.operators.SkippingIndex.attachStats(spark, outDir, Seq("doc_id"))
      }
      val small = s"${out}_keyset01"
      val big = s"${out}_keyset1"
      buildKeyset(s"$src/documents.parquet", small, 32)
      buildKeyset(s"$out/documents.parquet", big, 320)
      def perPage(dir: String): (Double, Int) = {
        val walk = graft.operators.SkippingIndex.keysetWalk(spark, dir, "doc_id")
        walk.page(Long.MinValue, 1000)._1.collect() // warm codegen/scan init
        var cur = Long.MinValue
        var maxKept = 0
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        (0 until 20).foreach { _ =>
          val t0 = System.nanoTime()
          val (df, p) = walk.page(cur, 1000)
          val keys = df.select("doc_id").collect()
          times += (System.nanoTime() - t0) / 1e6
          maxKept = math.max(maxKept, p.filesKept)
          if (keys.nonEmpty) cur = keys.last.getLong(0)
        }
        (times.sorted.apply(times.length / 2), maxKept) // median ms/page
      }
      val (msSmall, keptS) = perPage(small)
      val (msBig, keptB) = perPage(big)
      println(f"[scale] keyset_page sf0.1=$msSmall%6.1f ms/page (files_kept<=$keptS)  " +
        f"sf1=$msBig%6.1f ms/page (files_kept<=$keptB)  ratio=${msBig / msSmall}%5.2fx")
      results += f"""  "keyset_page": {"sf01_ms_per_page": $msSmall%.1f, """ +
        f""""sf1_ms_per_page": $msBig%.1f, "ratio": ${msBig / msSmall}%.2f, """ +
        f""""files_kept_max_sf01": $keptS, "files_kept_max_sf1": $keptB, """ +
        f""""page_rows": 1000, "pages_walked": 20, "timing": "median_ms_per_page"}"""
    }

    // snapshot-CDC probe: SnapshotTable.changes' claim is that the diff
    // reads ONLY the manifests' symmetric difference, so a fixed-width
    // change band costs the same whatever the table size — per-diff
    // wall time must be ~FLAT from sf0.1 to sf1 when rows-per-file is
    // held constant (files scale 10x, the touched band does not).
    if (fullSweep) locally {
      import graft.operators.SnapshotTable
      def buildSnap(docsDir: String, outDir: String, nFiles: Int): Unit = {
        val p = new org.apache.hadoop.fs.Path(outDir)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
        SnapshotTable.create(spark, spark.read.parquet(docsDir)
          .select(col("doc_id"), col("text")).withColumn("commit_v", lit(0L))
          .repartitionByRange(nFiles, col("doc_id")), outDir)
      }
      def probe(dir: String): (Double, Int, Long) = {
        // fixed 500-key update band (present at both scales)
        val ch = SnapshotTable.read(spark, dir, Some(1L))
          .filter(col("doc_id").between(1000, 1499))
          .withColumn("text", concat(col("text"), lit(" upd")))
          .withColumn("commit_v", lit(1L)).withColumn("_deleted", lit(false))
        SnapshotTable.upsert(spark, dir, ch, "doc_id", "commit_v", "text")
        val cf = SnapshotTable.changedFiles(spark, dir, 1L, 2L)
        val t0 = System.nanoTime()
        val n = SnapshotTable.changes(spark, dir, "doc_id", 1L, 2L,
          ignoreCols = Seq("commit_v")).count()
        ((System.nanoTime() - t0) / 1e9, cf.removed.size + cf.added.size, n)
      }
      val small = s"${out}_cdc01"
      val big = s"${out}_cdc1"
      buildSnap(s"$src/documents.parquet", small, 32)
      buildSnap(s"$out/documents.parquet", big, 320)
      val (tS, filesS, nS) = probe(small)
      val (tB, filesB, nB) = probe(big)
      println(f"[scale] snapshot_changes sf0.1=$tS%6.2fs ($filesS files, $nS rows)  " +
        f"sf1=$tB%6.2fs ($filesB files, $nB rows)  ratio=${tB / tS}%5.2fx")
      results += f"""  "snapshot_changes": {"sf01_sec": $tS%.3f, "sf1_sec": $tB%.3f, """ +
        f""""ratio": ${tB / tS}%.2f, "files_touched_sf01": $filesS, """ +
        f""""files_touched_sf1": $filesB, "change_rows_sf01": $nS, """ +
        f""""change_rows_sf1": $nB, "band_keys": 500}"""
    }

    // bloom point-lookup probe: SkippingIndex.pruneBloom's claim is that
    // an equality lookup of a RARE value reads O(files holding it +
    // fpp·files) data files, with the probe itself metadata-sized — so
    // per-lookup wall time should grow FAR slower than the 10x corpus
    // (the fpp tail adds ~fpp·files false-positive reads; at 1% over
    // 320 files that is ~3 extra bounded reads, not 10x the work).
    if (fullSweep) locally {
      import graft.operators.SkippingIndex
      // tag: one distinguished RARE value per probed doc_id (doc_id
      // itself), everything else folded into 64 dense residues — rare
      // values live in exactly one file at both scales
      def buildTagged(docsDir: String, outDir: String, nFiles: Int): Unit = {
        spark.read.parquet(docsDir).select(col("doc_id"))
          .withColumn("tag",
            when(pmod(col("doc_id"), lit(97L)) === 0L, col("doc_id") + 1000000L)
              .otherwise(pmod(col("doc_id"), lit(64L))))
          .repartitionByRange(nFiles, col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(outDir)
        SkippingIndex.buildBloomIndex(spark,
          spark.read.parquet(outDir).inputFiles.toSeq.sorted, "tag",
          s"$outDir.bloomidx", expectedItemsPerFile = 4096L, fpp = 0.01)
      }
      def perLookup(dir: String): (Double, Int, Int) = {
        var maxKept = 0; var total = 0
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        (1 to 20).foreach { i =>
          val v = i.toLong * 97L + 1000000L // a rare tag present once
          val t0 = System.nanoTime()
          val p = SkippingIndex.pruneBloom(spark, s"$dir.bloomidx", v,
            org.apache.spark.sql.types.LongType)
          val n = if (p.filesKept == 0) 0L
            else spark.read.parquet(p.kept: _*)
              .filter(col("tag") === v).count()
          times += (System.nanoTime() - t0) / 1e6
          require(n == 1L, s"rare tag $v must match exactly once, got $n")
          maxKept = math.max(maxKept, p.filesKept); total = p.filesTotal
        }
        (times.sorted.apply(times.length / 2), maxKept, total)
      }
      val small = s"${out}_bloom01"
      val big = s"${out}_bloom1"
      buildTagged(s"$src/documents.parquet", small, 32)
      buildTagged(s"$out/documents.parquet", big, 320)
      val (msS, keptS, totS) = perLookup(small)
      val (msB, keptB, totB) = perLookup(big)
      println(f"[scale] bloom_lookup sf0.1=$msS%6.1f ms (kept<=$keptS/$totS)  " +
        f"sf1=$msB%6.1f ms (kept<=$keptB/$totB)  ratio=${msB / msS}%5.2fx")
      results += f"""  "bloom_lookup": {"sf01_ms_per_lookup": $msS%.1f, """ +
        f""""sf1_ms_per_lookup": $msB%.1f, "ratio": ${msB / msS}%.2f, """ +
        f""""files_kept_max_sf01": $keptS, "files_total_sf01": $totS, """ +
        f""""files_kept_max_sf1": $keptB, "files_total_sf1": $totB, """ +
        f""""lookups": 20, "timing": "median_ms_per_lookup"}"""
    }

    // kNN-join probe at the OPERATING ENVELOPE: the gate pins nCells=16
    // for oracle replayability, but a deployment sizes cells to the
    // corpus (cells ∝ N keeps per-cell occupancy constant), so the probe
    // scales 16 → 160 with the 10x corpus. knnJoin's claim is that the
    // shuffle-hash-join-on-cell shape then costs (queries × nProbe ×
    // occupancy) — ~10x work for 10x queries with 10x output — where the
    // broadcast-replay shape would ship the corpus-sized query side to
    // every executor. Output-normalized ratio ≈ time ratio / rows ratio.
    if (fullSweep) locally {
      import graft.operators.IvfIndex
      def probe(dir: String, nCells: Int): (Double, Long) = {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        var rows = 0L
        var best = Double.MaxValue
        (0 until 2).foreach { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val centroids = IvfIndex.train(
            e.filter(pmod(col("vec_id"), lit(2)) === 0), "vec_id", "embedding",
            nCells = nCells, sampleFraction = 1.0)
          val indexed = IvfIndex.index(e, "vec_id", "embedding", centroids)
          rows = IvfIndex.knnJoin(indexed, e, "vec_id", "embedding", centroids,
            k = 5, nProbe = 4, excludeSelf = true).count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (best, rows)
      }
      val (tS, nS) = probe(src, 16)
      val (tB, nB) = probe(out, 160)
      val norm = (tB / tS) / (nB.toDouble / nS.toDouble)
      println(f"[scale] ann_knn_join sf0.1=$tS%6.2fs ($nS rows, 16 cells)  " +
        f"sf1=$tB%7.2fs ($nB rows, 160 cells)  ratio=${tB / tS}%5.1fx " +
        f"(output-normalized ${norm}%4.2fx)")
      results += f"""  "ann_knn_join_envelope": {"sf01_sec": $tS%.3f, "sf1_sec": $tB%.3f, """ +
        f""""sf01_rows": $nS, "sf1_rows": $nB, "ratio": ${tB / tS}%.2f, """ +
        f""""output_normalized_ratio": $norm%.2f, "cells_sf01": 16, "cells_sf1": 160, """ +
        f""""note": "cells scale with the corpus (constant occupancy) - the deployment shape"}"""
    }

    // deep-merge BPE probe: 1024 merge rounds. The sf1 documents
    // vocabulary EXHAUSTS at ~368 merges (every distinct word collapses
    // to one symbol — it is replica-structured synthetic text), so the
    // deep probe runs on a 60k-distinct-word random vocabulary, the
    // shape a real tokenizer trains on. The wall-clock comparison vs 64
    // rounds bounds marginal per-round cost, and the TrainStats counters
    // prove the incremental property directly: total word updates across
    // rounds ≪ rounds × vocabulary (a full-rescan trainer touches the
    // whole vocab every round).
    if (fullSweep) locally {
      val rnd = new scala.util.Random(42)
      val letters = "abcdefghijklmnopqrstuvwxyz"
      val vocabN = 60000
      val rows = (0 until vocabN).map { i =>
        (i.toLong, (0 until (6 + rnd.nextInt(9))).map(_ => letters(rnd.nextInt(26))).mkString)
      }
      import spark.implicits._
      val docs = rows.toDF("doc_id", "text").repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      def trainTimed(m: Int): (Double, graft.operators.Bpe.TrainStats) = {
        var st: graft.operators.Bpe.TrainStats = null
        val t0 = System.nanoTime()
        graft.operators.Bpe.train(docs, "text", merges = m, onStats = st = _).collect()
        ((System.nanoTime() - t0) / 1e9, st)
      }
      trainTimed(64) // warmup
      val (t64, _) = trainTimed(64)
      val (t1k, s1k) = trainTimed(1024)
      val perRound = (t1k - t64) / (1024 - 64)
      // encode under the FULL 1024-rule table: the bounded kernel's cost
      // per word is rule-count-independent (the old fold would have been
      // a 1024-deep replace chain)
      val rules1k = graft.operators.Bpe.train(docs, "text", merges = 1024)
        .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val tE0 = System.nanoTime()
      val encRows = graft.operators.Bpe
        .encodeSymbolCounts(docs, "doc_id", "text", rules1k).count()
      val tEnc = (System.nanoTime() - tE0) / 1e9
      println(f"[scale] bpe_encode 60k words under 1024 rules: $tEnc%.2fs ($encRows rows)")
      // the STRUCTURAL driver bound: a distributed top-V cut at
      // V >= vocab must leave all 1024 rules identical (the cut is the
      // memory bound, not a model change)
      val rulesCapped = graft.operators.Bpe
        .train(docs, "text", merges = 1024, maxVocab = 100000)
        .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      require(rulesCapped == rules1k,
        "maxVocab >= vocab changed the learned rules — top-V cut is not a no-op")
      println(s"[scale] bpe_train maxVocab=100000 (>= 60k vocab): all 1024 rules identical")
      docs.unpersist()
      println(f"[scale] bpe_train 60k-word vocab: 64 merges $t64%.2fs, 1024 merges $t1k%.2fs " +
        f"(marginal ${perRound * 1000}%.2f ms/round); word updates " +
        f"${s1k.wordUpdates} over ${s1k.rounds} rounds vs full-rescan " +
        f"${s1k.vocabWords * s1k.rounds} (${s1k.vocabWords} vocab words)")
      results += f"""  "bpe_train_deep": {"merges64_sec": $t64%.3f, "merges1024_sec": $t1k%.3f, """ +
        f""""marginal_ms_per_round": ${perRound * 1000}%.3f, "vocab_words": ${s1k.vocabWords}, """ +
        f""""word_updates_1024": ${s1k.wordUpdates}, "symbol_ops_1024": ${s1k.symbolOps}, """ +
        f""""full_rescan_equiv_updates": ${s1k.vocabWords * s1k.rounds}, """ +
        f""""encode_1024rules_sec": $tEnc%.3f, "capped_vocab_rules_identical": true}"""
    }
    val rt = Runtime.getRuntime
    val json = "{\n\"queries\": {\n" + results.mkString(",\n") + "\n},\n" +
      s""""env": {"available_processors": ${rt.availableProcessors}, """ +
      s""""max_heap_mb": ${rt.maxMemory / (1 << 20)}, """ +
      s""""loadavg_before": "$loadBefore", "loadavg_after": "${loadavg()}", """ +
      s""""timing": "min_of_2_cache_cleared_forced_evaluation"},\n""" +
      s""""src": "$src", "replicas": $Reps\n}"""
    val artifact = new java.io.File(out).getAbsoluteFile.getParent + "/bench_sf1.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(artifact), json)
    println(s"[scale] wrote $artifact")
    spark.stop()
  }

  private def build(spark: SparkSession, src: String, out: String): Unit = {
    new java.io.File(out).mkdirs()
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until Reps).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + k * 10000000L)
        .withColumn("text", regexp_replace(col("text"), "(\\p{L}+)", "$1" + k))
    }.reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until Reps).map { k =>
      if (k == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + k * 10000000L)
        .withColumn("embedding", expr(
          s"""transform(embedding, (x, i) ->
             |  CAST(x * (CASE WHEN pmod(xxhash64($k, i), 2) = 0
             |                 THEN 1.0 ELSE -1.0 END) AS FLOAT))""".stripMargin))
    }.reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val ev = spark.read.parquet(s"$src/events.parquet") // ts passes through as stored
    (0 until Reps).map { k =>
      if (k == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + k * 100000000L)
        .withColumn("user_id", col("user_id") + k * 10000000L)
    }.reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"[scale] built $out: " +
      s"${spark.read.parquet(s"$out/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$out/embeddings.parquet").count()} vectors, " +
      s"${spark.read.parquet(s"$out/events.parquet").count()} events")
  }
}

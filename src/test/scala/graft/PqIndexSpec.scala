package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PqIndex, SimilaritySearch}
import graft.sources.Tables

class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")

  test("train is deterministic; encode compresses to m codes per vector") {
    val m1 = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8, kCodes = 16, iters = 2)
    val m2 = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8, kCodes = 16, iters = 2)
    assert(m1.codebooks.zip(m2.codebooks).forall { case (a, b) => a.sameElements(b) })
    assert(m1.dim == 64 && m1.d == 8)

    val enc = PqIndex.encode(emb, "vec_id", "embedding", m1)
    assert(enc.count() == emb.count(), "encoding covers the full corpus")
    val row = enc.first()
    assert(row.getSeq[Int](2).length == 8, "m codes per vector")
    assert(row.getSeq[Int](2).forall(c => c >= 0 && c < 16), "codes within codebook range")
    // schema carries NO vector column: codes + norm only (the compression)
    assert(!enc.columns.contains("v") && !enc.columns.contains("embedding"))
  }

  test("ADC + exact re-rank recall vs brute force; self-match survives") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 16, m = 8, kCodes = 16)
    val enc = PqIndex.encode(emb, "vec_id", "embedding", model)
    val q = emb.filter(col("vec_id") < 10)
    val approx = PqIndex.search(enc, emb, "vec_id", "embedding",
      q, "vec_id", "embedding", model, k = 10, nProbe = 4, refine = 4)
    val got = approx.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
    assert((0L until 10L).forall(i => got.contains((i, i))),
      "query's own vector survives ADC + re-rank")
    // re-ranked scores are exact cosines: the self-match is 1.0
    val self = approx.filter(col("qid") === col("id")).select("cosine").collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-3))
  }

  test("persisted index round-trip: identical results, cells pruned on read") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8,
      kCodes = 16, iters = 1)
    val enc = PqIndex.encode(emb, "vec_id", "embedding", model)
    val dir = TestSpark.scratch("pq_index")
    PqIndex.writeIndex(enc, dir)
    val disk = PqIndex.readIndex(spark, dir)
    val q = emb.filter(col("vec_id") < 5)
    def run(idx: org.apache.spark.sql.DataFrame) =
      PqIndex.search(idx, emb, "vec_id", "embedding", q, "vec_id", "embedding",
        model, k = 10, nProbe = 2, refine = 4)
    assert(run(disk).collect().toSeq == run(enc).collect().toSeq,
      "on-disk index must return byte-identical results")
    // the probed-cell join must dynamic-partition-prune the index scan:
    // only nProbe of nCells directories are read. AQE off so the physical
    // tree is directly traversable (stages hide the scans otherwise)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      val df = run(disk)
      df.collect()
      df.queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("pq_index")) => f
    }
    assert(scans.nonEmpty, s"expected a scan of the persisted index:\n$plan")
    scans.foreach { f =>
      assert(f.partitionFilters.exists(_.toString.contains("dynamicpruning")),
        s"index scan must carry a dynamic cell-pruning filter:\n$f")
    }
  }

  test("incremental append: half-then-half index equals the one-shot index") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8,
      kCodes = 16, iters = 1)
    val dir = TestSpark.scratch("pq_index_incr")
    PqIndex.writeIndex(
      PqIndex.encode(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", model), dir)
    PqIndex.appendToIndex(
      emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", model, dir)
    val q = emb.filter(col("vec_id") < 5)
    def run(idx: org.apache.spark.sql.DataFrame) =
      PqIndex.search(idx, emb, "vec_id", "embedding", q, "vec_id", "embedding",
        model, k = 5).collect().toSeq
    assert(run(PqIndex.readIndex(spark, dir)) ==
      run(PqIndex.encode(emb, "vec_id", "embedding", model)),
      "append-built index must search byte-identically to a one-shot build")
  }

  test("tombstone delete: served search equals an index rebuilt from survivors") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8,
      kCodes = 16, iters = 1)
    val dir = TestSpark.scratch("pq_index_del")
    PqIndex.writeIndex(PqIndex.encode(emb, "vec_id", "embedding", model), dir)
    // delete the odd half via the tombstone sidecar — no index rewrite
    PqIndex.deleteFromIndex(spark,
      emb.filter(col("vec_id") % 2 === 1).select("vec_id"), "vec_id", dir)
    val q = emb.filter(col("vec_id") < 5)
    def run(idx: org.apache.spark.sql.DataFrame) =
      PqIndex.search(idx, emb, "vec_id", "embedding", q, "vec_id", "embedding",
        model, k = 5).collect().toSeq
    val served = run(PqIndex.readIndex(spark, dir))
    val rebuilt = run(PqIndex.encode(
      emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", model))
    assert(served == rebuilt,
      "tombstoned index must search byte-identically to a survivors-only rebuild")
    assert(served.nonEmpty &&
      served.forall(r => r.getLong(1) % 2 == 0), "no deleted id may surface")
    // deleting an already-deleted or unknown id is a no-op
    PqIndex.deleteFromIndex(spark,
      spark.range(1, 10, 2).toDF("vec_id"), "vec_id", dir)
    assert(run(PqIndex.readIndex(spark, dir)) == served, "re-delete is idempotent")
    // the delete committed NEW versions; version 1 still serves the full
    // pre-delete index (pinned time travel, files immutable until vacuum)
    assert(PqIndex.readIndex(spark, dir, Some(1L)).count() == emb.count())
  }

  test("compactIndex: identical search, empty sidecar, no anti-join in the plan") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8,
      kCodes = 16, iters = 1)
    val dir = TestSpark.scratch("pq_index_compact")
    PqIndex.writeIndex(PqIndex.encode(emb, "vec_id", "embedding", model), dir)
    PqIndex.deleteFromIndex(spark,
      emb.filter(col("vec_id") % 2 === 1).select("vec_id"), "vec_id", dir)
    val q = emb.filter(col("vec_id") < 5)
    def run() =
      PqIndex.search(PqIndex.readIndex(spark, dir), emb, "vec_id", "embedding",
        q, "vec_id", "embedding", model, k = 5).collect().toSeq
    val before = run()
    // RACING READER: pin the pre-compaction versions before compacting —
    // v1 = full index, v2 = tombstoned. The manifest commit over
    // immutable filesets must leave both serving exactly what they
    // pinned, however the compaction rewrites cells (the concurrent-
    // reader guarantee the old delete+rename design could not give).
    val pinnedFull = PqIndex.readIndex(spark, dir, Some(1L))
    val pinnedMasked = PqIndex.readIndex(spark, dir, Some(2L))
    PqIndex.compactIndex(spark, dir)
    assert(run() == before,
      "compaction must not change served results, row for row")
    assert(pinnedFull.count() == emb.count(),
      "a reader pinned to v1 during compaction must still see the full index")
    assert(PqIndex.search(pinnedMasked, emb, "vec_id", "embedding",
      q, "vec_id", "embedding", model, k = 5).collect().toSeq == before,
      "a reader pinned to the tombstoned v2 must serve identically through the compaction")
    // physical state: current version holds exactly the survivors and
    // references no tombstone files — the serve plan has no anti-join
    assert(PqIndex.readIndex(spark, dir).count() ==
      emb.filter(col("vec_id") % 2 === 0).count(),
      "tombstoned rows are physically gone from the compacted version")
    val plan = PqIndex.readIndex(spark, dir).queryExecution.executedPlan
    assert(!plan.toString.toLowerCase.contains("anti"),
      s"compacted index must serve without a tombstone anti-join:\n$plan")
    // compacting an already-compacted index is a no-op
    PqIndex.compactIndex(spark, dir)
    assert(run() == before)
    // vacuum drops the old versions' now-unreferenced files (grace 0:
    // provably no writer in flight here) — the tomb tree empties and
    // only the compacted version remains readable
    val deleted = PqIndex.vacuumIndex(spark, dir, keepLast = 1, graceMs = 0L)
    assert(deleted.nonEmpty, "vacuum must reap the pre-compaction files")
    assert(PqIndex.versions(spark, dir).length == 1)
    val tombRoot = new java.io.File(dir, "tomb")
    assert(!tombRoot.exists() ||
      tombRoot.listFiles().forall(d => d.listFiles().forall(c =>
        c.listFiles() == null || c.listFiles().isEmpty)),
      "after compact+vacuum no tombstone parquet may remain on disk")
    assert(run() == before, "the retained version serves on after vacuum")
  }

  test("append after delete unmasks the id (delete-then-reinsert update path)") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8,
      kCodes = 16, iters = 1)
    val dir = TestSpark.scratch("pq_index_reins")
    PqIndex.writeIndex(PqIndex.encode(emb, "vec_id", "embedding", model), dir)
    val victim = emb.filter(col("vec_id") === 3)
    PqIndex.deleteFromIndex(spark, victim.select("vec_id"), "vec_id", dir)
    assert(PqIndex.readIndex(spark, dir).filter(col("id") === 3).count() == 0,
      "deleted id must be masked")
    // re-insert the same id (same vector → same cell): must serve again,
    // EXACTLY ONCE — the superseded tombstone's old row is purged, not
    // revived next to the new copy
    PqIndex.appendToIndex(victim, "vec_id", "embedding", model, dir)
    assert(PqIndex.readIndex(spark, dir).filter(col("id") === 3).count() == 1,
      "re-appended id must be served once, not masked and not duplicated")
    // other tombstones survive the append untouched
    PqIndex.deleteFromIndex(spark,
      emb.filter(col("vec_id").isin(5, 7)).select("vec_id"), "vec_id", dir)
    PqIndex.appendToIndex(emb.filter(col("vec_id") === 5), "vec_id", "embedding",
      model, dir)
    val ids = PqIndex.readIndex(spark, dir).filter(col("id").isin(5, 7))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(5L), s"append of 5 must unmask only 5, kept 7 masked: $ids")
    // when the last tombstone is superseded the current version carries
    // no tombstone files at all — the serve plan loses its anti-join
    PqIndex.appendToIndex(emb.filter(col("vec_id") === 7), "vec_id", "embedding",
      model, dir)
    assert(!PqIndex.readIndex(spark, dir).queryExecution.executedPlan
      .toString.toLowerCase.contains("anti"),
      "an all-superseded tombstone set must vanish from the manifest, not linger empty")
    // every id is live exactly once: the three delete→reinsert round
    // trips net out to the original corpus
    assert(PqIndex.readIndex(spark, dir).count() == emb.count())
    assert(PqIndex.readIndex(spark, dir).groupBy("id").count()
      .filter(col("count") > 1).count() == 0, "no id may be duplicated")
  }

  test("delete resolves cells via footer-pruned files on an id-clustered index") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8,
      kCodes = 16, iters = 1)
    val dir = TestSpark.scratch("pq_index_del_prune")
    // id-clustered filesets: range-partition the encode output by id, so
    // each cell directory holds files with narrow id bands — the layout
    // an ingest-ordered corpus produces naturally
    PqIndex.writeIndex(
      PqIndex.encode(emb, "vec_id", "embedding", model)
        .repartitionByRange(8, col("id")), dir)
    val n = emb.count()
    // a narrow id band: the footer stats must rule out every file whose
    // id range misses it — far fewer than the full file list
    val prune = PqIndex.deleteFromIndex(spark,
      emb.filter(col("vec_id") < 20).select("vec_id"), "vec_id", dir)
    assert(prune.filesKept < prune.filesTotal / 2,
      s"id-clustered delete must footer-prune: read ${prune.filesKept}/${prune.filesTotal}")
    // tombstones identical to the unpruned contract: exactly the batch's
    // ids are masked, everything else serves
    val served = PqIndex.readIndex(spark, dir).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(served.size.toLong == n - 20 && !served.exists(_ < 20L),
      "pruned delete must mask exactly the deleted ids")
    // a batch provably outside every file's id range is a stats-only
    // no-op: zero files read, no version committed
    val vBefore = PqIndex.versions(spark, dir).last
    val miss = PqIndex.deleteFromIndex(spark,
      spark.range(10000000L, 10000005L).toDF("vec_id"), "vec_id", dir)
    assert(miss.filesKept == 0, s"out-of-range delete must prune everything: $miss")
    assert(PqIndex.versions(spark, dir).last == vBefore, "no-op must not commit")
  }

  test("model save/load round-trip: identical model, identical search") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 8, m = 8,
      kCodes = 16, iters = 1)
    val dir = TestSpark.scratch("pq_model")
    PqIndex.saveModel(spark, model, dir)
    val loaded = PqIndex.loadModel(spark, dir)
    assert(loaded.m == model.m && loaded.kCodes == model.kCodes)
    assert(loaded.centroids.map(_._1).sameElements(model.centroids.map(_._1)))
    assert(loaded.centroids.zip(model.centroids).forall {
      case ((_, a), (_, b)) => a.sameElements(b) })
    assert(loaded.codebooks.zip(model.codebooks).forall {
      case (a, b) => a.sameElements(b) })
    // a search under the loaded model is byte-identical
    val enc = PqIndex.encode(emb, "vec_id", "embedding", model)
    val q = emb.filter(col("vec_id") < 5)
    def run(mdl: PqIndex.Model) =
      PqIndex.search(enc, emb, "vec_id", "embedding", q, "vec_id", "embedding",
        mdl, k = 5).collect().toSeq
    assert(run(loaded) == run(model))
  }

  test("sampled training preserves recall (the 100 TB train path)") {
    val model = PqIndex.train(emb, "vec_id", "embedding", nCells = 16, m = 8,
      kCodes = 16, sampleFraction = 0.5)
    val enc = PqIndex.encode(emb, "vec_id", "embedding", model)
    assert(enc.count() == emb.count(), "encode covers the FULL corpus")
    val q = emb.filter(col("vec_id") < 10)
    val got = PqIndex.search(enc, emb, "vec_id", "embedding",
      q, "vec_id", "embedding", model, k = 10, nProbe = 4, refine = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.4, s"sampled-train recall=$recall")
  }
}

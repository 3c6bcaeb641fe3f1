package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupStore}

/** Exact oracles for the incremental content-hash store: batch-split
  * invariance against the one-shot truth, first-arrival-wins semantics
  * under out-of-order arrival, store distinctness, and the returned
  * survivor frame's stability across its own append.
  */
class DedupStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(name: String): String = {
    val d = TestSpark.scratch(name) + "/store"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  // 12 docs in 4 duplicate families (texts t0..t3), ids interleaved so
  // families span every batch split used below
  private lazy val docs = (0 until 12)
    .map(i => (i.toLong, s"t${i % 4} body"))
    .toDF("doc_id", "text")

  test("id-ordered incremental ingest equals the one-shot exact dedup") {
    val store = freshStore("dedupstore-ordered")
    Seq((0, col("doc_id") < 4), (1, col("doc_id") >= 4 && col("doc_id") < 8),
        (2, col("doc_id") >= 8)).foreach { case (tag, cond) =>
      DedupStore.ingest(spark, docs.filter(cond), "doc_id", "text", store, tag)
      ()
    }
    val got = DedupStore.read(spark, store)
      .select("content_hash", "keep_id").sort("content_hash")
      .as[(String, Long)].collect().toSeq
    val want = Dedup.exact(docs, "doc_id", "text")
      .select("content_hash", "keep_id").sort("content_hash")
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    // everything landed in batch 0: ids 0..3 cover all four families
    val batches = DedupStore.read(spark, store)
      .select("arrival_batch").distinct().as[Long].collect().toSeq
    assert(batches == Seq(0))
  }

  test("out-of-order arrival: first arrival wins, not the global min id") {
    val store = freshStore("dedupstore-ooo")
    // high ids arrive first: keepers must be the batch-0 minima (8..11),
    // NOT the global minima (0..3)
    DedupStore.ingest(spark, docs.filter(col("doc_id") >= 8), "doc_id", "text", store, 0)
    DedupStore.ingest(spark, docs.filter(col("doc_id") < 8), "doc_id", "text", store, 1)
    val keepers = DedupStore.read(spark, store)
      .select("keep_id").as[Long].collect().toSet
    assert(keepers == Set(8L, 9L, 10L, 11L))
    assert(DedupStore.read(spark, store)
      .select("arrival_batch").distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("store stays distinct by content_hash across ingests") {
    val store = freshStore("dedupstore-distinct")
    (0 until 3).foreach { tag =>
      // the SAME batch re-ingested: only the first contributes rows
      DedupStore.ingest(spark, docs, "doc_id", "text", store, tag)
      ()
    }
    val byHash = DedupStore.read(spark, store)
      .groupBy("content_hash").count().select("count").as[Long].collect()
    assert(byHash.nonEmpty && byHash.forall(_ == 1L))
  }

  test("returned survivors are materialized before the append (stable frame)") {
    val store = freshStore("dedupstore-stable")
    val s0 = DedupStore.ingest(spark, docs.filter(col("doc_id") < 4),
      "doc_id", "text", store, 0)
    // second ingest changes the store on disk; the first survivor frame
    // must still read its own pre-append content
    DedupStore.ingest(spark, docs.filter(col("doc_id") >= 4), "doc_id", "text", store, 1)
    assert(s0.count() == 4)
    assert(s0.select("keep_id").as[Long].collect().toSet == Set(0L, 1L, 2L, 3L))
    // and the second ingest found nothing new
    assert(DedupStore.read(spark, store).count() == 4)
  }

  test("streaming maintainer: multi-batch arrival covers the one-shot hash set") {
    val srcDir = TestSpark.scratch("dedupstore-stream-src")
    val rmSrc = new org.apache.hadoop.fs.Path(srcDir)
    rmSrc.getFileSystem(spark.sessionState.newHadoopConf()).delete(rmSrc, true)
    graft.sources.Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(4).write.mode("overwrite").parquet(srcDir)
    val store = freshStore("dedupstore-stream")
    val ck = TestSpark.scratch("dedupstore-stream-ck")
    val rmCk = new org.apache.hadoop.fs.Path(ck)
    rmCk.getFileSystem(spark.sessionState.newHadoopConf()).delete(rmCk, true)
    val schema = spark.read.parquet(srcDir).schema
    val q = DedupStore.maintainStream(spark, srcDir, schema,
      "doc_id", "text", store, ck)
    q.awaitTermination(180000)
    assert(q.exception.isEmpty)
    val corpus = spark.read.parquet(srcDir)
      .select(col("doc_id").cast("long").as("keep_id"),
        sha2(col("text"), 256).as("content_hash"))
    val st = DedupStore.read(spark, store)
    // one row per distinct content, whatever the file-to-batch split was
    assert(st.count() ==
      corpus.select("content_hash").distinct().count())
    assert(st.groupBy("content_hash").count()
      .filter(col("count") > 1).count() == 0)
    // every keeper is a genuine (id, hash) pair of the corpus: the
    // first-arrival winner is always a real member of its family
    assert(st.select("content_hash", "keep_id")
      .join(corpus, Seq("content_hash", "keep_id"), "left_anti")
      .count() == 0)
  }

  test("compactStore: ceil(n/target) files, identical content and survivors, ingest continues") {
    val store = freshStore("dedupstore-compact")
    // 900 distinct texts over 3 ingests: each ingest commits its own
    // hash-partitioned fileset (up to shuffle-partitions files apiece) —
    // the small-file shape compaction exists to fix
    val corpus = (0 until 900).map(i => (i.toLong, s"unique text $i"))
      .toDF("doc_id", "text")
    (0 until 3).foreach { b =>
      DedupStore.ingest(spark,
        corpus.filter(col("doc_id") >= b * 300 && col("doc_id") < (b + 1) * 300),
        "doc_id", "text", store, b.toLong)
      ()
    }
    val before = DedupStore.read(spark, store)
      .orderBy("content_hash").collect().map(_.toSeq).toSeq
    // one fileset PER BATCH (AQE coalesces each tiny batch to one file
    // here; at scale each is shuffle-partitions files) — compaction's
    // job is collapsing the per-batch filesets into ceil(n/target)
    val filesBefore = DedupStore.read(spark, store).inputFiles.length
    assert(filesBefore >= 3, s"3 per-batch filesets must hold >=3 files: $filesBefore")
    DedupStore.compactStore(spark, store, targetRecords = 450L)
    // ceil(900/450) = 2 hash-partitioned files
    assert(DedupStore.read(spark, store).inputFiles.length == 2,
      s"compaction must land ceil(n/target) files")
    assert(DedupStore.read(spark, store)
      .orderBy("content_hash").collect().map(_.toSeq).toSeq == before,
      "compaction must be content-invisible")
    // vacuum reclaims the superseded per-batch filesets; content holds
    val deleted = DedupStore.vacuumStore(spark, store, keepLast = 1, graceMs = 0L)
    assert(deleted.nonEmpty)
    assert(DedupStore.read(spark, store).count() == 900)
    // the next ingest anti-joins the COMPACTED store: re-delivered
    // content contributes nothing, genuinely-new content lands
    val b3 = ((0 until 10).map(i => (1000L + i, s"unique text $i")) ++ // dups of batch 0
      (0 until 5).map(i => (2000L + i, s"fresh text $i"))).toDF("doc_id", "text")
    val fresh = DedupStore.ingest(spark, b3, "doc_id", "text", store, 3L)
    assert(fresh.count() == 5, "only genuinely-new content survives the compacted store")
    assert(DedupStore.read(spark, store).count() == 905)
  }

  test("takedown forgets content: duplicates vanish, re-ingest re-records fresh, compact folds, replay exactly-once") {
    val store = freshStore("dedupstore-takedown")
    DedupStore.ingest(spark, docs.filter($"doc_id" < 6), "doc_id", "text",
      store, 0L)
    DedupStore.ingest(spark, docs.filter($"doc_id" >= 6), "doc_id", "text",
      store, 1L)
    assert(DedupStore.read(spark, store).count() == 4L) // 4 families
    // takedown of doc 1's content (family t1): the HASH leaves the
    // store, so doc 1 AND its duplicates (5, 9) all leave survivors
    assert(DedupStore.takedown(spark,
      docs.filter($"doc_id" === 1L), "text", store, tag = 2L) == 1L)
    val after = DedupStore.read(spark, store)
    assert(after.count() == 3L)
    val surv = DedupStore.survivors(spark, docs, "doc_id", store)
      .select("doc_id").as[Long].collect().toSet
    assert(!surv.exists(id => id % 4 == 1),
      s"the whole duplicate family must leave the survivor view: $surv")
    // idempotent: absent (already-forgotten or never-seen) hashes no-op
    assert(DedupStore.takedown(spark,
      docs.filter($"doc_id" === 1L), "text", store, tag = 3L) == 0L)
    assert(DedupStore.takedown(spark,
      Seq((99L, "never ingested")).toDF("doc_id", "text"), "text",
      store, tag = 4L) == 0L)
    // REPLAYED takedown tag: supersedes its own commit, content stable
    assert(DedupStore.takedown(spark,
      docs.filter($"doc_id" === 1L), "text", store, tag = 2L) == 1L)
    assert(DedupStore.read(spark, store).count() == 3L)
    // FORGET, not ban: re-ingesting the content records a fresh first
    // arrival (new keeper = the re-ingest batch's lowest id)
    DedupStore.ingest(spark, docs.filter($"doc_id" % 4 === 1L),
      "doc_id", "text", store, 5L)
    val re = DedupStore.read(spark, store)
      .filter(col("keep_id") % 4 === 1L)
      .select("keep_id", "arrival_batch").as[(Long, Long)].collect().toSeq
    assert(re == Seq((1L, 5L)),
      s"re-ingested content must re-record fresh (got $re)")
    // compaction folds tombstones: rows identical, no X entries left,
    // vacuum reclaims the superseded filesets
    val before = DedupStore.read(spark, store)
      .select("content_hash", "keep_id", "arrival_batch")
      .sort("content_hash").collect().toSeq
    DedupStore.compactStore(spark, store, targetRecords = 1L << 20)
    assert(DedupStore.read(spark, store)
      .select("content_hash", "keep_id", "arrival_batch")
      .sort("content_hash").collect().toSeq == before,
      "compaction must be content-invisible")
    assert(DedupStore.vacuumStore(spark, store, keepLast = 1,
      graceMs = 0L).nonEmpty)
    assert(DedupStore.read(spark, store)
      .select("content_hash", "keep_id", "arrival_batch")
      .sort("content_hash").collect().toSeq == before)
  }

  test("survivors view joins keepers back to the corpus") {
    val store = freshStore("dedupstore-surv")
    DedupStore.ingest(spark, docs, "doc_id", "text", store, 0)
    val surv = DedupStore.survivors(spark, docs, "doc_id", store)
      .select("doc_id").as[Long].collect().toSet
    assert(surv == Set(0L, 1L, 2L, 3L))
  }
}

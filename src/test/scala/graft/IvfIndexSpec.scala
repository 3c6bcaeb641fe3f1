package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, SimilaritySearch}
import graft.sources.Tables

class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")

  test("train produces stable centroids and full-coverage assignment") {
    val c1 = IvfIndex.train(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    val c2 = IvfIndex.train(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    assert(c1.map(_._1).toSeq == (0 until 8))
    // deterministic across runs
    assert(c1.zip(c2).forall { case ((i, a), (j, b)) => i == j && a.sameElements(b) })
    val indexed = IvfIndex.index(emb, "vec_id", "embedding", c1)
    assert(indexed.count() == emb.count())
    val cells = indexed.groupBy("cell").count().collect()
    assert(cells.length >= 2, "corpus must spread across cells")
  }

  test("search recall vs brute force; self-match survives") {
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nCells = 16)
    val indexed = IvfIndex.index(emb, "vec_id", "embedding", centroids)
    val q = emb.filter(col("vec_id") < 10)
    val approx = IvfIndex.search(indexed, q, "vec_id", "embedding", centroids,
      k = 10, nProbe = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
    assert((0L until 10L).forall(i => approx.contains((i, i))),
      "query's own vector lies in its own best cell")
  }

  test("sampled training preserves recall (the 100 TB train path)") {
    // centroids trained on half the corpus must index/search as well as
    // full-corpus training — the recall bar is the same as above
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nCells = 16,
      sampleFraction = 0.5)
    val indexed = IvfIndex.index(emb, "vec_id", "embedding", centroids)
    assert(indexed.count() == emb.count(), "assignment covers the FULL corpus")
    val q = emb.filter(col("vec_id") < 10)
    val approx = IvfIndex.search(indexed, q, "vec_id", "embedding", centroids,
      k = 10, nProbe = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"sampled-train recall=$recall")
    assert((0L until 10L).forall(i => approx.contains((i, i))))
  }
}

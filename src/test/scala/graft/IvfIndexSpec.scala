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

  test("knnJoin == search per query (strategy-invisible); shuffle join, no broadcast of the query side") {
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nCells = 16)
    val indexed = IvfIndex.index(emb, "vec_id", "embedding", centroids)
    // every embedding is a query — the corpus-sized query side
    val viaJoin = IvfIndex.knnJoin(indexed, emb, "vec_id", "embedding",
      centroids, k = 5, nProbe = 4, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    // the broadcast path with self filtered AFTER must agree on the same
    // neighbor set when it asks for k neighbors beyond self (k+1, drop
    // self, keep 5): the join is a pure execution-strategy change
    val viaSearch = IvfIndex.search(indexed, emb, "vec_id", "embedding",
      centroids, k = 6, nProbe = 4)
      .filter(col("qid") =!= col("id"))
      .withColumn("rk2", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cosine").desc, col("id").asc)))
      .filter(col("rk2") <= 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaJoin.map(t => (t._1, t._2)) == viaSearch,
      "shuffle knnJoin and broadcast search must rank the same neighbors")
    assert(viaJoin.forall(_._4 <= 5) && viaJoin.nonEmpty)
    // plan shape: the probed-queries × index join must NOT broadcast
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = IvfIndex.knnJoin(indexed, emb, "vec_id", "embedding",
        centroids, k = 5, nProbe = 4, excludeSelf = true)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val bhj = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
      assert(bhj.isEmpty, s"knnJoin must not broadcast a corpus-sized query side:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("nearestCells kernel == the struct-array formulation it replaced (ties, zero vectors, order)") {
    import spark.implicits._
    import graft.functions.expr.GraftFunctions
    // adversarial fixture: a DUPLICATED centroid forces exact score ties
    // (rule: higher cell id wins, greatest()'s struct order), and a zero
    // vector scores 0.0 against every cell (all-tie)
    val rnd = new scala.util.Random(7)
    val dim = 8
    val cents: Array[(Int, Array[Double])] = Array.tabulate(6)(i =>
      (i, Array.fill(dim)(rnd.nextDouble() - 0.5)))
    cents(4) = (4, cents(2)._2.clone())
    val vecs = ((0 until 200).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() - 0.5))) :+
      (999L, Seq.fill(dim)(0.0)))
      .toDF("id", "v")
    // legacy single-best: greatest over (score, cell) structs
    val scored = cents.map { case (cellId, c) =>
      struct(GraftFunctions.cosine(col("v"), lit(c)).as("score"),
        lit(cellId).as("cell"))
    }
    val legacy1 = vecs.withColumn("cell", greatest(scored.toSeq: _*).getField("cell"))
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kernel1 = IvfIndex.assign(vecs, cents)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel1 == legacy1, "single-best assignment must match greatest()")
    assert(kernel1(999L) == 5, "all-tie (zero vector) resolves to the highest cell")
    // legacy nProbe ranking: reversed ascending struct sort
    val legacyN = vecs.withColumn("cells",
        slice(reverse(array_sort(array(scored.toSeq: _*))), 1, 3))
      .select(col("id"), expr("transform(cells, x -> x.cell)").as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val kernelN = vecs.withColumn("cs",
        GraftFunctions.nearestCells(col("v"), cents.sortBy(_._1).map(_._2), 3))
      .select("id", "cs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(kernelN == legacyN, "nProbe ranking must match the sorted-struct order")
  }
}

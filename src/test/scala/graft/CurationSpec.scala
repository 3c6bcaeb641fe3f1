package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.sources.Tables

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  /** Pure-Scala replica of the kernel tokenizer (lower-cased letter/digit
    * runs) — an independent oracle for the n-gram operators.
    */
  private def toks(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetterOrDigit(cp))
        sb.appendAll(Character.toChars(Character.toLowerCase(cp)))
      else if (sb.nonEmpty) { out += sb.toString; sb.clear() }
      i += Character.charCount(cp)
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  private def grams(s: String, n: Int): Set[String] = {
    val t = toks(s)
    if (t.isEmpty) Set.empty
    else if (t.size <= n) Set(t.mkString(" "))
    else t.sliding(n).map(_.mkString(" ")).toSet
  }

  test("chunkDocuments: full coverage, exact overlap, no pure-overlap tail, no shuffle") {
    val sample = docs.filter(col("doc_id") < 100)
    val chunkTokens = 64
    val overlap = 16
    val stride = chunkTokens - overlap
    val got = Curation.chunkDocuments(sample, "doc_id", "text", chunkTokens, overlap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    val truth = sample.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(Option(r.getString(1)).getOrElse("")))
      .filter(_._2.nonEmpty).toMap
    assert(got.keySet == truth.keySet, "every tokenized doc chunks; empty docs don't")
    truth.foreach { case (id, ts) =>
      val chunks = got(id)
      // chunk i is exactly tokens[i*stride, i*stride+chunkTokens)
      chunks.foreach { case (_, i, n, text) =>
        val expect = ts.slice(i.toInt * stride, i.toInt * stride + chunkTokens)
        assert(text == expect.mkString(" ") && n == expect.size, s"doc $id chunk $i")
      }
      // ids are dense from 0 and the count matches the closed form
      assert(chunks.map(_._2).toSeq == (0L until chunks.length.toLong))
      assert(chunks.length == math.max(1,
        ((ts.size - overlap) + stride - 1) / stride), s"doc $id nChunks")
      // chunks cover every token: last chunk reaches the end
      assert((chunks.length - 1) * stride + chunks.last._3 == ts.size)
    }
    // streaming shape: the chunker itself is one scan stage, no exchange
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = {
        val df = Curation.chunkDocuments(sample, "doc_id", "text")
        df.collect()
        df.queryExecution.executedPlan
      }
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.isEmpty, s"chunking must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("chunkDocuments edge grid: tiny chunks, zero overlap, boundary lengths") {
    import spark.implicits._
    // doc lengths straddle every boundary of the chunk arithmetic:
    // empty, 1, overlap, overlap+1, chunk, chunk+1, 2 strides, ...
    val lengths = Seq(0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31)
    val docs = lengths.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"w$j").mkString(" ")) }
      .toDF("doc_id", "text")
    val texts = lengths.zipWithIndex
      .map { case (n, i) => i.toLong -> (1 to n).map(j => s"w$j") }.toMap
    for ((chunk, overlap) <- Seq((1, 0), (2, 0), (2, 1), (8, 0), (8, 3), (8, 7))) {
      val stride = chunk - overlap
      val got = Curation.chunkDocuments(docs, "doc_id", "text", chunk, overlap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
      texts.foreach { case (id, ts) =>
        if (ts.isEmpty) assert(!got.contains(id), s"($chunk,$overlap) empty doc $id")
        else {
          val chunks = got(id)
          assert(chunks.length == math.max(1, ((ts.size - overlap) + stride - 1) / stride),
            s"($chunk,$overlap) doc $id count")
          chunks.foreach { case (_, i, n, text) =>
            val expect = ts.slice(i.toInt * stride, i.toInt * stride + chunk)
            assert(text == expect.mkString(" ") && n == expect.size,
              s"($chunk,$overlap) doc $id chunk $i")
          }
          // coverage: last chunk ends at the last token
          assert((chunks.length - 1) * stride + chunks.last._3 == ts.size,
            s"($chunk,$overlap) doc $id coverage")
        }
      }
    }
  }

  test("redactPii matches a java.util.regex replica and leaves no residual matches") {
    import spark.implicits._
    val rows = Seq(
      (1L, "no pii here at all"),
      (2L, "mail a.b+c%d@ex-ample.co.uk and x@y.io twice"),
      (3L, "call +1-555-0100 or +49-30-1234567 now"),
      (4L, "host 10.0.0.1 and 192.168.255.254 up"),
      (5L, "mix u@v.com +1-555-2222 8.8.8.8 end"),
      (6L, ""))
    val df = rows.toDF("doc_id", "text")
    val got = Curation.redactPii(df, "doc_id", "text").orderBy("doc_id").collect()
    // independent replica on the same pattern strings
    def count(re: String, s: String): Long =
      re.r.findAllMatchIn(s).size.toLong
    rows.zip(got).foreach { case ((id, text), r) =>
      assert(r.getLong(0) == id)
      assert(r.getLong(1) == count(Curation.EmailRe, text), s"emails in '$text'")
      assert(r.getLong(2) == count(Curation.PhoneRe, text), s"phones in '$text'")
      assert(r.getLong(3) == count(Curation.Ipv4Re, text), s"ips in '$text'")
      val expected = text
        .replaceAll(Curation.EmailRe, "[EMAIL]")
        .replaceAll(Curation.PhoneRe, "[PHONE]")
        .replaceAll(Curation.Ipv4Re, "[IP]")
      assert(r.getString(4) == expected)
      // scrub completeness: no pattern survives redaction
      Seq(Curation.EmailRe, Curation.PhoneRe, Curation.Ipv4Re).foreach { re =>
        assert(count(re, r.getString(4)) == 0L, s"residual $re in '${r.getString(4)}'")
      }
    }
    val planted = got.filter(_.getLong(0) != 1L).filter(_.getLong(0) != 6L)
    assert(planted.forall(r => r.getLong(1) + r.getLong(2) + r.getLong(3) > 0))
  }

  test("holdout split: exact val count per group, reproducible, exhaustive") {
    val split = Curation.holdoutSplit(docs, "doc_id", "lang", valPerGroup = 20)
    val counts = split.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(counts.getOrElse((lang, "val"), 0L) == math.min(20L, n), s"val count for $lang")
      assert(counts.getOrElse((lang, "val"), 0L) + counts.getOrElse((lang, "train"), 0L) == n)
    }
    // reproducible: same membership on a rerun with different partitioning
    val v1 = split.filter(col("split") === "val").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val v2 = Curation.holdoutSplit(docs.repartition(7), "doc_id", "lang", 20)
      .filter(col("split") === "val").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(v1 == v2)
  }

  test("urlFilter drops any doc citing a blocked domain, keeps url-free docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain text no links"),
      (2L, "see https://good.example.com/a and http://also-fine.org/b"),
      (3L, "mixed https://good.example.com/x then https://bad.example.net/y"),
      (4L, "only https://bad.example.net/z here"),
      (5L, "scheme-less bad.example.net is not a URL reference"),
      (6L, null.asInstanceOf[String])) // NULL text = no URLs, must be KEPT
      .toDF("doc_id", "text")
    val out = Curation.urlFilter(df, "doc_id", "text", Seq("bad.example.net"))
      .select("doc_id", "n_urls").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 0L, 2L -> 2L, 5L -> 0L, 6L -> 0L))
  }

  test("decontaminate matches a brute-force n-gram overlap oracle") {
    val n = 5
    val all = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val evalGrams = all.filter(_._1 < 25).values.flatMap(grams(_, n)).toSet
    val expected = all.filter { case (id, text) =>
      id >= 25 && grams(text, n).intersect(evalGrams).isEmpty
    }.keySet
    val got = Curation.decontaminate(
      docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
      "doc_id", "text", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.size < all.count(_._1 >= 25),
      "some training doc must actually be contaminated for the test to bite")
  }

  test("mix keeps the binding group whole and is deterministic") {
    val targets = PipelineQueries.MixTargets
    val mixed = Curation.mixToTarget(docs, "doc_id", "text", "lang", targets)
    val kept = mixed.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // subset of the corpus, deterministic across runs
    val again = Curation.mixToTarget(docs, "doc_id", "text", "lang", targets)
      .collect().map(r => r.getLong(0)).toSeq
    assert(kept.map(_._1).toSeq == again)
    // the binding language (largest tokens/target deficit) keeps rate 1:
    // every one of its documents survives
    val totals = docs
      .select(col("lang"), graft.functions.TextFunctions.wordCount(col("text")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = totals.minBy { case (l, t) => t / targets(l) }._1
    assert(kept.count(_._2 == binding) == docs.filter(col("lang") === binding).count())
    // kept token mass is scaled toward the targets: for every pair of
    // languages the kept-token ratio is closer to the target ratio than
    // the raw corpus ratio was (up to per-document sampling noise)
    val keptTok = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    for (l <- totals.keys if l != binding) {
      val targetRatio = targets(l) / targets(binding)
      val rawRatio = totals(l).toDouble / totals(binding)
      val keptRatio = keptTok.getOrElse(l, 0L).toDouble / keptTok(binding)
      assert(math.abs(keptRatio - targetRatio) < math.abs(rawRatio - targetRatio) + 0.15,
        s"$l: kept=$keptRatio target=$targetRatio raw=$rawRatio")
    }
  }

  test("decontaminateFuzzy: planted paraphrase dropped, exact screen would keep it; empties never match") {
    import spark.implicits._
    val evalSet = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val train = Seq(
      // shares most 3-gram shingles with the eval doc (one word changed
      // at the END so several 5-grams still differ) -> fuzzy dropped
      (100L, "the quick brown fox jumps over the lazy dog today"),
      // paraphrase-level overlap BELOW threshold -> kept
      (101L, "the quick brown fox sleeps all day long in the barn"),
      // unrelated -> kept
      (102L, "completely different words appear in this document body"),
      // too short for any 3-gram shingle -> never a candidate, kept
      (103L, "tiny doc")).toDF("doc_id", "text")
    val kept = Curation.decontaminateFuzzy(train, evalSet, "doc_id", "text",
      n = 3, threshold = 0.5).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(101L, 102L, 103L), s"$kept")
    // hand-check doc 100: 10 words -> 8 shingles per side, 7 shared
    // (only the last trigram differs) -> j = 7/9 >= 0.5; doc 101 shares
    // 2 of its 9 with eval's 8 -> j = 2/15 < 0.5
    // threshold 0.8: doc 100's 7/9 ~ 0.778 < 0.8 -> everything kept
    assert(Curation.decontaminateFuzzy(train, evalSet, "doc_id", "text",
      n = 3, threshold = 0.8).count() == 4)
    // an empty eval set drops nothing
    assert(Curation.decontaminateFuzzy(train, evalSet.filter(lit(false)),
      "doc_id", "text", n = 3, threshold = 0.5).count() == 4)
  }

  test("temperatureMix: alpha=1 is the identity, the smallest source keeps rate 1, shares flatten") {
    // alpha = 1: w = tokens, every rate = 1 — nothing dropped
    assert(Curation.temperatureMix(docs, "doc_id", "text", "lang", alpha = 1.0)
      .count() == docs.count())
    val mixed = Curation.temperatureMix(docs, "doc_id", "text", "lang", alpha = 0.5)
    val kept = mixed.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val totals = docs
      .select(col("lang"), graft.functions.TextFunctions.wordCount(col("text")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // for alpha < 1 the SMALLEST source binds (min tokens^(1-alpha)) and
    // keeps every document
    val smallest = totals.minBy(_._2)._1
    assert(kept.count(_._2 == smallest) ==
      docs.filter(col("lang") === smallest).count())
    // larger sources subsample toward rate (t_min/t_g)^(1-alpha): kept
    // token share must sit near it (per-doc hash-sampling noise aside)
    val keptTok = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    for ((l, t) <- totals if l != smallest) {
      val expected = math.pow(totals(smallest).toDouble / t, 0.5)
      val got = keptTok.getOrElse(l, 0L).toDouble / t
      assert(math.abs(got - expected) < 0.15,
        s"$l: kept share $got vs expected rate $expected")
    }
    // deterministic on any partitioning (the hash gate, not sampling)
    val again = Curation.temperatureMix(docs.repartition(7), "doc_id", "text",
      "lang", alpha = 0.5).collect().map(_.getLong(0)).toSeq
    assert(kept.map(_._1).toSeq == again)
  }

  test("ccnetBuckets: per-source buckets are score-ordered, near-terciles, exhaustive") {
    val b = Curation.ccnetBuckets(docs, "doc_id", "text", "source")
    val rows = b.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    // every scored doc appears exactly once (docs with tokens)
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.length == docs.filter(
      graft.functions.TextFunctions.wordCount(col("text")) > 0).count())
    rows.groupBy(_._2).foreach { case (src, grp) =>
      val byBucket = grp.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")), s"$src")
      // ordering: head (most fluent = lowest surprisal) <= middle <= tail
      for {
        h <- byBucket.get("head"); m <- byBucket.get("middle")
      } assert(h.max <= m.min + 1e-9, s"$src head/middle overlap")
      for {
        m <- byBucket.get("middle"); t <- byBucket.get("tail")
      } assert(m.max <= t.min + 1e-9, s"$src middle/tail overlap")
      // near-terciles: cutoffs are exact percentiles, so each bucket is
      // a third up to ties at the cutoffs
      val n = grp.length
      byBucket.values.foreach(v =>
        assert(math.abs(v.size - n / 3.0) <= math.max(3.0, n * 0.15),
          s"$src bucket sizes ${byBucket.view.mapValues(_.size).toMap}"))
    }
  }

  test("string ids are rejected instead of hashing to NULL (empty output)") {
    import spark.implicits._
    val stringDocs = Seq(("doc_a", "some text", "en")).toDF("id", "text", "lang")
    val e = intercept[IllegalArgumentException](
      Curation.mixToTarget(stringDocs, "id", "text", "lang", Map("en" -> 1.0)))
    assert(e.getMessage.contains("integral id"))
  }

  test("pack's two-phase running sum is bucket-width-invariant") {
    // the (group, id-range-bucket) decomposition must be invisible in the
    // output: offsets + within-bucket sums == the single-window cumsum
    val budget = 512
    def run(width: Long) =
      Curation.packShards(docs, "doc_id", "text", "lang", budget, idsPerBucket = width)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val oneBucket = run(1L << 40) // every group collapses to a single bucket
    val manyBuckets = run(8)      // forces multi-bucket prefix arithmetic
    assert(oneBucket == manyBuckets)
  }

  test("unit hash sampling is overflow-safe for ids past 2^32") {
    import spark.implicits._
    // ids around 2^40: the pre-reduced multiply must neither wrap nor
    // throw under ANSI mode, and stays consistent with small-id arithmetic
    val big = (0L until 6L).map(i => ((1L << 40) + i * 1048576L + i, s"text $i words here", "en"))
      .toDF("doc_id", "text", "lang")
    val kept = Curation.mixToTarget(big, "doc_id", "text", "lang", Map("en" -> 1.0))
    // rate 1.0 for the only language: every row survives regardless of hash
    assert(kept.count() == 6)
    // and a sub-1.0 rate selects the same rows as the reference arithmetic
    val r = Curation.mixToTarget(
      big.union(big.select(col("doc_id") + 7, col("text"), lit("de"))),
      "doc_id", "text", "lang", Map("en" -> 0.9, "de" -> 0.1))
    assert(r.count() > 0) // no overflow exception under ANSI
  }

  test("shuffleShard: partitioning-invariant, balanced, dense per-shard positions") {
    import spark.implicits._
    val docs = (0L until 4000L).toDF("doc_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.shuffleShard(d, "doc_id", "seedA", 8)
        .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(17))
    assert(a == b, "order/shard must not depend on input partitioning")
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    // md5 mod 8 balances in expectation: no shard off by more than 25%
    assert(byShard.values.forall(s => s.size > 375 && s.size < 625),
      byShard.view.mapValues(_.size).toMap.toString)
    // positions are dense 1..n within each shard
    assert(byShard.values.forall(s => s.map(_._3).sorted == (1L to s.size)))
    // a different seed is a different permutation
    val c = Curation.shuffleShard(docs, "doc_id", "seedB", 8)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
    assert(c != a)
  }

  test("dsir weights: hand-computed log ratios; target-like docs trend positive") {
    import spark.implicits._
    // 1-bucket degenerate case: every token lands in bucket 0, so the
    // ratio collapses to ln(((T+1)/(T+1)) / ((R+1)/(R+1))) = 0 — weights
    // are exactly 0 whatever the text (smoothing totals: tt + B == tc + 1
    // only when B=1 and all tokens are target... compute directly)
    val docs = Seq(
      (1L, "alpha alpha beta", "en"),
      (2L, "gamma delta", "fr")).toDF("doc_id", "text", "lang")
    val one = Curation.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 1)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // B=1: every token in bucket 0; tc=3, tt=3, rc=5, rt=5
    // lr = ln((4/4) / (6/6)) = 0 → every weight 0.0
    assert(one.map(_._3) == Seq(0.0, 0.0) && one.map(_._2) == Seq(3L, 2L))
    // real corpus: English docs (the target) must average a HIGHER
    // weight than non-English — the signal DSIR selects on
    val real = Tables.load(spark, TestSpark.sf, "documents")
    val w = Curation.dsirWeights(real, "doc_id", "text",
      col("lang") === "en", buckets = 256)
      .join(real.select(col("doc_id"), col("lang")), "doc_id")
    val avg = w.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("log_weight").as("aw"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(avg(true) > avg(false),
      s"target docs must outscore the rest: $avg")
  }

  test("repetition metrics match a brute-force replica on real documents") {
    import graft.operators.TextAnalysis
    def dupFrac(t: Seq[String], n: Int): Double =
      if (t.size <= n) 0.0
      else {
        val total = (t.size - n + 1).toDouble
        val distinct = t.sliding(n).map(_.mkString(" ")).toSet.size.toDouble
        BigDecimal(1.0 - distinct / total).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    def topFrac(t: Seq[String]): Double =
      if (t.isEmpty) 0.0
      else BigDecimal(t.groupBy(identity).values.map(_.size).max.toDouble / t.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.select("doc_id", "text").collect()
      .map { r =>
        val t = toks(r.getString(1))
        (r.getLong(0), (t.size.toLong, dupFrac(t, 2), dupFrac(t, 3), topFrac(t)))
      }.toMap
    val got = TextAnalysis.repetition(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == expected)
    // a doc that is one phrase repeated must score near-1 dup fractions
    import spark.implicits._
    val spam = Seq((1L, ("spam ham " * 50).trim)).toDF("doc_id", "text")
    val row = TextAnalysis.repetition(spam, "doc_id", "text").first()
    assert(row.getDouble(2) > 0.9 && row.getDouble(4) === 0.5)
  }

  test("quality filter applies every rule and keeps a real survivor set") {
    val kept = Curation.qualityFilter(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // brute-force replica of the default thresholds
    val expected = docs.select("doc_id", "text").collect().filter { r =>
      val t = toks(r.getString(1))
      val nw = t.size
      val awl = if (t.isEmpty) 0.0 else t.map(_.length).sum.toDouble / nw
      val dup2 = if (nw <= 2) 0.0
        else 1.0 - t.sliding(2).map(_.mkString(" ")).toSet.size.toDouble / (nw - 1)
      val topw = if (t.isEmpty) 0.0
        else t.groupBy(identity).values.map(_.size).max.toDouble / nw
      nw >= 30 && nw <= 100000 && awl >= 3.0 && awl <= 10.0 && dup2 <= 0.1 && topw <= 0.2
    }.map(_.getLong(0)).toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < docs.count(), "filter must actually discriminate")
    // rule isolation: a word-salad spam doc fails dup2/topw even when long
    import spark.implicits._
    val spam = Seq((1L, ("lorem ipsum " * 40).trim)).toDF("doc_id", "text")
    assert(Curation.qualityFilter(spam, "doc_id", "text").count() == 0)
  }

  test("pack assigns greedy sequential shards under the token budget") {
    val budget = 512
    val packed = Curation.packShards(docs, "doc_id", "text", "lang", budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // exact replay of the greedy rule per language
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, shard) =>
        assert(shard == cum / budget, s"doc $id")
        cum += n
      }
    }
    // every shard except possibly the last starts below the budget line
    val shardTokens = packed.groupBy(r => (r._2, r._4)).view.mapValues(_.map(_._3).sum)
    shardTokens.foreach { case ((lang, shard), tok) =>
      val maxDoc = packed.filter(r => r._2 == lang && r._4 == shard).map(_._3).max
      assert(tok <= budget + maxDoc, s"$lang shard $shard overflows: $tok")
    }
  }
}

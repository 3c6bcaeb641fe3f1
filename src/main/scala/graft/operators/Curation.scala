package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T}

/** Corpus curation operators — the steps between "deduplicated documents"
  * and "training shards" in a data pipeline: mix sources to a target
  * token distribution, pack documents into fixed-token-budget shards,
  * and drop training documents that leak evaluation content.
  *
  * Scale design: every operator is one scan of the corpus plus
  * broadcast-sized side data (per-group aggregates, target weights,
  * bucket prefix offsets, the eval n-gram set) — the only corpus-sized
  * shuffle is pack's window, which partitions by (group, id-range
  * bucket) so no single task ever owns a whole group.
  */
object Curation {

  /** Deterministic uniform in [0,1) from an id — identical integer
    * arithmetic in any engine (used by the DuckDB oracle verbatim),
    * unlike rand(). Knuth multiplicative hash, bucketed to 2^20. The id
    * is reduced mod 2^20 BEFORE the multiply — same result ((a*k) mod m
    * == ((a mod m)*k) mod m), but the product stays under 2^51 for any
    * long id, so neither Spark's ANSI mode nor the oracle's BIGINT
    * arithmetic can overflow on ids past 2^32.
    */
  private def unitHash(id: org.apache.spark.sql.Column) =
    pmod(pmod(id.cast("long"), lit(1048576L)) * lit(2654435761L), lit(1048576L)) / lit(1048576.0)

  /** String ids would silently become NULL under the hash arithmetic and
    * filter every row out — reject them loudly instead.
    */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"Curation needs an integral id column; '$idCol' is $dt " +
      "(hash string ids to longs with xxhash64 first)")
  }

  /** Downsample so the output's token mass over `byCol` follows
    * `targets` (shares summing to 1). The most-constrained group is kept
    * whole: C = min_g(tokens_g / target_g) is the largest achievable
    * total, each group keeps rate_g = C * target_g / tokens_g of its
    * tokens (sampled uniformly by document).
    */
  def mixToTarget(docs: DataFrame, idCol: String, textCol: String,
      byCol: String, targets: Map[String, Double]): DataFrame = {
    requireIntegralId(docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol), col(byCol),
      T.wordCount(col(textCol)).cast("long").as("n_tokens"))
    val targetDf = targets.toSeq.toDF(byCol, "target")
    val totals = toks.groupBy(byCol).agg(sum("n_tokens").as("tokens_g"))
      .join(broadcast(targetDf), byCol)
      .withColumn("cap", col("tokens_g") / col("target"))
    val c = totals.agg(min("cap").as("c"))
    val rates = totals.crossJoin(broadcast(c))
      .withColumn("rate", col("c") * col("target") / col("tokens_g"))
      .select(col(byCol), col("rate"))
    toks.join(broadcast(rates), byCol)
      .filter(unitHash(col(idCol)) < col("rate"))
      .select(col(idCol), col(byCol), col("n_tokens"))
      .orderBy(idCol)
  }

  /** Temperature-scaled source mixing — the multilingual-mix standard
    * (mT5/XLM-R: sample source g with probability ∝ p_g^alpha; alpha < 1
    * flattens toward uniform so low-resource sources up-weight without
    * hand-written targets). [[mixToTarget]] with targets DERIVED from
    * the corpus itself: w_g = tokens_g^alpha, and the most-constrained
    * group kept whole. The normalization Σw cancels algebraically —
    * rate_g = min_h(tokens_h / w_h) · w_g / tokens_g — so no cross-group
    * float SUM exists whose accumulation order could drift across
    * engines/partitionings; every remaining op (pow, div, mul, min) is
    * per-group, and the rate is rounded to 12 decimals so pow()'s
    * last-ulp license cannot flip the deterministic hash-gate compare.
    * Plan shape: one token-count scan, a group-count aggregate (sources
    * — broadcast-sized), rates broadcast back — no extra corpus shuffle.
    */
  def temperatureMix(docs: DataFrame, idCol: String, textCol: String,
      byCol: String, alpha: Double): DataFrame = {
    requireIntegralId(docs, idCol)
    require(alpha > 0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    val toks = docs.select(col(idCol), col(byCol),
      T.wordCount(col(textCol)).cast("long").as("n_tokens"))
    val totals = toks.groupBy(byCol).agg(sum("n_tokens").as("tokens_g"))
      .withColumn("w", pow(col("tokens_g").cast("double"), lit(alpha)))
    val m = totals.agg(min(col("tokens_g").cast("double") / col("w")).as("m"))
    val rates = totals.crossJoin(broadcast(m))
      .withColumn("rate",
        round(col("m") * col("w") / col("tokens_g").cast("double"), 12))
      .select(col(byCol), col("rate"))
    toks.join(broadcast(rates), byCol)
      .filter(unitHash(col(idCol)) < col("rate"))
      .select(col(idCol), col(byCol), col("n_tokens"))
      .orderBy(idCol)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
    * per `byCol` source, documents split into head/middle/tail by their
    * LM surprisal ([[TextAnalysis.lmScore]]'s mean -ln p — head = the
    * most fluent third, the band CCNet trains on). Buckets assign by
    * CUTOFF comparison, not per-row rank: the tercile cutoffs are two
    * exact interpolated percentiles per source (rounded to 4 decimals
    * like the scores, so the assignment replays across engines),
    * broadcast back over the scored frame — the calibration-then-
    * threshold deployment shape. At 100 TB swap the exact percentile
    * for approx_percentile cutoffs (exact percentile buffers a source's
    * scores in its aggregation state; the CASE assignment is unchanged)
    * — the q72-style documented swap. Docs with no tokens have no score
    * and no row (lmScore's contract).
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
      byCol: String): DataFrame = {
    val scored = TextAnalysis.lmScore(docs, idCol, textCol)
      .select(col(idCol), col("avg_neg_logp"))
    val joined = docs.select(col(idCol), col(byCol)).join(scored, Seq(idCol))
    val cuts = joined.groupBy(byCol).agg(
      round(expr(s"percentile(avg_neg_logp, ${1.0 / 3})"), 4).as("c1"),
      round(expr(s"percentile(avg_neg_logp, ${2.0 / 3})"), 4).as("c2"))
    joined.join(broadcast(cuts), byCol)
      .withColumn("bucket",
        when(col("avg_neg_logp") <= col("c1"), "head")
          .when(col("avg_neg_logp") <= col("c2"), "middle")
          .otherwise("tail"))
      .select(col(idCol), col(byCol), col("avg_neg_logp"), col("bucket"))
      .orderBy(idCol)
  }

  /** Assign each document to a training shard: per `byCol` group, in
    * `idCol` order, shard k holds the documents whose running token
    * count starts inside [k*budget, (k+1)*budget) — greedy sequential
    * packing, the standard approximation when exact bin packing is not
    * worth a shuffle.
    *
    * The running sum is two-phase so no window ever runs over a whole
    * group in one task (a `Window.partitionBy(byCol)` cumsum would put
    * ~20 TB per language on one executor at corpus scale): documents are
    * range-bucketed by id within each group (`idsPerBucket` ids per
    * bucket — order-preserving, so bucket order == id order), per-bucket
    * token totals are aggregated (one tiny row per (group, bucket)),
    * exclusive prefix offsets are computed by a window over THAT
    * aggregate and broadcast back, and the corpus-sized window runs per
    * (group, bucket). cum = bucket offset + within-bucket running sum —
    * bit-identical to the single-window result, since long addition is
    * associative.
    */
  def packShards(docs: DataFrame, idCol: String, textCol: String,
      byCol: String, budget: Int, idsPerBucket: Long = 1L << 20): DataFrame = {
    requireIntegralId(docs, idCol)
    require(idsPerBucket > 0, "idsPerBucket must be positive")
    val toks = docs.select(col(idCol), col(byCol),
      T.wordCount(col(textCol)).cast("long").as("n_tokens"))
      // integral `div` (not `/`): exact for the full long range, and
      // truncation toward zero is monotone in id, so buckets partition
      // each group into consecutive id ranges
      .withColumn("bucket", expr(s"cast(`$idCol` as bigint) div $idsPerBucket"))
    val wBuckets = Window.partitionBy(byCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per (group, bucket): the window below is over this small
    // aggregate, not the corpus
    val offsets = toks.groupBy(col(byCol), col("bucket"))
      .agg(sum("n_tokens").as("bucket_tokens"))
      .withColumn("offset", coalesce(sum("bucket_tokens").over(wBuckets), lit(0L)))
      .select(col(byCol), col("bucket"), col("offset"))
    val wInBucket = Window.partitionBy(col(byCol), col("bucket")).orderBy(idCol)
    toks.join(broadcast(offsets), Seq(byCol, "bucket"))
      .withColumn("cum", col("offset") + sum("n_tokens").over(wInBucket))
      .withColumn("shard", floor((col("cum") - col("n_tokens")) / budget))
      .select(col(idCol), col(byCol), col("n_tokens"), col("shard"))
      .orderBy(idCol)
  }

  /** Gopher-style structural quality filter (Rae et al. 2021, §A1.1):
    * keep documents passing cheap rule checks — word-count bounds,
    * mean-word-length bounds, low duplicate-2-gram fraction, no single
    * dominating token. The standard pre-filter before model-based
    * scoring; one narrow codegen'd scan, no shuffle, all comparisons on
    * unrounded doubles derived from integer counts (engine-exact).
    */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Long = 30, maxWords: Long = 100000,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
      maxDup2gramFrac: Double = 0.1, maxTopWordFrac: Double = 0.2): DataFrame = {
    val ts = T.tokens(col(textCol))
    val nw = size(ts).cast("long")
    val awl = T.avgWordLength(col(textCol))
    val dup2 = when(size(ts) <= 2, 0.0).otherwise(
      lit(1.0) - size(H.shingles(col(textCol), 2)).cast("double") / (size(ts) - 1).cast("double"))
    val topw = when(size(ts) === 0, 0.0).otherwise(
      graft.functions.expr.GraftFunctions.topTokenCount(ts).cast("double") / size(ts).cast("double"))
    docs.filter(nw.between(minWords, maxWords) &&
      awl.between(minAvgWordLen, maxAvgWordLen) &&
      dup2 <= maxDup2gramFrac && topw <= maxTopWordFrac)
  }

  /** Deterministic exact-size holdout split: the `valPerGroup` documents
    * with the smallest sha2(salt || id) per group become "val", the rest
    * "train" — reproducible on any engine/cluster size (hash order, not
    * rand()), with EXACT per-group counts, which rate-based sampling
    * cannot guarantee. One key shuffle for the per-group window.
    */
  def holdoutSplit(docs: DataFrame, idCol: String, byCol: String,
      valPerGroup: Int, salt: String = "holdout"): DataFrame = {
    val w = Window.partitionBy(byCol)
      .orderBy(sha2(concat(lit(salt), col(idCol).cast("string")), 256), col(idCol))
    docs.withColumn("_hrk", row_number().over(w))
      .withColumn("split", when(col("_hrk") <= valPerGroup, "val").otherwise("train"))
      .drop("_hrk")
  }

  /** PII scrub patterns — deliberately lookaround-free and syntax-portable
    * so the exact same pattern strings run under Java regex (Spark) and
    * RE2 (DuckDB oracle) with identical leftmost-first matches.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9\\-]{6,}[0-9]"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact PII spans (emails, +international phone numbers, IPv4
    * addresses) with typed placeholders and count each kind — the scrub
    * pass a training corpus runs before release. Counts are of pattern
    * occurrences in the ORIGINAL text; redaction applies email → phone →
    * ip in that order. One narrow codegen'd projection, no shuffle — the
    * 100 TB shape is a plain map over the corpus scan.
    */
  /** DSIR-style importance weights (Xie et al., NeurIPS 2023 — "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely its hashed-unigram features
    * are under a TARGET distribution (the rows matching `targetPred`,
    * e.g. a trusted high-quality subset) than under the raw corpus:
    *
    *   log w(x) = Σ_tokens ln( p_target(bucket(w)) / p_raw(bucket(w)) )
    *
    * with add-one-smoothed bucket probabilities over `buckets` hashed
    * feature buckets (the hashing trick bounds the model at `buckets`
    * numbers however large the vocabulary). High-weight documents are
    * the ones importance resampling keeps; this operator emits the
    * weights and leaves the sampling policy (top-k, Gumbel, quota per
    * source) to the caller — the weight is the reusable part.
    *
    * Scale shape: one token scan builds the two bucket-count tables
    * (`buckets` rows each — broadcast), a second aggregation folds each
    * doc's (bucket, multiplicity) pairs against the broadcast log-ratio
    * table. No corpus-sized join; the only shuffles are the two
    * bucket/doc aggregations. Engine-portable by construction: buckets
    * come from md5 (identical everywhere), counts are exact integers,
    * and the per-doc sum folds over the bucket-sorted term list so
    * double addition happens in one fixed order on any partitioning
    * (the lmScore determinism contract).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0, "dsirWeights needs a positive bucket count")
    val feats = docs
      .select(col(idCol).as("id"), targetPred.as("is_t"),
        explode(T.tokens(col(textCol))).as("w"))
      .select(col("id"), col("is_t"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
    val rawCnt = feats.groupBy("b").agg(count(lit(1)).as("rc"))
    val tgtCnt = feats.filter(col("is_t")).groupBy("b").agg(count(lit(1)).as("tc"))
    val tot = feats.agg(count(lit(1)).as("rt"),
      count(when(col("is_t"), 1)).as("tt"))
    val ratio = rawCnt.join(tgtCnt, Seq("b"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(tot))
      .select(col("b"),
        log(((col("tc") + 1).cast("double") / (col("tt") + buckets).cast("double"))
          / ((col("rc") + 1).cast("double") / (col("rt") + buckets).cast("double")))
          .as("lr"))
    feats.groupBy("id", "b").agg(count(lit(1)).as("m"))
      .join(broadcast(ratio), "b")
      .select(col("id"),
        struct(col("b"), (col("m").cast("double") * col("lr")).as("term")).as("wt"),
        col("m"))
      .groupBy("id")
      .agg(collect_list(col("wt")).as("l"), sum("m").as("n"))
      .select(col("id").as(idCol),
        col("n").cast("long").as("n_tokens"),
        round(expr("aggregate(array_sort(l), cast(0.0 as double), (a, x) -> a + x.term)"),
          4).as("log_weight"))
  }

  /** Deterministic global shuffle + sharding — the last step of every
    * training-data export: a seeded pseudo-random order that is
    * IDENTICAL on any cluster size or partitioning, split into
    * `nShards` balanced shards. Order key = md5(seed || ':' || id)
    * (engine-portable, uniform); shard = key mod nShards (balanced in
    * expectation, no global coordination); position = rank within the
    * shard by the same key.
    *
    * Scale shape: one hash shuffle on `shard` and a per-shard sort —
    * shards are the parallel unit, so there is NO global row-numbering
    * (a single global `row_number()` funnels the corpus through one
    * task; rank-within-shard keeps every task at corpus/nShards rows).
    * Writers downstream `partitionBy("shard")` and read back in
    * (shard, pos) order for a reproducible training stream.
    */
  def shuffleShard(docs: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "shuffleShard needs a positive shard count")
    val key = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    docs.withColumn("_k", key)
      .withColumn("shard",
        (conv(substring(col("_k"), 1, 8), 16, 10).cast("long")
          % nShards).as("shard"))
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("_k"), col(idCol)))
          .cast("long"))
      .drop("_k")
  }

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]"),
        Ipv4Re, "[IP]").as("text_redacted"))

  /** URL domain pattern (group 1 = host), Java-regex/RE2-portable like
    * the PII patterns above.
    */
  val UrlDomainRe = "https?://([A-Za-z0-9.-]+)"

  /** Domain-blocklist filtering (the C4/RefinedWeb-style curation step):
    * keep documents whose text references NO blocked domain; n_urls
    * counts every URL seen. One codegen'd scan with the blocklist as a
    * plan literal — no shuffle, no side table; at 100 TB the blocklist
    * (thousands of domains) still rides inside the task binary.
    */
  def urlFilter(docs: DataFrame, idCol: String, textCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    // NULL text carries no URLs: coalesce keeps the row (a bare filter on
    // not(arrays_overlap(NULL, ...)) would silently drop it)
    val domains = coalesce(
      regexp_extract_all(col(textCol), lit(UrlDomainRe), lit(1)),
      array().cast("array<string>"))
    docs.withColumn("__domains", domains)
      .filter(not(arrays_overlap(col("__domains"),
        array(blockedDomains.map(lit): _*))))
      .withColumn("n_urls", size(col("__domains")).cast("long"))
      .drop("__domains")
  }

  /** Split documents into overlapping token windows — the context-window
    * chunking step ahead of packing/embedding in a training pipeline.
    * Chunk i covers tokens [i·stride, i·stride + chunkTokens) with
    * stride = chunkTokens - overlap; a trailing window that would be pure
    * overlap (start >= nTokens - overlap) is not emitted, and docs
    * shorter than one chunk yield exactly one chunk. Token-less docs
    * yield none.
    *
    * One projection + explode, no shuffle: chunking streams through the
    * scan at any corpus size (plan-asserted in CurationSpec).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got ($chunkTokens, $overlap)")
    val stride = chunkTokens - overlap
    // nChunks = max(1, ceil((n - overlap) / stride)): the last start
    // strictly below n - overlap (plus the i=0 chunk for short docs)
    val nChunks = greatest(lit(1),
      floor(((col("n_tokens") - lit(overlap)) + lit(stride - 1)) / lit(stride)).cast("int"))
    docs
      .select(col(idCol), T.tokens(col(textCol)).as("__toks"))
      .withColumn("n_tokens", size(col("__toks")))
      .filter(col("n_tokens") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(chunkTokens), col("n_tokens") - col("chunk_id") * stride)
          .cast("long").as("chunk_tokens"),
        concat_ws(" ", slice(col("__toks"),
          col("chunk_id") * stride + 1, lit(chunkTokens))).as("chunk_text"))
  }

  /** Drop training documents sharing ANY word n-gram with the eval set —
    * n-gram decontamination. The eval n-gram set
    * is broadcast (eval sets are tiny next to a training corpus), so the
    * check is one scan of the training side with a broadcast semi-join.
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val evalGrams = evalSet
      .select(explode(H.shingles(col(textCol), n)).as("g")).distinct()
    val trainGrams = train
      .select(col(idCol), explode(H.shingles(col(textCol), n)).as("g"))
    val contaminated = trainGrams
      .join(broadcast(evalGrams), "g")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** FUZZY decontamination — the near-duplicate face of
    * [[decontaminate]]: exact-n-gram overlap misses paraphrased or
    * reformatted leaks, so the standard contamination screen is exact
    * n-grams PLUS a Jaccard threshold against the eval set (the
    * GPT-3/PaLM-style contamination analyses). Drops training docs whose
    * shingle-set Jaccard with ANY eval doc is >= `threshold`.
    *
    * Scale shape: the EVAL side is benchmark-sized (thousands of docs,
    * not the corpus) — its exploded (gram, eval-doc) postings ride as a
    * broadcast; candidates are exactly the training docs sharing >= 1
    * shingle with an eval doc (never all-pairs), deduped as narrow
    * (id, eid) pairs before the verify; the verify is the exact set
    * Jaccard (integer sizes in double — the division and the threshold
    * compare are bit-identical cross-engine). Training side: ONE shingle
    * scan, no self-join. Empty-shingle docs on either side never match
    * (Jaccard undefined -> treated as 0, mirroring the oracle's
    * non-empty filter).
    */
  def decontaminateFuzzy(train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val tr = train.select(col(idCol), H.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val ev = evalSet.select(col(idCol).as("_eid"),
        H.shingles(col(textCol), n).as("esh"))
      .filter(size(col("esh")) > 0)
    val cand = tr.select(col(idCol), explode(col("sh")).as("g"))
      .join(broadcast(ev.select(col("_eid"), explode(col("esh")).as("g"))), "g")
      .select(col(idCol), col("_eid")).distinct()
    val contaminated = cand
      .join(tr, Seq(idCol)).join(broadcast(ev), Seq("_eid"))
      .withColumn("inter",
        size(array_intersect(col("sh"), col("esh"))).cast("double"))
      .filter(col("inter") /
        (size(col("sh")).cast("double") + size(col("esh")).cast("double")
          - col("inter")) >= threshold)
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }
}

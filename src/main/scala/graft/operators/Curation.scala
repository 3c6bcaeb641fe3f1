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
  * broadcast-sized side data (per-group aggregates, target weights, the
  * eval n-gram set) — no corpus-sized shuffle except pack's per-group
  * window, which partitions by the grouping column.
  */
object Curation {

  /** Deterministic uniform in [0,1) from an id — identical integer
    * arithmetic in any engine (used by the DuckDB oracle verbatim),
    * unlike rand(). Knuth multiplicative hash, bucketed to 2^20.
    */
  private def unitHash(id: org.apache.spark.sql.Column) =
    pmod(id * lit(2654435761L), lit(1048576L)) / lit(1048576.0)

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

  /** Assign each document to a training shard: per `byCol` group, in
    * `idCol` order, shard k holds the documents whose running token
    * count starts inside [k*budget, (k+1)*budget) — greedy sequential
    * packing, the standard approximation when exact bin packing is not
    * worth a shuffle.
    */
  def packShards(docs: DataFrame, idCol: String, textCol: String,
      byCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(byCol).orderBy(idCol)
    docs.select(col(idCol), col(byCol),
      T.wordCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("shard", floor((col("cum") - col("n_tokens")) / budget))
      .select(col(idCol), col(byCol), col("n_tokens"), col("shard"))
      .orderBy(idCol)
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
}

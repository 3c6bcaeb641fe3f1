package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the missing piece between the text-analysis operators and a trainable
  * model: given a corpus, learn the first `merges` subword merge rules.
  *
  * Distributed shape (the part that matters at 100 TB): the corpus is
  * touched EXACTLY ONCE — one tokenize → word-count pass whose output,
  * the weighted VOCABULARY (distinct word, frequency), is
  * corpus-size-independent (it grows with distinct words, not rows).
  * Every merge round then runs on the cached vocabulary alone: count
  * adjacent symbol pairs weighted by word frequency (map-side partial
  * aggregate → tiny (pair, count) shuffle), take the argmax (a ONE-ROW
  * collect — the model update, same footprint as a Lloyd centroid step),
  * and apply the merge as a codegen'd string transform. No round ever
  * rescans the corpus, and the driver only ever sees single-row argmax
  * results plus the final rule table.
  *
  * Symbol representation: each word is rendered as `(c1)(c2)…(ck)` —
  * every symbol wrapped in parens. Tokens are letter/digit runs
  * ([[TextFunctions.tokens]]), so parens NEVER occur inside a symbol,
  * which makes "merge the pair (l,r)" a plain non-overlapping
  * left-to-right `replace(s, "(l)(r)", "(lr)")` — the exact greedy
  * semantics BPE specifies (in "aaa" the pair (a,a) merges once, not
  * twice), and a semantics `replace` implements IDENTICALLY in Spark
  * (UTF8String.replace) and DuckDB — which is what lets the
  * pipeline_bpe oracle replay the whole training in SQL, unrolled round
  * by round like the k-means replays.
  *
  * Ties in the argmax break (count DESC, lhs ASC, rhs ASC) — binary
  * string order, identical across engines for these alnum symbols.
  */
object Bpe {

  /** Pattern extracting the symbol list back out of the paren rendering. */
  private val SymRe = "\\(([^)]*)\\)"

  private def syms(s: Column): Column =
    regexp_extract_all(s, lit(SymRe), lit(1))

  /** Learn `merges` merge rules over `df`'s `textCol`. Returns one row
    * per round: (round, lhs, rhs, pair_count, corpus_symbols) where
    * pair_count is the corpus-weighted frequency of the chosen pair
    * BEFORE the merge and corpus_symbols the weighted total symbol count
    * AFTER it — the latter independently validates the apply step (under
    * overlaps, e.g. (a,a) on "aaaa", fewer merges apply than pairs
    * counted, and only a correct greedy apply yields the right total).
    */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(merges >= 1, "merges >= 1")
    val vocab = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("s0", regexp_replace(col("word"), "(.)", "($1)"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val rules = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    var s: Column = col("s0")
    var r = 1
    while (r <= merges) {
      val sy = syms(s)
      val best = vocab.filter(size(sy) >= 2)
        .select(col("n"), explode(transform(sequence(lit(1), size(sy) - 1),
          i => struct(element_at(sy, i).as("lhs"), element_at(sy, i + 1).as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      require(best.nonEmpty,
        s"BPE round $r: no adjacent pairs left — corpus exhausted after ${r - 1} merges")
      val lhs = best(0).getAs[String]("lhs")
      val rhs = best(0).getAs[String]("rhs")
      val cnt = best(0).getAs[Long]("cnt")
      // apply the merge: one codegen'd replace over the cached vocab —
      // the expression chain stays r replaces deep on ONE cached scan
      s = call_function("replace", s, lit(s"($lhs)($rhs)"), lit(s"($lhs$rhs)"))
      val nsym = vocab.agg(sum(col("n") * size(syms(s))).as("t"))
        .collect()(0).getAs[Long]("t")
      rules += ((r.toLong, lhs, rhs, cnt, nsym))
      r += 1
    }
    vocab.unpersist()
    rules.toSeq.toDF("round", "lhs", "rhs", "pair_count", "corpus_symbols")
  }

  /** Encode `textCol` under an already-learned rule list: wrap, apply
    * every rule in training order (same greedy replace), count symbols —
    * the inference-side tokenizer, one narrow scan, no shuffle.
    */
  def encodeSymbolCounts(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    val perWord = rules.foldLeft(
      regexp_replace(col("word"), "(.)", "($1)"): Column) {
        case (acc, (l, rr)) =>
          call_function("replace", acc, lit(s"($l)($rr)"), lit(s"($l$rr)"))
      }
    df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(col(idCol), size(syms(perWord)).cast("long").as("k"))
      .groupBy(idCol).agg(sum("k").as("n_bpe_tokens"))
  }
}

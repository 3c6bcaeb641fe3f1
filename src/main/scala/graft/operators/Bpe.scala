package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expr.GraftFunctions

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the missing piece between the text-analysis operators and a trainable
  * model: given a corpus, learn the first `merges` subword merge rules.
  *
  * Distributed shape (the part that matters at 100 TB): the corpus is
  * touched EXACTLY ONCE — one tokenize → word-count pass whose output,
  * the weighted VOCABULARY (distinct word, frequency), is
  * corpus-size-independent (it grows with distinct words, not rows, and
  * `minCount` bounds the hapax tail that dominates distinct words on web
  * text). That vocabulary is the MODEL-FIT working set — the same class
  * of driver-side state as IvfIndex's centroid rows — because BPE
  * training is inherently sequential (round r+1's counts depend on round
  * r's merge) with per-round work proportional to the few words
  * containing the winning pair: running 32k such rounds as 32k Spark
  * jobs would pay 32k job latencies to parallelize near-zero work per
  * round. The trainer is therefore the classic INCREMENTAL algorithm
  * over the collected vocabulary:
  *
  *  - exact pair counts and a pair → containing-words inverted index are
  *    built once (O(total vocabulary symbols));
  *  - each round takes the argmax from a lazy max-heap (stale entries
  *    discarded on pop, every count change pushes a fresh entry), then
  *    re-counts ONLY the words that contain the winning pair — subtract
  *    their old adjacent pairs, apply the greedy merge, add the new ones
  *    — so per-round cost tracks the affected words, never the
  *    vocabulary (the previous implementation re-scanned the full vocab
  *    with an r-deep replace chain every round: O(V·merges) total and
  *    codegen-hostile past a few hundred merges).
  *
  * Merge semantics (pinned by the DuckDB training replay, which renders
  * each word as `(c1)(c2)…(ck)` and merges with
  * `replace(s, "(l)(r)", "(lr)")`): a merge applies greedily,
  * non-overlapping, left-to-right — in "aaa" the pair (a,a) merges once,
  * not twice. The trainer's symbol-array merge implements exactly that
  * (tokens are letter/digit runs, so a symbol can never span a paren
  * boundary in the rendered form). Ties in the argmax break
  * (count DESC, lhs ASC, rhs ASC) in CODE-POINT order — equal to the
  * UTF-8 binary order Spark's orderBy and DuckDB's ORDER BY use, and NOT
  * Java's compareTo (UTF-16 code-unit order differs for supplementary
  * characters).
  */
object Bpe {

  /** Trainer work counters, delivered via `onStats`: `wordUpdates` /
    * `symbolOps` measure the incremental property — they grow with the
    * words AFFECTED per round, not with rounds × vocabulary.
    */
  final case class TrainStats(
      rounds: Int, vocabWords: Long, wordUpdates: Long, symbolOps: Long)

  /** Code-point (= UTF-8 binary) string order; see the tie-break note. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** dequeue() yields the argmax under (count DESC, lhs ASC, rhs ASC). */
  private val heapOrd: Ordering[(Long, String, String)] =
    new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        if (x._1 != y._1) java.lang.Long.compare(x._1, y._1)
        else {
          val c = cpCompare(y._2, x._2)
          if (c != 0) c else cpCompare(y._3, x._3)
        }
      }
    }

  private def splitCodePoints(w: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** The byte-level symbol alphabet (the GPT-2 `bytes_to_unicode` table,
    * public domain scheme from Radford et al.'s released tokenizer):
    * every byte maps to ONE printable unicode code point — printable
    * bytes ('!'..'~', '¡'..'¬', '®'..'ÿ') map to themselves, the rest
    * (controls, space, 0x7f, 0x80-0xa0, 0xad) to 256+k in table order —
    * so byte sequences become ordinary strings the same merge machinery
    * (and the DuckDB replay's paren rendering) handles unchanged. This
    * is what makes the tokenizer LOSSLESS on arbitrary UTF-8: a
    * multi-byte character is several symbols, and merges may cross
    * character (but in practice not word) boundaries exactly like real
    * byte-level BPE vocabularies.
    */
  val byteToUnicode: Array[String] = {
    val printable = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    var shifted = 0
    Array.tabulate(256) { b =>
      if (printable(b)) new String(Character.toChars(b))
      else { val s = new String(Character.toChars(256 + shifted)); shifted += 1; s }
    }
  }

  private[graft] def splitBytes(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Array.tabulate(bytes.length)(i => byteToUnicode(bytes(i) & 0xff))
  }

  private[graft] def splitWord(w: String, byteLevel: Boolean): Array[String] =
    if (byteLevel) splitBytes(w) else splitCodePoints(w)

  private def containsPair(syms: Array[String], l: String, r: String): Boolean = {
    var j = 0
    while (j + 1 < syms.length) {
      if (syms(j) == l && syms(j + 1) == r) return true
      j += 1
    }
    false
  }

  /** Greedy non-overlapping left-to-right merge of (l, r) — the
    * `replace("(l)(r)", "(lr)")` semantics on the symbol array.
    */
  private def mergeWord(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
        out += l + r; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Learn `merges` merge rules over `df`'s `textCol`. Returns one row
    * per round: (round, lhs, rhs, pair_count, corpus_symbols) where
    * pair_count is the corpus-weighted frequency of the chosen pair
    * BEFORE the merge and corpus_symbols the weighted total symbol count
    * AFTER it — the latter independently validates the apply step (under
    * overlaps, e.g. (a,a) on "aaaa", fewer merges apply than pairs
    * counted, and only a correct greedy apply yields the right total).
    *
    * `minCount` drops vocabulary words rarer than the floor BEFORE
    * training (0 symbols contributed) — the standard min-frequency knob
    * every production BPE trainer exposes. The default 1 keeps every
    * word. `maxVocab` is the STRUCTURAL driver-memory bound: a
    * distributed top-V frequency cut (TakeOrderedAndProject — no full
    * vocabulary sort, no driver involvement until V rows) under the
    * deterministic order (n DESC, word ASC in UTF-8 binary order), so
    * the collect is bounded by V however heavy the hapax tail is —
    * minCount's bound is data-dependent, this one is not. With
    * V >= distinct words the cut is a no-op (identical rules,
    * spec-asserted); the cut's tie order is pinned by spec.
    *
    * `byteLevel = true` trains over the [[byteToUnicode]] byte alphabet
    * instead of code points — the real-LLM-tokenizer symbol model
    * (GPT-2/LLaMA-style): multi-byte UTF-8 characters are several
    * symbols and merges reassemble them from data, not from the
    * decoder's notion of a character.
    */
  def train(df: DataFrame, textCol: String, merges: Int,
      minCount: Long = 1L,
      maxVocab: Int = Int.MaxValue,
      byteLevel: Boolean = false,
      onStats: TrainStats => Unit = _ => ()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(merges >= 1, "merges >= 1")
    // the ONE distributed corpus pass
    val counted = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val capped =
      if (maxVocab == Int.MaxValue) counted
      else counted.orderBy(col("n").desc, col("word").asc).limit(maxVocab)
    val vocabRows = capped.as[(String, Long)].collect()

    val nWords = vocabRows.length
    val freq = new Array[Long](nWords)
    val words = new Array[Array[String]](nWords)
    var totalSymbols = 0L
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)

    def inc(p: (String, String), w: Long, id: Int): Unit = {
      pairCounts.update(p, pairCounts.getOrElse(p, 0L) + w)
      pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += id
    }
    def dec(p: (String, String), w: Long): Unit = {
      val c = pairCounts(p) - w
      if (c <= 0L) pairCounts.remove(p) else pairCounts.update(p, c)
    }

    var i = 0
    while (i < nWords) {
      freq(i) = vocabRows(i)._2
      val syms = splitWord(vocabRows(i)._1, byteLevel)
      words(i) = syms
      totalSymbols += freq(i) * syms.length
      var j = 0
      while (j + 1 < syms.length) { inc((syms(j), syms(j + 1)), freq(i), i); j += 1 }
      i += 1
    }
    pairCounts.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }

    val rules = mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    var wordUpdates = 0L
    var symbolOps = 0L
    var round = 1
    while (round <= merges) {
      // lazy argmax: discard entries whose count no longer matches
      var best: (Long, String, String) = null
      while (best == null && heap.nonEmpty) {
        val e = heap.dequeue()
        if (pairCounts.getOrElse((e._2, e._3), 0L) == e._1) best = e
      }
      require(best != null,
        s"BPE round $round: no adjacent pairs left — corpus exhausted after ${round - 1} merges")
      val (cnt, l, r) = best
      val touched = mutable.HashSet.empty[(String, String)]
      // ONLY the words containing the winning pair are re-counted
      pairWords.remove((l, r)).foreach(_.foreach { id =>
        val syms = words(id)
        if (containsPair(syms, l, r)) {
          wordUpdates += 1
          symbolOps += syms.length
          val w = freq(id)
          var j = 0
          while (j + 1 < syms.length) {
            dec((syms(j), syms(j + 1)), w); touched += ((syms(j), syms(j + 1))); j += 1
          }
          val merged = mergeWord(syms, l, r)
          words(id) = merged
          j = 0
          while (j + 1 < merged.length) {
            inc((merged(j), merged(j + 1)), w, id); touched += ((merged(j), merged(j + 1))); j += 1
          }
          totalSymbols -= w * (syms.length - merged.length)
        }
      })
      assert(!pairCounts.contains((l, r)),
        s"BPE round $round: merged pair ($l, $r) still has occurrences — apply bug")
      // every touched pair re-enters the heap at its NEW count; the old
      // entries go stale and are discarded on pop
      touched.foreach { p =>
        pairCounts.get(p).foreach(c => heap.enqueue((c, p._1, p._2)))
      }
      rules += ((round.toLong, l, r, cnt, totalSymbols))
      round += 1
    }
    onStats(TrainStats(merges, nWords.toLong, wordUpdates, symbolOps))
    rules.toSeq.toDF("round", "lhs", "rhs", "pair_count", "corpus_symbols")
  }

  /** Encode `textCol` under an already-learned rule list and count the
    * resulting symbols per document — the inference-side 100 TB
    * tokenizer workload: one narrow scan, no shuffle beyond the per-doc
    * sum. The per-word work is [[graft.functions.expr.BpeOps]]'
    * bounded kernel — O(len^2) per word INDEPENDENT of the rule count,
    * applying rules in training order with the same greedy semantics
    * (the former fold of one codegen'd `replace` per rule grew the
    * expression tree with the vocabulary and broke down far below real
    * 32k-merge rule tables). For corpora with long repeated words, the
    * standard distinct-word cache (encode per distinct word, join counts
    * back) composes on top; under Zipf the frequent words are short, so
    * the plain scan is the default.
    */
  def encodeSymbolCounts(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)], byteLevel: Boolean = false): DataFrame =
    df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(col(idCol),
        GraftFunctions.bpeSymbolCount(col("word"), rules, byteLevel)
          .cast("long").as("k"))
      .groupBy(idCol).agg(sum("k").as("n_bpe_tokens"))
}

package graft.functions.expr

import org.apache.spark.unsafe.types.UTF8String

/** Compiled form of a learned BPE rule list: the (lhs, rhs) -> ranks map
  * plus the flat rule arrays, shipped to executors as ONE plan-level
  * reference object (like [[graft.functions.expr]] HyperplaneSignature's
  * plane matrix) — never serialized into the expression tree as a
  * 32k-literal chain.
  *
  * The rank map key joins lhs and rhs with [[BpeTable.Sep]] (U+0000 NUL,
  * written as an escape so the source stays a diffable text file), which
  * cannot occur inside a symbol (symbols are concatenations of word
  * characters — letter/digit runs from the tokenizer), so the key is
  * unambiguous.
  *
  * A pair may carry SEVERAL ranks: the trainer normally never re-emits a
  * pair (a merge consumes all its occurrences), but a DIFFERENT
  * intermediate merge can re-create the pair later — e.g. the symbol
  * "abc" is producible by both (ab,c) and (a,bc), so after (a,bc) fires
  * elsewhere a later legitimate (ab,c) rule would find fresh pairs. The
  * map therefore stores ALL ranks per pair (ascending, by construction),
  * and the kernel picks the minimum rank >= its cursor — exactly the
  * rule the sequential fold applies.
  */
final class BpeTable(rules: Seq[(String, String)],
    val byteLevel: Boolean = false) extends Serializable {
  val lhs: Array[String] = rules.map(_._1).toArray
  val rhs: Array[String] = rules.map(_._2).toArray
  @transient lazy val ranks: java.util.HashMap[String, Array[Int]] = {
    val acc = new java.util.HashMap[String, java.util.ArrayList[Integer]](lhs.length * 2)
    var i = 0
    while (i < lhs.length) {
      val k = lhs(i) + BpeTable.Sep + rhs(i)
      var l = acc.get(k)
      if (l == null) { l = new java.util.ArrayList[Integer](1); acc.put(k, l) }
      l.add(Integer.valueOf(i)) // i is increasing, so each list is sorted ascending
      i += 1
    }
    val m = new java.util.HashMap[String, Array[Int]](acc.size * 2)
    val it = acc.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val l = e.getValue
      val a = new Array[Int](l.size)
      var j = 0
      while (j < a.length) { a(j) = l.get(j).intValue; j += 1 }
      m.put(e.getKey, a)
    }
    m
  }
  def size: Int = lhs.length
}

object BpeTable {
  /** Separator between lhs and rhs in the rank-map key — NUL, which the
    * word tokenizer can never emit inside a symbol. Kept as an escape so
    * git/diff tools treat this source as text.
    */
  val Sep: String = "\u0000"
}

/** JVM kernel for the BPE encode expression — the bounded per-word
  * replacement for the O(merges)-deep replace-chain fold.
  *
  * Semantics are EXACTLY the sequential fold's (apply each learned rule
  * once, in training order, as a greedy non-overlapping left-to-right
  * merge — the `replace(s, "(l)(r)", "(lr)")` semantics the DuckDB
  * oracle replays), computed without touching rules that cannot fire:
  * repeatedly find the minimum-rank adjacent pair with rank >= the
  * cursor, merge ALL its occurrences greedily, advance the cursor past
  * that rank. Equivalence: between two applied ranks the symbol array is
  * unchanged, so a skipped rule's pair was absent when its turn came;
  * and a rule's own pass never re-creates its own pair (the merged
  * symbol contains both halves), so one greedy pass per rule is
  * complete. Duplicate rules for the SAME pair (re-created by a
  * different intermediate merge) are honored: the table stores every
  * rank a pair was emitted at and the scan takes the minimum rank at or
  * after the cursor. Cost is O(len^2) per word — INDEPENDENT of the
  * rule count, which is what makes a 32k-merge vocabulary encodable at
  * corpus scale (the fold's 32k-deep expression chain also breaks
  * codegen long before that).
  */
object BpeOps {

  /** Smallest element of sorted `a` that is >= `cursor`, or Int.MaxValue. */
  private def minAtOrAfter(a: Array[Int], cursor: Int): Int = {
    var j = 0
    while (j < a.length) {
      if (a(j) >= cursor) return a(j)
      j += 1
    }
    Integer.MAX_VALUE
  }

  /** Number of BPE symbols `word` encodes to under `t`'s rules. The
    * initial split matches the trainer's symbol model: code points
    * (the "(.)" per-character wrap of training), or — `t.byteLevel` —
    * UTF-8 bytes mapped through [[graft.operators.Bpe.byteToUnicode]].
    */
  def symbolCount(word: UTF8String, t: BpeTable): Int = {
    val w = word.toString
    var syms = new java.util.ArrayList[String](w.length)
    if (t.byteLevel) {
      val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < bytes.length) {
        syms.add(graft.operators.Bpe.byteToUnicode(bytes(i) & 0xff))
        i += 1
      }
    } else {
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms.add(w.substring(i, i + n))
        i += n
      }
    }
    val ranks = t.ranks
    var cursor = 0
    var done = syms.size < 2 || t.size == 0
    while (!done) {
      // minimum applicable rank at or after the cursor
      var best = Integer.MAX_VALUE
      var j = 0
      while (j + 1 < syms.size) {
        val a = ranks.get(syms.get(j) + BpeTable.Sep + syms.get(j + 1))
        if (a != null) {
          val r = minAtOrAfter(a, cursor)
          if (r < best) best = r
        }
        j += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        val l = t.lhs(best); val rr = t.rhs(best); val m = l + rr
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k + 1 < syms.size && syms.get(k) == l && syms.get(k + 1) == rr) {
            out.add(m); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
        cursor = best + 1
        if (syms.size < 2) done = true
      }
    }
    syms.size
  }
}

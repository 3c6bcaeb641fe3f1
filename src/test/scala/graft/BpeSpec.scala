package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed merges: argmax, tie-break, greedy apply") {
    // vocab: aaa ×1, bb ×2  (two docs; "bb" appears twice)
    val docs = Seq((1L, "aaa bb"), (2L, "bb")).toDF("doc_id", "text")
    val out = Bpe.train(docs, "text", merges = 2)
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // round 1: pairs (a,a)×2 (within "aaa"), (b,b)×2 (two "bb" docs) —
    // tie at 2, lexicographic tie-break picks (a,a); greedy apply turns
    // "(a)(a)(a)" into "(aa)(a)" (ONE merge, not two) so the weighted
    // symbol total is aaa→2 plus bb→2×2 = 6
    assert(out(0) == ((1L, "a", "a", 2L, 6L)))
    // round 2: pairs (aa,a)×1, (b,b)×2 → (b,b); total = 2 + 1×2 = 4
    assert(out(1) == ((2L, "b", "b", 2L, 4L)))
  }

  test("overlapping runs merge greedily left-to-right (aaaa: 3 pairs, 2 merges)") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = Bpe.train(docs, "text", merges = 1).collect()(0)
    assert(out.getString(1) == "a" && out.getString(2) == "a")
    assert(out.getLong(3) == 3L, "pair_count counts all 3 adjacent (a,a) pairs")
    assert(out.getLong(4) == 2L, "greedy apply yields (aa)(aa) - 2 symbols")
  }

  test("encode under learned rules reproduces training symbol totals") {
    val docs = Seq((1L, "banana band"), (2L, "banana")).toDF("doc_id", "text")
    val trained = Bpe.train(docs, "text", merges = 3).orderBy("round").collect()
    val rules = trained.map(r => (r.getString(1), r.getString(2))).toSeq
    val lastTotal = trained.last.getLong(4)
    val enc = Bpe.encodeSymbolCounts(docs, "doc_id", "text", rules)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(enc == lastTotal,
      "encoding the corpus under the learned rules must give the training total")
  }

  test("byte-level: multi-byte characters are several symbols that merges reassemble") {
    // "ää" = bytes C3 A4 C3 A4 → symbols Ã ¤ Ã ¤ (0xC3/0xA4 are both in
    // the printable self-map range); the only pairs are (Ã,¤)×2 and
    // (¤,Ã)×1, so round 1 must merge the intra-character pair — byte
    // evidence, not the decoder's notion of a character
    val docs = Seq((1L, "ää")).toDF("doc_id", "text")
    val out = Bpe.train(docs, "text", merges = 2, byteLevel = true)
      .orderBy("round").collect()
    assert(out(0).getString(1) == "Ã" && out(0).getString(2) == "¤",
      s"round 1 must merge the UTF-8 byte pair of ä, got ${out(0)}")
    assert(out(0).getLong(3) == 2L && out(0).getLong(4) == 2L)
    // round 2 joins the two reassembled characters
    assert(out(1).getString(1) == "Ã¤" && out(1).getString(2) == "Ã¤")
    // code-point training on the same corpus starts from 'ä' directly —
    // the two symbol models provably differ
    val cp = Bpe.train(docs, "text", merges = 1).collect()(0)
    assert(cp.getString(1) == "ä" && cp.getString(2) == "ä")
  }

  test("byte-level alphabet: every byte maps to one distinct printable symbol") {
    val m = Bpe.byteToUnicode
    assert(m.length == 256)
    assert(m.distinct.length == 256, "mapping must be injective (lossless)")
    assert(m.forall(s => s.codePointCount(0, s.length) == 1))
    // GPT-2 pins: printable ASCII self-maps, space/controls shift to 256+k
    assert(m('a'.toInt) == "a" && m('0'.toInt) == "0")
    assert(m(' '.toInt).codePointAt(0) >= 256)
    assert(m(0xc3) == "Ã" && m(0xa4) == "¤")
  }

  test("byte-level encode kernel matches the trainer's symbol totals on non-ASCII") {
    val docs = Seq((1L, "ärger über ärger"), (2L, "la journée passée"))
      .toDF("doc_id", "text")
    val trained = Bpe.train(docs, "text", merges = 6, byteLevel = true)
      .orderBy("round").collect()
    val rules = trained.map(r => (r.getString(1), r.getString(2))).toSeq
    val lastTotal = trained.last.getLong(4)
    val enc = Bpe.encodeSymbolCounts(docs, "doc_id", "text", rules, byteLevel = true)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(enc == lastTotal,
      "byte-level encode under the learned rules must give the training total")
  }

  test("maxVocab: a top-V cut at V >= vocab is a no-op; the cut's tie order is pinned") {
    val docs = Seq((1L, "foo bar baz foo bar qux quux corge"),
      (2L, "foo bar grault garply waldo")).toDF("doc_id", "text")
    val full = Bpe.train(docs, "text", merges = 4).collect().map(_.toSeq).toSeq
    val capped = Bpe.train(docs, "text", merges = 4, maxVocab = 1000)
      .collect().map(_.toSeq).toSeq
    assert(capped == full, "V >= distinct words must not change any rule")
    // tie order: words at the same frequency cut in UTF-8-binary word
    // order. Vocab: freq-3 foo/bar, freq-1 the rest; V=4 keeps
    // foo, bar, then the two lexicographically-smallest singletons
    // (baz, corge) — so 'qu' can never be learned while 'ba'+'z' can
    val cut = Bpe.train(docs, "text", merges = 2, maxVocab = 4)
      .orderBy("round").collect()
    val cutPairs = cut.map(r => (r.getString(1), r.getString(2))).toSet
    assert(!cutPairs.exists { case (l, r) => (l + r).contains("qu") },
      s"qux/quux are past the deterministic cut: $cutPairs")
  }

  // ---- reference implementations the incremental trainer/kernel must
  // equal: a naive full-recount trainer and the sequential replace-chain
  // fold (the old implementation's semantics, also what the DuckDB
  // oracle replays)

  private def cmp(a: String, b: String): Int = {
    val c = a.compareTo(b); c // ASCII test corpus: code-unit == code-point order
  }

  private def naiveTrain(vocab: Seq[(String, Long)], merges: Int)
      : Seq[(Long, String, String, Long, Long)] = {
    var words = vocab.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    for (r <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + n
      assert(counts.nonEmpty, s"naive reference exhausted at round $r")
      val best = counts.toSeq.sortWith { case (((l1, r1), c1), ((l2, r2), c2)) =>
        if (c1 != c2) c1 > c2
        else if (l1 != l2) cmp(l1, l2) < 0
        else cmp(r1, r2) < 0
      }.head
      val ((l, rr), cnt) = best
      words = words.map { case (syms, n) =>
        val o = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == rr) { o += l + rr; j += 2 }
          else { o += syms(j); j += 1 }
        }
        (o.toArray, n)
      }
      val total = words.map { case (syms, n) => n * syms.length }.sum
      out += ((r.toLong, l, rr, cnt, total))
    }
    out.toSeq
  }

  private def foldCount(word: String, rules: Seq[(String, String)]): Int = {
    var s = word.map(c => s"($c)").mkString
    for ((l, r) <- rules) s = s.replace(s"($l)($r)", s"($l$r)")
    s.count(_ == '(')
  }

  test("incremental trainer equals the naive full-recount reference (random corpus)") {
    val rnd = new scala.util.Random(11)
    val alpha = "abc"
    val ws = Seq.fill(400)((0 until (1 + rnd.nextInt(8)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val vocab = ws.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val want = naiveTrain(vocab, 30)
    val got = Bpe.train(docs, "text", merges = 30).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want,
      s"first divergence: ${got.zip(want).find { case (a, b) => a != b }}")
  }

  test("bounded encode kernel equals the sequential replace-chain fold") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.expr.{BpeOps, BpeTable}
    // rules engineered so later merges create pairs of EARLIER rules
    // (which sequential semantics must NOT apply) and cascading merges
    // (which it must): the equivalence argument's corner cases
    val rules = Seq(("a", "b"), ("ab", "c"), ("b", "c"), ("a", "abc"), ("d", "d"))
    val t = new BpeTable(rules)
    val rnd = new scala.util.Random(13)
    val words = Seq("abc", "aabc", "abcabc", "aabcbc", "ddddd", "abab", "cab",
      "aababcc", "bca", "") ++
      Seq.fill(300)((0 until rnd.nextInt(12)).map(_ => "abcd"(rnd.nextInt(4))).mkString)
    for (w <- words if w.nonEmpty) {
      val got = BpeOps.symbolCount(UTF8String.fromString(w), t)
      val want = foldCount(w, rules)
      assert(got == want, s"word '$w': kernel $got vs fold $want")
    }
    // trained-rule tables too: encode totals already spec'd above, but
    // check per-word equality under a real learned table
    val ws2 = Seq.fill(200)((0 until (1 + rnd.nextInt(8))).map(_ => "abc"(rnd.nextInt(3))).mkString)
    val learned = naiveTrain(ws2.groupBy(identity).view.mapValues(_.size.toLong).toSeq, 20)
      .map(r => (r._2, r._3))
    val t2 = new BpeTable(learned)
    for (w <- ws2.distinct)
      assert(BpeOps.symbolCount(UTF8String.fromString(w), t2) == foldCount(w, learned))
  }

  test("per-round work tracks affected words, not the vocabulary") {
    // 1000 distinct words; every merge affects only the words containing
    // its pair, so total word updates across rounds must sit far below
    // the naive rounds x vocab rescan count
    val rnd = new scala.util.Random(17)
    val ws = (0 until 1000).map(i =>
      (0 until (3 + rnd.nextInt(8))).map(_ => "abcdefgh"(rnd.nextInt(8))).mkString + i)
    val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    var stats: Option[Bpe.TrainStats] = None
    Bpe.train(docs, "text", merges = 50, onStats = s => stats = Some(s)).collect()
    val st = stats.get
    assert(st.vocabWords == 1000L)
    assert(st.wordUpdates < st.vocabWords * st.rounds / 4,
      s"incremental trainer touched ${st.wordUpdates} words over ${st.rounds} rounds " +
        s"— a full-rescan would touch ${st.vocabWords * st.rounds}")
  }

  test("training never rescans the corpus: merge rounds read the cached vocab only") {
    // proxy assertion: the vocabulary of a corpus with many duplicate
    // words is tiny, and training cost scales with it — verified
    // structurally: train() touches df only in the one vocab aggregation
    // (code-shape guarantee), and the rule table on a 1000-copy corpus
    // equals the rule table on the 1-copy corpus scaled in counts
    val one = Seq((1L, "hello world")).toDF("doc_id", "text")
    val many = (0 until 1000).map(i => (i.toLong, "hello world")).toDF("doc_id", "text")
    val a = Bpe.train(one, "text", 2).select("round", "lhs", "rhs").collect().toSeq
    val b = Bpe.train(many, "text", 2).select("round", "lhs", "rhs").collect().toSeq
    assert(a == b, "merge rules are frequency-ratio driven - copies cannot change them")
  }
}

package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot-path vector/text kernels.
  *
  * Each `doGenCode` emits a single static call into [[VectorOps]], so the
  * whole operator stays inside WholeStageCodegen with one JVM loop per row
  * — versus the builtin-composition equivalents (`aggregate`/`zip_with`/
  * `transform` chains) that allocate intermediate arrays per element.
  * Benchmarks (sf0.1): simhash 11.2s → one-pass kernel, minhash 10.4s →
  * one base hash + k multiply-adds per shingle.
  */
private object ExprUtil {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def col(e: Expression): Column = ColumnBridge.column(e)

  /** Both sides must be arrays of the SAME float/double element type:
    * the kernels pick float-vs-double accessors from the left child, so a
    * float/double mix would read garbage instead of failing analysis.
    */
  def checkVectorPair(name: String, left: Expression, right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if (a == FloatType || a == DoubleType) && a == b =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires two arrays with the same float/double element " +
            s"type, got ${l.catalogString} and ${r.catalogString}")
    }

  /** The kernels read raw `ArrayData`/`UTF8String` slots, so a
    * wrong-typed child does not throw — it silently reinterprets memory
    * (a long array fed to a string kernel returns garbage counts, found
    * by PropertySpec). Every expression therefore rejects wrong input
    * types at ANALYSIS time; these helpers keep the messages uniform.
    */
  def checkArrayOf(name: String, e: Expression, elem: DataType,
      pos: String): TypeCheckResult = e.dataType match {
    case ArrayType(t, _) if t == elem => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires $pos of type array<${elem.catalogString}>, " +
        s"got ${other.catalogString}")
  }

  def checkString(name: String, e: Expression): TypeCheckResult = e.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires a string input, got ${other.catalogString}")
  }

  def checkVector(name: String, e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires an array<float|double> vector, got ${other.catalogString}")
  }

  def firstFailure(checks: TypeCheckResult*): TypeCheckResult =
    checks.find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** cosine(array<float|double>, array<float|double>) -> double */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkVectorPair(prettyName, left, right)
  private lazy val isFloat = ExprUtil.isFloatArray(left)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expr.VectorOps.cosine($a, $b, $isFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(array<float|double>, array<float|double>) -> double */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkVectorPair(prettyName, left, right)
  private lazy val isFloat = ExprUtil.isFloatArray(left)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expr.VectorOps.dot($a, $b, $isFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Packed hyperplane sign signature; the plane matrix rides along as a
  * plan-level reference object (not serialized into the expression tree
  * as literals).
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkVector(prettyName, child)
  private lazy val isFloat = ExprUtil.isFloatArray(child)

  override def nullSafeEval(v: Any): Any =
    VectorOps.hyperplaneSig(v.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.expr.VectorOps.hyperplaneSig($v, $ref, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(array<string>) -> long. `portable` uses md5-derived token
  * hashes (bit-replayable in DuckDB oracle SQL) instead of xxh64.
  */
case class SimHash64(child: Expression, portable: Boolean = false) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkArrayOf(prettyName, child, StringType, "its token input")

  override def nullSafeEval(toks: Any): Any =
    VectorOps.simhash64(toks.asInstanceOf[ArrayData], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.expr.VectorOps.simhash64($t, $portable);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_signature(array<string>, k) -> array<long> */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkArrayOf(prettyName, child, StringType, "its shingle input")

  override def nullSafeEval(sh: Any): Any =
    VectorOps.minhashSignature(sh.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expr.VectorOps.minhashSignature($s, $k);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** window_hashes(array<string>, w) -> array<long>: rolling polynomial
  * hash of every length-w token window, O(n) per row (no per-window
  * string build). Feeds Dedup.substringDupSpans' fast path.
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkArrayOf(prettyName, child, StringType, "its token input")

  override def nullSafeEval(toks: Any): Any =
    VectorOps.windowHashes(toks.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.expr.VectorOps.windowHashes($t, $w);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_tokens(string) -> array<string>: lower-cased letter/digit-run
  * tokens, order preserved, duplicates kept.
  */
case class WordTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_tokens"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkString(prettyName, child)

  override def nullSafeEval(text: Any): Any =
    VectorOps.wordTokens(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.expr.VectorOps.wordTokens($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bpe_symbol_count(word) -> number of BPE symbols the word encodes to
  * under a learned rule table. The rule table rides as a plan-level
  * reference object ([[BpeTable]], like HyperplaneSignature's planes);
  * the kernel ([[BpeOps.symbolCount]]) is O(len^2) per word independent
  * of the rule count — a 32k-merge tokenizer stays one static call
  * inside WholeStageCodegen, where the former fold of one `replace` per
  * rule grew the expression tree (and the generated code) linearly with
  * the vocabulary.
  */
case class BpeSymbolCount(child: Expression, table: BpeTable) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_symbol_count"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkString(prettyName, child)

  override def nullSafeEval(word: Any): Any =
    BpeOps.symbolCount(word.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.expr.BpeOps.symbolCount($w, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_shingles(string, n) -> sorted distinct array<string> of word
  * n-grams; tokenize + shingle + dedupe + sort in one kernel.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkString(prettyName, child)

  override def nullSafeEval(text: Any): Any =
    VectorOps.wordShingles(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.expr.VectorOps.wordShingles($t, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** sorted_intersect_size(array<string>, array<string>) -> int; both inputs
  * must be ascending-sorted (array_sort). Linear merge, zero allocation.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.firstFailure(
      ExprUtil.checkArrayOf(prettyName, left, StringType, "its left input"),
      ExprUtil.checkArrayOf(prettyName, right, StringType, "its right input"))

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expr.VectorOps.sortedIntersectSize($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** hashed_bow(array<string>, dim) -> array<double>: md5-bucketed token
  * counts, l2-normalized, rounded to 4 — one pass per row. The builtin
  * composition (per-token md5 → hex substring → conv → per-bucket
  * filter-count) measured ~3 ms/doc from string round-trips; the kernel
  * hashes digest bytes directly. Bucket arithmetic stays the
  * engine-portable SQL form (first 8 md5 hex chars as integer, mod dim).
  */
case class HashedBow(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hashed_bow"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkArrayOf(prettyName, child, StringType, "its token input")

  override def nullSafeEval(toks: Any): Any =
    VectorOps.hashedBow(toks.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.expr.VectorOps.hashedBow($t, $dim);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** top_token_count(array<string>) -> int: max multiplicity of any token. */
case class TopTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_top_token_count"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkArrayOf(prettyName, child, StringType, "its token input")

  override def nullSafeEval(toks: Any): Any =
    VectorOps.topTokenCount(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.expr.VectorOps.topTokenCount($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_encode(vector, coarse_centroid) -> array<int> of m codebook indices
  * (PQ residual encoding). Codebooks ride along as a plan reference object.
  */
case class PqEncode(left: Expression, right: Expression,
    codebooks: Array[Array[Double]], m: Int, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.firstFailure(
      ExprUtil.checkVector(prettyName, left),
      ExprUtil.checkArrayOf(prettyName, right, DoubleType, "its centroid input"))
  private lazy val isFloat = ExprUtil.isFloatArray(left)

  override def nullSafeEval(v: Any, c: Any): Any =
    VectorOps.pqEncode(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      codebooks, m, k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.expr.VectorOps.pqEncode($v, $c, $ref, $m, $k, $isFloat);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** nearest_cells(vector) -> array<int>: the nProbe centroid indices with
  * the highest cosine, best-first — the coarse-quantizer probe as ONE
  * kernel over a centroid reference object instead of an nCells-wide
  * struct-array expression (see [[VectorOps.nearestCells]] for the exact
  * tie/NaN parity contract with the formulation it replaces).
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkVector(prettyName, child)
  private lazy val isFloat = ExprUtil.isFloatArray(child)

  override def nullSafeEval(v: Any): Any =
    VectorOps.nearestCells(v.asInstanceOf[ArrayData], centroids, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.expr.VectorOps.nearestCells($v, $ref, $nProbe, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_lut(query_vector) -> array<double> of m*k ADC partial dot products. */
case class PqLut(child: Expression, codebooks: Array[Array[Double]], m: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.checkVector(prettyName, child)
  private lazy val isFloat = ExprUtil.isFloatArray(child)

  override def nullSafeEval(q: Any): Any =
    VectorOps.pqLut(q.asInstanceOf[ArrayData], codebooks, m, k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
    nullSafeCodeGen(ctx, ev, q =>
      s"${ev.value} = graft.functions.expr.VectorOps.pqLut($q, $ref, $m, $k, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_adc(codes, lut) -> double: O(m) approximate dot product. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.firstFailure(
      ExprUtil.checkArrayOf(prettyName, left, IntegerType, "its codes input"),
      ExprUtil.checkArrayOf(prettyName, right, DoubleType, "its LUT input"))

  override def nullSafeEval(codes: Any, lut: Any): Any =
    VectorOps.pqAdc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.expr.VectorOps.pqAdc($c, $l, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Row-valued bloom-bitmap membership test: `might_contain` with the
  * BITMAP as an ordinary column. Spark's builtin BloomFilterMightContain
  * requires a foldable (or scalar-subquery) bitmap — right for "one bloom,
  * many probe values", unusable for the reverse shape a distributed
  * skipping-index probe needs: ONE hashed lookup value tested against the
  * per-file bitmap column of a (file, bloom) index frame, so only
  * booleans (not bitmaps) ever leave the executors
  * ([[graft.operators.SkippingIndex.pruneBloom]]). Bitmaps are read with
  * the same spark-sketch `BloomFilter.readFrom` the builtin uses, so the
  * formats can never drift. Eval-only (CodegenFallback): the index frame
  * is metadata-sized (one row per data file) and each eval deserializes
  * one ~KB bitmap — codegen would save nothing measurable.
  */
case class BloomBitmapMightContain(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_bitmap_might_contain"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (BINARY bitmap, BIGINT hashed value), got " +
          s"(${l.simpleString(2)}, ${r.simpleString(2)})")
    }
  }

  override def nullSafeEval(bytes: Any, hashed: Any): Any =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(bytes.asInstanceOf[Array[Byte]])
      .mightContainLong(hashed.asInstanceOf[Long])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API entry points for the native expressions. */
object GraftFunctions {
  import ExprUtil.col

  def cosine(a: Column, b: Column): Column =
    col(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    col(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hyperplaneSignature(v: Column, planes: Array[Array[Double]]): Column =
    col(HyperplaneSignature(ColumnBridge.expression(v), planes))

  def simhash64(tokens: Column, portable: Boolean = false): Column =
    col(SimHash64(ColumnBridge.expression(tokens), portable))

  def minhashSignature(shingles: Column, k: Int): Column =
    col(MinHashSignature(ColumnBridge.expression(shingles), k))

  def windowHashes(tokens: Column, w: Int): Column =
    col(WindowHashes(ColumnBridge.expression(tokens), w))

  def sortedIntersectSize(a: Column, b: Column): Column =
    col(SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def wordShingles(text: Column, n: Int): Column =
    col(WordShingles(ColumnBridge.expression(text), n))

  def wordTokens(text: Column): Column =
    col(WordTokens(ColumnBridge.expression(text)))

  def bpeSymbolCount(word: Column, rules: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    col(BpeSymbolCount(ColumnBridge.expression(word), new BpeTable(rules, byteLevel)))

  def topTokenCount(tokens: Column): Column =
    col(TopTokenCount(ColumnBridge.expression(tokens)))

  def hashedBow(tokens: Column, dim: Int): Column =
    col(HashedBow(ColumnBridge.expression(tokens), dim))

  def pqEncode(v: Column, centroid: Column, codebooks: Array[Array[Double]],
      m: Int, k: Int): Column =
    col(PqEncode(ColumnBridge.expression(v), ColumnBridge.expression(centroid),
      codebooks, m, k))

  def nearestCells(v: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    col(NearestCells(ColumnBridge.expression(v), centroids, nProbe))

  def pqLut(q: Column, codebooks: Array[Array[Double]], m: Int, k: Int): Column =
    col(PqLut(ColumnBridge.expression(q), codebooks, m, k))

  def pqAdc(codes: Column, lut: Column, k: Int): Column =
    col(PqAdc(ColumnBridge.expression(codes), ColumnBridge.expression(lut), k))

  def bloomBitmapMightContain(bitmap: Column, hashed: Column): Column =
    col(BloomBitmapMightContain(
      ColumnBridge.expression(bitmap), ColumnBridge.expression(hashed)))
}

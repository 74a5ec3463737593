package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native codegen kernels for the document-sketch hot path (minhash + simhash).
 *
 * Motivation (round-1 bench): the higher-order-function formulation of
 * shingle→hash→k-min (`TextFunctions.wordShingles` + `Dedup.shingleHashes` +
 * `Dedup.minhashFromHashes`) runs interpreted per element — `transform` /
 * `zip_with` / `aggregate` lambdas never enter whole-stage codegen, and the
 * struct-accumulating shingle builder allocates per gram. One query
 * (`x2_dedup_minhash_lsh`) cost 22.7s = 23% of the entire bench at sf0.1.
 *
 * These expressions collapse the whole pipeline into a single compiled pass
 * per row: token bytes are fed straight into an MD5 digest per shingle (no
 * gram string materialization), the 60-bit hash and the k affine permutation
 * minima are tracked in primitive locals. Semantics are BIT-IDENTICAL to the
 * HOF forms (verified in `TextSketchSpec`), so the DuckDB oracle mirrors are
 * unchanged:
 *
 *  - hash60(s) = first 15 hex chars of md5(s) as int64
 *    (== big-endian first 8 md5 bytes >>> 4)
 *  - gram_i    = concat_ws(" ", tokens[i..i+n-1])  (short tails truncate,
 *    exactly as the slice/zip_with builder pads with skipped NULLs)
 *  - sig[q]    = min over grams of (A_q·(hash60 mod 2^30) + B_q) mod P
 *  - simhash   = Σ_b (1<<b) · [ Σ over DISTINCT tokens of ±1 on bit b > 0 ]
 *
 * 100 TB posture: a narrow per-row projection, no shuffle, no UDF —
 * `WholeStageCodegen` keeps the row loop compiled and the kernel is a static
 * call with zero boxing on the hot fields.
 */
object SketchKernels {

  // Affine MinHash family — MUST stay identical to graft.ext.Dedup's
  // (the DuckDB oracle mirrors these constants).
  val MinhashP = 1073741789L // largest prime < 2^30
  val MinhashMod = 1073741824L // 2^30
  def affineA(i: Int): Long = ((1103515245L * i + 12345L) % MinhashMod) | 1L
  def affineB(i: Int): Long = (69069L * i + 1L) % MinhashP

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of an md5 digest as int64: big-endian first 8 bytes,
   *  logically shifted right one nibble. */
  private def h60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** tokens → word-n-gram shingles → md5/60-bit hash → k-element affine
   *  MinHash signature, in one compiled pass. Equals
   *  `Dedup.minhashFromHashes(Dedup.shingleHashes(TextFunctions.wordShingles(text, n)), k)`
   *  for every non-empty token array. INTENTIONAL divergence on empty input:
   *  this kernel returns an EMPTY signature (its `containsNull=false` array
   *  type cannot carry the k NULLs `array_min([])` yields in the HOF form) —
   *  an empty signature is the honest "no shingles" encoding, and every
   *  pipeline consumer filters `size(sig) > 0` before banding. Pinned in
   *  `TextSketchSpec`. */
  def minhashShingleSig(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val numTok = tokens.numElements()
    if (numTok == 0) return new GenericArrayData(Array.empty[Long])
    val cnt = math.max(numTok - (n - 1), 1)
    val md = md5.get()
    val mins = Array.fill(k)(Long.MaxValue)
    val as = Array.tabulate(k)(affineA)
    val bs = Array.tabulate(k)(affineB)
    var i = 0
    while (i < cnt) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val idx = i + j
        // concat_ws(" ") semantics: the zip_with builder pads short tails
        // with NULL and concat_ws skips them — so just stop at the boundary.
        if (idx < numTok && !tokens.isNullAt(idx)) {
          if (!first) md.update(' '.toByte)
          md.update(tokens.getUTF8String(idx).getBytes)
          first = false
        }
        j += 1
      }
      val hm = h60(md.digest()) % MinhashMod
      var q = 0
      while (q < k) {
        val v = (as(q) * hm + bs(q)) % MinhashP
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** `bits`-bit SimHash over the DISTINCT token set (±1 voting per hash bit,
   *  tie → 0). Equals `Dedup.simhash(tokens, bits)` BIT-FOR-BIT, including
   *  null elements: `array_distinct` keeps one null, whose NULL hash votes
   *  `otherwise(-1)` on every bit in the HOF form — mirrored here by a
   *  single all-bits −1 vote when any null element is present. bits ≤ 60 so
   *  every sketch stays positive int64 (DuckDB BIGINT arithmetic is
   *  overflow-checked — see the 60-bit hash family rationale in Dedup). */
  def simhash(tokens: ArrayData, bits: Int): Long = {
    val numTok = tokens.numElements()
    val md = md5.get()
    val votes = new Array[Int](bits)
    val seen = new java.util.HashSet[Any](math.max(16, numTok * 2))
    var hasNull = false
    var i = 0
    while (i < numTok) {
      if (tokens.isNullAt(i)) hasNull = true
      else {
        val t = tokens.getUTF8String(i)
        if (seen.add(t)) {
          md.reset()
          md.update(t.getBytes)
          val h = h60(md.digest())
          var b = 0
          while (b < bits) {
            if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    if (hasNull) { var b = 0; while (b < bits) { votes(b) -= 1; b += 1 } }
    var sketch = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  /** tokens → word-n-gram shingles → DISTINCT SORTED 60-bit gram hashes, in
   *  one compiled pass — the set representation for exact Jaccard
   *  verification. Gram bytes and hashing are identical to
   *  [[minhashShingleSig]] (and to the `wordShinglesSql`+`hash60Sql` oracle
   *  mirror); dedup happens on the HASHES, so both engines compare the exact
   *  same integer sets even under (astronomically unlikely) collisions. */
  def shingleHashSet(tokens: ArrayData, n: Int): ArrayData = {
    val numTok = tokens.numElements()
    if (numTok == 0) return new GenericArrayData(Array.empty[Long])
    val cnt = math.max(numTok - (n - 1), 1)
    val md = md5.get()
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < cnt) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val idx = i + j
        if (idx < numTok && !tokens.isNullAt(idx)) {
          if (!first) md.update(' '.toByte)
          md.update(tokens.getUTF8String(idx).getBytes)
          first = false
        }
        j += 1
      }
      set.add(h60(md.digest()))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** BOTH sketch forms in ONE md5 pass over the shingle stream:
   *  struct(mh = [[minhashShingleSig]], sh = [[shingleHashSet]]). The MD5
   *  digest per shingle dominates both kernels, so pipelines that need the
   *  banded signature AND the exact-verification set (x19, x35) halve their
   *  hot-path cost by sketching once. Outputs are BIT-IDENTICAL to the two
   *  separate kernels (pinned in `TextSketchSpec`). */
  def minhashAndShingleSet(tokens: ArrayData, n: Int, k: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val numTok = tokens.numElements()
    if (numTok == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](new GenericArrayData(Array.empty[Long]),
          new GenericArrayData(Array.empty[Long])))
    val cnt = math.max(numTok - (n - 1), 1)
    val md = md5.get()
    val mins = Array.fill(k)(Long.MaxValue)
    val as = Array.tabulate(k)(affineA)
    val bs = Array.tabulate(k)(affineB)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < cnt) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val idx = i + j
        if (idx < numTok && !tokens.isNullAt(idx)) {
          if (!first) md.update(' '.toByte)
          md.update(tokens.getUTF8String(idx).getBytes)
          first = false
        }
        j += 1
      }
      val h = h60(md.digest())
      set.add(h)
      val hm = h % MinhashMod
      var q = 0
      while (q < k) {
        val v = (as(q) * hm + bs(q)) % MinhashP
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(mins), new GenericArrayData(out)))
  }

  /** Exact Jaccard of two SORTED distinct int64 arrays via a single merge
   *  walk — O(|a|+|b|), no per-pair array allocation. Arithmetic mirrors
   *  `Dedup.jaccardSql`: inter / max(|a|+|b|-inter, 1). */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter / math.max(na.toDouble + nb.toDouble - inter, 1.0)
  }
}

/** Column expression: word-n-gram MinHash signature straight from the token
 *  array (see [[SketchKernels.minhashShingleSig]]). */
case class MinHashShingleSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1 && k <= 64, s"minhash_signature: bad n=$n / k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects ARRAY<STRING> tokens, got $other")
  }

  override def nullSafeEval(tokens: Any): Any =
    SketchKernels.minhashShingleSig(tokens.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SketchKernels.minhashShingleSig($c, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

/** Column expression: `bits`-bit SimHash sketch of a token array
 *  (see [[SketchKernels.simhash]]). */
case class SimHashSketch(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60, s"simhash: bits must be in [1,60], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects ARRAY<STRING> tokens, got $other")
  }

  override def nullSafeEval(tokens: Any): Any =
    SketchKernels.simhash(tokens.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SketchKernels.simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

/** Column expression: distinct sorted 60-bit word-n-gram shingle hashes
 *  (see [[SketchKernels.shingleHashSet]]). */
case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle_hash_set: bad n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set expects ARRAY<STRING> tokens, got $other")
  }

  override def nullSafeEval(tokens: Any): Any =
    SketchKernels.shingleHashSet(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SketchKernels.shingleHashSet($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash_set"
}

/** Column expression: both sketch forms in one compiled pass —
 *  struct(mh: ARRAY<BIGINT>, sh: ARRAY<BIGINT>) per
 *  [[SketchKernels.minhashAndShingleSet]]. */
case class ShingleSketch(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1 && k <= 64, s"shingle_sketch: bad n=$n / k=$k")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(
      "mh", ArrayType(LongType, containsNull = false), nullable = false),
    org.apache.spark.sql.types.StructField(
      "sh", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_sketch expects ARRAY<STRING> tokens, got $other")
  }

  override def nullSafeEval(tokens: Any): Any =
    SketchKernels.minhashAndShingleSet(tokens.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SketchKernels.minhashAndShingleSet($c, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_sketch"
}

/** Column expression: exact Jaccard of two sorted distinct int64 arrays
 *  (see [[SketchKernels.jaccardSorted]]). Inputs MUST be sorted — pair with
 *  [[ShingleHashSet]], which emits sorted sets by construction. */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects ARRAY<BIGINT> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SketchKernels.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}

object TextSketches {
  /** Column-API entry: MinHash signature of word n-gram shingles of a
   *  tokenized text. */
  def minhashShingleSig(tokens: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(
      MinHashShingleSig(GraftColumnBridge.expression(tokens), n, k))

  /** Column-API entry: SimHash sketch of a token array. */
  def simhash(tokens: Column, bits: Int): Column =
    GraftColumnBridge.column(
      SimHashSketch(GraftColumnBridge.expression(tokens), bits))

  /** Column-API entry: distinct sorted word-n-gram shingle hash set. */
  def shingleHashSet(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      ShingleHashSet(GraftColumnBridge.expression(tokens), n))

  /** Column-API entry: struct(mh, sh) — signature + set in one md5 pass. */
  def shingleSketch(tokens: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(
      ShingleSketch(GraftColumnBridge.expression(tokens), n, k))

  /** Column-API entry: exact Jaccard of two sorted distinct hash sets. */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaccardSorted(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

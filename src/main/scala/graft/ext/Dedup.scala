package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.TextFunctions

/**
 * Document-deduplication operators for large-scale training-data pipelines:
 * exact (fingerprint group-by), MinHash+LSH banding, SimHash, and exact
 * n-gram Jaccard over blocked candidate pairs.
 *
 * All hot paths are composed from codegen'd built-ins (no UDFs); hashes are
 * md5-derived 60-bit ints so every step has a bit-identical DuckDB mirror
 * (the *Sql builders) for the driver's oracle.
 *
 * Scale design (100 TB):
 *  - exact dedup is one shuffle on the 128-bit fingerprint — perfectly
 *    balanced keys, no skew.
 *  - MinHash signatures are an O(shingles) per-row projection; candidate
 *    generation joins on (band, band-hashes), i.e. O(n) shuffle + per-bucket
 *    work, never the O(n²) all-pairs join. Bucket sizes concentrate sharply
 *    (random hashing), so no salting is needed; a pathological hot bucket
 *    would surface in AQE's skew-join split.
 *  - exact-Jaccard verification runs only on LSH/blocking survivors — the
 *    candidate set is ~linear in corpus size for real near-dup densities.
 */
object Dedup {

  /** Exact dedup: keep the first row (lowest `idCol`) per normalized-text
   *  fingerprint. One hash-shuffle; survivors carry their fingerprint. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("fingerprint").orderBy(col(idCol))
    docs.withColumn("fingerprint", TextFunctions.docFingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // MinHash hash family: ONE md5 per shingle (the expensive part), then k
  // cheap affine derivations h_i = (a_i·(h mod 2^30) + b_i) mod P. All
  // products stay < 2^60, so the integer math is overflow-free and
  // bit-identical in any engine (DuckDB errors on BIGINT overflow — this
  // family is designed to never get there).
  // Shared with the native codegen kernel (graft.expressions.SketchKernels):
  // the HOF forms here are the readable spec + oracle mirror source, the
  // kernel is the hot-path twin — TextSketchSpec pins them bit-equal.
  private val MinhashP = graft.expressions.SketchKernels.MinhashP
  private val MinhashMod = graft.expressions.SketchKernels.MinhashMod
  private def affineA(i: Int): Long = graft.expressions.SketchKernels.affineA(i)
  private def affineB(i: Int): Long = graft.expressions.SketchKernels.affineB(i)

  /** Per-shingle base hashes — bind this to a column once so the md5 pass
   *  runs once, not once per signature element. */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => TextFunctions.hash60(s))

  def shingleHashesSql(shinglesExpr: String): String =
    s"list_transform($shinglesExpr, s -> ${TextFunctions.hash60Sql("s")})"

  /** k-element MinHash signature from the base-hash array: element i is
   *  `min over shingles of affine_i(hash)` — k permutation approximations
   *  from one md5 per shingle. */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(hashes, h =>
        (lit(affineA(i)) * (h % lit(MinhashMod)) + lit(affineB(i))) % lit(MinhashP)))): _*)

  def minhashFromHashesSql(hashesExpr: String, k: Int): String =
    (0 until k).map(i =>
      s"list_min(list_transform($hashesExpr, h -> (${affineA(i)} * (h % $MinhashMod) + ${affineB(i)}) % $MinhashP))")
      .mkString("[", ", ", "]")

  /** Convenience composition (prefer binding [[shingleHashes]] to a column
   *  first in multi-use plans — Catalyst won't CSE the md5 pass for you). */
  def minhashSignature(shingles: Column, k: Int): Column =
    minhashFromHashes(shingleHashes(shingles), k)

  /**
   * LSH banding: split the signature into `bands` bands of `rowsPerBand`
   * minhashes; docs agreeing on ALL hashes of any band become a candidate
   * pair. Returns distinct (doc_a, doc_b) with doc_a < doc_b.
   *
   * The join key is (band, h_0..h_{r-1}) — an equi-join Catalyst shuffles by
   * hash, so the quadratic blow-up is confined to single buckets.
   */
  def lshCandidatePairs(sig: DataFrame, idCol: String, mhCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      struct((lit(b).as("band") +:
        (0 until rowsPerBand).map(r =>
          element_at(col(mhCol), b * rowsPerBand + r + 1).as(s"h$r"))): _*)
    }: _*)
    val rows = sig.select(col(idCol), explode(bandStructs).as("bk"))
      .select(col(idCol), col("bk.*"))
    val a = rows.alias("a"); val b = rows.alias("b")
    val keyEq = (col("a.band") === col("b.band")) +:
      (0 until rowsPerBand).map(r => col(s"a.h$r") === col(s"b.h$r"))
    a.join(b, keyEq.reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** Fraction of the two signatures' k minhashes that agree — the unbiased
   *  Jaccard estimate for MinHash. */
  def signatureAgreement(mhA: Column, mhB: Column, k: Int): Column =
    (1 to k).map(i =>
      when(element_at(mhA, i) === element_at(mhB, i), 1).otherwise(0))
      .reduce(_ + _).cast(DoubleType) / lit(k.toDouble)

  def signatureAgreementSql(a: String, b: String, k: Int): String =
    s"(CAST(len(list_filter([${(1 to k).mkString(", ")}], i -> $a[i] = $b[i])) AS DOUBLE) / $k.0)"

  /** `bits`-bit SimHash over the distinct-token set: bit b is set when the
   *  majority of token hashes have bit b set (+1/−1 voting). Near-duplicate
   *  docs land within small Hamming distance. */
  def simhash(tokens: Column, bits: Int): Column = {
    val hashes = transform(array_distinct(tokens), t => TextFunctions.hash60(t))
    (0 until bits).map { b =>
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _).cast(LongType)
  }

  /** SQL mirror of [[simhash]] (integer votes — order-insensitive, so
   *  DuckDB's unordered list_distinct is safe). */
  def simhashSql(tokensExpr: String, bits: Int): String =
    simhashFromHashesSql(
      s"list_transform(list_distinct($tokensExpr), t -> ${TextFunctions.hash60Sql("t")})",
      bits)

  /** [[simhashSql]] over a pre-bound distinct-token hash list — hoist the
   *  hash pass into a CTE so the oracle doesn't re-run md5 per sketch bit. */
  def simhashFromHashesSql(hashesExpr: String, bits: Int): String =
    (0 until bits).map { b =>
      val vote = s"list_sum(list_transform($hashesExpr, h -> CASE WHEN (h & ${1L << b}) != 0 THEN 1 ELSE -1 END))"
      s"(CASE WHEN $vote > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("CAST((", " + ", ") AS BIGINT)")

  /**
   * Connected components over near-duplicate pairs: every node gets the
   * MINIMUM id reachable through the pair graph as its cluster label — the
   * canonical-document assignment of clustering dedup ("keep one doc per
   * near-dup cluster").
   *
   * Iterative min-label propagation WITH pointer jumping: per round, each
   * node takes the min of its own, its neighbors', and its label's label —
   * the pointer-jump halves remaining chain lengths, so convergence is
   * O(log diameter) rounds instead of O(diameter). Each round is two
   * equi-joins + one aggregation — shuffle-partitioned by node id, no
   * driver-side graph state; the same shape the large-star/small-star
   * algorithm runs at 100 TB.
   */
  def connectedComponents(nodes: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("__src"), col(bCol).as("__dst"))
      .unionByName(pairs.select(col(bCol).as("__src"), col(aCol).as("__dst")))
      .distinct().localCheckpoint(true)
    // localCheckpoint (not persist): iterative plans nest their whole
    // history, so re-analysis cost grows per round — truncating lineage
    // keeps every iteration O(current state).
    // labels only ever DECREASE (min-propagation + min-jump), so the label
    // SUM is a strictly monotone progress measure: sum unchanged ⟺ no label
    // changed. The sum rides the checkpoint materialization as an OBSERVED
    // metric — the old separate aggregate re-scanned the fresh labels once
    // more per round (a full extra pass at any scale).
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs, sum(col("cc").cast("decimal(38,0)")).as("__s"))
        .localCheckpoint(true)
      (ck, obs.get("__s").asInstanceOf[java.math.BigDecimal])
    }
    var (labels, prevSum) = checkpointWithSum(
      nodes.select(col(idCol), col(idCol).as("cc")))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbr = labels.join(edges, labels(idCol) === edges("__src"))
        .select(col("__dst").as(idCol), col("cc"))
      val merged = labels.unionByName(nbr)
        .groupBy(idCol).agg(min("cc").as("cc")).localCheckpoint(true)
      // pointer jump: follow the current label to ITS label and take the min
      val jump = merged.select(col(idCol).as("__lid"), col("cc").as("__lcc"))
      val (next, curSum) = checkpointWithSum(
        merged.join(jump, merged("cc") === jump("__lid"), "left")
          .select(merged(idCol),
            least(merged("cc"), coalesce(col("__lcc"), merged("cc"))).as("cc")))
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      it += 1
    }
    labels
  }

  /** Exact Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = size(a).cast(DoubleType) + size(b).cast(DoubleType) - inter
    inter / greatest(uni, lit(1.0))
  }

  def jaccardSql(a: String, b: String): String = {
    val inter = s"CAST(len(list_intersect($a, $b)) AS DOUBLE)"
    s"($inter / greatest(CAST(len($a) AS DOUBLE) + CAST(len($b) AS DOUBLE) - $inter, 1.0))"
  }

  // ---- CORPUS BLOOM SUMMARY (incremental exact-dedup prefilter) -----------
  //
  // The production shape when corpus ≫ batch and batches arrive
  // continuously: instead of scanning (or even banding) the corpus per
  // arriving batch, the corpus's fingerprint set is summarized ONCE into a
  // Bloom filter — megabytes for billions of documents — and each batch
  // probes the broadcast summary row-locally. Only probe HITS (true
  // matches + the fpp sliver of false positives) proceed to the exact
  // fingerprint join; a batch with no duplicates touches zero corpus
  // partitions. The filter is maintained incrementally: bloom union is
  // bitwise OR, so each committed batch's own summary ORs in (same
  // discipline as the per-file bloom index sidecars in LakeTable).
  // Exactness: Bloom filters have no false negatives, and the verify join
  // removes false positives — the RESULT is exact, only the WORK is
  // probabilistic. Build and probe reuse Spark's own codegen'd
  // BloomFilterAggregate / BloomFilterMightContain (the runtime-filter
  // machinery), driven directly so the summary is a first-class value the
  // pipeline can persist and ship.

  /** One-pass executor-merged Bloom summary of `keyCol` (a LONG column):
   *  partial blooms build per partition and OR-merge in the aggregate —
   *  the driver receives only the final ~`numBits/8` byte sketch. */
  def bloomSummary(df: DataFrame, keyCol: Column,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnBridge.expression(keyCol.cast(LongType)))),
      Literal(expectedItems), Literal(numBits))
    df.select(GraftColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Row-local membership probe of a [[bloomSummary]] — codegen'd, no UDF.
   *  NULL keys probe to NULL (kept by neither filter side). */
  def mightContain(summary: Array[Byte], keyCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.types.BinaryType
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(summary, BinaryType),
      new XxHash64(Seq(GraftColumnBridge.expression(keyCol.cast(LongType))))))
  }
}

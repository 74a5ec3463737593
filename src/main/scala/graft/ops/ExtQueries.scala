package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.expressions.{TextSketches => TS}
import graft.ext.{Dedup, Media, Similarity, Skew}
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.ingest.BronzeIngest
import graft.lake.LakeTable

/**
 * North-star extension queries (SURVEY.md §7.6): the operations a
 * large-scale training-data pipeline needs on top of the reference's
 * medallion surface — deduplication (exact / MinHash+LSH / SimHash /
 * n-gram Jaccard / embedding cosine), similarity search (brute-force and
 * LSH top-k), text analysis, and multimodal-column plumbing. All over the
 * driver `documents` / `embeddings` tables with exact DuckDB oracles.
 */
object ExtQueries {

  private val K = 8 // minhash signature length
  private val BANDS = 4
  private val ROWS_PER_BAND = 2
  private val DIM = 64
  private val LSH_BITS = 6 // 64 buckets/band: candidate sets stay ~n/64-sized
  private val LSH_BANDS = 4
  private val SIMHASH_BITS = 60 // positive int64 — DuckDB BIGINT is overflow-checked
  private val SIMHASH_BANDS = 4
  private val SIMHASH_BAND_BITS = 15 // 2^15 buckets/band
  private val SIMHASH_HAM = 3 // ≤3 differing bits can't dirty all 4 bands → full recall

  private def tmp(prefix: String): String =
    FixtureRoots.create(prefix)   // registered; harness sweeps after each query

  /** Shared oracle CTE: embeddings as double vectors with precomputed norms. */
  private val NORM_CTE =
    """n AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
      |  sqrt(list_dot_product(list_transform(embedding, x -> x::DOUBLE),
      |                        list_transform(embedding, x -> x::DOUBLE))) AS nrm
      |  FROM embeddings)""".stripMargin

  /** Shared oracle CTE: banded LSH bucket per embedding (over the `n` CTE's
    * double vectors — mirrors lshBucket's internal toDouble). */
  private val BUCKET_CTE = {
    val bands = (0 until LSH_BANDS).map { b =>
      s"SELECT vec_id, $b AS band, ${VF.lshBucketSql("v", DIM, LSH_BITS, seed = b * LSH_BITS)} AS bucket FROM n"
    }.mkString("\nUNION ALL\n")
    s"bk AS (\n$bands)"
  }

  val all: Seq[Q] = Seq(

    // ---- deduplication ------------------------------------------------------

    // Exact dedup: fingerprint group-by, keep lowest doc_id. The union plants
    // exact duplicates (same text, shifted ids) for the operator to remove.
    Q("x1_dedup_exact", (s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val planted = docs.withColumn("doc_id", col("doc_id") + lit(1000000L))
      Dedup.exact(docs.unionByName(planted), "doc_id", "text")
        .select("doc_id", "fingerprint").orderBy("doc_id")
    },
      Some(s"""WITH all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 1000000, text FROM documents)
        SELECT doc_id, ${TF.docFingerprintSql("text")} AS fingerprint FROM all_docs
        QUALIFY ROW_NUMBER() OVER (PARTITION BY ${TF.docFingerprintSql("text")} ORDER BY doc_id) = 1
        ORDER BY doc_id""")),

    // MinHash + LSH banding near-dup candidates with signature-estimated
    // Jaccard (shingle→minhash→band→bucket-join; no O(n²) pair scan).
    // The shingle→hash→k-min pipeline is ONE native codegen expression
    // (graft.expressions.MinHashShingleSig) — the round-1 HOF formulation of
    // the same math ran interpreted per element and owned 23% of the bench.
    Q("x2_dedup_minhash_lsh", (s, d) => {
      // persist the signature: the self-join + two enrich joins reuse it.
      // text-non-null ≡ size(mh)>0 (split(trim(s)) is never empty for
      // non-null s); the cheap form pushes to the scan instead of
      // duplicating the minhash kernel into a pushed Filter
      val sig = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          TS.minhashShingleSig(TF.tokens(TF.normalizeText(col("text"))), 3, K).as("mh"))
        .persist()
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", "mh", BANDS, ROWS_PER_BAND)
      cand
        .join(sig.select(col("doc_id").as("doc_a"), col("mh").as("mha")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("mh").as("mhb")), "doc_b")
        .withColumn("est_jaccard", Dedup.signatureAgreement(col("mha"), col("mhb"), K))
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    },
      Some(s"""WITH sh AS (
          SELECT doc_id, ${TF.wordShinglesSql("text", 3)} AS sh FROM documents),
        hs AS (
          SELECT doc_id, ${Dedup.shingleHashesSql("sh")} AS hs
          FROM sh WHERE len(sh) > 0),
        sigs AS (
          SELECT doc_id, ${Dedup.minhashFromHashesSql("hs", K)} AS mh FROM hs),
        bands AS (
          SELECT doc_id, b AS band, mh[2*b+1] AS h0, mh[2*b+2] AS h1
          FROM sigs, (SELECT unnest([0,1,2,3]) AS b) bb),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
          ${Dedup.signatureAgreementSql("sa.mh", "sb.mh", K)} AS est_jaccard
        FROM cand JOIN sigs sa ON cand.doc_a = sa.doc_id
                  JOIN sigs sb ON cand.doc_b = sb.doc_id
        ORDER BY doc_a, doc_b""")),

    // SimHash document sketch + hamming-prefix bucket (native codegen kernel;
    // TextSketchSpec pins it bit-equal to the HOF spec form Dedup.simhash).
    Q("x3_dedup_simhash", (s, d) => {
      val toks = TF.tokens(TF.normalizeText(col("text")))
      t(s, d, "documents")
        .select(col("doc_id"), TS.simhash(toks, 16).as("simhash"))
        .withColumn("bucket", shiftright(col("simhash"), 8))
        .orderBy("doc_id")
    },
      Some(s"""SELECT doc_id,
          ${Dedup.simhashSql(TF.tokensSql(TF.normalizeTextSql("text")), 16)} AS simhash,
          ${Dedup.simhashSql(TF.tokensSql(TF.normalizeTextSql("text")), 16)} >> 8 AS bucket
        FROM documents ORDER BY doc_id""")),

    // SimHash near-dup pairs, banded properly for corpus scale: a 60-bit
    // sketch split into 4 × 15-bit bands (2^15 buckets per band — bucket
    // cardinality grows with sketch entropy, so candidate pairs stay ~linear
    // in corpus size, unlike round 1's 256-bucket prefix whose pairs grew
    // O(n²/256)), verified by Hamming distance over the FULL sketch.
    // Hamming ≤ SIMHASH_HAM with 4 bands guarantees 100% recall by
    // pigeonhole (≤3 differing bits can't dirty all 4 bands). 60 bits (not
    // 64) keeps every sketch a positive int64 — DuckDB BIGINT arithmetic is
    // overflow-checked, and the driver oracle must replay the same math.
    Q("x18_dedup_simhash_pairs", (s, d) => {
      def bandOf(sh: Column, j: Int): Column =
        shiftright(sh, j * SIMHASH_BAND_BITS)
          .bitwiseAND(lit((1L << SIMHASH_BAND_BITS) - 1))
      val toks = TF.tokens(TF.normalizeText(col("text")))
      val dd = t(s, d, "documents")
        .select(col("doc_id"), TS.simhash(toks, SIMHASH_BITS).as("sh"))
        .persist()
      val bandStructs = array((0 until SIMHASH_BANDS).map { j =>
        struct(lit(j).as("band"), bandOf(col("sh"), j).as("bv"))
      }: _*)
      val rows = dd.select(col("doc_id"), col("sh"), explode(bandStructs).as("bk"))
        .select(col("doc_id"), col("sh"), col("bk.*"))
      val a = rows.alias("a"); val b = rows.alias("b")
      // A pair matching several bands is emitted ONLY from its first agreeing
      // band (no-earlier-band-matches predicate) — pairs come out unique by
      // construction, so no post-join DISTINCT shuffle. The hamming verify
      // rides the join as a filter, so non-dup bucket collisions never
      // materialize downstream.
      val firstBandOnly = (0 until SIMHASH_BANDS - 1).map { i =>
        col("a.band") <= lit(i) || (bandOf(col("a.sh"), i) =!= bandOf(col("b.sh"), i))
      }.reduce(_ && _)
      a.join(b, col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id") &&
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))) <= SIMHASH_HAM &&
          firstBandOnly)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
        .orderBy("doc_a", "doc_b")
    },
      Some {
        def bandOf(sh: String, j: Int): String =
          s"(($sh >> ${j * SIMHASH_BAND_BITS}) & ${(1L << SIMHASH_BAND_BITS) - 1})"
        val firstBandOnly = (0 until SIMHASH_BANDS - 1).map { i =>
          s"(a.band <= $i OR ${bandOf("a.sh", i)} != ${bandOf("b.sh", i)})"
        }.mkString(" AND ")
        s"""WITH th AS (
          SELECT doc_id,
            list_transform(list_distinct(${TF.tokensSql(TF.normalizeTextSql("text"))}),
                           t -> ${TF.hash60Sql("t")}) AS hs
          FROM documents),
        sk AS (
          SELECT doc_id, ${Dedup.simhashFromHashesSql("hs", SIMHASH_BITS)} AS sh FROM th),
        bands AS (
          SELECT doc_id, sh, b AS band,
            ((sh >> (b * $SIMHASH_BAND_BITS)) & ${(1L << SIMHASH_BAND_BITS) - 1}) AS bv
          FROM sk, (SELECT unnest(${(0 until SIMHASH_BANDS).mkString("[", ",", "]")}) AS b) bb)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= $SIMHASH_HAM AND $firstBandOnly
        ORDER BY doc_a, doc_b"""
      }),

    // Exact n-gram Jaccard as the VERIFY stage over MinHash-LSH candidate
    // pairs — the shape that survives 100 TB. Earlier rounds blocked on
    // (lang, source, len_band); that key is low-cardinality, so one
    // (en, web, band) block goes quadratic at corpus scale (round-6 verdict).
    // Now candidate generation is Dedup.lshCandidatePairs — an equi-join on
    // (band, band-hashes), O(n) shuffle, never all-pairs — and the compiled
    // exact-Jaccard kernel (JaccardSorted, a merge walk over distinct sorted
    // 60-bit shingle hashes) runs ONLY on LSH survivors. One shingleSketch
    // kernel pass emits both the minhash signature and the sorted set.
    Q("x4_dedup_jaccard_pairs", (s, d) => {
      val toks = TF.tokens(TF.normalizeText(col("text")))
      // persist: the LSH self-join + two verify joins consume `sig` 3×.
      val sig = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), TS.shingleSketch(toks, 2, K).as("sk"))
        .select(col("doc_id"), col("sk.mh").as("mh"), col("sk.sh").as("sh"))
        .persist()
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", "mh", BANDS, ROWS_PER_BAND)
      cand
        .join(sig.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          TS.jaccardSorted(col("sha"), col("shb")).as("jaccard"))
        .filter(col("jaccard") >= 0.1)
        .orderBy("doc_a", "doc_b")
    },
      Some(s"""WITH shg AS (
          SELECT doc_id, ${TF.wordShinglesSql("text", 2)} AS shg FROM documents),
        hs AS (
          SELECT doc_id, ${Dedup.shingleHashesSql("shg")} AS hs
          FROM shg WHERE len(shg) > 0),
        sigs AS (
          SELECT doc_id, ${Dedup.minhashFromHashesSql("hs", K)} AS mh FROM hs),
        sets AS (
          SELECT doc_id, list_sort(list_distinct(hs)) AS sh FROM hs),
        bands AS (
          SELECT doc_id, b AS band, mh[2*b+1] AS h0, mh[2*b+2] AS h1
          FROM sigs, (SELECT unnest([0,1,2,3]) AS b) bb),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, ${Dedup.jaccardSql("sa.sh", "sb.sh")} AS jaccard
        FROM cand
        JOIN sets sa ON cand.doc_a = sa.doc_id
        JOIN sets sb ON cand.doc_b = sb.doc_id
        WHERE ${Dedup.jaccardSql("sa.sh", "sb.sh")} >= 0.1
        ORDER BY doc_a, doc_b""")),

    // CAPSTONE: full corpus dedup in one pipeline — the actual training-data
    // workflow the x-family stages compose into: minhash-LSH candidate pairs
    // (never all-pairs) → exact Jaccard verification on compiled sorted hash
    // sets → connected components → canonical (minimum-id) survivor per
    // near-dup cluster. Every doc gets its cluster label; `is_canonical`
    // marks the kept document. All stages are bucketed equi-joins + the
    // pointer-jumping CC — the shape that runs at 100 TB.
    Q("x19_dedup_corpus", (s, d) => {
      val docs = t(s, d, "documents")
      val toks = TF.tokens(TF.normalizeText(col("text")))
      // one pass computes BOTH sketch forms; persisted for the three joins.
      // text-non-null ≡ size(mh)>0 here, and the cheap form pushes to the
      // scan instead of duplicating the kernel into a pushed Filter
      val sig = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), TS.shingleSketch(toks, 3, K).as("sk"))
        .select(col("doc_id"), col("sk.mh").as("mh"), col("sk.sh").as("sh"))
        .persist()
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", "mh", BANDS, ROWS_PER_BAND)
      val verified = cand
        .join(sig.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .filter(TS.jaccardSorted(col("sha"), col("shb")) >= 0.5)
        .select("doc_a", "doc_b")
      Dedup.connectedComponents(docs.select("doc_id"), "doc_id",
          verified, "doc_a", "doc_b")
        .withColumn("is_canonical", col("doc_id") === col("cc"))
        .orderBy("doc_id")
    },
      Some(s"""WITH RECURSIVE shg AS (
          SELECT doc_id, ${TF.wordShinglesSql("text", 3)} AS shg FROM documents),
        hs AS (
          SELECT doc_id, ${Dedup.shingleHashesSql("shg")} AS hs
          FROM shg WHERE len(shg) > 0),
        sigs AS (
          SELECT doc_id, ${Dedup.minhashFromHashesSql("hs", K)} AS mh FROM hs),
        sets AS (
          SELECT doc_id, list_sort(list_distinct(hs)) AS sh FROM hs),
        bands AS (
          SELECT doc_id, b AS band, mh[2*b+1] AS h0, mh[2*b+2] AS h1
          FROM sigs, (SELECT unnest([0,1,2,3]) AS b) bb),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id),
        pairs AS (
          SELECT doc_a, doc_b FROM cand
          JOIN sets sa ON cand.doc_a = sa.doc_id
          JOIN sets sb ON cand.doc_b = sb.doc_id
          WHERE ${Dedup.jaccardSql("sa.sh", "sb.sh")} >= 0.5),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(id, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
        SELECT id AS doc_id, MIN(lbl) AS cc, id = MIN(lbl) AS is_canonical
        FROM reach GROUP BY id ORDER BY doc_id""")),

    // QUALITY-WEIGHTED canonical selection — the curation form of x19: the
    // survivor of each near-dup cluster is the HIGHEST-QUALITY member (tie →
    // lowest id), not the lowest id. This is what a training-data pipeline
    // actually keeps: dedup clusters via MinHash-LSH + exact-Jaccard +
    // connected components, then one window over (cluster, quality DESC).
    // Same bucketed join + pointer-jumping shapes as x19; the only addition
    // is a broadcast-sized quality projection and one hash exchange on cc.
    Q("x38_dedup_keep_best", (s, d) => {
      val docs = t(s, d, "documents")
      val toks = TF.tokens(TF.normalizeText(col("text")))
      val sig = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), TS.shingleSketch(toks, 3, K).as("sk"))
        .select(col("doc_id"), col("sk.mh").as("mh"), col("sk.sh").as("sh"))
        .persist()
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", "mh", BANDS, ROWS_PER_BAND)
      val verified = cand
        .join(sig.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .filter(TS.jaccardSorted(col("sha"), col("shb")) >= 0.5)
        .select("doc_a", "doc_b")
      val cc = Dedup.connectedComponents(docs.select("doc_id"), "doc_id",
        verified, "doc_a", "doc_b")
      val quality = docs.select(col("doc_id"), TF.qualityScore(col("text")).as("quality"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cc").orderBy(col("quality").desc, col("doc_id"))
      cc.join(quality, "doc_id")
        .withColumn("is_kept", row_number().over(w) === 1)
        .select("doc_id", "cc", "quality", "is_kept")
        .orderBy("doc_id")
    },
      Some(s"""WITH RECURSIVE shg AS (
          SELECT doc_id, ${TF.wordShinglesSql("text", 3)} AS shg FROM documents),
        hs AS (
          SELECT doc_id, ${Dedup.shingleHashesSql("shg")} AS hs
          FROM shg WHERE len(shg) > 0),
        sigs AS (
          SELECT doc_id, ${Dedup.minhashFromHashesSql("hs", K)} AS mh FROM hs),
        sets AS (
          SELECT doc_id, list_sort(list_distinct(hs)) AS sh FROM hs),
        bands AS (
          SELECT doc_id, b AS band, mh[2*b+1] AS h0, mh[2*b+2] AS h1
          FROM sigs, (SELECT unnest([0,1,2,3]) AS b) bb),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id),
        pairs AS (
          SELECT doc_a, doc_b FROM cand
          JOIN sets sa ON cand.doc_a = sa.doc_id
          JOIN sets sb ON cand.doc_b = sb.doc_id
          WHERE ${Dedup.jaccardSql("sa.sh", "sb.sh")} >= 0.5),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(id, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        comp AS (SELECT id AS doc_id, MIN(lbl) AS cc FROM reach GROUP BY id),
        scored AS (
          SELECT c.doc_id, c.cc, ${TF.qualityScoreSql("d.text")} AS quality
          FROM comp c JOIN documents d ON c.doc_id = d.doc_id)
        SELECT doc_id, cc, quality,
          ROW_NUMBER() OVER (PARTITION BY cc ORDER BY quality DESC, doc_id) = 1
            AS is_kept
        FROM scored ORDER BY doc_id""")),

    // LEAKAGE-FREE SPLIT ASSIGNMENT — train/valid/test by hashing the
    // near-dup CLUSTER id, not the document id: every member of a cluster
    // lands in the same split, so a near-duplicate of a test document can
    // never sit in train (the eval-leakage failure mode doc-level hashing
    // has). 80/10/10 via the deterministic 60-bit hash both engines share.
    // Shapes: x19's cluster machinery + one scalar hash — no new exchange.
    Q("x39_split_by_cluster", (s, d) => {
      val docs = t(s, d, "documents")
      val toks = TF.tokens(TF.normalizeText(col("text")))
      val sig = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), TS.shingleSketch(toks, 3, K).as("sk"))
        .select(col("doc_id"), col("sk.mh").as("mh"), col("sk.sh").as("sh"))
        .persist()
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", "mh", BANDS, ROWS_PER_BAND)
      val verified = cand
        .join(sig.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .filter(TS.jaccardSorted(col("sha"), col("shb")) >= 0.5)
        .select("doc_a", "doc_b")
      val pct = TF.hash60(col("cc").cast("string")) % 100
      Dedup.connectedComponents(docs.select("doc_id"), "doc_id",
          verified, "doc_a", "doc_b")
        .withColumn("split",
          when(pct < 80, "train").when(pct < 90, "valid").otherwise("test"))
        .select("doc_id", "cc", "split")
        .orderBy("doc_id")
    },
      Some(s"""WITH RECURSIVE shg AS (
          SELECT doc_id, ${TF.wordShinglesSql("text", 3)} AS shg FROM documents),
        hs AS (
          SELECT doc_id, ${Dedup.shingleHashesSql("shg")} AS hs
          FROM shg WHERE len(shg) > 0),
        sigs AS (
          SELECT doc_id, ${Dedup.minhashFromHashesSql("hs", K)} AS mh FROM hs),
        sets AS (
          SELECT doc_id, list_sort(list_distinct(hs)) AS sh FROM hs),
        bands AS (
          SELECT doc_id, b AS band, mh[2*b+1] AS h0, mh[2*b+2] AS h1
          FROM sigs, (SELECT unnest([0,1,2,3]) AS b) bb),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id),
        pairs AS (
          SELECT doc_a, doc_b FROM cand
          JOIN sets sa ON cand.doc_a = sa.doc_id
          JOIN sets sb ON cand.doc_b = sb.doc_id
          WHERE ${Dedup.jaccardSql("sa.sh", "sb.sh")} >= 0.5),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(id, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        comp AS (SELECT id AS doc_id, MIN(lbl) AS cc FROM reach GROUP BY id)
        SELECT doc_id, cc,
          CASE WHEN ${TF.hash60Sql("CAST(cc AS VARCHAR)")} % 100 < 80 THEN 'train'
               WHEN ${TF.hash60Sql("CAST(cc AS VARCHAR)")} % 100 < 90 THEN 'valid'
               ELSE 'test' END AS split
        FROM comp ORDER BY doc_id""")),

    // EXACT-SUBSTRING span dedup (Lee et al. 2022's ExactSubstr, the
    // practical hashed form): every 8-token span is hashed by the compiled
    // shingle kernel; a span hash seen in MORE THAN ONE document marks
    // duplicated text. Output per doc: span counts and the duplicated-text
    // fraction — the signal used to clip boilerplate/licence blocks that
    // MinHash (whole-doc granularity) cannot see. Scale shape: one explode
    // (linear in corpus tokens), one balanced hash-shuffle on the 60-bit
    // span hash, one broadcast-sized join back — no pairwise anything.
    Q("x40_dup_spans", (s, d) => {
      val sh = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"),
          TS.shingleHashSet(TF.tokens(TF.normalizeText(col("text"))), 8).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist() // consumed twice: span explode + per-doc span counts
      val spans = sh.select(col("doc_id"), explode(col("sh")).as("h"))
      val dupHashes = spans.groupBy("h")
        .agg(count(lit(1)).as("ndocs")).filter(col("ndocs") > 1)
      val dupPerDoc = spans.join(dupHashes, "h")
        .groupBy("doc_id").agg(count(lit(1)).as("dup_spans"))
      sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_spans"))
        .join(dupPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
          (coalesce(col("dup_spans"), lit(0L)).cast(DoubleType) / col("n_spans"))
            .as("dup_frac"))
        .orderBy("doc_id")
    },
      Some(s"""WITH shg AS (
          SELECT doc_id, ${TF.wordShinglesSql("text", 8)} AS shg FROM documents),
        hs AS (
          SELECT doc_id, list_distinct(list_transform(shg,
            s -> ${TF.hash60Sql("s")})) AS sh
          FROM shg WHERE len(shg) > 0),
        spans AS (SELECT doc_id, unnest(sh) AS h FROM hs),
        dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(*) > 1),
        per AS (
          SELECT s.doc_id, COUNT(*) AS dup_spans
          FROM spans s JOIN dup USING (h) GROUP BY s.doc_id)
        SELECT hs.doc_id AS doc_id, len(hs.sh) AS n_spans,
          COALESCE(per.dup_spans, 0) AS dup_spans,
          CAST(COALESCE(per.dup_spans, 0) AS DOUBLE) / len(hs.sh) AS dup_frac
        FROM hs LEFT JOIN per ON hs.doc_id = per.doc_id
        ORDER BY hs.doc_id""")),

    // INCREMENTAL DEDUP — the production form: an ARRIVING BATCH is deduped
    // against the existing corpus without ever recomputing corpus-vs-corpus
    // pairs. The corpus side is scanned ONCE and never shuffles (its banded
    // signatures probe a BROADCAST of the batch's bands — at 100 TB the
    // corpus is the table, the day's batch is the broadcast); MinHash-LSH
    // candidates verify through the compiled exact-Jaccard kernel. Planted
    // batch: exact copies of corpus docs (must be flagged, with their
    // canonical corpus match) + token-reversed docs (novel, must be kept).
    // x35 runs the same cross-set shape for decontamination; here the
    // decision lands on the SMALL side (drop the arrival, keep the match).
    Q("x41_dedup_incremental", (s, d) => {
      val docs = t(s, d, "documents")
      def sketch(df: org.apache.spark.sql.DataFrame, idCol: String) = df
        .filter(col("text").isNotNull)
        .select(col(idCol),
          TS.shingleSketch(TF.tokens(TF.normalizeText(col("text"))), 3, K).as("sk"))
        .select(col(idCol), col("sk.mh").as("mh"), col("sk.sh").as("sh"))
      def banded(df: org.apache.spark.sql.DataFrame, idCol: String, shAs: String) = df
        .select(col(idCol), col("sh").as(shAs),
          explode(array((0 until BANDS).map(b => struct(lit(b).as("band"),
            element_at(col("mh"), b * ROWS_PER_BAND + 1).as("h0"),
            element_at(col("mh"), b * ROWS_PER_BAND + 2).as("h1"))): _*)).as("bd"))
        .select(col(idCol), col(shAs), col("bd.band").as("band"),
          col("bd.h0").as("h0"), col("bd.h1").as("h1"))
      val batch = docs.filter(col("doc_id") % 9 === 2)
        .select((col("doc_id") + 900000L).as("batch_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 9 === 5)
          .select((col("doc_id") + 900000L).as("batch_id"),
            array_join(reverse(TF.tokens(TF.normalizeText(col("text")))), " ")
              .as("text")))
      val corpusB = banded(
        sketch(docs.select(col("doc_id").as("corpus_id"), col("text")), "corpus_id"),
        "corpus_id", "sh_c")
      val batchB = banded(sketch(batch, "batch_id"), "batch_id", "sh_b")
      val matches = corpusB.join(broadcast(batchB), Seq("band", "h0", "h1"))
        .select(col("batch_id"), col("corpus_id"),
          TS.jaccardSorted(col("sh_b"), col("sh_c")).as("j"))
        .distinct() // several agreeing bands → identical candidate rows
        .filter(col("j") >= 0.5)
        .groupBy("batch_id").agg(min(col("corpus_id")).as("match_id"))
      batch.select(col("batch_id"))
        .join(matches, Seq("batch_id"), "left")
        .select(col("batch_id"), col("match_id").isNotNull.as("is_dup"),
          col("match_id"))
        .orderBy("batch_id")
    },
      Some(s"""WITH batch_raw AS (
          SELECT doc_id + 900000 AS batch_id, text FROM documents WHERE doc_id % 9 = 2
          UNION ALL
          SELECT doc_id + 900000, array_to_string(list_reverse(
            ${TF.tokensSql(TF.normalizeTextSql("text"))}), ' ')
          FROM documents WHERE doc_id % 9 = 5),
        cshg AS (SELECT doc_id AS corpus_id, ${TF.wordShinglesSql("text", 3)} AS shg
          FROM documents),
        chs AS (SELECT corpus_id, ${Dedup.shingleHashesSql("shg")} AS hs
          FROM cshg WHERE len(shg) > 0),
        csigs AS (SELECT corpus_id, ${Dedup.minhashFromHashesSql("hs", K)} AS mh FROM chs),
        csets AS (SELECT corpus_id, list_sort(list_distinct(hs)) AS sh FROM chs),
        cbands AS (SELECT corpus_id, b AS band, mh[2*b+1] AS h0, mh[2*b+2] AS h1
          FROM csigs, (SELECT unnest([0,1,2,3]) AS b) bb),
        bshg AS (SELECT batch_id, ${TF.wordShinglesSql("text", 3)} AS shg FROM batch_raw),
        bhs AS (SELECT batch_id, ${Dedup.shingleHashesSql("shg")} AS hs
          FROM bshg WHERE len(shg) > 0),
        bsigs AS (SELECT batch_id, ${Dedup.minhashFromHashesSql("hs", K)} AS mh FROM bhs),
        bsets AS (SELECT batch_id, list_sort(list_distinct(hs)) AS sh FROM bhs),
        bbands AS (SELECT batch_id, b AS band, mh[2*b+1] AS h0, mh[2*b+2] AS h1
          FROM bsigs, (SELECT unnest([0,1,2,3]) AS b) bb),
        cand AS (
          SELECT DISTINCT bt.batch_id, c.corpus_id
          FROM cbands c JOIN bbands bt
            ON c.band = bt.band AND c.h0 = bt.h0 AND c.h1 = bt.h1),
        matches AS (
          SELECT cand.batch_id, MIN(cand.corpus_id) AS match_id
          FROM cand
          JOIN bsets ON cand.batch_id = bsets.batch_id
          JOIN csets ON cand.corpus_id = csets.corpus_id
          WHERE ${Dedup.jaccardSql("bsets.sh", "csets.sh")} >= 0.5
          GROUP BY cand.batch_id)
        SELECT br.batch_id AS batch_id, m.match_id IS NOT NULL AS is_dup, m.match_id
        FROM batch_raw br LEFT JOIN matches m ON br.batch_id = m.batch_id
        ORDER BY br.batch_id""")),

    // BLOOM-PREFILTERED INCREMENTAL EXACT DEDUP — the steady-state
    // production form when corpus ≫ batch: the corpus's 60-bit document
    // fingerprints are summarized ONCE into a Bloom filter (megabytes for
    // billions of docs; executor-side partial-bloom OR-merge, the driver
    // receives only the finished sketch) and every arriving batch probes
    // the BROADCAST summary row-locally — a batch with no duplicates
    // touches ZERO corpus partitions, where x41's banded form still scans
    // the corpus once per batch. Only bloom HITS (true matches + the fpp
    // sliver of false positives) reach the exact fingerprint join, whose
    // corpus side is a narrow broadcast-probe scan. Bloom filters have no
    // false negatives and the exact join removes false positives, so the
    // RESULT is exact — only the work is probabilistic — which is what
    // makes the oracle a plain relational replay.
    Q("x44_dedup_bloom", (s, d) => {
      val docs = t(s, d, "documents")
      val batch = docs.filter(col("doc_id") % 9 === 2)
        .select((col("doc_id") + 900000L).as("batch_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 9 === 5)
          .select((col("doc_id") + 900000L).as("batch_id"),
            array_join(reverse(TF.tokens(TF.normalizeText(col("text")))), " ")
              .as("text")))
      val corpusFp = docs.select(col("doc_id"),
        TF.fingerprintBucket(col("text")).as("fp"))
      val batchFp = batch.select(col("batch_id"),
        TF.fingerprintBucket(col("text")).as("fp"))
      // one pass over the corpus → ~512 KB summary on the driver
      val bloom = Dedup.bloomSummary(corpusFp.filter(col("fp").isNotNull),
        col("fp"), expectedItems = 500000L, numBits = 1L << 22)
      val candFps = batchFp
        .filter(Dedup.mightContain(bloom, col("fp"))) // row-local prefilter
        .select("fp").distinct()
      // corpus scanned once, never shuffled: broadcast-probe + partial agg;
      // only the handful of MATCHED rows reach the exchange
      val matches = corpusFp.join(broadcast(candFps), Seq("fp"))
        .groupBy("fp").agg(min(col("doc_id")).as("match_id"))
      batchFp.join(broadcast(matches), Seq("fp"), "left")
        .select(col("batch_id"), col("match_id").isNotNull.as("is_dup"),
          col("match_id"))
        .orderBy("batch_id")
    },
      Some(s"""WITH batch_raw AS (
          SELECT doc_id + 900000 AS batch_id, text FROM documents WHERE doc_id % 9 = 2
          UNION ALL
          SELECT doc_id + 900000, array_to_string(list_reverse(
            ${TF.tokensSql(TF.normalizeTextSql("text"))}), ' ')
          FROM documents WHERE doc_id % 9 = 5),
        bfp AS (SELECT batch_id, ${TF.fingerprintBucketSql("text")} AS fp FROM batch_raw),
        cfp AS (SELECT doc_id, ${TF.fingerprintBucketSql("text")} AS fp FROM documents),
        m AS (SELECT fp, MIN(doc_id) AS match_id FROM cfp GROUP BY fp)
        SELECT b.batch_id, m.match_id IS NOT NULL AS is_dup, m.match_id
        FROM bfp b LEFT JOIN m ON b.fp = m.fp
        ORDER BY b.batch_id""")),

    // SEMANTIC PRUNING (SemDeDup-style): embeddings are blocked by k-means
    // cells (the IVF quantizer with one Lloyd refinement — cells play the
    // role LSH bands play for text), pairwise cosine runs WITHIN cells only,
    // and connected components pick one canonical survivor per semantic
    // cluster. Pairwise work is bounded by cell size (at 100 TB the
    // quantizer is sized so cells cap at ~10⁴ vectors); cross-cell near-dups
    // are the method's documented recall trade, exactly as in SemDeDup.
    Q("x42_semantic_prune", (s, d) => {
      val emb = t(s, d, "embeddings")
      val assigned = Similarity.ivfCells(emb, "vec_id", "embedding",
        centStride = 100, kmeansIters = 1).persist() // pair sides + label join
      // hot-cell-capped within-cell pairs: cells average centStride, and
      // any degenerate cell above the cap is hash-re-split so pair work is
      // O(n·cap) under ANY distribution (SimilarityCapSpec plants a 90%
      // mass collapse and proves the bound). The cap sits far above the
      // natural max cell size here, so on well-spread data — including this
      // oracle's — capped ≡ exhaustive within-cell.
      val pairs = Similarity.cellCappedPairs(assigned, "vec_id",
          maxCellSize = 1000)
        .withColumn("cos", VF.dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") >= 0.4)
        .select("id_a", "id_b")
      Dedup.connectedComponents(emb.select("vec_id"), "vec_id",
          pairs, "id_a", "id_b")
        .join(assigned.select(col("vec_id"), col("cell")), Seq("vec_id"))
        .withColumn("is_kept", col("vec_id") === col("cc"))
        .select("vec_id", "cell", "cc", "is_kept")
        .orderBy("vec_id")
    },
      Some(s"""WITH RECURSIVE $NORM_CTE,
        cent AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 100 = 1),
        a0 AS (
          SELECT vec_id, v, nrm, cent_id AS cell FROM (
            SELECT n.vec_id, n.v, n.nrm, c.cent_id,
              ROW_NUMBER() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cent_id) AS rn
            FROM n, cent c) WHERE rn = 1),
        refined AS (
          SELECT cent_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM (
            SELECT cell AS cent_id, list(m ORDER BY pos) AS cv FROM (
              SELECT a.cell, r.range AS pos,
                CAST(SUM(CAST(a.v[r.range] AS DECIMAL(27,12))) AS DOUBLE) AS m
              FROM a0 a, range(1, 65) r
              GROUP BY a.cell, r.range)
            GROUP BY cell)),
        assigned AS (
          SELECT vec_id, v, nrm, cent_id AS cell FROM (
            SELECT n.vec_id, n.v, n.nrm, c.cent_id,
              ROW_NUMBER() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cent_id) AS rn
            FROM n, refined c) WHERE rn = 1),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(id, lbl) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        comp AS (SELECT id AS vec_id, MIN(lbl) AS cc FROM reach GROUP BY id)
        SELECT comp.vec_id AS vec_id, assigned.cell AS cell, comp.cc AS cc,
          comp.vec_id = comp.cc AS is_kept
        FROM comp JOIN assigned ON comp.vec_id = assigned.vec_id
        ORDER BY comp.vec_id""")),

    // Embedding near-dup pairs: banded sign-LSH candidates + exact cosine.
    Q("x5_dedup_embedding_cosine", (s, d) =>
      Similarity.nearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
          DIM, LSH_BITS, LSH_BANDS, minCosine = 0.4)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $NORM_CTE,
        $BUCKET_CTE,
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bk a JOIN bk b
            ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        SELECT id_a, id_b, cos FROM (
          SELECT id_a, id_b,
            list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS cos
          FROM cand JOIN n na ON cand.id_a = na.vec_id
                    JOIN n nb ON cand.id_b = nb.vec_id)
        WHERE cos >= 0.4 ORDER BY id_a, id_b""")),

    // Clustering dedup: connected components over the embedding near-dup
    // pair graph — every vector labeled with its cluster's canonical
    // (minimum) id; `is_canonical` marks the survivor per cluster.
    Q("x17_dedup_clusters", (s, d) => {
      val emb = t(s, d, "embeddings")
      val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        DIM, LSH_BITS, LSH_BANDS, minCosine = 0.4)
      Dedup.connectedComponents(emb.select("vec_id"), "vec_id",
          pairs, "id_a", "id_b")
        .withColumn("is_canonical", col("vec_id") === col("cc"))
        .orderBy("vec_id")
    },
      Some(s"""WITH RECURSIVE $NORM_CTE,
        $BUCKET_CTE,
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bk a JOIN bk b
            ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        pairs AS (
          SELECT id_a, id_b FROM (
            SELECT id_a, id_b,
              list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS cos
            FROM cand JOIN n na ON cand.id_a = na.vec_id
                      JOIN n nb ON cand.id_b = nb.vec_id)
          WHERE cos >= 0.4),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(id, lbl) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
        SELECT id AS vec_id, MIN(lbl) AS cc, id = MIN(lbl) AS is_canonical
        FROM reach GROUP BY id ORDER BY vec_id""")),

    // ---- similarity search --------------------------------------------------

    // Exact brute-force cosine top-k for a query subset (the baseline an ANN
    // index is measured against).
    Q("x6_sim_topk_brute", (s, d) =>
      Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 50 === 0, k = 3)
        .orderBy("q_id", "rank"),
      Some(s"""WITH $NORM_CTE
        SELECT q_id, n_id, cos, rank FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
            list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos,
            CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) AS INT) AS rank
          FROM n q JOIN n c ON c.vec_id != q.vec_id
          WHERE q.vec_id % 50 = 0)
        WHERE rank <= 3 ORDER BY q_id, rank""")),

    // HARD-NEGATIVE MINING (contrastive-training data prep): for each
    // anchor, the k nearest embeddings with a DIFFERENT label — the
    // near-boundary negatives that dominate the contrastive gradient
    // (random negatives are trivially separable). Exact cosine, anchors
    // broadcast (x6's documented baseline shape); the 100 TB path batches
    // anchors through the IVF cells instead (x13/x37 machinery).
    Q("x45_hard_negatives", (s, d) =>
      Similarity.hardNegatives(t(s, d, "embeddings"), "vec_id", "embedding",
          "label", col("vec_id") % 50 === 0, k = 3)
        .orderBy("q_id", "rank"),
      Some(s"""WITH nl AS (
          SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v,
            sqrt(list_dot_product(list_transform(embedding, x -> x::DOUBLE),
                 list_transform(embedding, x -> x::DOUBLE))) AS nrm
          FROM embeddings)
        SELECT q_id, q_label, n_id, n_label, cos, rank FROM (
          SELECT q.vec_id AS q_id, q.label AS q_label,
            c.vec_id AS n_id, c.label AS n_label,
            list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos,
            CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                       c.vec_id) AS INT) AS rank
          FROM nl q JOIN nl c ON c.vec_id != q.vec_id AND c.label != q.label
          WHERE q.vec_id % 50 = 0)
        WHERE rank <= 3 ORDER BY q_id, rank""")),

    // x45's 100 TB path: IVF cells block the corpus, anchors probe their 2
    // nearest cells, the cross-label top-k re-ranks exactly within probed
    // cells — per-anchor work O(nprobe·cell) instead of O(corpus). The
    // oracle replays quantizer + refinement + 2-probe assignment (x37's
    // chain) with the label inequality in the candidate join.
    Q("x46_hard_negatives_ivf", (s, d) =>
      Similarity.hardNegativesIvf(t(s, d, "embeddings"), "vec_id", "embedding",
          "label", col("vec_id") % 50 === 0, centStride = 40, k = 3,
          kmeansIters = 1, nprobe = 2)
        .orderBy("q_id", "rank"),
      Some(s"""WITH $NORM_CTE,
        lab AS (SELECT vec_id, label FROM embeddings),
        cent AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 40 = 1),
        a0 AS (
          SELECT vec_id, v, nrm, cent_id AS cell FROM (
            SELECT n.vec_id, n.v, n.nrm, c.cent_id,
              ROW_NUMBER() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cent_id) AS rn
            FROM n, cent c) WHERE rn = 1),
        refined AS (
          SELECT cent_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM (
            SELECT cell AS cent_id, list(m ORDER BY pos) AS cv FROM (
              SELECT a.cell, r.range AS pos,
                CAST(SUM(CAST(a.v[r.range] AS DECIMAL(27,12))) AS DOUBLE) AS m
              FROM a0 a, range(1, 65) r
              GROUP BY a.cell, r.range)
            GROUP BY cell)),
        ranked AS (
          SELECT n.vec_id, n.v, n.nrm, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY n.vec_id
              ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cent_id) AS rn
          FROM n, refined c),
        assigned AS (SELECT r.vec_id, r.v, r.nrm, r.cell, l.label
          FROM ranked r JOIN lab l ON r.vec_id = l.vec_id WHERE r.rn = 1),
        probes AS (SELECT r.vec_id, r.v, r.nrm, r.cell, l.label
          FROM ranked r JOIN lab l ON r.vec_id = l.vec_id
          WHERE r.rn <= 2 AND r.vec_id % 50 = 0)
        SELECT q_id, q_label, n_id, n_label, cos, rank FROM (
          SELECT q.vec_id AS q_id, q.label AS q_label,
            a.vec_id AS n_id, a.label AS n_label,
            list_dot_product(q.v, a.v) / (q.nrm * a.nrm) AS cos,
            CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY list_dot_product(q.v, a.v) / (q.nrm * a.nrm) DESC,
                       a.vec_id) AS INT) AS rank
          FROM probes q JOIN assigned a
            ON q.cell = a.cell AND a.vec_id != q.vec_id AND a.label != q.label)
        WHERE rank <= 3 ORDER BY q_id, rank""")),

    // DATASET CARD (datasheet/data-statement reporting — the per-source
    // summary every published training corpus ships): one grouped pass over
    // the corpus produces document counts, token/char volumes, exact-dup
    // counts (fingerprint cardinality), mean quality, and exact interpolated
    // length percentiles per (source, lang). Every float is engineered out
    // of the cross-engine compare: quality is truncated to micro-units
    // (FLOOR(q*1e6) — integer, no decimal rounding-mode dependence) before
    // the exact integer SUM, and the p50/p90 interpolation lo+frac·(hi−lo)
    // is computed as a pure-integer numerator divided by the rank
    // denominator in ONE IEEE (correctly-rounded, hence engine-identical)
    // double division — never an engine's own quantile formula. The stats
    // pass stays one map-side-combined shuffle on the handful of group keys;
    // the percentile pass is a per-group sort (rank windows), the unavoidable
    // cost of EXACT order statistics — at 100 TB one would swap in the
    // t-digest/GK sketch and drop the sort, same report shape.
    Q("x47_dataset_card", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val base = docs.select(col("source"), col("lang"), col("n_chars"),
        TF.tokenCount(col("text")).as("toks"),
        floor(TF.qualityScore(col("text")) * lit(1000000.0)).as("q6"),
        TF.fingerprintBucket(col("text")).as("fp"))
      val stats = base.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"),
          (sum(col("q6")).cast(DoubleType) /
            (count(lit(1)) * lit(1000000L)).cast(DoubleType)).as("mean_quality"))
      val grp = Window.partitionBy("source", "lang")
      val ranked = base.select(col("source"), col("lang"), col("n_chars"))
        .withColumn("rn", row_number().over(grp.orderBy("n_chars")) - lit(1))
        .withColumn("n", count(lit(1)).over(grp))
        // interpolation indices: pos = (n-1)·p as an exact rational num/den
        .withColumn("lo50", expr("(n-1) DIV 2"))
        .withColumn("hi50", expr("(n-1) DIV 2 + CASE WHEN (n-1) % 2 > 0 THEN 1 ELSE 0 END"))
        .withColumn("lo90", expr("((n-1)*9) DIV 10"))
        .withColumn("hi90", expr("((n-1)*9) DIV 10 + CASE WHEN ((n-1)*9) % 10 > 0 THEN 1 ELSE 0 END"))
      val pcts = ranked.groupBy("source", "lang")
        .agg(max(col("n")).as("nn"),
          max(when(col("rn") === col("lo50"), col("n_chars"))).as("v50lo"),
          max(when(col("rn") === col("hi50"), col("n_chars"))).as("v50hi"),
          max(when(col("rn") === col("lo90"), col("n_chars"))).as("v90lo"),
          max(when(col("rn") === col("hi90"), col("n_chars"))).as("v90hi"))
        .select(col("source"), col("lang"),
          ((col("v50lo") * lit(2) + ((col("nn") - 1) % 2) * (col("v50hi") - col("v50lo")))
            .cast(DoubleType) / lit(2.0)).as("p50_chars"),
          ((col("v90lo") * lit(10) + (((col("nn") - 1) * 9) % 10) * (col("v90hi") - col("v90lo")))
            .cast(DoubleType) / lit(10.0)).as("p90_chars"))
      stats.join(pcts, Seq("source", "lang"))
        .select(col("source"), col("lang"), col("n_docs"), col("total_tokens"),
          col("total_chars"), col("n_exact_dups"), col("mean_quality"),
          col("p50_chars"), col("p90_chars"))
        .orderBy("source", "lang")
    },
      Some(s"""WITH base AS (
          SELECT source, lang, n_chars,
            ${TF.tokenCountSql("text")} AS toks,
            CAST(FLOOR(${TF.qualityScoreSql("text")} * 1000000) AS BIGINT) AS q6,
            ${TF.fingerprintBucketSql("text")} AS fp
          FROM documents WHERE text IS NOT NULL),
        stats AS (
          SELECT source, lang, count(*) AS n_docs,
            CAST(SUM(toks) AS BIGINT) AS total_tokens,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            count(*) - count(DISTINCT fp) AS n_exact_dups,
            CAST(SUM(q6) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS mean_quality
          FROM base GROUP BY source, lang),
        ranked AS (
          SELECT source, lang, n_chars,
            ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY n_chars) - 1 AS rn,
            COUNT(*) OVER (PARTITION BY source, lang) AS n
          FROM base),
        pcts AS (
          SELECT source, lang,
            CAST(MAX(CASE WHEN rn = (n-1)//2 THEN n_chars END) * 2
              + ((MAX(n)-1) % 2)
                * (MAX(CASE WHEN rn = (n-1)//2 + (CASE WHEN (n-1) % 2 > 0 THEN 1 ELSE 0 END)
                        THEN n_chars END)
                   - MAX(CASE WHEN rn = (n-1)//2 THEN n_chars END)) AS DOUBLE) / 2
              AS p50_chars,
            CAST(MAX(CASE WHEN rn = ((n-1)*9)//10 THEN n_chars END) * 10
              + (((MAX(n)-1)*9) % 10)
                * (MAX(CASE WHEN rn = ((n-1)*9)//10 + (CASE WHEN ((n-1)*9) % 10 > 0 THEN 1 ELSE 0 END)
                        THEN n_chars END)
                   - MAX(CASE WHEN rn = ((n-1)*9)//10 THEN n_chars END)) AS DOUBLE) / 10
              AS p90_chars
          FROM ranked GROUP BY source, lang)
        SELECT s.source, s.lang, n_docs, total_tokens, total_chars, n_exact_dups,
          mean_quality, p50_chars, p90_chars
        FROM stats s JOIN pcts p ON s.source = p.source AND s.lang = p.lang
        ORDER BY s.source, s.lang""")),

    // PERCEPTUAL IMAGE DEDUP (aHash): real PPM decode → 8×8 resize →
    // mean-threshold 64-bit average hash → equi-grouping on the hash — the
    // image twin of text fingerprint dedup (byte-level noise within the
    // luma bands never moves the hash, so re-encodes/jitter collapse to one
    // class). The fixture is analytically structured: every payload's BYTES
    // are id-distinct but its aHash depends only on the bright-row index,
    // so the oracle replays hash, canonical and class size in pure SQL
    // while the Spark side runs the REAL decoder end-to-end.
    Q("x48_media_ahash_dedup", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = Media.ppmAHashes(
        Media.synthesizeAHashPpms(t(s, d, "documents"))).toDF()
      val w = Window.partitionBy("ahash")
      h.withColumn("canonical_id", min(col("media_id")).over(w))
        .withColumn("class_size", count(lit(1)).over(w))
        .select("media_id", "ahash", "canonical_id", "class_size")
        .orderBy("media_id")
    },
      Some("""WITH h AS (
          SELECT doc_id AS media_id,
            255 * (CAST(1 AS BIGINT) << CAST(8 * (doc_id % 7) AS INT)) AS ahash
          FROM documents)
        SELECT media_id, ahash,
          MIN(media_id) OVER (PARTITION BY ahash) AS canonical_id,
          COUNT(*) OVER (PARTITION BY ahash) AS class_size
        FROM h ORDER BY media_id""")),

    // ACOUSTIC DEDUP (zero-crossing fingerprint): real WAV decode → integer
    // zero-crossing signature → equi-grouping — the audio twin of x48's
    // image aHash (gain/loudness changes never move the crossing count, so
    // re-encoded takes collapse to one class). The fixture is analytic:
    // byte-distinct square waves whose signature depends only on the
    // half-period, so the oracle replays signature/canonical/class size in
    // pure SQL while Spark runs the real RIFF chunk walker.
    Q("x49_media_audio_dedup", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val f = Media.wavFeatures(
        Media.synthesizeSquareWavs(t(s, d, "documents"))).toDF()
      val w = Window.partitionBy("zero_crossings")
      f.withColumn("canonical_id", min(col("media_id")).over(w))
        .withColumn("class_size", count(lit(1)).over(w))
        .select("media_id", "zero_crossings", "peak", "canonical_id", "class_size")
        .orderBy("media_id")
    },
      Some("""WITH f AS (
          SELECT doc_id AS media_id,
            799 // (1 + doc_id % 5) AS zero_crossings,
            CAST(1000 + doc_id % 4000 AS INT) AS peak
          FROM documents)
        SELECT media_id, zero_crossings, peak,
          MIN(media_id) OVER (PARTITION BY zero_crossings) AS canonical_id,
          COUNT(*) OVER (PARTITION BY zero_crossings) AS class_size
        FROM f ORDER BY media_id""")),

    // VIDEO SCENE-CUT DETECTION: real Y4M decode → every-frame luma means
    // (the x34 sampling primitive at stride 1) → per-video lag window →
    // frames whose luma delta exceeds the threshold are cuts — the keyframe
    // selection/shot-boundary primitive video curation pipelines run before
    // captioning or frame extraction. One narrow flatMap + one window keyed
    // on the video id; no shuffle grows with frame count beyond the window
    // key. Analytic fixture → pure-SQL oracle for cut position and count.
    Q("x50_media_scene_cuts", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val frames = Media.sampleY4mFrames(
        Media.synthesizeSceneCutY4ms(t(s, d, "documents")), stride = 1).toDF()
      val w = Window.partitionBy("media_id").orderBy("frame_no")
      frames
        .withColumn("delta", abs(col("mean_luma") - lag("mean_luma", 1).over(w)))
        .withColumn("is_cut", col("delta") > 50.0)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("is_cut"), 1L).otherwise(0L)).as("n_cuts"),
          min(when(col("is_cut"), col("frame_no"))).as("cut_frame"))
        .orderBy("media_id")
    },
      Some("""SELECT doc_id AS media_id,
          7 + doc_id % 4 AS n_frames,
          CAST(1 AS BIGINT) AS n_cuts,
          CAST(1 + doc_id % 5 AS INT) AS cut_frame
        FROM documents ORDER BY media_id""")),

    // ANN top-k: banded LSH candidate generation + exact cosine re-rank.
    Q("x7_sim_lsh_topk", (s, d) =>
      Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 50 === 0, DIM, LSH_BITS, LSH_BANDS, k = 3)
        .orderBy("q_id", "rank"),
      Some(s"""WITH $NORM_CTE,
        $BUCKET_CTE,
        cand AS (
          SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
          FROM bk q JOIN bk c
            ON q.band = c.band AND q.bucket = c.bucket AND q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0)
        SELECT q_id, n_id, cos, rank FROM (
          SELECT q_id, n_id,
            list_dot_product(nq.v, nc.v) / (nq.nrm * nc.nrm) AS cos,
            CAST(ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY list_dot_product(nq.v, nc.v) / (nq.nrm * nc.nrm) DESC, n_id) AS INT) AS rank
          FROM cand JOIN n nq ON cand.q_id = nq.vec_id
                    JOIN n nc ON cand.n_id = nc.vec_id)
        WHERE rank <= 3 ORDER BY q_id, rank""")),

    // IVF-style ANN: deterministic coarse centroids, nearest-cell assignment,
    // in-cell search (nprobe=1).
    // IVF with ONE k-means (Lloyd) refinement of the coarse quantizer; the
    // oracle replays the refinement exactly — decimal-exact component sums
    // make the refined centroids order-independent (cosine is scale-
    // invariant, so the sum centroid ≡ the mean centroid for assignment).
    Q("x13_sim_ivf_topk", (s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 50 === 0, centStride = 40, k = 3, kmeansIters = 1)
        .orderBy("q_id", "rank"),
      Some(s"""WITH $NORM_CTE,
        cent AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 40 = 1),
        a0 AS (
          SELECT vec_id, v, nrm, cent_id AS cell FROM (
            SELECT n.vec_id, n.v, n.nrm, c.cent_id,
              ROW_NUMBER() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cent_id) AS rn
            FROM n, cent c) WHERE rn = 1),
        refined AS (
          SELECT cent_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM (
            SELECT cell AS cent_id, list(m ORDER BY pos) AS cv FROM (
              SELECT a.cell, r.range AS pos,
                CAST(SUM(CAST(a.v[r.range] AS DECIMAL(27,12))) AS DOUBLE) AS m
              FROM a0 a, range(1, 65) r
              GROUP BY a.cell, r.range)
            GROUP BY cell)),
        assigned AS (
          SELECT vec_id, v, nrm, cent_id AS cell FROM (
            SELECT n.vec_id, n.v, n.nrm, c.cent_id,
              ROW_NUMBER() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cent_id) AS rn
            FROM n, refined c) WHERE rn = 1)
        SELECT q_id, n_id, cell, cos, rank FROM (
          SELECT q.vec_id AS q_id, a.vec_id AS n_id, q.cell,
            list_dot_product(q.v, a.v) / (q.nrm * a.nrm) AS cos,
            CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY list_dot_product(q.v, a.v) / (q.nrm * a.nrm) DESC, a.vec_id) AS INT) AS rank
          FROM assigned q JOIN assigned a ON q.cell = a.cell AND a.vec_id != q.vec_id
          WHERE q.vec_id % 50 = 0)
        WHERE rank <= 3 ORDER BY q_id, rank""")),

    // x13 companion at nprobe=2: queries probe their TWO nearest cells of
    // the same refined quantizer — the IVF recall knob (a neighbor just
    // across the cell boundary is reachable; SimilaritySpec proves recall
    // vs brute force is monotone in nprobe). The oracle replays the same
    // top-2 probe assignment; corpus rows still live in exactly one cell,
    // so the probe join never duplicates a candidate pair.
    Q("x37_sim_ivf_nprobe", (s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 50 === 0, centStride = 40, k = 3, kmeansIters = 1,
          nprobe = 2)
        .orderBy("q_id", "rank"),
      Some(s"""WITH $NORM_CTE,
        cent AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 40 = 1),
        a0 AS (
          SELECT vec_id, v, nrm, cent_id AS cell FROM (
            SELECT n.vec_id, n.v, n.nrm, c.cent_id,
              ROW_NUMBER() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cent_id) AS rn
            FROM n, cent c) WHERE rn = 1),
        refined AS (
          SELECT cent_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM (
            SELECT cell AS cent_id, list(m ORDER BY pos) AS cv FROM (
              SELECT a.cell, r.range AS pos,
                CAST(SUM(CAST(a.v[r.range] AS DECIMAL(27,12))) AS DOUBLE) AS m
              FROM a0 a, range(1, 65) r
              GROUP BY a.cell, r.range)
            GROUP BY cell)),
        ranked AS (
          SELECT n.vec_id, n.v, n.nrm, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY n.vec_id
              ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cent_id) AS rn
          FROM n, refined c),
        assigned AS (SELECT vec_id, v, nrm, cell FROM ranked WHERE rn = 1),
        probes AS (SELECT vec_id, v, nrm, cell FROM ranked
          WHERE rn <= 2 AND vec_id % 50 = 0)
        SELECT q_id, n_id, cell, cos, rank FROM (
          SELECT q.vec_id AS q_id, a.vec_id AS n_id, q.cell,
            list_dot_product(q.v, a.v) / (q.nrm * a.nrm) AS cos,
            CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY list_dot_product(q.v, a.v) / (q.nrm * a.nrm) DESC, a.vec_id) AS INT) AS rank
          FROM probes q JOIN assigned a ON q.cell = a.cell AND a.vec_id != q.vec_id)
        WHERE rank <= 3 ORDER BY q_id, rank""")),

    // Product-quantization ANN: 8 subspaces × 8 dims, stride-seeded per-
    // subspace codebooks, asymmetric (exact-query vs reconstructed-corpus)
    // cosine scoring. The oracle replays the encode (argmin L2, tiebreak
    // cent_id), the ordered reconstruction, and the ADC scores exactly.
    Q("x14_sim_pq_topk", (s, d) =>
      Similarity.pqTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 50 === 0, dim = DIM, m = 8, centStride = 40, k = 3)
        .orderBy("q_id", "rank"),
      Some(s"""WITH $NORM_CTE,
        jj AS (SELECT unnest([0,1,2,3,4,5,6,7]) AS j),
        cents AS (
          SELECT vec_id AS cent_id, j, v[8*j+1 : 8*j+8] AS csub
          FROM n, jj WHERE vec_id % 40 = 1),
        subs AS (
          SELECT vec_id, j, v[8*j+1 : 8*j+8] AS sv FROM n, jj),
        enc AS (
          SELECT vec_id, j, csub FROM (
            SELECT s.vec_id, s.j, c.csub,
              ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
                list_dot_product(s.sv, s.sv)
                  - 2.0 * list_dot_product(s.sv, c.csub)
                  + list_dot_product(c.csub, c.csub),
                c.cent_id) AS rn
            FROM subs s JOIN cents c ON s.j = c.j) WHERE rn = 1),
        recon AS (
          SELECT vec_id, rv, sqrt(list_dot_product(rv, rv)) AS rnrm FROM (
            SELECT vec_id, flatten(list(csub ORDER BY j)) AS rv
            FROM enc GROUP BY vec_id))
        SELECT q_id, n_id, score, rank FROM (
          SELECT q.vec_id AS q_id, r.vec_id AS n_id,
            list_dot_product(q.v, r.rv) / (q.nrm * r.rnrm) AS score,
            CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              list_dot_product(q.v, r.rv) / (q.nrm * r.rnrm) DESC, r.vec_id) AS INT) AS rank
          FROM n q JOIN recon r ON r.vec_id != q.vec_id
          WHERE q.vec_id % 50 = 0)
        WHERE rank <= 3 ORDER BY q_id, rank""")),

    // ---- curation: deterministic sampling & corpus vocabulary ---------------

    // Exact-fraction stratified sample: ceil(10%) of documents per lang,
    // membership a pure function of doc_id (reproducible across clusters and
    // re-runs, unlike Dataset.sample). One exchange on the stratum key.
    Q("x20_sample_stratified", (s, d) =>
      graft.ext.Sampling.stratifiedExact(
          t(s, d, "documents").select("doc_id", "lang"),
          Seq("lang"), "doc_id", 0.1)
        .select("doc_id", "lang", "sample_rank")
        .orderBy("doc_id"),
      Some(s"""WITH ranked AS (
          SELECT doc_id, lang,
            CAST(ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY ${TF.hash60Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS BIGINT)
              AS sample_rank,
            COUNT(*) OVER (PARTITION BY lang) AS __n
          FROM documents)
        SELECT doc_id, lang, sample_rank FROM ranked
        WHERE sample_rank <= CEIL(__n * 0.1) ORDER BY doc_id""")),

    // Deterministic seeded GLOBAL SHUFFLE into fixed shards — the export
    // step between curation and training: position = seeded 60-bit hash of
    // the id (a new seed is a fresh permutation, identical across engines
    // and re-runs), shard = hash mod N, shard_pos = hash-order rank within
    // the shard. One uniform hash shuffle + within-partition sort — no
    // global sort at any scale; shards then write out independently.
    Q("x51_shuffle_shards", (s, d) =>
      graft.ext.Sampling.shuffleShards(
          t(s, d, "documents").select("doc_id", "lang"), "doc_id", 7L, 8)
        .select("doc_id", "lang", "shard", "shard_pos")
        .orderBy("shard", "shard_pos"),
      Some(s"""WITH h AS (
          SELECT doc_id, lang,
            ${TF.hash60Sql("'7:' || CAST(doc_id AS VARCHAR)")} AS hh
          FROM documents)
        SELECT doc_id, lang, CAST(hh % 8 AS INTEGER) AS shard,
          CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8
            ORDER BY hh, doc_id) AS BIGINT) AS shard_pos
        FROM h ORDER BY shard, shard_pos""")),

    // Hash-threshold ~10% sample: zero-shuffle narrow filter — the 100 TB
    // default when exact per-stratum counts aren't required.
    Q("x21_sample_hash", (s, d) =>
      graft.ext.Sampling.hashSample(t(s, d, "documents"), "doc_id", 1, 10)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, source FROM documents
        WHERE ${TF.hash60Sql("CAST(doc_id AS VARCHAR)")} % 10 < 1
        ORDER BY doc_id""")),

    // Corpus vocabulary: global token frequencies, top 100. Explode + two-
    // phase hash aggregate (map-side partial combine absorbs the Zipfian
    // token skew) + TakeOrdered top-k — no global sort of the vocabulary.
    Q("x22_vocab_topk", (s, d) =>
      t(s, d, "documents")
        .select(explode(TF.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100),
      Some(s"""SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest(${TF.tokensSql("text")}) AS token FROM documents)
        GROUP BY token ORDER BY cnt DESC, token LIMIT 100""")),

    // Per-stratum heavy hitters: the 5 most frequent tokens per language.
    // Two-phase hash aggregate on (lang, token) absorbs Zipf skew map-side;
    // the per-lang top-k window runs over the already-aggregated (small)
    // vocabulary, never the raw token stream.
    Q("x25_heavy_hitters", (s, d) => {
      val counts = t(s, d, "documents")
        .select(col("lang"), explode(TF.tokens(col("text"))).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("cnt").desc, col("token"))
      counts.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 5)
        .orderBy("lang", "rank")
    },
      Some(s"""WITH counts AS (
          SELECT lang, token, COUNT(*) AS cnt
          FROM (SELECT lang, unnest(${TF.tokensSql("text")}) AS token FROM documents)
          GROUP BY lang, token)
        SELECT lang, token, cnt,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS INT) AS rank
        FROM counts QUALIFY rank <= 5 ORDER BY lang, rank""")),

    // Sliding-window text CHUNKING — the split step every context-bounded
    // training pipeline runs (window 64 tokens, stride 48 → 16-token
    // overlap). Pure narrow ops: tokenize once, explode the start offsets,
    // slice per chunk — no shuffle until the output sort. Both engines
    // compute identical chunk frames: Spark `slice(toks, start+1, 64)` ==
    // DuckDB `list_slice(toks, start+1, start+64)` (1-based, end-clamped).
    Q("x26_text_chunking", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .withColumn("start",
          explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(48))))
        .select(
          col("doc_id"),
          (col("start") / 48).cast("int").as("chunk_idx"),
          size(slice(col("toks"), col("start") + 1, lit(64))).as("n_chunk_tokens"),
          array_join(slice(col("toks"), col("start") + 1, lit(64)), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH toks AS (
          SELECT doc_id, ${TF.tokensSql("text")} AS toks FROM documents
        ), starts AS (
          SELECT doc_id, toks,
            unnest(generate_series(0, CAST(len(toks) AS INT) - 1, 48)) AS start
          FROM toks)
        SELECT doc_id, CAST(start / 48 AS INT) AS chunk_idx,
          CAST(len(list_slice(toks, start + 1, start + 64)) AS INT) AS n_chunk_tokens,
          array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text
        FROM starts ORDER BY doc_id, chunk_idx""")),

    // PII REDACTION — regex scrubbing of emails and long digit runs, the
    // hygiene pass training corpora run before tokenization. The synthetic
    // documents carry no PII, so both sides deterministically inject the
    // same email + account fragment per doc, then redact; match counts are
    // asserted via regexp_extract_all so the oracle proves the patterns
    // actually fired. Codegen'd regexp_replace — row-local, no shuffle.
    Q("x27_pii_redact", (s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val numRe = "[0-9]{6,}"
      t(s, d, "documents")
        .withColumn("dirty",
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com acct 900"), col("doc_id"), lit("1234")))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("dirty"), lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("dirty"), lit(numRe), lit(0))).as("n_numbers"),
          regexp_replace(regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
            numRe, "<NUM>").as("redacted"))
        .filter(col("doc_id") % 20 === 0)
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id,
          CAST(len(regexp_extract_all(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(dirty, '[0-9]{6,}')) AS INT) AS n_numbers,
          regexp_replace(regexp_replace(dirty,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '[0-9]{6,}', '<NUM>', 'g') AS redacted
        FROM (SELECT doc_id,
                text || ' contact user' || doc_id || '@example.com acct 900' || doc_id || '1234' AS dirty
              FROM documents)
        WHERE doc_id % 20 = 0 ORDER BY doc_id""")),

    // ---- text analysis ------------------------------------------------------

    Q("x8_text_stats", (s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.bpeishTokenCount(col("text")).as("n_bpe_tokens"),
        TF.punctRatio(col("text")).as("punct_ratio"),
        TF.avgWordLen(col("text")).as("avg_word_len"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          ${TF.tokenCountSql("text")} AS n_tokens,
          ${TF.bpeishTokenCountSql("text")} AS n_bpe_tokens,
          ${TF.punctRatioSql("text")} AS punct_ratio,
          ${TF.avgWordLenSql("text")} AS avg_word_len
        FROM documents ORDER BY doc_id""")),

    Q("x9_text_quality", (s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TF.qualityScore(col("text")).as("quality"),
        TF.stopwordRatio(col("text")).as("stopword_ratio"))
        .filter(col("quality") >= 0.61)
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          ${TF.qualityScoreSql("text")} AS quality,
          ${TF.stopwordRatioSql("text")} AS stopword_ratio
        FROM documents
        WHERE ${TF.qualityScoreSql("text")} >= 0.61
        ORDER BY doc_id""")),

    // Gopher-style repetition / diversity signals (the filters a training-
    // data pipeline runs before dedup): duplicate-bigram and -trigram
    // occurrence fractions plus distinct-token ratio, all row-local HOF
    // arithmetic — no shuffle, linear in tokens.
    Q("x23_text_repetition", (s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TF.distinctTokenRatio(col("text")).as("distinct_token_ratio"),
        TF.dupGramFrac(col("text"), 2).as("dup_bigram_frac"),
        TF.dupGramFrac(col("text"), 3).as("dup_trigram_frac"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          ${TF.distinctTokenRatioSql("text")} AS distinct_token_ratio,
          ${TF.dupGramFracSql("text", 2)} AS dup_bigram_frac,
          ${TF.dupGramFracSql("text", 3)} AS dup_trigram_frac
        FROM documents ORDER BY doc_id""")),

    Q("x10_text_langid", (s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), col("lang"),
        TF.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, ${TF.languageIdSql("text")} AS lang_pred
        FROM documents ORDER BY doc_id""")),

    Q("x11_text_fingerprint", (s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TF.docFingerprint(col("text")).as("fingerprint"),
        TF.fingerprintBucket(col("text")).as("bucket"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          ${TF.docFingerprintSql("text")} AS fingerprint,
          ${TF.fingerprintBucketSql("text")} AS bucket
        FROM documents ORDER BY doc_id""")),

    // ---- skew mitigation ----------------------------------------------------

    // Salted two-phase aggregation over a deliberately hot key (6 distinct
    // l_returnflag/l_linestatus cells own all rows). The rewrite is
    // result-preserving: the oracle is the plain GROUP BY.
    Q("k1_salted_agg", (s, d) =>
      Skew.saltedAggregate(
        t(s, d, "lineitem"), keys = Seq("l_returnflag"), saltBuckets = 16,
        saltSource = Seq("l_orderkey", "l_linenumber", "l_partkey"),
        partialAggs = Seq(
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("psum"),
          count(lit(1)).as("pcnt")),
        finalAggs = Seq(
          sum(col("psum")).cast(DoubleType).as("sum_qty"),
          sum(col("pcnt")).as("cnt")))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
          COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Salted dimension join (hot FK spread over 8 sub-keys) feeding an
    // order-insensitive rollup; oracle is the unsalted join + GROUP BY.
    Q("k2_salted_join", (s, d) => {
      val joined = Skew.saltedJoin(
        t(s, d, "lineitem"), t(s, d, "supplier"), "l_suppkey", "s_suppkey", 8)
      joined.groupBy("s_name")
        .agg(dsum(col("l_extendedprice")).as("total_price"), count(lit(1)).as("cnt"))
        .orderBy("s_name")
    },
      Some(s"""SELECT s_name, ${dsumSql("l_extendedprice")} AS total_price, COUNT(*) AS cnt
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name ORDER BY s_name""")),

    // ---- streaming ingest + catalog (S-family round-trips) ------------------

    // S1/S2/O5/O6: real streaming CSV→bronze ingest — events subset written
    // as CSV landing files, drained twice through the checkpointed stream
    // (second run is a no-op), bronze read back. The oracle replays the
    // subset from the original parquet: hash equality proves the lossless
    // CSV round-trip + exactly-once ingest.
    Q("s1_bronze_roundtrip", (s, d) => {
      val root = tmp("graft_s1")
      val subset = t(s, d, "events").filter(col("event_id") % 100 === 0)
        .select("event_id", "user_id", "event_type", "value")
      subset.coalesce(1).write.option("header", "true").csv(s"$root/landing")
      BronzeIngest.run(s, s"$root/landing", s"$root/bronze", s"$root/cp")
      BronzeIngest.run(s, s"$root/landing", s"$root/bronze", s"$root/cp") // idempotent
      LakeTable(s, s"$root/bronze").read
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },
      Some("""SELECT event_id, user_id, event_type, value FROM events
        WHERE event_id % 100 = 0 ORDER BY event_id""")),

    // S6 + S9-S12: direct-path SQL scan, catalog DDL, temp-view
    // registration, existence introspection, scalar watermark collect.
    Q("s9_catalog_ops", (s, d) => {
      import s.implicits._
      s.sql("CREATE DATABASE IF NOT EXISTS graft_cat")
      t(s, d, "events").createOrReplaceTempView("src_events")
      val dbExists = s.catalog.databaseExists("graft_cat")
      val viewExists = s.catalog.tableExists("src_events")
      val maxTs = s.sql("SELECT MAX(ts) FROM src_events").head().getTimestamp(0)
      // S6: SQL direct-path scan (`SELECT count(*) FROM delta.`path``-style)
      val nRows = s.sql(s"SELECT count(*) FROM parquet.`$d/events.parquet`")
        .head().getLong(0)
      Seq((dbExists, viewExists)).toDF("db_exists", "view_exists")
        .withColumn("max_ts", lit(maxTs))
        .withColumn("n_rows", lit(nRows))
    },
      Some("""SELECT true AS db_exists, true AS view_exists,
        (SELECT MAX(ts) FROM events) AS max_ts,
        (SELECT COUNT(*) FROM events) AS n_rows""")),

    // ---- semi-structured (JSON) columns -------------------------------------

    // JSON property extraction + typed aggregation over the events.props
    // payload — the schema-on-read path every log/telemetry pipeline needs.
    // get_json_object is codegen'd; from_json with an explicit schema is the
    // bulk-typed alternative when the payload shape is known.
    Q("x16_json_extract", (s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
      // CAST(SUM(...) AS BIGINT): DuckDB SUM(BIGINT) yields HUGEINT, which
      // the compare layer surfaces as float — Spark's sum(long) is BIGINT.
      Some("""SELECT event_type, COUNT(*) AS cnt,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
          MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY event_type ORDER BY event_type""")),

    // ---- multimodal plumbing ------------------------------------------------

    // Binary payload column + typed metadata; features via column functions
    // (the mapPartitions decode path is cross-checked in MediaSpec).
    Q("x12_media_features", (s, d) =>
      Media.featureColumns(
        Media.synthesizeFromDocuments(t(s, d, "documents")).toDF())
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, 'img/' || source AS kind,
          CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          md5(text) AS content_md5
        FROM documents ORDER BY media_id""")),

    // ---- corpus curation: decontamination, packing, mixture -----------------

    // Benchmark DECONTAMINATION — drop training documents that share any
    // 5-word shingle with a held-out eval set (doc_id ≡ 0 mod 97 stands in
    // for the benchmark). The eval side is tiny BY NATURE (benchmarks are
    // thousands of docs, the corpus is billions), so its distinct shingle
    // hashes broadcast and the 100 TB training side is scanned ONCE with a
    // narrow hash-join probe — no shuffle of the corpus. Joining on the
    // 60-bit shingle hash in BOTH engines keeps the comparison exact even
    // under (vanishingly unlikely) hash collisions.
    Q("x28_decontaminate", (s, d) => {
      // filter each side BEFORE shingling (the doc_id predicate pushes into
      // the parquet scan, and the tiny eval side never shingles the corpus);
      // shingle hashes come from the one-pass compiled kernel — same
      // tokenize→5-gram→hash60 family the oracle replays per x4's mirror
      def grams(docs: org.apache.spark.sql.DataFrame) = docs
        .select(col("doc_id"), explode(
          TS.shingleHashSet(TF.tokens(TF.normalizeText(col("text"))), 5)).as("gram_h"))
      val docs = t(s, d, "documents")
      val bench = grams(docs.filter(col("doc_id") % 97 === 0))
        .select("gram_h").distinct()
      grams(docs.filter(col("doc_id") % 97 =!= 0))
        .join(broadcast(bench), "gram_h")
        .groupBy("doc_id")
        .agg(countDistinct(col("gram_h")).as("n_shared_grams"))
        .orderBy("doc_id")
    },
      Some(s"""WITH g AS (
          SELECT doc_id, ${TF.hash60Sql("gram")} AS gram_h FROM (
            SELECT doc_id, unnest(${TF.wordShinglesSql("text", 5)}) AS gram
            FROM documents)),
        bench AS (SELECT DISTINCT gram_h FROM g WHERE doc_id % 97 = 0)
        SELECT g.doc_id, COUNT(DISTINCT g.gram_h) AS n_shared_grams
        FROM g JOIN bench b ON g.gram_h = b.gram_h
        WHERE g.doc_id % 97 <> 0
        GROUP BY g.doc_id ORDER BY g.doc_id""")),

    // FUZZY decontamination — cross-corpus MinHash-LSH between the training
    // corpus and the held-out eval set, then EXACT Jaccard verification of
    // the banded candidates: catches paraphrased/near-duplicate
    // contamination that exact n-gram overlap (x28) misses. The eval side's
    // banded signatures broadcast (tiny by nature); the corpus side stays a
    // narrow scan + hash probe — never an all-pairs product. The set
    // sketches ride the band explode so no second pass recomputes them.
    Q("x35_decontaminate_fuzzy", (s, d) => {
      val docs = t(s, d, "documents")
      // ONE compiled sketch pass per row: signature + verification set share
      // the md5-per-shingle stream instead of each recomputing it. The
      // no-shingles guard is `text IS NOT NULL` — equivalent to
      // `size(mh) > 0` (split(trim(s)) is never empty for non-null s) but
      // CHEAP, so predicate pushdown lands it in the scan instead of
      // duplicating the sketch kernel into a pushed Filter (PlanQualitySpec
      // pins one kernel per side).
      def prep(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          TS.shingleSketch(TF.tokens(TF.normalizeText(col("text"))), 3, K).as("sk"))
        .select(col("doc_id"), col("sk.mh").as("mh"), col("sk.sh").as("sh"))
      def banded(df: org.apache.spark.sql.DataFrame, idAs: String, shAs: String) =
        df.select(col("doc_id").as(idAs), col("sh").as(shAs),
          explode(array((0 until BANDS).map(b => struct(lit(b).as("band"),
            element_at(col("mh"), b * ROWS_PER_BAND + 1).as("h0"),
            element_at(col("mh"), b * ROWS_PER_BAND + 2).as("h1"))): _*)).as("bd"))
        .select(col(idAs), col(shAs), col("bd.band").as("band"),
          col("bd.h0").as("h0"), col("bd.h1").as("h1"))
      val evalB = banded(prep(docs.filter(col("doc_id") % 13 === 11)),
        "eval_doc_id", "sh_e")
      val trainB = banded(prep(docs.filter(col("doc_id") % 13 =!= 11)),
        "doc_id", "sh_t")
      trainB.join(broadcast(evalB), Seq("band", "h0", "h1"))
        .select(col("doc_id"), col("eval_doc_id"),
          TS.jaccardSorted(col("sh_t"), col("sh_e")).as("jaccard"))
        .distinct() // same pair from several agreeing bands → identical rows
        .filter(col("jaccard") >= 0.3)
        .orderBy("doc_id", "eval_doc_id")
    },
      Some(s"""WITH shg AS (
          SELECT doc_id, ${TF.wordShinglesSql("text", 3)} AS sh FROM documents),
        hs AS (
          SELECT doc_id, ${Dedup.shingleHashesSql("sh")} AS hs
          FROM shg WHERE len(sh) > 0),
        sigs AS (
          SELECT doc_id, ${Dedup.minhashFromHashesSql("hs", K)} AS mh FROM hs),
        sets AS (SELECT doc_id, list_sort(list_distinct(hs)) AS shs FROM hs),
        bands AS (
          SELECT doc_id, b AS band, mh[2*b+1] AS h0, mh[2*b+2] AS h1
          FROM sigs, (SELECT unnest([0,1,2,3]) AS b) bb),
        cand AS (
          SELECT DISTINCT t.doc_id AS doc_id, e.doc_id AS eval_doc_id
          FROM bands t JOIN bands e
            ON t.band = e.band AND t.h0 = e.h0 AND t.h1 = e.h1
          WHERE t.doc_id % 13 <> 11 AND e.doc_id % 13 = 11)
        SELECT c.doc_id AS doc_id, c.eval_doc_id AS eval_doc_id,
          ${Dedup.jaccardSql("st.shs", "se.shs")} AS jaccard
        FROM cand c JOIN sets st ON c.doc_id = st.doc_id
                    JOIN sets se ON c.eval_doc_id = se.doc_id
        WHERE ${Dedup.jaccardSql("st.shs", "se.shs")} >= 0.3
        ORDER BY c.doc_id, c.eval_doc_id""")),

    // SEQUENCE PACKING — concat-then-chunk assignment of documents to fixed
    // 1024-token training sequences, the step between curation and batch
    // assembly. Packing state is a running token count per source stream, so
    // the only exchange is the window partitioning on `source`; each doc's
    // sequence id and intra-sequence offset derive from the EXCLUSIVE running
    // sum (docs straddle budget boundaries, as concat packing does). At
    // 100 TB the same window runs per (source, day) shard to bound partition
    // height.
    Q("x29_pack_sequences", (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      t(s, d, "documents")
        .select(col("doc_id"), col("source"), TF.tokenCount(col("text")).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("seq_id", expr("(cum - n_tokens) div 1024"))
        .withColumn("tok_offset", (col("cum") - col("n_tokens")) % 1024)
        .drop("cum")
        .orderBy("doc_id")
    },
      Some(s"""WITH c AS (
          SELECT doc_id, source, ${TF.tokenCountSql("text")} AS n_tokens,
            CAST(SUM(${TF.tokenCountSql("text")}) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM documents)
        SELECT doc_id, source, n_tokens,
          (cum - n_tokens) // 1024 AS seq_id,
          (cum - n_tokens) % 1024 AS tok_offset
        FROM c ORDER BY doc_id""")),

    // SEQUENCE MATERIALIZATION — assemble x29's packed sequences into the
    // actual training-sequence payloads: documents of one (source, seq_id)
    // bin concatenated in doc_id order. The comparison carries the md5 of
    // each assembled payload, so the oracle proves byte-identical assembly
    // (order included) without shipping megabytes of packed text through
    // the compare. One exchange for the window + one for the group-by —
    // both on the same (source-dominated) keys.
    Q("x36_pack_materialize", (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          TF.tokenCount(col("text")).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("seq_id", expr("(cum - n_tokens) div 1024"))
        .groupBy("source", "seq_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens_total"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            p => p.getField("text")), "\n")).as("packed_md5"))
        .orderBy("source", "seq_id")
    },
      Some(s"""WITH c AS (
          SELECT doc_id, source, text, ${TF.tokenCountSql("text")} AS n_tokens,
            CAST(SUM(${TF.tokenCountSql("text")}) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM documents)
        SELECT source, (cum - n_tokens) // 1024 AS seq_id,
          COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
          md5(string_agg(text, chr(10) ORDER BY doc_id)) AS packed_md5
        FROM c GROUP BY source, (cum - n_tokens) // 1024
        ORDER BY source, seq_id""")),

    // DATA-MIXTURE SAMPLING — resample the corpus so per-source counts hit
    // target mixture weights (here: sources ≥ src10 weighted 3×), taking the
    // LARGEST feasible corpus under rate ≤ 1: λ = min_s(n_s / w_s), target_s
    // = ⌊λ·w_s⌋. Membership is the same deterministic hash-rank used by the
    // stratified sampler (reproducible across clusters/re-runs). The per-
    // source counts and targets are a 20-row aggregate — broadcast back; the
    // corpus itself is scanned once and exchanged once (the per-source rank
    // window). Output is the per-source audit: totals, sampled counts,
    // achieved share.
    Q("x30_mixture_sample", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents").select("doc_id", "source")
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
        .withColumn("w",
          when(substring(col("source"), 4, 8).cast("int") >= 10, lit(3.0))
            .otherwise(lit(1.0)))
      // tiny (one row per source): the all-rows window is a 20-row frame
      val targets = counts
        .withColumn("lambda",
          min(col("n_total").cast(DoubleType) / col("w")).over(Window.partitionBy()))
        .withColumn("n_target", floor(col("lambda") * col("w")).cast("long"))
        .select("source", "n_total", "n_target")
      val rk = Window.partitionBy("source")
        .orderBy(TF.hash60(col("doc_id").cast("string")), col("doc_id"))
      docs.withColumn("rk", row_number().over(rk).cast("long"))
        .join(broadcast(targets), "source")
        .filter(col("rk") <= col("n_target"))
        .groupBy("source")
        .agg(max(col("n_total")).as("n_total"), count(lit(1)).as("n_sampled"))
        .withColumn("achieved_share",
          col("n_sampled").cast(DoubleType) /
            sum(col("n_sampled")).over(Window.partitionBy()).cast(DoubleType))
        .orderBy("source")
    },
      Some(s"""WITH counts AS (
          SELECT source, COUNT(*) AS n_total,
            CASE WHEN CAST(substr(source, 4) AS INT) >= 10 THEN 3.0 ELSE 1.0 END AS w
          FROM documents GROUP BY source),
        targets AS (
          SELECT source, n_total,
            CAST(FLOOR(MIN(CAST(n_total AS DOUBLE) / w) OVER () * w) AS BIGINT)
              AS n_target
          FROM counts),
        ranked AS (
          SELECT doc_id, source,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY ${TF.hash60Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS BIGINT)
              AS rk
          FROM documents),
        sampled AS (
          SELECT r.source, t.n_total
          FROM ranked r JOIN targets t ON r.source = t.source
          WHERE r.rk <= t.n_target),
        agg AS (
          SELECT source, MAX(n_total) AS n_total, COUNT(*) AS n_sampled
          FROM sampled GROUP BY source)
        SELECT source, n_total, n_sampled,
          CAST(n_sampled AS DOUBLE) / CAST(SUM(n_sampled) OVER () AS DOUBLE)
            AS achieved_share
        FROM agg ORDER BY source""")),

    // REAL multimodal decode — deterministic PPM (P6) payloads synthesized
    // from documents, then parsed by the actual byte-level decoder in a
    // narrow mapPartitions pass. The oracle predicts dims/sizes from the
    // synthesis formulas, but every compared value flows OUT of the parser:
    // a header/raster bug breaks the hash. (Channel means are spec-verified;
    // they'd require replaying the md5 keystream in SQL.)
    Q("x32_media_ppm_decode", (s, d) =>
      Media.ppmFeatures(Media.synthesizePpmFromDocuments(t(s, d, "documents")))
        .select("media_id", "width", "height", "n_pixels", "byte_len")
        .orderBy("media_id"),
      // header "P6\n{w} {h}\n255\n" is 11 bytes while w,h are single-digit
      // (w∈[4,8], h∈[3,6] by construction)
      Some("""SELECT doc_id AS media_id,
          CAST(4 + doc_id % 5 AS INT) AS width,
          CAST(3 + doc_id % 4 AS INT) AS height,
          (4 + doc_id % 5) * (3 + doc_id % 4) AS n_pixels,
          11 + (4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS byte_len
        FROM documents ORDER BY media_id""")),

    // REAL audio decode — RIFF/WAVE PCM16 payloads (8 kHz mono, frame count
    // a mod-function of doc_id) walked by the actual chunk parser; the
    // compared dims/durations/sizes all flow OUT of the decoder. byte_len =
    // canonical 44-byte header + 2 bytes/sample; duration_us is exact
    // integer arithmetic in both engines. (RMS/zero-crossings are
    // spec-verified — they'd require replaying the md5 keystream in SQL.)
    Q("x33_media_wav_decode", (s, d) =>
      Media.wavFeatures(Media.synthesizeWavFromDocuments(t(s, d, "documents")))
        .select("media_id", "sample_rate", "channels", "n_frames",
          "duration_us", "byte_len")
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
          CAST(8000 AS INT) AS sample_rate,
          CAST(1 AS INT) AS channels,
          50 + doc_id % 200 AS n_frames,
          (50 + doc_id % 200) * 1000000 // 8000 AS duration_us,
          44 + (50 + doc_id % 200) * 2 AS byte_len
        FROM documents ORDER BY media_id""")),

    // REAL video decode — YUV4MPEG2 (Y4M) payloads with raw 4:2:0 frames,
    // walked by the actual stream/FRAME-marker parser. Header is a fixed 39
    // bytes while dims are single-digit (w∈{4,6,8}, h∈{2,4} by
    // construction); each frame costs 6 ("FRAME\n") + w*h*3/2 raster bytes;
    // 25 fps → 40000 µs per frame, exact in both engines. (Per-frame luma
    // sampling is spec-verified — the md5 plane keystream has no SQL twin.)
    Q("x34_media_y4m_decode", (s, d) =>
      Media.y4mFeatures(Media.synthesizeY4mFromDocuments(t(s, d, "documents")))
        .select("media_id", "width", "height", "n_frames", "duration_us", "byte_len")
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
          CAST(4 + (doc_id % 3) * 2 AS INT) AS width,
          CAST(2 + (doc_id % 2) * 2 AS INT) AS height,
          3 + doc_id % 6 AS n_frames,
          (3 + doc_id % 6) * 40000 AS duration_us,
          39 + (3 + doc_id % 6) *
            (6 + (4 + (doc_id % 3) * 2) * (2 + (doc_id % 2) * 2) * 3 // 2)
            AS byte_len
        FROM documents ORDER BY media_id""")),

    // UNIGRAM-LM QUALITY PROXY (the CCNet-style corpus-statistics filter,
    // log-free): per doc, the mean corpus document-frequency of its token
    // occurrences (high = boilerplate built from ubiquitous tokens) and the
    // hapax fraction (occurrences of corpus-unique tokens — gibberish/OCR
    // noise scores high). All-integer aggregation with ONE final double
    // division per column, so the doubles replay bit-exact in any engine —
    // the same determinism trick as the decimal-exact centroid sums.
    // Scale: explode is linear; the df join keys on the token itself, so
    // stopwords are hot keys — exactly the skew AQE's skew-join split
    // handles (proven in SkewSpec); at 100 TB one would broadcast the
    // head-of-vocabulary df table and shuffle only the tail.
    Q("x43_lm_quality", (s, d) => {
      val toks = t(s, d, "documents").select(col("doc_id"),
        explode(TF.tokens(TF.normalizeText(col("text")))).as("token"))
      val dfreq = toks.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      toks.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("df")).as("sum_df"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("hapax"))
        .select(col("doc_id"), col("n_tokens"), col("sum_df"),
          (col("sum_df").cast(DoubleType) / col("n_tokens")).as("mean_df"),
          (col("hapax").cast(DoubleType) / col("n_tokens")).as("hapax_frac"))
        .orderBy("doc_id")
    },
      Some(s"""WITH toks AS (
          SELECT doc_id, unnest(${TF.tokensSql(TF.normalizeTextSql("text"))}) AS token
          FROM documents),
        dfreq AS (
          SELECT token, COUNT(*) AS df
          FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token)
        SELECT t.doc_id AS doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(d.df) AS BIGINT) AS sum_df,
          CAST(SUM(d.df) AS DOUBLE) / COUNT(*) AS mean_df,
          CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
            AS hapax_frac
        FROM toks t JOIN dfreq d USING (token)
        GROUP BY t.doc_id ORDER BY t.doc_id""")),

    // TF-IDF keyterms — top-3 distinguishing terms per document, scored
    // tf·(N+1)/(df+1): the rarity weight is kept RATIONAL (no log) because
    // integer-exact double division replays bit-identically across engines,
    // while libm log implementations differ in the last ulp (same term
    // ordering per document either way — the weight is monotone in 1/df).
    // Shape: one shuffle to (doc, token) counts, one to token doc-
    // frequencies, equi-join them back, per-doc top-k window over the
    // already-aggregated terms — never the raw token stream. N is a bounded
    // scalar collect (the S12 watermark pattern).
    Q("x31_tfidf_keyterms", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val n = docs.count()
      val toks = docs.select(col("doc_id"),
        explode(TF.tokens(TF.normalizeText(col("text")))).as("token"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("token"))
      tf.join(dfreq, "token")
        .withColumn("score",
          col("tf").cast(DoubleType) * lit((n + 1).toDouble) /
            (col("df").cast(DoubleType) + lit(1.0)))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "token", "tf", "df", "score")
        .orderBy("doc_id", "rank")
    },
      Some(s"""WITH toks AS (
          SELECT doc_id, unnest(${TF.tokensSql(TF.normalizeTextSql("text"))}) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT doc_id, token, tf, df,
            CAST(tf AS DOUBLE) * (n + 1) / (CAST(df AS DOUBLE) + 1.0) AS score
          FROM tf JOIN dfreq USING (token), n)
        SELECT doc_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY score DESC, token) AS INT) AS rank,
          token, tf, df, score
        FROM scored QUALIFY rank <= 3 ORDER BY doc_id, rank"""))
  )
}

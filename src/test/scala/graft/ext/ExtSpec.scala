package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class ExtSpec extends SparkSpec {
  import spark.implicits._

  test("Dedup.exact keeps exactly one row per distinct normalized text") {
    val docs = Seq(
      (1L, "hello world"),
      (2L, "  Hello   WORLD "), // same after normalization
      (3L, "something else")).toDF("doc_id", "text")
    val got = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L)) // lowest id survives
  }

  test("minhash signature: identical shingle sets → identical signatures") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "v w x y z")).toDF("doc_id", "text")
    val sig = docs.select(col("doc_id"),
      Dedup.minhashSignature(TextFunctions.wordShingles(col("text"), 2), 8).as("mh"))
    val m = sig.as[(Long, Seq[Long])].collect().toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("lshCandidatePairs surfaces identical docs as a candidate pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely different content with no overlap at all here")).toDF("doc_id", "text")
    val sig = docs.select(col("doc_id"),
      Dedup.minhashSignature(TextFunctions.wordShingles(col("text"), 3), 8).as("mh"))
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", "mh", 4, 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("simhash: identical docs equal; near-identical docs within small hamming distance") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      Dedup.simhash(TextFunctions.tokens(col("text")), 16).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    val hamming = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(hamming <= 6, s"hamming distance $hamming too large for near-dup")
  }

  test("jaccard: exact set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    val j = df.select(Dedup.jaccard(col("a"), col("b"))).as[Double].head()
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("bruteForceTopK: rank 1 is the true nearest neighbor") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // nearest to 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("vec_id") === 0, k = 2)
      .select("n_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got.map(_._1) == Seq(1L, 2L))
  }

  test("lshTopK results are a subset of brute-force candidates with correct ranks") {
    val emb = graft.ops.t(spark, sfDir, "embeddings")
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 64, 2, 4, k = 3)
    // every (q, n) pair must be a real pair with the exact cosine the brute
    // path computes; ranks are 1..k without gaps per query
    val byQ = lsh.select("q_id", "rank").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    byQ.foreach { case (q, ranks) => assert(ranks == (1 to ranks.size), s"q=$q ranks=$ranks") }
  }

  test("ivfTopK recall vs brute force is monotone in nprobe") {
    val emb = graft.ops.t(spark, sfDir, "embeddings")
    val qf = col("vec_id") % 50 === 0
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", qf, k = 3))
    def ivf(np: Int): Set[(Long, Long)] = pairs(Similarity.ivfTopK(
      emb, "vec_id", "embedding", qf, centStride = 40, k = 3,
      kmeansIters = 1, nprobe = np))
    val r1 = (ivf(1) & exact).size.toDouble / exact.size
    val r2 = (ivf(2) & exact).size.toDouble / exact.size
    val r4 = (ivf(4) & exact).size.toDouble / exact.size
    // probing more cells only ever ADDS candidates, and a candidate that
    // displaces a true top-k hit must itself be a true top-k hit (both
    // rankings are (cos DESC, id)) — so recall is monotone in nprobe
    assert(r2 >= r1, s"recall regressed: nprobe=1 $r1 vs nprobe=2 $r2")
    assert(r4 >= r2, s"recall regressed: nprobe=2 $r2 vs nprobe=4 $r4")
    assert(r4 > r1, // the knob must actually DO something on this corpus
      s"probing 4 cells found nothing beyond 1 cell (r1=$r1 r4=$r4)")
  }

  test("similarity queries leave NO cached RDDs behind (round-4 verdict #4)") {
    val emb = graft.ops.t(spark, sfDir, "embeddings")
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Similarity.nearDupPairs(emb, "vec_id", "embedding", 64, 6, 4, 0.95).count()
    Similarity.lshTopK(emb, "vec_id", "embedding",
      col("vec_id") % 500 === 0, 64, 2, 4, k = 3).count()
    Similarity.ivfTopK(emb, "vec_id", "embedding",
      col("vec_id") % 500 === 0, centStride = 40, k = 3, kmeansIters = 1).count()
    Similarity.pqTopK(emb, "vec_id", "embedding",
      col("vec_id") % 500 === 0, dim = 64, m = 8, centStride = 40, k = 3).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"similarity calls leaked cached RDDs: $leaked — a library consumer " +
        "composing several calls would accumulate cache pressure")
  }

  test("connectedComponents labels chains transitively and keeps singletons") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3, pair 5-6, singletons 4 and 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, "id", pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("media: mapPartitions feature extraction matches the column-function path") {
    val docs = graft.ops.t(spark, sfDir, "documents").limit(50)
    val media = Media.synthesizeFromDocuments(docs)
    val typed = Media.extractFeatures(media)
      .select("media_id", "byte_len", "content_md5")
      .as[(Long, Long, String)].collect().map { case (i, l, m) => i -> (l, m) }.toMap
    val cols = Media.featureColumns(media.toDF())
      .select("media_id", "byte_len", "content_md5")
      .as[(Long, Long, String)].collect().map { case (i, l, m) => i -> (l, m) }.toMap
    assert(typed == cols)
  }

  test("media: resize emits bounded fixed-dim thumbnails; frame sampling is deterministic") {
    val docs = graft.ops.t(spark, sfDir, "documents").limit(20)
    val media = Media.synthesizeFromDocuments(docs)
    val thumbs = Media.resize(media, 8, 4).collect()
    assert(thumbs.length == 20)
    assert(thumbs.forall(t => t.width == 8 && t.height == 4 && t.thumb.length == 32))

    val frames = Media.sampleFrames(media, nFrames = 3, frameBytes = 16).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length <= 16))
    // deterministic: same input → same offsets and bytes
    val again = Media.sampleFrames(media, nFrames = 3, frameBytes = 16).collect()
    assert(frames.map(f => (f.media_id, f.frame_no, f.offset)).sorted.toSeq ==
      again.map(f => (f.media_id, f.frame_no, f.offset)).sorted.toSeq)
  }

  test("media: stub decode is deterministic and bounded") {
    val (w, h) = Media.stubDecode("some bytes".getBytes("UTF-8"))
    assert(w == Media.stubDecode("some bytes".getBytes("UTF-8"))._1)
    assert(w >= 1 && w <= 640 && h >= 1 && h <= 480)
  }

  test("hardNegatives returns only cross-label neighbors, ranked by cosine, " +
      "and the top negative is the true nearest cross-label vector") {
    import org.apache.spark.sql.functions._
    import graft.ext.Similarity
    val emb = spark.createDataFrame(Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.8f, 0.2f), 1), (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(-1.0f, 0.0f), 2))).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
      col("vec_id") === 1, k = 2).orderBy("rank")
      .select("n_id", "n_label", "rank").as[(Long, Int, Int)].collect().toSeq
    // anchor 1 (label 0): same-label 2 is excluded even though it is the
    // globally nearest; the hardest negative is 3 (label 1), then 4
    assert(got == Seq((3L, 1, 1), (4L, 1, 2)))
  }

  test("bloomSummary has NO false negatives; probe is deterministic; " +
      "false-positive rate stays near the sizing") {
    import org.apache.spark.sql.functions._
    import graft.ext.Dedup
    val members = (1L to 2000L).map(_ * 7919L) // arbitrary member keys
    val corpus = members.toDF("k")
    val bloom = Dedup.bloomSummary(corpus, col("k"), 2000L, 1L << 16)
    val bloom2 = Dedup.bloomSummary(corpus, col("k"), 2000L, 1L << 16)
    assert(java.util.Arrays.equals(bloom, bloom2), "summary must be deterministic")
    // no false negatives: every member probes true
    val memberHits = corpus.filter(Dedup.mightContain(bloom, col("k"))).count()
    assert(memberHits == 2000L)
    // false positives bounded: 10k non-members, expect ~fpp · 10k hits
    val nonMembers = (1L to 10000L).map(_ * 7919L + 3L).toDF("k")
    val fp = nonMembers.filter(Dedup.mightContain(bloom, col("k"))).count()
    assert(fp < 1000L, s"false-positive count $fp is far above the sizing")
    // NULL keys probe to NULL → dropped by the filter, kept by its negation's
    // null-rejecting complement — never a phantom hit
    val withNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS k")
    assert(withNull.filter(Dedup.mightContain(bloom, col("k"))).count() == 0)
  }
}

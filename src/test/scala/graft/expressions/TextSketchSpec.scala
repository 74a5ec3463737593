package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Dedup
import graft.functions.{TextFunctions => TF}
import graft.ops.t

/** Pins the native codegen sketch kernels bit-equal to their HOF spec forms
 *  (which in turn are oracle-verified against DuckDB), including the edge
 *  cases the HOF builders encode: short docs, empty text, unicode, nulls. */
class TextSketchSpec extends SparkSpec {
  import spark.implicits._

  private val edgeDocs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "one two", // shorter than the 3-gram window → single truncated gram
    "one",     // single token
    "",        // empty text → one "" token (split semantics)
    "  spaced   out\ttabs\nand newlines  ",
    "MiXeD CaSe TEXT with Ünïcödé tökens 的是了 çæøå",
    "punct!!! soup??? ### $$$ %%%",
    "repeat repeat repeat repeat repeat")

  test("minhash_signature == HOF shingle→hash→k-min on real documents") {
    val docs = t(spark, sfDir, "documents")
    val toks = TF.tokens(TF.normalizeText(col("text")))
    val diff = docs.select(
      TextSketches.minhashShingleSig(toks, 3, 8).as("native"),
      Dedup.minhashSignature(TF.wordShingles(col("text"), 3), 8).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("minhash_signature == HOF on edge-case docs (n=2 and n=3)") {
    val df = edgeDocs.toDF("text")
    for (n <- Seq(2, 3); k <- Seq(4, 8)) {
      val toks = TF.tokens(TF.normalizeText(col("text")))
      val diff = df.select(
        TextSketches.minhashShingleSig(toks, n, k).as("native"),
        Dedup.minhashSignature(TF.wordShingles(col("text"), n), k).as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(diff == 0, s"mismatch at n=$n k=$k")
    }
  }

  test("simhash == HOF voting at 16 and 60 bits") {
    val docs = t(spark, sfDir, "documents").limit(200)
      .select(col("text")).unionByName(edgeDocs.toDF("text"))
    val toks = TF.tokens(TF.normalizeText(col("text")))
    for (bits <- Seq(16, 60)) {
      val diff = docs.select(
        TextSketches.simhash(toks, bits).as("native"),
        Dedup.simhash(toks, bits).as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(diff == 0, s"mismatch at bits=$bits")
    }
  }

  test("60-bit sketches are non-negative (oracle BIGINT safety)") {
    val docs = t(spark, sfDir, "documents")
    val toks = TF.tokens(TF.normalizeText(col("text")))
    val neg = docs.select(TextSketches.simhash(toks, 60).as("sh"))
      .filter(col("sh") < 0).count()
    assert(neg == 0)
  }

  test("null tokens → null sketch; empty token array → empty signature") {
    val df = Seq(Some(Seq("a", "b", "c")), None).toDF("toks")
    val got = df.select(
      TextSketches.minhashShingleSig(col("toks"), 3, 4).as("mh"),
      TextSketches.simhash(col("toks"), 16).as("sh"))
      .collect()
    assert(got(0).getSeq[Long](0).size == 4 && !got(0).isNullAt(1))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    val empty = Seq(Seq.empty[String]).toDF("toks")
      .select(TextSketches.minhashShingleSig(col("toks"), 3, 4).as("mh"))
    assert(empty.head().getSeq[Long](0).isEmpty)
  }

  test("simhash == HOF on arrays CONTAINING null elements (null votes -1 on all bits)") {
    val df = Seq(
      Seq[String]("a", null, "b"),
      Seq[String](null, null),      // distinct → one null → one -1 vote
      Seq[String]("a", "a", null)).toDF("toks")
    for (bits <- Seq(16, 60)) {
      val rows = df.select(
        TextSketches.simhash(col("toks"), bits).as("native"),
        Dedup.simhash(col("toks"), bits).as("hof")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"bits=$bits: $r"))
    }
  }

  test("shingle_hash_set == sorted distinct HOF shingle hashes") {
    val docs = t(spark, sfDir, "documents").select(col("text"))
      .unionByName(edgeDocs.toDF("text"))
    for (n <- Seq(2, 3)) {
      val toks = TF.tokens(TF.normalizeText(col("text")))
      // spec form: distinct grams → hash → distinct-on-hash → ascending sort
      val spec = array_sort(array_distinct(
        transform(TF.wordShingles(col("text"), n), s => TF.hash60(s))))
      val diff = docs.select(
        TextSketches.shingleHashSet(toks, n).as("native"), spec.as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(diff == 0, s"mismatch at n=$n")
    }
  }

  test("jaccard_sorted == HOF jaccard over the same hash sets") {
    val docs = t(spark, sfDir, "documents")
    val toks = TF.tokens(TF.normalizeText(col("text")))
    val dd = docs.select(col("doc_id"), col("lang"),
      TextSketches.shingleHashSet(toks, 2).as("sh"))
    val a = dd.alias("a"); val b = dd.alias("b")
    val pairs = a.join(b, col("a.lang") === col("b.lang") &&
      col("a.doc_id") < col("b.doc_id") && col("a.doc_id") < 50 && col("b.doc_id") < 50)
    val diff = pairs.select(
      (TextSketches.jaccardSorted(col("a.sh"), col("b.sh")) =!=
        Dedup.jaccard(col("a.sh"), col("b.sh"))).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("jaccard_sorted edge cases: empty sets, identical sets, nulls") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(2L, 3L, 4L))), // 2/4
      (Some(Seq.empty[Long]), Some(Seq(1L))),          // 0/max(1,1)
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])),  // 0/1 guard
      (Some(Seq(5L, 9L)), Some(Seq(5L, 9L))),          // identical → 1.0
      (None, Some(Seq(1L)))).toDF("a", "b")
    val got = df.select(TextSketches.jaccardSorted(col("a"), col("b")).as("j"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(Some(0.5), Some(0.0), Some(0.0), Some(1.0), None))
  }

  test("shingle_sketch == (minhash_signature, shingle_hash_set) in one pass") {
    val docs = t(spark, sfDir, "documents").select(col("text"))
      .unionByName(edgeDocs.toDF("text"))
    for ((n, k) <- Seq((2, 8), (3, 8), (3, 16))) {
      val toks = TF.tokens(TF.normalizeText(col("text")))
      val diff = docs.select(
          TextSketches.shingleSketch(toks, n, k).as("sk"),
          TextSketches.minhashShingleSig(toks, n, k).as("mh"),
          TextSketches.shingleHashSet(toks, n).as("sh"))
        .filter(col("sk.mh") =!= col("mh") || col("sk.sh") =!= col("sh"))
        .count()
      assert(diff == 0, s"combined kernel diverges at n=$n k=$k")
    }
    // null tokens → null struct (UnaryExpression null propagation)
    val nulls = Seq[Option[Seq[String]]](None).toDF("toks")
      .select(TextSketches.shingleSketch(col("toks"), 3, 8).as("sk"))
      .collect()
    assert(nulls.head.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val docs = t(spark, sfDir, "documents")
    val toks = TF.tokens(TF.normalizeText(col("text")))
    val df = docs.select(
      TextSketches.minhashShingleSig(toks, 3, 8).as("mh"),
      TextSketches.simhash(toks, 60).as("sh"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("minhash_signature")
      && plan.contains("simhash"), plan)
  }
}

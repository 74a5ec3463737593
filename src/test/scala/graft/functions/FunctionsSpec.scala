package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals: dupGramFrac and distinctTokenRatio") {
    val df = Seq(
      "a b a b a b",        // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      "all words unique here",
      "").toDF("text")
    val got = df.select(
      TextFunctions.distinctTokenRatio(col("text")),
      TextFunctions.dupGramFrac(col("text"), 2)).as[(Double, Double)].collect().toSeq
    assert(got(0) == ((2.0 / 6.0, 1.0 - 2.0 / 5.0)))
    assert(got(1) == ((1.0, 0.0)))
    // empty text: "" tokenizes to [""] (one empty token), so ratios stay
    // defined — 1 distinct of 1 token, 1 gram of 1
    assert(got(2) == ((1.0, 0.0)))
  }

  test("wordGrams keeps duplicate grams in order; wordShingles is its distinct set") {
    val df = Seq("x y x y").toDF("text")
    val grams = df.select(TextFunctions.wordGrams(col("text"), 2))
      .as[Seq[String]].head()
    assert(grams == Seq("x y", "y x", "x y"))
    val sh = df.select(TextFunctions.wordShingles(col("text"), 2))
      .as[Seq[String]].head()
    assert(sh.sorted == Seq("x y", "y x"))
  }

  test("tokenCount / bpeishTokenCount") {
    val df = Seq("the quick brown fox", "hello, world!").toDF("text")
    val got = df.select(
      TextFunctions.tokenCount(col("text")),
      TextFunctions.bpeishTokenCount(col("text"))).as[(Long, Long)].collect().toSeq
    assert(got == Seq((4L, 4L), (2L, 4L))) // "hello , world !" → 4 bpe-ish tokens
  }

  test("punctRatio and stopwordRatio") {
    val df = Seq("the cat!!").toDF("text")
    val (punct, stop) = df.select(
      TextFunctions.punctRatio(col("text")),
      TextFunctions.stopwordRatio(col("text"))).as[(Double, Double)].head()
    assert(math.abs(punct - 2.0 / 9.0) < 1e-12)
    assert(stop == 0.5) // "the" of 2 tokens
  }

  test("languageId votes by marker words with deterministic ties") {
    val df = Seq(
      "the cat and the dog is here",
      "der hund ist nicht hier",
      "el que es la casa de los",
      "xyzzy plugh").toDF("text")
    val got = df.select(TextFunctions.languageId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "und"))
  }

  test("docFingerprint is whitespace/case-insensitive; shingles are distinct n-grams") {
    val df = Seq(("A  B\tC", "a b c")).toDF("t1", "t2")
    val same = df.select(
      (TextFunctions.docFingerprint(col("t1")) ===
        TextFunctions.docFingerprint(col("t2"))).as("same")).as[Boolean].head()
    assert(same)
    val sh = Seq("a b a b c").toDF("text")
      .select(TextFunctions.wordShingles(col("text"), 2)).as[Seq[String]].head()
    assert(sh == Seq("a b", "b a", "b c")) // distinct, order of first occurrence
  }

  test("dot / norm / cosine on float arrays") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
    val got = df.select(
      VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect().toSeq
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("lshBucket: equal vectors share a bucket, opposite vectors do not") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f, 3.0f, 4.0f)),
      ("b", Array(1.0f, 2.0f, 3.0f, 4.0f)),
      ("c", Array(-1.0f, -2.0f, -3.0f, -4.0f))).toDF("id", "v")
    val buckets = df.select(col("id"),
      VectorFunctions.lshBucket(col("v"), dim = 4, nBits = 8)).as[(String, Long)]
      .collect().toMap
    assert(buckets("a") == buckets("b"))
    assert(buckets("a") != buckets("c"))
  }
}

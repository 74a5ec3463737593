package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Text-analysis Column library for large-scale training-data pipelines:
 * tokenization, token counting, quality signals, n-gram shingling,
 * hash-based fingerprints, and a stopword-marker language-ID heuristic.
 *
 * Everything here composes `org.apache.spark.sql.functions` (codegen'd /
 * native higher-order functions) — no UDFs, so the hot path stays inside
 * Tungsten and scales linearly with input bytes. Hashes derive from `md5`
 * (hex → 60-bit int via base-16 `conv`) so results are engine-portable and
 * oracle-checkable; a production variant would swap in `xxhash64` for speed
 * (same plumbing, not cross-engine-reproducible).
 */
object TextFunctions {

  /** Whitespace tokenization (trimmed, split on runs of whitespace). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish subword count: alpha runs, digit runs, single punctuation —
   *  the standard pre-tokenizer shape used before byte-pair merging. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0))).cast(LongType)

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  /** English stopword list used by both the quality score and language ID. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(EnglishStopwords: _*))).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)
  }

  def avgWordLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast(LongType)).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)
  }

  /** Composite quality score in [0,1]-ish: rewards stopword presence and
   *  moderate word length, penalizes punctuation soup. Heuristic weights —
   *  the point is the (cheap, single-pass, codegen) shape, not the values. */
  def qualityScore(text: Column): Column =
    lit(0.4) * least(stopwordRatio(text) * lit(4.0), lit(1.0)) +
      lit(0.4) * (lit(1.0) - least(punctRatio(text) * lit(5.0), lit(1.0))) +
      lit(0.2) * when(tokenCount(text).between(5, 100000), lit(1.0)).otherwise(lit(0.0))

  /** Language-ID by marker-word voting. Marker sets per language; the
   *  prediction is the argmax hit count with a fixed precedence order on
   *  ties (en > de > es > fr > zh), 'und' when nothing matches. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "que", "es", "los"),
    "fr" -> Seq("le", "la", "les", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*))).cast(LongType)

  def languageId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> langScore(text, m) }
    // argmax with fixed precedence: a language wins iff its score is strictly
    // greater than every earlier language's and >= every later one's.
    val best = scores.zipWithIndex.foldLeft(lit("und")) { case (acc, ((l, s), i)) =>
      val beatsEarlier = scores.take(i).map(_._2 < s).foldLeft(lit(true))(_ && _)
      val tiesLater = scores.drop(i + 1).map(_._2 <= s).foldLeft(lit(true))(_ && _)
      when(s > 0 && beatsEarlier && tiesLater, lit(l)).otherwise(acc)
    }
    best
  }

  /** 60-bit portable hash of a string: first 15 hex chars of md5 as int. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Whole-document fingerprint (md5 of whitespace-normalized lowercase text)
   *  plus a 60-bit bucket of it — the exact-dedup / routing key. */
  def docFingerprint(text: Column): Column =
    md5(normalizeText(text))
  def fingerprintBucket(text: Column): Column =
    conv(substring(docFingerprint(text), 1, 15), 16, 10).cast(LongType)

  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Distinct word n-gram shingles ("a b c" word windows) — the unit set for
   *  Jaccard/minhash dedup. Documents shorter than n shingle to the whole text. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(normalizeText(text))
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    array_distinct(grams)
  }
}

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

  /** Argmax-with-precedence = FIRST index achieving the max score (ties go
   *  to the earlier language, 'und' when no marker hits) — one score pass
   *  per language instead of the O(L²) pairwise-comparison formulation. */
  def languageId(text: Column): Column = {
    val scores = array(LangMarkers.map { case (_, m) => langScore(text, m) }: _*)
    val maxS = array_max(scores)
    val langs = array(LangMarkers.map { case (l, _) => lit(l) }: _*)
    when(maxS > 0, element_at(langs, array_position(scores, maxS).cast("int")))
      .otherwise(lit("und"))
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
   *  Jaccard/minhash dedup. Documents shorter than n shingle to the whole text.
   *
   *  Implementation note: grams are built by zipping n SHIFTED SLICES of the
   *  token array, not by `element_at(toks, i+k)` inside a transform lambda —
   *  lambda bodies re-evaluate captured expression trees per ELEMENT, which
   *  re-ran the regex tokenization ~3·|grams| times per row (30× slowdown
   *  measured at sf0.1). Slices are top-level expressions, evaluated once per
   *  row. zip_with pads the shorter slices with NULL and concat_ws skips
   *  NULLs, which exactly reproduces the truncated-gram semantics for
   *  documents shorter than n tokens. */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(wordGrams(text, n))

  /** All word n-grams IN ORDER (duplicates kept) — the raw sequence
   *  repetition metrics count over; [[wordShingles]] is its distinct set. */
  def wordGrams(text: Column, n: Int): Column = {
    val toks = tokens(normalizeText(text))
    val cnt = greatest(size(toks) - (n - 1), lit(1))
    val slices = (0 until n).map(k => slice(toks, lit(k + 1), cnt))
    // accumulate the shifted slices into arrays of growing structs, then
    // join each struct's fields into the gram string
    val acc0 = transform(slices.head, x => struct(x.as("c0")))
    val acc = slices.tail.zipWithIndex.foldLeft(acc0) { case (a, (s, k)) =>
      zip_with(a, s, (p, x) =>
        struct(((0 to k).map(j => p.getField(s"c$j").as(s"c$j")) :+ x.as(s"c${k + 1}")): _*))
    }
    transform(acc, p =>
      concat_ws(" ", (0 until n).map(j => p.getField(s"c$j")): _*))
  }

  /** Gopher-style repetition signal: fraction of n-gram OCCURRENCES that are
   *  repeats of an earlier gram (0 = no repetition, →1 = loops). Exactly
   *  `1 - |distinct grams| / |grams|`; both counts are row-local integers so
   *  the single double division replays bit-identically in the oracle. */
  def dupGramFrac(text: Column, n: Int): Column = {
    val g = wordGrams(text, n)
    when(size(g) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(g)).cast(DoubleType) / size(g).cast(DoubleType))
  }

  /** Vocabulary diversity: distinct tokens / total tokens (1 = all unique). */
  def distinctTokenRatio(text: Column): Column = {
    val toks = tokens(normalizeText(text))
    when(size(toks) === 0, lit(1.0))
      .otherwise(size(array_distinct(toks)).cast(DoubleType) /
        size(toks).cast(DoubleType))
  }

  // ---- DuckDB SQL mirrors (oracle parity) ----------------------------------
  // Each *Sql builder produces the DuckDB expression computing the exact same
  // value as the Column form above: identical regexes, identical arithmetic
  // order, integer-exact list sums, truncating hex→int64. Note shingle/token
  // SETS may come back in different element order (DuckDB list_distinct is
  // unordered) — callers must only consume them set-wise (min/count/contains).

  def normalizeTextSql(c: String): String =
    s"lower(trim(regexp_replace($c, '\\s+', ' ', 'g')))"

  def tokensSql(c: String): String = s"string_split_regex(trim($c), '\\s+')"

  def tokenCountSql(c: String): String = s"CAST(len(${tokensSql(c)}) AS BIGINT)"

  def bpeishTokenCountSql(c: String): String =
    s"CAST(len(regexp_extract_all($c, '$BpePattern')) AS BIGINT)"

  def punctRatioSql(c: String): String =
    s"(CAST(length(regexp_replace($c, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / " +
      s"CAST(greatest(length($c), 1) AS DOUBLE))"

  private def sqlStringList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  def stopwordRatioSql(c: String): String = {
    val toks = tokensSql(c)
    s"(CAST(len(list_filter($toks, t -> list_contains(${sqlStringList(EnglishStopwords)}, t))) AS DOUBLE) / " +
      s"CAST(greatest(len($toks), 1) AS DOUBLE))"
  }

  def avgWordLenSql(c: String): String = {
    val toks = tokensSql(c)
    s"(CAST(list_sum(list_transform($toks, t -> length(t))) AS DOUBLE) / " +
      s"CAST(greatest(len($toks), 1) AS DOUBLE))"
  }

  def qualityScoreSql(c: String): String =
    s"(0.4 * least(${stopwordRatioSql(c)} * 4.0, 1.0) + " +
      s"0.4 * (1.0 - least(${punctRatioSql(c)} * 5.0, 1.0)) + " +
      s"0.2 * (CASE WHEN ${tokenCountSql(c)} BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END))"

  def languageIdSql(c: String): String = {
    val toks = tokensSql(c)
    def score(markers: Seq[String]) =
      s"CAST(len(list_filter($toks, t -> list_contains(${sqlStringList(markers)}, t))) AS BIGINT)"
    val scores = LangMarkers.map { case (_, m) => score(m) }.mkString("[", ", ", "]")
    val langs = sqlStringList(LangMarkers.map(_._1))
    s"(CASE WHEN list_max($scores) > 0 " +
      s"THEN $langs[list_position($scores, list_max($scores))] ELSE 'und' END)"
  }

  def hash60Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  def docFingerprintSql(c: String): String = s"md5(${normalizeTextSql(c)})"

  def fingerprintBucketSql(c: String): String =
    s"CAST(('0x' || substr(md5(${normalizeTextSql(c)}), 1, 15)) AS BIGINT)"

  def wordShinglesSql(c: String, n: Int): String =
    s"list_distinct(${wordGramsSql(c, n)})"

  def wordGramsSql(c: String, n: Int): String = {
    val toks = tokensSql(normalizeTextSql(c))
    s"list_transform(range(1, greatest(len($toks) - $n, 0) + 2), " +
      s"i -> array_to_string($toks[i:i+${n - 1}], ' '))"
  }

  def dupGramFracSql(c: String, n: Int): String = {
    val g = wordGramsSql(c, n)
    s"CASE WHEN len($g) = 0 THEN 0.0 ELSE 1.0 - " +
      s"CAST(len(list_distinct($g)) AS DOUBLE) / CAST(len($g) AS DOUBLE) END"
  }

  def distinctTokenRatioSql(c: String): String = {
    val toks = tokensSql(normalizeTextSql(c))
    s"CASE WHEN len($toks) = 0 THEN 1.0 ELSE " +
      s"CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE) END"
  }
}

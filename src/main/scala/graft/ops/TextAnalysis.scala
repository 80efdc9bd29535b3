package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library — language ID, quality signals, token
  * counting, fingerprints. Pure codegen'd column expressions: at scale
  * these are scan-local with zero shuffle.
  */
object TextAnalysis {

  def words(text: Column): Column = split(text, " ")

  def wordCount(text: Column): Column = size(words(text))

  def uniqueWordCount(text: Column): Column = size(array_distinct(words(text)))

  /** BPE-ish token estimate: letter runs + digit runs + single symbols. */
  def tokenCount(textCol: String): Column =
    size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  def stopwordCount(textCol: String, stopwords: Seq[String]): Column =
    size(expr(s"filter(split($textCol, ' '), w -> w IN (${stopwords.map("'" + _ + "'").mkString(", ")}))"))

  /** Classic cheap pre-training quality signals. */
  def qualitySignals(textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "is", "in")): Seq[Column] = {
    val text = col(textCol)
    val nWords = wordCount(text).cast("double")
    Seq(
      (stopwordCount(textCol, stopwords).cast("double") / nWords).as("stop_ratio"),
      (uniqueWordCount(text).cast("double") / nWords).as("unique_ratio"),
      ((length(text) - (wordCount(text) - lit(1))).cast("double") / nWords).as("avg_word_len"))
  }

  /** Per-language stopword lists for the n-gram-heuristic language ID. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "de" -> Seq("der", "die", "und", "ein", "das"))

  /** Stopword-hit argmax with a fixed tie-break order (list order). */
  def langId(textCol: String): Column = {
    val scores = langStopwords.map { case (lang, ws) => lang -> stopwordCount(textCol, ws) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) { case (((lang, s), i), rest) =>
      val laterScores = scores.drop(i + 1).map(_._2)
      when(laterScores.foldLeft(lit(true))((acc, o) => acc && s >= o), lang).otherwise(rest)
    }
  }

  /** Content fingerprints (md5: engine-portable, the exact-dedup key). */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))
  def prefixFingerprint(text: Column, n: Int = 64): Column = md5(substring(text, 1, n))

  /** Adjacent word-bigram STRINGS ("w1 w2") of `textCol`, empty for a
    * single-word document. Built as zip_with over two slices rather
    * than `transform(sequence(1, size - 1), ...)`: the sequence form
    * DESCENDS to [1, 0] when size = 1 and `element_at(arr, 0)` then
    * throws in Spark, while the DuckDB mirror `range(1, len)` is simply
    * empty — the slice form is empty there too, matching the oracle.
    * Shared by t06/t08/qf01/qf03 so the guard and tokenization can't
    * diverge between them. */
  def bigramStringsExpr(textCol: String): String =
    s"""zip_with(slice(split($textCol, ' '), 1, size(split($textCol, ' ')) - 1),
       |         slice(split($textCol, ' '), 2, size(split($textCol, ' ')) - 1),
       |         (a, b) -> concat(a, ' ', b))""".stripMargin

  /** Adjacent word-bigram PAIRS (struct w1, w2) — same construction as
    * [[bigramStringsExpr]]. */
  def bigramPairsExpr(textCol: String): String =
    s"""zip_with(slice(split($textCol, ' '), 1, size(split($textCol, ' ')) - 1),
       |         slice(split($textCol, ' '), 2, size(split($textCol, ' ')) - 1),
       |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin

  /** Adjacent word triples, same zip_with-over-slices shape as the
    * bigram builder (and the same single-word/short-doc safety: a doc
    * with < 3 tokens yields an empty array, never a descending
    * sequence). */
  def trigramTriplesExpr(textCol: String): String = {
    val n3 = s"greatest(size(split($textCol, ' ')) - 2, 0)" // <3 tokens -> empty, not a negative slice
    s"""zip_with(zip_with(slice(split($textCol, ' '), 1, $n3),
       |                  slice(split($textCol, ' '), 2, $n3),
       |                  (a, b) -> struct(a AS w1, b AS w2)),
       |         slice(split($textCol, ' '), 3, $n3),
       |         (ab, c) -> struct(ab.w1 AS w1, ab.w2 AS w2, c AS w3))""".stripMargin
  }
}

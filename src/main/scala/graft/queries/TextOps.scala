package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns
import graft.functions.TextFns._

/** Text-analysis query surface over `documents` (SURVEY.md §2 E*).
  *
  * All four ops are map-only scans — no shuffle at any scale; the
  * kernels live in [[graft.functions.TextFns]]. Oracle SQL for the
  * lang-id scores is *generated from the same stopword map* the
  * Spark side uses, so the two can't silently drift.
  */
object TextOps {

  /** DuckDB list literal for a stopword set. */
  private def swList(lang: String): String =
    TextFns.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** E1: per-doc language scores + argmax prediction. The synthetic
    * corpus carries no real language signal (same vocab for every
    * `lang` label), so the oracle pins the scoring arithmetic; the
    * accuracy claim is spec-checked on real-language fixtures. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val scores = langs.map(l => l -> langScore(col("text"), l))
    documents(s, dir)
      .select(col("doc_id") +: scores.map { case (l, c) => c.as(s"s_$l") } :+
        langPredict(scores.map { case (l, _) => l -> col(s"s_$l") }).as("pred_lang"): _*)
  }

  val langIdSql: String = {
    val scoreCols = langs.map { l =>
      s"len(list_filter(toks, t -> list_contains(${swList(l)}, t))) AS s_$l"
    }.mkString(",\n  ")
    val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val pred = langs.map(l => s"WHEN s_$l = m AND m > 0 THEN '$l'").mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
       |  CASE $pred ELSE 'und' END AS pred_lang
       |FROM (
       |  SELECT doc_id, $m AS m, ${langs.map(l => s"s_$l").mkString(", ")} FROM (
       |    SELECT doc_id,
       |  $scoreCols
       |    FROM (SELECT doc_id,
       |            list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
       |          FROM documents)))""".stripMargin
  }

  /** E2: quality scoring — length, punctuation ratio, stopword
    * ratio, mean token length, composite score. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val nTok = greatest(wsTokenCount(col("text")), lit(1))
    val punctRatio = punctCount(col("text")).cast("double") / length(col("text"))
    val stopRatio = langScore(col("text"), "en").cast("double") / nTok
    documents(s, dir).select(
      col("doc_id"),
      wsTokenCount(col("text")).as("n_tok"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stop_ratio"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") / nTok, 4)
        .as("avg_tok_len"),
      round(least(nTok, lit(100)).cast("double") / 100 * (lit(1) - punctRatio), 4)
        .as("quality"))
  }

  val textQualitySql: String =
    s"""SELECT doc_id, n_tok,
       |  round(punct / len, 4) AS punct_ratio,
       |  round(stop_hits / nt, 4) AS stop_ratio,
       |  round(nospace / nt, 4) AS avg_tok_len,
       |  round(least(nt, 100) / 100 * (1 - punct / len), 4) AS quality
       |FROM (
       |  SELECT doc_id,
       |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok,
       |    greatest(len(list_filter(string_split(text, ' '), t -> t <> '')), 1)::DOUBLE AS nt,
       |    length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE AS punct,
       |    length(text)::DOUBLE AS len,
       |    length(regexp_replace(text, ' ', '', 'g'))::DOUBLE AS nospace,
       |    len(list_filter(string_split(lower(text), ' '),
       |        t -> list_contains(${swList("en")}, t)))::DOUBLE AS stop_hits
       |  FROM documents)""".stripMargin

  /** E3: token counting — whitespace tokens vs BPE-ish lexer tokens. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      wsTokenCount(col("text")).as("ws_tokens"),
      reTokenCount(col("text")).as("re_tokens"),
      length(col("text")).as("n_chars_txt"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS re_tokens,
      |  length(text) AS n_chars_txt
      |FROM documents""".stripMargin

  /** E4: rolling-hash fingerprint per doc. No cross-engine hash →
    * rows-only for the driver; semantics are property-tested. */
  def docFingerprintQ(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"), docFingerprint(col("text")).as("fp"))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns

/** Training-set preparation operators (SURVEY.md G8/G9): the steps
  * between "clean corpus" and "tensors" that a 100 TB pipeline runs
  * last — deterministic splits and sequence packing. Both are pure
  * column algebra + windows, map-only or one shuffle, and exactly
  * oracle-able.
  */
object TrainPrep {

  /** G8: deterministic train/val/test split. The split key is an
    * arithmetic hash of doc_id (multiplicative hashing mod 100 —
    * engine-portable, unlike xxhash), so membership is stable across
    * runs, engines, and repartitions: 80/10/10. Emits per-split
    * per-lang counts — the balance check a pipeline actually runs. */
  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    val h = pmod(col("doc_id") * 2654435761L % 1000000007L, lit(100))
    documents(s, dir)
      .withColumn("split",
        when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
  }

  val sampleSplitSql: String =
    """SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
      |  lang, count(*) AS n_docs, sum(n_chars) AS n_chars
      |FROM (SELECT lang, n_chars, (doc_id * 2654435761 % 1000000007) % 100 AS h
      |      FROM documents)
      |GROUP BY 1, 2""".stripMargin

  val SeqLen = 512

  /** G9: sequence packing — docs concatenate greedily (in doc_id
    * order) into fixed-budget training sequences: a running token
    * cumsum assigns each doc to bin floor(cumsum_before / SeqLen).
    * One global-ordering window at verify scale; at 100 TB the same
    * math runs per shard (partitionBy(shard) — packing is
    * shard-local by design, like any real pipeline). Emits per-bin
    * doc counts and token fill. */
  def seqPack(s: SparkSession, dir: String): DataFrame = {
    val toks = documents(s, dir)
      .select(col("doc_id"), TextFns.wsTokenCount(col("text")).cast("long").as("n_tok"))
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("before") / SeqLen))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
  }

  val seqPackSql: String =
    s"""SELECT bin, count(*) AS n_docs, sum(n_tok) AS n_tokens FROM (
       |  SELECT doc_id, n_tok,
       |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $SeqLen AS bin
       |  FROM (SELECT doc_id,
       |          len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
       |        FROM documents))
       |GROUP BY bin""".stripMargin
}

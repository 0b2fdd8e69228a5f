package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Table-maintenance operators (round-3 H-line): MERGE-style
  * change-feed application and snapshot diffing — the mutations a
  * long-lived analytical table takes after initial load (the
  * reference's Postgres table gets UPDATE/DELETE for free; a lake
  * table needs them as operators).
  *
  * The change feed is synthesized DETERMINISTICALLY from the
  * documents table so the oracle can re-derive it: doc_id % 10 == 0
  * are deletes, doc_id % 10 == 7 are updates (text replaced, n_chars
  * recomputed), and one insert per source beyond the current id
  * range. Scale shape: MERGE = one anti-join (deletes) + one
  * key-shuffle LWW (updates) + a union (inserts) — all on the key,
  * no full-table rewrite of untouched rows beyond the join itself.
  */
object Maintenance {

  /** The synthesized change feed: (op, doc_id, text, lang, source,
    * n_chars). */
  private def changes(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val deletes = d.filter(col("doc_id") % 10 === 0)
      .select(lit("delete").as("op"), col("doc_id"),
        lit(null).cast("string").as("text"), lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("source"), lit(null).cast("long").as("n_chars"))
    val updTxt = concat(lit("updated "), col("doc_id").cast("string"))
    val updates = d.filter(col("doc_id") % 10 === 7)
      .select(lit("update").as("op"), col("doc_id"),
        updTxt.as("text"), col("lang"), col("source"), length(updTxt).cast("long").as("n_chars"))
    val maxId = d.agg(max(col("doc_id")).as("mx"))
    val insTxt = concat(lit("inserted for "), col("source"))
    val inserts = d.groupBy(col("source")).agg(min(col("lang")).as("lang"),
        min(col("doc_id")).as("mn"))
      .crossJoin(broadcast(maxId))
      .select(lit("insert").as("op"), (col("mx") + 1 + col("mn")).as("doc_id"),
        insTxt.as("text"), col("lang"), col("source"), length(insTxt).cast("long").as("n_chars"))
    deletes.unionByName(updates).unionByName(inserts)
  }

  private val changesSql: String =
    """ch AS (
      |  SELECT 'delete' AS op, doc_id, NULL AS text, NULL AS lang,
      |         NULL AS source, NULL::BIGINT AS n_chars
      |  FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT 'update', doc_id, 'updated ' || CAST(doc_id AS VARCHAR),
      |         lang, source, length('updated ' || CAST(doc_id AS VARCHAR))::BIGINT
      |  FROM documents WHERE doc_id % 10 = 7
      |  UNION ALL
      |  SELECT 'insert', (SELECT max(doc_id) FROM documents) + 1 + min(doc_id),
      |         'inserted for ' || source, min(lang), source,
      |         length('inserted for ' || source)::BIGINT
      |  FROM documents GROUP BY source)""".stripMargin

  /** H17: MERGE INTO semantics — apply the change feed to the base
    * table: DELETE removes, UPDATE replaces (LWW on the key: the
    * change row wins), INSERT appends. Emits the resulting table. */
  def mergeDelete(s: SparkSession, dir: String): DataFrame = {
    val base = documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
    val ch = changes(s, dir)
    val deletes = ch.filter(col("op") === "delete").select(col("doc_id"))
    val upserts = ch.filter(col("op") =!= "delete").drop("op")
    // change rows outrank base rows on the same key (ver = 1 beats 0)
    val merged = graft.ingest.Upsert.lastWriteWins(
      base.withColumn("__ver", lit(0)).unionByName(upserts.withColumn("__ver", lit(1))),
      Seq("doc_id"), Seq(col("__ver").desc)).drop("__ver")
    merged.join(deletes, Seq("doc_id"), "left_anti")
  }

  private val mergedCte: String =
    """merged AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM (
      |    SELECT doc_id, text, lang, source, n_chars, ver,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY ver DESC) AS rn
      |    FROM (
      |      SELECT doc_id, text, lang, source, n_chars, 1 AS ver FROM ch WHERE op <> 'delete'
      |      UNION ALL
      |      SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT), 0 FROM documents))
      |  WHERE rn = 1
      |    AND doc_id NOT IN (SELECT doc_id FROM ch WHERE op = 'delete'))""".stripMargin

  val mergeDeleteSql: String =
    s"""WITH $changesSql,
       |$mergedCte
       |SELECT doc_id, text, lang, source, n_chars FROM merged""".stripMargin

  /** H18: snapshot diff — compare the base table and the merged
    * result (the audit a pipeline runs after every maintenance
    * window): per-source counts of added / removed / changed /
    * unchanged rows. One full-outer join on the key. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = documents(s, dir)
      .select(col("doc_id"), col("source"), col("text").as("t0"))
    val after = mergeDelete(s, dir)
      .select(col("doc_id"), col("source").as("src1"), col("text").as("t1"))
    base.join(after, Seq("doc_id"), "full_outer")
      .select(coalesce(col("source"), col("src1")).as("source"),
        when(col("t0").isNull, "added")
          .when(col("t1").isNull, "removed")
          .when(col("t0") =!= col("t1"), "changed")
          .otherwise("unchanged").as("change"))
      .groupBy(col("source"), col("change"))
      .agg(count(lit(1)).as("n"))
  }

  val snapshotDiffSql: String =
    s"""WITH $changesSql,
       |$mergedCte
       |SELECT coalesce(b.source, a.source) AS source,
       |  CASE WHEN b.doc_id IS NULL THEN 'added'
       |       WHEN a.doc_id IS NULL THEN 'removed'
       |       WHEN b.text <> a.text THEN 'changed'
       |       ELSE 'unchanged' END AS change,
       |  count(*) AS n
       |FROM documents b FULL OUTER JOIN merged a ON b.doc_id = a.doc_id
       |GROUP BY 1, 2""".stripMargin
}

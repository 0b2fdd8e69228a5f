package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-write-wins dedup — the Spark-side equivalent of the
  * reference's `ON CONFLICT (uuid) DO UPDATE` upsert path
  * (utils.go:99-105): of all rows sharing a key, keep the one
  * ranked first by `version` columns (e.g. created_at DESC, then a
  * unique tiebreaker for determinism).
  *
  * Scale: exactly one shuffle on the key. AQE handles skewed keys;
  * for a continuous pipeline the same transform runs per
  * micro-batch inside foreachBatch before the sink MERGE.
  */
object Upsert {
  def lastWriteWins(df: DataFrame, keys: Seq[String], version: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Maintenance

/** K107: STREAMING INCREMENTAL VIEW MAINTENANCE — K101's delta
  * algebra under K73's staged-wave transport: the change feed
  * arrives as three file-dropped waves (deletes, then updates, then
  * inserts — proving cross-batch accumulation, not one lucky batch),
  * and each micro-batch REFRESHES the maintained per-(source, lang)
  * aggregate view by folding signed deltas into it — the base table
  * is never re-aggregated after the initial view build.
  *
  * Per batch, the K101 shape verbatim: old rows for delete/update
  * keys come from ONE broadcast-keyed fetch against the base (the
  * serving store's index lookup — see [[Maintenance.ivmAgg]]'s IO
  * note), additions are map-side projections of the change rows, and
  * the batch's delta aggregate carries |touched-group| rows. The
  * maintained view itself lives driver-side in a concurrent map —
  * GROUP-cardinality (sources × langs, tens of rows), the one
  * cardinality class the repo allows off-cluster; a deployment keys
  * the same merge into its serving store. count/sum are
  * self-maintainable, so no batch ever rescans a base group.
  *
  * The oracle is the FULL recompute over the merged table
  * ([[Maintenance.ivmAggSql]]) — hash equality of a three-batch
  * incremental maintenance against the from-scratch aggregate is the
  * IVM correctness contract, now proven ACROSS batches. Delta
  * folding is commutative (integer sums), so wave order cannot
  * matter; the spec also asserts ≥ 3 data batches were consumed.
  */
object StreamIvm {

  /** Data micro-batches consumed by the last [[run]] (spec probe). */
  @volatile private[graft] var dataBatches: Long = -1L

  def run(s: SparkSession, dir: String): DataFrame = {
    val ch = Maintenance.changes(s, dir)
    val view = new scala.collection.concurrent.TrieMap[(String, String), (Long, Long)]()
    s.read.parquet(Maintenance.ensureIvmView(s, dir)).collect().foreach { r =>
      view.put((r.getAs[String]("source"), r.getAs[String]("lang")),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars")))
    }

    val base = Files.createTempDirectory(Paths.get("target"), "stream_ivm")
    val watch = Files.createDirectory(base.resolve("changes"))
    val q = s.readStream.schema(ch.schema)
      .option("maxFilesPerTrigger", "1000000")
      .parquet(watch.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val touched = batch.filter(col("op") =!= "insert").select(col("doc_id"))
        val removals = graft.Tables.documents(s, dir)
          .join(broadcast(touched), Seq("doc_id"))
          .select(col("source"), col("lang"),
            lit(-1L).as("dn"), (col("n_chars").cast("long") * -1L).as("dc"))
        val additions = batch.filter(col("op") =!= "delete")
          .select(col("source"), col("lang"), lit(1L).as("dn"),
            col("n_chars").as("dc"))
        // |touched-group| rows — the per-batch refresh payload
        removals.unionByName(additions)
          .groupBy(col("source"), col("lang"))
          .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
          .collect().foreach { r =>
            val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
            val (n0, c0) = view.getOrElse(k, (0L, 0L))
            view.put(k, (n0 + r.getAs[Long]("dn"), c0 + r.getAs[Long]("dc")))
          }
        ()
      }
      .start()
    try {
      Seq("delete", "update", "insert").zipWithIndex.foreach { case (op, i) =>
        Staging.stage(ch.filter(col("op") === op), watch.toString, s"wave_$i")
        q.processAllAvailable()
      }
      dataBatches = q.recentProgress.count(_.numInputRows > 0).toLong
    } finally q.stop()
    Staging.clearDir(watch)
    Files.deleteIfExists(base)
    val rows = view.toSeq.collect { case ((src, lang), (n, c)) if n > 0 =>
      Row(src, lang, n, c)
    }
    val p = s.conf.get("spark.sql.shuffle.partitions").toInt
    s.createDataFrame(s.sparkContext.parallelize(rows, p),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_docs",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_chars",
          org.apache.spark.sql.types.LongType))))
  }

  /** Streamed maintenance must equal the full recompute. */
  val sql: String = Maintenance.ivmAggSql
}

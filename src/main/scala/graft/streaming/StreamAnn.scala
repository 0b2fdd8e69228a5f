package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** K108: STREAMING SIMILARITY SEARCH — the ANN family's missing
  * stream-side path: query vectors ARRIVE (two file-dropped waves of
  * probe embeddings) and each micro-batch answers exact top-[[Ann.K]]
  * cosine against the STATIC corpus — the online-retrieval shape
  * (a query service, embedding-drift probes against a frozen index)
  * where the corpus is the big side and the per-trigger probe set is
  * small.
  *
  * Per batch this is the K42 stream-static discipline applied to
  * search: the batch's probes broadcast into ONE corpus scan
  * ([[Ann.bruteforceFor]], the exact kernel D1 itself runs on), the
  * two-phase rank keeps per-reducer state at K rows, and results are
  * probe×K-sized — the only thing that ever leaves the cluster. No
  * watermark and no state store: search is stateless per trigger, so
  * the streaming cost is exactly the batch kernel per wave. At scale
  * the same plan swaps [[Ann.bruteforceFor]] for the IVF/LSH legs
  * (D2/D3) unchanged — candidate generation is a property of the
  * index side, not of the transport.
  *
  * All probes are processed exactly once across the waves and the
  * scoring doubles are the kernel's own, so the union of the batch
  * results equals the batch D1 run — the oracle IS
  * [[Ann.annBruteforceSql]]. The spec asserts ≥ 2 data batches (the
  * result really accumulated across triggers).
  */
object StreamAnn {

  /** Data micro-batches consumed by the last [[run]] (spec probe). */
  @volatile private[graft] var dataBatches: Long = -1L

  def run(s: SparkSession, dir: String): DataFrame = {
    val probeRows = graft.Tables.embeddings(s, dir)
      .filter(col("vec_id") < Ann.NumQueries)
      .select(col("vec_id"), col("embedding"))
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Row]()

    val base = Files.createTempDirectory(Paths.get("target"), "stream_ann")
    val watch = Files.createDirectory(base.resolve("probes"))
    val q = s.readStream.schema(probeRows.schema)
      .option("maxFilesPerTrigger", "1000000")
      .parquet(watch.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // probes×K rows — report-sized, the service's response payload
        Ann.bruteforceFor(s, dir, Ann.asProbes(batch))
          .collect().foreach(results.add)
        ()
      }
      .start()
    try {
      Staging.stage(probeRows.filter(col("vec_id") % 2 === 0), watch.toString, "wave_a")
      q.processAllAvailable()
      Staging.stage(probeRows.filter(col("vec_id") % 2 === 1), watch.toString, "wave_b")
      q.processAllAvailable()
      dataBatches = q.recentProgress.count(_.numInputRows > 0).toLong
    } finally q.stop()
    Staging.clearDir(watch)
    Files.deleteIfExists(base)
    import scala.jdk.CollectionConverters._
    val p = s.conf.get("spark.sql.shuffle.partitions").toInt
    s.createDataFrame(
      s.sparkContext.parallelize(results.asScala.toSeq, p),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("nb",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rnk",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cos",
          org.apache.spark.sql.types.DoubleType))))
  }

  /** Streamed search must equal the batch exact kernel. */
  val sql: String = Ann.annBruteforceSql
}

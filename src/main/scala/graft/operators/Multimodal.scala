package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal plumbing (SURVEY.md §2 F*): media as opaque `binary`
  * payloads + typed metadata structs. The container has no
  * image/audio codecs, so the decode KERNEL is a deterministic stub
  * (first-bytes feature vector) — but everything Spark-side is the
  * real shape: binary columns flow through scans and shuffles
  * untouched, decode iterates partition batches through a typed
  * Dataset (the `mapInPandas`/`mapPartitions` batch pattern), and
  * frame sampling is pure codegen'd column algebra over the bytes.
  * Swapping the stub for a JNI/codec call changes one function.
  *
  * Payloads here are the documents' UTF-8 bytes (ASCII corpus), which
  * keeps every op oracle-able: DuckDB recomputes the same features
  * from the text.
  */
object Multimodal {

  /** Deterministic mime assignment — a stand-in for real sniffing. */
  private def mimeCol = when(col("doc_id") % 3 === 0, "image/png")
    .when(col("doc_id") % 3 === 1, "audio/wav")
    .otherwise("video/mp4")

  /** F1 building block: documents → (doc_id, payload: binary,
    * meta: struct(mime, n_bytes, source)). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        mimeCol.as("mime"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** F1: schema + stats — bytes under management per mime type. */
  def mmSchema(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy(col("meta.mime").as("mime"))
      .agg(count(lit(1)).as("n_items"), sum(col("meta.n_bytes")).as("total_bytes"))

  val mmSchemaSql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |            ELSE 'video/mp4' END AS mime,
      |  count(*) AS n_items, sum(strlen(text))::BIGINT AS total_bytes
      |FROM documents GROUP BY 1""".stripMargin

  /** K-line: content-hash dedup of the binary payloads — the CAS
    * (content-addressed storage) report an image/audio pipeline runs
    * before re-encoding anything: per mime type, how many payloads,
    * how many unique blobs, and the bytes a dedup pass reclaims.
    * Hashes are md5 over the RAW binary column (the payload never
    * decodes); two groupBys — (mime, hash) then mime — both
    * map-side-combining aggregates, so at 100 TB the shuffle carries
    * 16-byte keys + counters, never blobs. */
  def mmDedup(s: SparkSession, dir: String): DataFrame = {
    val m = mediaTable(s, dir).select(col("doc_id"), col("payload"),
      col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
    m.groupBy(col("mime"), md5(col("payload")).as("h"))
      // identical payloads have identical sizes: min() IS the size
      .agg(count(lit(1)).as("copies"),
        sum(col("n_bytes")).as("bytes_all"), min(col("n_bytes")).as("bytes_one"))
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n_unique"),
        sum(col("copies")).as("n_payloads"),
        sum(col("bytes_all") - col("bytes_one")).as("dup_bytes"))
  }

  val mmDedupSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |         ELSE 'video/mp4' END AS mime,
      |    strlen(text) AS n_bytes, md5(text) AS h
      |  FROM documents),
      |g AS (
      |  SELECT mime, h, count(*) AS copies,
      |    sum(n_bytes)::BIGINT AS bytes_all, min(n_bytes) AS bytes_one
      |  FROM m GROUP BY 1, 2)
      |SELECT mime, count(*) AS n_unique, sum(copies)::BIGINT AS n_payloads,
      |  sum(bytes_all - bytes_one)::BIGINT AS dup_bytes
      |FROM g GROUP BY 1""".stripMargin

  /** One decoded record — the typed batch-output schema. */
  case class Decoded(doc_id: Long, mime: String, n_bytes: Int, features: Array[Double])

  /** The STUB decode kernel: first 8 payload bytes scaled to [0,1].
    * This is the one function a real deployment replaces with a
    * codec call; signature (bytes in, features out) is the real one. */
  def decodeStub(payload: Array[Byte]): Array[Double] =
    payload.take(8).map(b => (b & 0xff) / 255.0)

  /** F2: decode via partition-batch iteration through a typed
    * Dataset — the Spark-side plumbing (encoders, schema,
    * partitioning) is production-shaped; only the kernel is fake. */
  def mmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir)
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
    val decoded: Dataset[Decoded] = media.mapPartitions { batch =>
      batch.map { case (id, payload, mime) =>
        Decoded(id, mime, payload.length, decodeStub(payload))
      }
    }
    decoded.select(
      (col("doc_id") +: col("mime") +: col("n_bytes") +:
        (0 until 8).map(i => round(element_at(col("features"), i + 1), 4).as(s"f$i"))): _*)
  }

  val mmDecodeSql: String = {
    val fs = (0 until 8)
      .map(i => s"round(ascii(substr(text, ${i + 1}, 1)) / 255.0, 4) AS f$i")
      .mkString(",\n  ")
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
       |       ELSE 'video/mp4' END AS mime,
       |  strlen(text) AS n_bytes,
       |  $fs
       |FROM documents""".stripMargin
  }

  val FrameBytes = 32
  val FrameStride = 4

  /** F3: deterministic frame/chunk sampling — split the payload into
    * [[FrameBytes]]-byte frames, keep every [[FrameStride]]-th.
    * Pure column algebra (sequence → filter → explode → substring):
    * codegen'd, map-only, no kernel at all. */
  def mmFramesample(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"),
        explode(filter(
          sequence(lit(0), floor((length(col("payload")) - 1) / FrameBytes).cast("int")),
          i => i % FrameStride === 0)).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        length(col("payload").substr(col("frame_idx") * FrameBytes + 1, lit(FrameBytes)))
          .as("frame_len"),
        ascii(decode(col("payload").substr(col("frame_idx") * FrameBytes + 1, lit(1)), "UTF-8"))
          .as("first_byte"))

  val mmFramesampleSql: String =
    s"""SELECT doc_id, frame_idx,
       |  strlen(substr(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS frame_len,
       |  ascii(substr(text, frame_idx * $FrameBytes + 1, 1)) AS first_byte
       |FROM (
       |  SELECT doc_id, text, unnest(range(0, (strlen(text) - 1) // $FrameBytes + 1)) AS frame_idx
       |  FROM documents)
       |WHERE frame_idx % $FrameStride = 0""".stripMargin
}

package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._
import graft.ingest.{Fetch, FetchManifest}
import graft.sinks.JdbcUpsertSink

class FetchSpec extends SparkSpec {

  import spark.implicits._

  private def manifestOf(urls: String*) = urls.toDF("url")

  test("permanent failure (403-analog) is not retried") {
    val f: String => Fetch.Result =
      _ => Fetch.Permanent("forbidden or does not exist")
    val rows = Fetch.fetchArchives(manifestOf("u1"), "url",
      maxAttempts = 5, backoffMs = 1, fetcher = f).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "permanent_fail")
    assert(rows(0).getInt(2) == 1)
    assert(rows(0).getString(5) == "forbidden or does not exist")
  }

  test("transient failures retry with backoff until success") {
    // fails twice, then succeeds — executor-side state via static map
    val f: String => Fetch.Result = { url =>
      val n = FetchSpecState.counts.merge(url, 1, (a, b) => a + b)
      if (n <= 2) Fetch.Transient(s"flaky $n")
      else Fetch.Ok(Array[Byte](1, 2, 3))
    }
    val rows = Fetch.fetchArchives(manifestOf("flaky://a"), "url",
      maxAttempts = 5, backoffMs = 1, fetcher = f).collect()
    assert(rows(0).getString(1) == "fetched")
    assert(rows(0).getInt(2) == 3)
    assert(rows(0).getLong(3) == 3L)
  }

  test("transient exhaustion stops at maxAttempts with transient_fail") {
    val f: String => Fetch.Result = _ => Fetch.Transient("always down")
    val rows = Fetch.fetchArchives(manifestOf("down://x"), "url",
      maxAttempts = 3, backoffMs = 1, fetcher = f).collect()
    assert(rows(0).getString(1) == "transient_fail")
    assert(rows(0).getInt(2) == 3)
  }

  test("file fetcher: missing file is permanent, real file returns bytes") {
    val dir = java.nio.file.Files.createTempDirectory("fetchspec")
    val p = dir.resolve("ok.bin")
    java.nio.file.Files.write(p, Array[Byte](7, 8))
    assert(Fetch.fileFetcher(s"file://$p") match {
      case Fetch.Ok(b) => b.sameElements(Array[Byte](7, 8)); case _ => false
    })
    assert(Fetch.fileFetcher(s"file://$dir/missing.bin").isInstanceOf[Fetch.Permanent])
  }

  test("fetch_ingest: statuses, row counts and byte sizes match the real files") {
    val rows = SparkEntry.queries("fetch_ingest")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet ==
      Set("part_0.csv", "part_1.csv", "part_2.csv", "part_404.csv"))
    assert(rows("part_404.csv") == (("permanent_fail", 1, 0L, 0L)))
    val base = java.nio.file.Paths.get(new java.net.URI(
      FetchManifest.manifest(spark, sf).collect()(0).getString(0))).getParent
    val nDocs = Tables.documents(spark, sf).count()
    (0 until 3).foreach { part =>
      val (status, _, nRows, nBytes) = rows(s"part_$part.csv")
      assert(status == "fetched")
      assert(nBytes == java.nio.file.Files.size(base.resolve(s"part_$part.csv")))
      assert(nRows == Tables.documents(spark, sf)
        .filter(col("doc_id") % 3 === part).count())
    }
    assert((0 until 3).map(p => rows(s"part_$p.csv")._3).sum == nDocs)
  }

  test("table_sizes matches the filesystem byte-for-byte") {
    val rows = SparkEntry.queries("table_sizes")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq("lineitem", "orders", "events", "documents").foreach { t =>
      val f = new java.io.File(s"$sf/$t.parquet")
      val (nRows, nBytes) = rows(s"$t.parquet")
      assert(nBytes == f.length(), s"$t bytes")
      assert(nRows == spark.read.parquet(f.getPath).count(), s"$t rows")
    }
  }

  test("duplicate-key classifier: sqlstate, message substring, cause chain") {
    val direct = new java.sql.SQLException("dup", "23505")
    val msg = new RuntimeException("ERROR: duplicate key (SQLSTATE 23505)")
    val wrapped = new RuntimeException("outer", direct)
    val other = new java.sql.SQLException("syntax", "42601")
    assert(JdbcUpsertSink.isDuplicateKey(direct))
    assert(JdbcUpsertSink.isDuplicateKey(msg))
    assert(JdbcUpsertSink.isDuplicateKey(wrapped))
    assert(!JdbcUpsertSink.isDuplicateKey(other))
    assert(!JdbcUpsertSink.isDuplicateKey(new RuntimeException("plain")))
  }
}

/** Executor-side attempt counter for the flaky-fetcher test (local
  * mode: same JVM, so a static map is visible to the "executor"). */
object FetchSpecState {
  val counts = new ConcurrentHashMap[String, Integer]()
}

package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  *
  * Each query is forced with a `noop`-format write — full
  * materialization of every output column, unlike count(), under
  * which Catalyst prunes the projected expressions and map-only
  * queries measure as bare scan time. One-time fixtures (bucketed
  * tables, partitioned events, the zipcsv archive, the corpus LSH
  * band index) are built BEFORE the timed loop so timings measure
  * plans, not fixture IO. A query that throws is reported in a
  * separate "failed" list (timing -1), never as a normal-looking
  * number.
  *
  * Every query runs THREE times: one cold pass (`queries`/`value` —
  * comparable with earlier rounds) and two warm passes reported as
  * their minimum (`queries_warm`/`warm_total`). Cold numbers on a
  * loaded box carry 3-30× first-run Janino/JIT compile noise on the
  * codegen-heavy queries (measured round 5: same commit, 262 s idle
  * vs 681 s loaded, the gap concentrated on exactly those queries);
  * the warm minimum is the steady-state plan cost, so regressions in
  * the PLAN are visible even when the driver box is busy. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configured(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"), cpus)
    // warm the session: JVM + parquet footer caches, tiny plan
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // one-time fixtures outside the timed path
    operators.ScalePatterns.ensureBucketed(spark, sfDir)
    operators.ScalePatterns.ensurePartitioned(spark, sfDir)
    operators.ScalePatterns.ensureDrift(spark, sfDir)
    operators.ScalePatterns.compactFiles(spark, sfDir) // builds the compacted layout
    ingest.ZipFixture.ensure(spark, sfDir)
    ingest.CsvBadFixture.ensure(spark, sfDir)
    ingest.FetchFixture.ensure(spark, sfDir)
    ingest.DecisionFixture.ensure(spark, sfDir)
    operators.Dedup.ensureCorpusIndex(spark, sfDir) // dedup_incremental reads it
    operators.Dedup.ensureClusterLabels(spark, sfDir) // dedup_apply reads it
    operators.CorpusClean.ensureBpeTokens(spark, sfDir) // bpe_apply reads it
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
          } catch { case scala.util.control.NonFatal(_) => false }
        // drop caches a query persisted for its own internal reuse:
        // timings stay independent and executor memory stays flat
        // across the 120+ query loop
        spark.sharedState.cacheManager.clearCache()
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val cold = once()
      val warm =
        if (cold < 0) -1.0
        else math.min(once(), once()) match { case w if w < 0 => -1.0; case w => w }
      (name, cold, warm)
    }
    // 3-decimal seconds keep the line short. The headline numbers go
    // out TWICE: a compact summary-only line FIRST (short enough that
    // no capture truncates it), then the full per-query line — both
    // valid instances of the one-JSON-line contract, so a parser
    // reading either the first or the last line gets totals. The full
    // line is ALSO written to bench_last.json (committed with the
    // round snapshot) so stdout truncation can never lose the data.
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    def qjson(sel: ((String, Double, Double)) => Double) =
      results.map(t => "\"" + t._1 + "\":" + r3(sel(t))).mkString("{", ",", "}")
    val failed = results.collect { case (k, c, _) if c < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = r3(results.collect { case (_, c, _) if c >= 0 => c }.sum)
    val warmTotal = r3(results.collect { case (_, _, w) if w >= 0 => w }.sum)
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","warm_total":$warmTotal,"n_queries":${results.size},"n_failed":${results.count(_._2 < 0)},"sf":"$sfDir","failed":$failed}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","warm_total":$warmTotal,"n_queries":${results.size},"n_failed":${results.count(_._2 < 0)},"sf":"$sfDir","failed":$failed,"queries":${qjson(_._2)},"queries_warm":${qjson(_._3)}}"""
    println(summary)
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), line + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}

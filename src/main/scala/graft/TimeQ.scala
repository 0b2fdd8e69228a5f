package graft
import org.apache.spark.sql.SparkSession

/** Standalone single-query timer for perf triage: runs ONE named
  * SparkEntry query N times with the bench's exact measurement
  * convention (noop-format write, cache clear between passes) on an
  * otherwise idle session, so a "regression" seen mid-bench can be
  * separated from suite-JVM/box noise (the round-7 lesson: mid-bench
  * numbers run 1.5-2x slower than the same plan standalone).
  *
  * Usage: runMain graft.TimeQ <name[,name...]> [sfDir] [passes]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configured(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-timeq"), cpus)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $name%s ${ts.map(t => f"$t%.3f").mkString(" ")}%s")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape probe for perf triage (the verify skill's "drop a
  * temporary main" step, made permanent): prints the executed plan of
  * each named SparkEntry query at sf0.001 — grep for
  * BroadcastHashJoin / PushedFilters / Exchange counts.
  *
  * Usage: runMain graft.PlanProbe <name> [name...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    for (n <- args) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

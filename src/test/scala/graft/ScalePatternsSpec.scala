package graft

import org.apache.spark.sql.functions._
import graft.operators.ScalePatterns

class ScalePatternsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("skew_agg: salted two-phase result equals direct groupBy") {
    val salted = run("skew_agg").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), graft.Portable.pround(sum("value"), 4).as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct)
  }

  test("bucketed_join: SMJ over bucketed scans, no shuffle or sort before the join") {
    val df = run("bucketed_join")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"))
    // the only hash exchange is the final small agg — the join inputs
    // read co-located buckets directly
    val shuffles = "Exchange hashpartitioning\\((?:l_orderkey|o_orderkey)".r.findAllIn(p).length
    assert(shuffles == 0, s"bucketed join shuffled its inputs:\n$p")
    assert(df.agg(sum("n_lines")).collect()(0).getLong(0) ==
      Tables.lineitem(spark, sf).count())
  }

  test("pruned_scan: only the 3 filtered date partitions are read") {
    val df = run("pruned_scan")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters:"), "no partition filter in scan")
    // inputFiles reflects the pre-pruning index; the physical scan's
    // selected partitions are what actually gets read
    val top = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = top.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val parts = scans.head.selectedPartitions.partitionCount
    assert(parts == 3, s"scan reads $parts partitions, expected 3")
  }

  test("join_size_est: the Σ cl·cr estimate is EXACT for the equi-join it predicts") {
    import org.apache.spark.sql.functions.col
    val est = run("join_size_est").collect()
      .map(r => r.getAs[Int]("nationkey") -> r.getAs[Long]("est_pairs")).toMap
    // execute the join the estimator refused to run, count per key
    val actual = Tables.customer(spark, sf)
      .join(Tables.supplier(spark, sf),
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    est.foreach { case (k, e) =>
      assert(actual(k) == e, s"nation $k: est $e != actual ${actual(k)}")
    }
    // and the estimator's plan contains no join of the two fact tables
    val p = SparkEntry.queries("join_size_est")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), "estimate must join histograms, not tables")
  }

  test("encoding_advisor: runs/distincts replay a local recount; clustered key picks RLE") {
    val rows = run("encoding_advisor").collect()
    assert(rows.map(_.getAs[String]("column")).toSet == ScalePatterns.EncCols.toSet)
    val byCol = rows.map(r => r.getAs[String]("column") -> r).toMap
    val li = Tables.lineitem(spark, sf)
    // l_orderkey is constant within its own cluster: runs = n_orders,
    // and ≥2 lines/order on average makes it the RLE pick
    val ok = byCol("l_orderkey")
    assert(ok.getAs[Long]("n_runs") == li.select("l_orderkey").distinct().count())
    assert(ok.getAs[String]("pick") == "rle")
    // local recount of l_returnflag runs under the pinned total order
    val local = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"),
        // NTZ timestamp → ISO string: lexical order = temporal order
        col("l_shipdate").cast("string"), col("l_suppkey"), col("l_quantity"))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getDouble(6))))
      .sortBy { case (okey, ord) => (okey, ord) }
    val runs = local.zipWithIndex.count { case ((okey, ord), i) =>
      i == 0 || local(i - 1)._1 != okey || local(i - 1)._2._2 != ord._2
    }
    val rf = byCol("l_returnflag")
    assert(rf.getAs[Long]("n_runs") == runs.toLong, "l_returnflag run recount")
    assert(rf.getAs[Long]("n_distinct") ==
      li.select(count_distinct(col("l_returnflag"))).head().getLong(0))
    rows.foreach { r =>
      val (nRows, nRuns, nd) = (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("n_distinct"))
      assert(nd <= nRuns && nRuns <= nRows, s"${r.getAs[String]("column")} bounds")
      assert(r.getAs[Long]("avg_run_len_pm") == nRows * 1000000L / nRuns)
      val expectPick = if (nRuns * 2 <= nRows) "rle"
        else if (nd * 50 <= nRows) "dict" else "plain"
      assert(r.getAs[String]("pick") == expectPick)
    }
  }
}

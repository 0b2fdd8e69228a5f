package graft

import org.apache.spark.sql.functions._
import graft.operators.{PageRankIter, Sketches}

/** Specs for the round-4 graph/sketch additions. */
class GraphSketchSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("pagerank_iter: matches a from-first-principles two-step recount") {
    val pairs = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().collect()
      .map(r => (s"c${r.getLong(0)}", s"s${r.getLong(1)}"))
    val edges = pairs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = deg.keySet
    def step(rank: Map[String, Long]): Map[String, Long] = {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (src, _) => rank(src) / deg(src) }.sum).toMap
      nodes.map(n => n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    val r0 = nodes.map(_ -> PageRankIter.RankScale).toMap
    val r2 = step(step(r0))
    val expected = r2.toSeq.sortBy { case (n, r) => (-r, n) }.take(PageRankIter.TopK)
    val got = run("pagerank_iter").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("kmv_merge: merged per-day sketches estimate EXACTLY like the direct sketch") {
    val r = run("kmv_merge").head()
    assert(r.getAs[Double]("est_merged") == r.getAs[Double]("est_direct"),
      "sketch merge must be lossless")
    val exact = Tables.events(spark, sf)
      .select(count_distinct(col("user_id"))).head().getLong(0)
    assert(r.getAs[Long]("n_exact") == exact)
    // the estimate is within 3 standard errors (se ≈ n/sqrt(K))
    val est = r.getAs[Double]("est_merged")
    assert(math.abs(est - exact) <= 3.0 * exact / math.sqrt(Sketches.K) + 1,
      s"est $est vs exact $exact")
  }

  test("key_skew_stats: matches a per-key recount") {
    val r = run("key_skew_stats").head()
    val counts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    assert(r.getAs[Long]("n_keys") == counts.length.toLong)
    assert(r.getAs[Long]("n_rows") == counts.sum)
    assert(r.getAs[Long]("max_cnt") == counts.max)
    val avg = counts.sum.toDouble / counts.length
    assert(math.abs(r.getAs[Double]("avg_cnt") - avg) < 1e-3)
    assert(math.abs(r.getAs[Double]("skew_ratio") - counts.max / avg) < 1e-3)
  }
}

package graft

class AnnSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def neighbors(name: String): Map[Long, Seq[Long]] =
    run(name).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk"), r.getAs[Long]("nb")))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }

  private def recallAtK(approx: Map[Long, Seq[Long]], exact: Map[Long, Seq[Long]]): Double = {
    val hits = exact.map { case (q, nbs) =>
      approx.getOrElse(q, Seq.empty).toSet.intersect(nbs.toSet).size
    }.sum
    hits.toDouble / exact.values.map(_.size).sum
  }

  test("ann_bruteforce: k ranked neighbors per query, no self-matches") {
    val rows = run("ann_bruteforce").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == Ann.NumQueries)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to Ann.K))
      assert(rs.forall(_.getAs[Long]("nb") != q))
      val cs = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann_lsh: recall@5 vs bruteforce above floor, subset property") {
    val r = recallAtK(neighbors("ann_lsh"), neighbors("ann_bruteforce"))
    assert(r >= 0.5, s"recall@5 $r")
  }

  test("ann_ivf: recall@5 vs bruteforce above floor") {
    val r = recallAtK(neighbors("ann_ivf"), neighbors("ann_bruteforce"))
    assert(r >= 0.4, s"recall@5 $r")
  }

  // alias so the object reference compiles from the test package
  private object Ann { val NumQueries = graft.operators.Ann.NumQueries; val K = graft.operators.Ann.K }
}

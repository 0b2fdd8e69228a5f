package graft

/** Brute-force local replays of the decorrelated TPC-H shapes in
  * [[graft.queries.Correlated]]: each test recomputes the correlated
  * definition row-at-a-time on the collected sf0.001 tables and
  * demands exact agreement with the distributed plan.
  */
class CorrelatedSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val li = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3).toLong))

  test("q18_big_orders: exactly the orders above the quantity threshold") {
    val perOrder = li.groupBy(_._1).map { case (k, v) => k -> v.map(_._4).sum }
    val expected = perOrder.filter(_._2 > 250)
    val got = run("q18_big_orders").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("total_qty")).toMap
    assert(got == expected)
    // the threshold prunes hard (the point of the HAVING subquery)
    assert(got.size < perOrder.size / 10)
  }

  test("q19_disjunct: disjunction result equals the sum of its disjoint branches") {
    // branches are brand-disjoint, so per-branch totals must add up
    val all = run("q19_disjunct").collect()(0)
    val branches = Seq(
      ("Brand#3", 1, 10, 1, 20), ("Brand#14", 11, 25, 10, 30),
      ("Brand#22", 26, 50, 20, 40)).map { case (b, s0, s1, q0, q1) =>
      Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf),
          org.apache.spark.sql.functions.col("l_partkey") ===
            org.apache.spark.sql.functions.col("p_partkey"))
        .filter(s"p_brand = '$b' AND p_size BETWEEN $s0 AND $s1 " +
          s"AND l_quantity BETWEEN $q0 AND $q1")
        .count()
    }
    assert(all.getAs[Long]("n_items") == branches.sum)
    assert(all.getAs[Long]("n_items") > 0, "predicate selected nothing — vacuous")
    assert(all.getAs[Double]("revenue") > 0)
  }

  test("q20_dominant_supplier: share test replays cross-multiplied, sole suppliers out") {
    val ps = li.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.map(_._4).sum }
    val tot = ps.groupBy(_._1._1).map { case (p, v) =>
      p -> (v.values.sum, v.size)
    }
    val expected = ps.toSeq.filter { case ((p, _), sq) =>
      val (tq, ns) = tot(p)
      ns >= 2 && BigInt(sq) * ns * 2 > BigInt(tq) * 3
    }.groupBy(_._1._2).map { case (s, v) => s -> v.size.toLong }
    val got = run("q20_dominant_supplier").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("n_parts_dominated"))
      .toMap
    assert(got == expected)
    assert(got.nonEmpty, "dominance cut selected nothing — vacuous")
  }

  test("q21_late_solo: credited supplier is the unique late one in a multi-supplier order") {
    val odate = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
    val ship = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2)))
    val late = ship.groupBy(t => (t._1, t._2)).map { case ((o, su), v) =>
      (o, su) -> v.exists(_._3.isAfter(odate(o).plusDays(180)))
    }
    val perOrder = late.groupBy(_._1._1).map { case (o, v) =>
      o -> (v.size, v.values.count(identity))
    }
    val expected = late.toSeq.collect {
      case ((o, su), true) if perOrder(o)._1 >= 2 && perOrder(o)._2 == 1 => su
    }.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    val got = run("q21_late_solo").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("n_orders")).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q2_min_bal: per-part minimum kept with ALL ties, only small parts") {
    val sizes = Tables.part(spark, sf).select("p_partkey", "p_size").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bal = Tables.supplier(spark, sf).select("s_suppkey", "s_acctbal").collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100 + 0.5).toLong).toMap
    val pairs = li.collect { case (_, p, su, _) if sizes(p) <= 10 => (p, su) }.distinct
    val minQ = pairs.groupBy(_._1).map { case (p, v) =>
      p -> v.map(t => bal(t._2)).min
    }
    val expected = pairs.filter { case (p, su) => bal(su) == minQ(p) }.toSet
    val got = run("q2_min_bal").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("s_suppkey")))
    assert(got.toSet == expected)
    assert(got.length == got.distinct.length)
    // at least one part must carry a genuine tie for the test to bite,
    // or the equality-join-back degenerates to an argmin
    val hasTie = expected.groupBy(_._1).exists(_._2.size >= 2)
    assert(hasTie || expected.size == minQ.size)
  }

  test("q16_supplier_cnt: low-balance suppliers excluded from every class count") {
    val excludedSupp = Tables.supplier(spark, sf).select("s_suppkey", "s_acctbal")
      .collect()
      .filter(r => math.floor(r.getDouble(1) * 100 + 0.5).toLong < 100000)
      .map(_.getLong(0)).toSet
    assert(excludedSupp.nonEmpty, "no excluded suppliers — NOT IN is vacuous")
    val cls = Tables.part(spark, sf).select("p_partkey", "p_brand", "p_size")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val expected = li.collect {
      case (_, p, su, _) if !excludedSupp(su) => (cls(p), su)
    }.distinct.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val got = run("q16_supplier_cnt").collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Int]("p_size")) ->
        r.getAs[Long]("supplier_cnt")).toMap
    assert(got == expected)
  }
}

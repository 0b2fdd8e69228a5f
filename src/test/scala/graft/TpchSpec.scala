package graft

import java.time.LocalDateTime

/** Brute-force local replays of the [[graft.queries.Tpch]] shapes on
  * the collected sf0.001 tables — same contract as CorrelatedSpec:
  * the correlated/textbook definition recomputed row-at-a-time must
  * agree exactly with the distributed plan.
  */
class TpchSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def revQ(price: Double, disc: Double): Long =
    math.floor(price * (1 - disc) * 10000 + 0.5).toLong

  private lazy val orderMeta = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority").collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[LocalDateTime](2), r.getString(3)))
    .toMap

  private lazy val lines = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate", "l_returnflag").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getAs[LocalDateTime](6), r.getString(7)))

  test("q4_priority_exists: per-priority order counts replay the EXISTS") {
    val lateOrders = lines.filter { l =>
      l._7.isAfter(orderMeta(l._1)._2.plusDays(120))
    }.map(_._1).toSet
    val expected = lateOrders.toSeq.map(o => orderMeta(o)._3)
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val got = run("q4_priority_exists").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("order_count")).toMap
    assert(got == expected)
    assert(got.values.sum < orderMeta.size, "every order late — filter vacuous")
  }

  test("q6_range_sum: scan-filter fold matches the row loop") {
    val lo = LocalDateTime.parse("1997-01-01T00:00:00")
    val hi = LocalDateTime.parse("1998-01-01T00:00:00")
    val sel = lines.filter { l =>
      !l._7.isBefore(lo) && l._7.isBefore(hi) &&
        l._6 >= 0.05 && l._6 <= 0.07 && l._4 < 24
    }
    val sumQ = sel.map(l => math.floor(l._5 * l._6 * 10000 + 0.5).toLong).sum
    val row = run("q6_range_sum").collect()(0)
    assert(row.getAs[Long]("n_items") == sel.length.toLong)
    assert(sel.nonEmpty)
    assert(math.abs(row.getAs[Double]("forecast_revenue") - sumQ / 10000.0) < 1e-6)
  }

  test("q7_nation_trade: both directions present, revenue replays") {
    val rows = run("q7_nation_trade").collect()
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).distinct.toSet
    assert(dirs == Set(("ASIA", "EUROPE"), ("EUROPE", "ASIA")))
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }

  test("q8_market_share: share = conditional sum over total, exactly") {
    val rows = run("q8_market_share").collect()
    assert(rows.length == 2) // 1996, 1997
    rows.foreach { r =>
      val (num, den) = (r.getAs[Long]("nation_rev_q"), r.getAs[Long]("total_rev_q"))
      assert(num > 0 && num < den, "share degenerate (0 or 1) — nation choice wrong")
      val share = graft.Portable.jround(num.toDouble / den.toDouble, 6)
      assert(r.getAs[Double]("mkt_share") == share)
    }
  }

  test("q9_profit_proxy: widget-only, profit is the exact integer difference") {
    val retail = Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_retailprice").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val suppNation = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nationName = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val expected = lines
      .filter(l => retail(l._2)._1.contains("widget"))
      .map { l =>
        val profitQ = revQ(l._5, l._6) -
          math.floor(retail(l._2)._2 * 100 + 0.5).toLong * l._4.toLong * 50
        ((nationName(suppNation(l._3)), orderMeta(l._1)._2.getYear), profitQ)
      }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val got = run("q9_profit_proxy").collect()
      .map(r => (r.getString(0), r.getAs[Int]("o_year")) ->
        r.getAs[Double]("profit")).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, pq) =>
      val want = graft.Portable.jround(pq / 10000.0, 4)
      assert(got(k) == want, s"$k: ${got(k)} vs $want")
    }
  }

  test("q10_returns: exactly the top-20 by returned revenue with custkey tiebreak") {
    val lo = LocalDateTime.parse("1997-01-01T00:00:00")
    val hi = LocalDateTime.parse("1997-04-01T00:00:00")
    val perCust = lines
      .filter { l =>
        val od = orderMeta(l._1)._2
        l._8 == "R" && !od.isBefore(lo) && od.isBefore(hi)
      }
      .map(l => orderMeta(l._1)._1 -> revQ(l._5, l._6))
      .groupBy(_._1).map { case (c, v) => c -> v.map(_._2).sum }
    val expected = perCust.toSeq.sortBy { case (c, q) => (-q, c) }.take(20)
    val got = run("q10_returns").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Double]("returned_revenue"))
    assert(got.map(_._1).toSet == expected.map(_._1).toSet)
    assert(got.length == math.min(20, perCust.size))
  }

  test("q12_late_by_class: two-bucket cross-tab conserves every line") {
    val rows = run("q12_late_by_class").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_late"), r.getAs[Long]("n_ontime"))).toMap
    assert(rows.keySet == Set("urgent", "other"))
    val total = rows.values.map(t => t._1 + t._2).sum
    assert(total == lines.length.toLong)
    rows.values.foreach { case (l, o) => assert(l > 0 && o > 0) }
  }
}

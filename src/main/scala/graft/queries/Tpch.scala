package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Portable.pround

/** The rest of the TPC-H query-shape family (SURVEY.md §2 K55+) —
  * with [[Analytics]] (Q1/Q3/Q5/Q11/Q13/Q14/Q15/Q17/Q22) and
  * [[Correlated]] (Q2/Q16/Q18/Q19/Q20/Q21) this completes all 22
  * shapes, adapted where the synthetic schema lacks a column
  * (no partsupp, no ship mode, no commit/receipt dates — each
  * adaptation documented on its operator). Conventions as everywhere:
  * money in ×10⁴ BIGINT before any sum, shares as exact-integer
  * numerator/denominator with ONE display division, dims broadcast,
  * consecutive aggregates keyed to reuse a single shuffle.
  */
object Tpch {

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private def revQ: Column = floor(revenue * 10000 + lit(0.5)).cast("long")

  /** K55: TPC-H Q4 shape — EXISTS against the fact ("orders where at
    * least one line shipped very late"), counted by priority. The
    * correlated EXISTS decorrelates to a per-order MAX(flag) on the
    * orders⋈lineitem shuffle — the priority tag rides the same
    * aggregate (hash(orderkey) clusters it), so exactly one wide
    * shuffle feeds the 5-row priority rollup. Lateness is an integer
    * day-interval compare on both engines (>120 days after order
    * date — the schema has no commitdate; documented adaptation). */
  def q4PriorityExists(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      .join(orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 120 DAYS"), 1).otherwise(0)).as("late"))
      .filter(col("late") === 1)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  val q4PriorityExistsSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 120 DAY)
      |GROUP BY 1""".stripMargin

  /** K56: TPC-H Q6 shape — the pure scan-filter-sum forecast query:
    * one year of shipments, a discount band, small quantities, no
    * join at all. Its whole point at scale is that EVERY predicate
    * reaches the parquet scan (shipdate min/max prunes row groups,
    * discount/quantity filter vectorized) and the revenue fold is a
    * single map-side partial sum of ×10⁴ BIGINT — the cheapest
    * possible full-table pass, and the yardstick the fancier shapes
    * are judged against. */
  def q6RangeSum(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_items"),
        pround(sum(floor(col("l_extendedprice") * col("l_discount") * 10000
          + lit(0.5)).cast("long")) / 10000.0, 4).as("forecast_revenue"))

  val q6RangeSumSql: String =
    """SELECT count(*) AS n_items,
      |  floor((sum(floor(l_extendedprice * l_discount * 10000 + 0.5)::BIGINT) / 10000.0) * 10000.0 + 0.5) / 10000.0 AS forecast_revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** K57: TPC-H Q7 shape — BILATERAL trade flows between two named
    * geographies: supplier side resolved through one dim chain,
    * customer side through the other, kept only for the ordered pairs
    * (A,B)/(B,A), by ship year. Adapted to REGION granularity — a
    * nation pair is vacuous at the smallest SF, where ten suppliers
    * spread over 25 nations (measured 0 rows); region pairs carry
    * flow at every scale. Both geography-filtered dim chains
    * broadcast (each prunes to 2/5 of its dim BEFORE the fact sees
    * it); the only wide work is lineitem⋈orders on the order key. */
  def q7NationTrade(s: SparkSession, dir: String): DataFrame = {
    def geo(keyCol: String, out: String) =
      nation(s, dir)
        .join(broadcast(region(s, dir).filter(col("r_name").isin("ASIA", "EUROPE"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as(keyCol), col("r_name").as(out))
    val suppG = supplier(s, dir)
      .join(geo("nk1", "supp_region"), col("s_nationkey") === col("nk1"))
      .select(col("s_suppkey"), col("supp_region"))
    val custG = customer(s, dir)
      .join(geo("nk2", "cust_region"), col("c_nationkey") === col("nk2"))
      .select(col("c_custkey"), col("cust_region"))
    lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), revQ.as("rev_q"))
      .join(broadcast(suppG), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custG), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_region") =!= col("cust_region"))
      .groupBy(col("supp_region"), col("cust_region"), col("l_year"))
      .agg(pround(sum(col("rev_q")) / 10000.0, 4).as("revenue"))
  }

  val q7NationTradeSql: String =
    """SELECT supp_region, cust_region, l_year,
      |  floor((sum(rev_q) / 10000.0) * 10000.0 + 0.5) / 10000.0 AS revenue
      |FROM (
      |  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
      |    year(l_shipdate) AS l_year,
      |    floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT AS rev_q
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |  WHERE r1.r_name IN ('ASIA', 'EUROPE')
      |    AND r2.r_name IN ('ASIA', 'EUROPE')
      |    AND r1.r_name <> r2.r_name
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01') t
      |GROUP BY 1, 2, 3""".stripMargin

  /** K58: TPC-H Q8 shape — MARKET SHARE: of all revenue flowing to
    * ASIA-region customers per order year, the fraction supplied by
    * one nation (NATION_12 — chosen because it holds suppliers at
    * every SF; most nations are supplier-empty at the smallest). The share is kept as exact-integer numerator (the
    * conditional ×10⁴ sum — a CASE inside the aggregate, not a
    * second scan) over denominator, with ONE display division — the
    * engines divide identical BIGINTs, so the float result is
    * bit-identical. Customer-side region filter broadcasts; the
    * supplier-nation tag is a broadcast lookup the conditional sum
    * reads. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaCust = customer(s, dir)
      .join(nation(s, dir).filter(col("n_regionkey") === 2),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = supplier(s, dir)
      .join(nation(s, dir).select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), revQ.as("rev_q"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_12", col("rev_q"))
          .otherwise(0L)).as("nation_rev_q"),
        sum(col("rev_q")).as("total_rev_q"))
      .select(col("o_year"), col("nation_rev_q"), col("total_rev_q"),
        pround(col("nation_rev_q") / col("total_rev_q"), 6).as("mkt_share"))
  }

  val q8MarketShareSql: String =
    """SELECT o_year,
      |  sum(CASE WHEN supp_nation = 'NATION_12' THEN rev_q ELSE 0 END)::BIGINT AS nation_rev_q,
      |  sum(rev_q)::BIGINT AS total_rev_q,
      |  floor((sum(CASE WHEN supp_nation = 'NATION_12' THEN rev_q ELSE 0 END)::BIGINT
      |        / sum(rev_q)::BIGINT) * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
      |FROM (
      |  SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
      |    floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT AS rev_q
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE n2.n_regionkey = 2
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01') t
      |GROUP BY 1""".stripMargin

  /** K59: TPC-H Q9 shape — PRODUCT-LINE PROFIT by supplier nation and
    * year. The schema has no partsupp/supplycost, so cost is imputed
    * at half retail (cost_q = 50·cents(p_retailprice)·qty — exact
    * BIGINT at the shared ×10⁴ scale; the adaptation is documented
    * here and in the oracle). Part (name-filtered — Q9's LIKE) and
    * supplier→nation both broadcast; profit sums as the DIFFERENCE
    * of two exact integers so negative-profit groups are exact, not
    * cancellation noise. */
  def q9ProfitProxy(s: SparkSession, dir: String): DataFrame = {
    val costQ = floor(col("p_retailprice") * 100 + lit(0.5)).cast("long") *
      col("l_quantity").cast("long") * 50L
    val parts = part(s, dir).filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val suppN = supplier(s, dir)
      .join(nation(s, dir).select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    lineitem(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, dir).select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(pround(sum(revQ - costQ) / 10000.0, 4).as("profit"))
  }

  val q9ProfitProxySql: String =
    """SELECT n_name, o_year,
      |  floor((sum(profit_q) / 10000.0) * 10000.0 + 0.5) / 10000.0 AS profit
      |FROM (
      |  SELECT n_name, year(o_orderdate) AS o_year,
      |    floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT
      |      - floor(p_retailprice * 100 + 0.5)::BIGINT
      |        * CAST(l_quantity AS BIGINT) * 50 AS profit_q
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  WHERE p_name LIKE '%widget%') t
      |GROUP BY 1, 2""".stripMargin

  /** K60: TPC-H Q10 shape — RETURNED-REVENUE top customers for one
    * quarter: returnflag='R' lines of a quarter's orders, summed per
    * customer, top 20. The returnflag + order-date filters prune
    * BEFORE the order-key shuffle; the top-20 is the classic
    * TakeOrderedAndProject (per-partition heads → one 20-row merge,
    * never a global sort), made deterministic across engines by the
    * exact-BIGINT revenue with custkey as tiebreak. */
  def q10Returns(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revQ.as("rev_q"))
      .join(orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_q")).as("rev_q"))
      .join(broadcast(customer(s, dir).select(col("c_custkey"), col("c_name"),
        col("c_acctbal"))), col("o_custkey") === col("c_custkey"))
      .orderBy(col("rev_q").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        pround(col("rev_q") / 10000.0, 4).as("returned_revenue"),
        pround(col("c_acctbal"), 2).as("acctbal"))

  val q10ReturnsSql: String =
    """SELECT c_custkey, c_name,
      |  floor((rev_q / 10000.0) * 10000.0 + 0.5) / 10000.0 AS returned_revenue,
      |  floor((c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal
      |FROM (
      |  SELECT o_custkey,
      |    sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT)::BIGINT AS rev_q
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-04-01'
      |  GROUP BY 1) r
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY rev_q DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** K61: TPC-H Q12 shape — the TWO-BUCKET lateness cross-tab: per
    * priority class (URGENT+HIGH vs the rest — Q12's split; the
    * schema has no ship mode, documented adaptation), how many lines
    * shipped late vs on time (>90 days after order date). The whole
    * cross-tab is conditional sums inside ONE aggregate over the
    * order-key join — the canonical "pivot without a pivot"
    * two-phase fold, output bounded at 2 rows. */
  def q12LateByClass(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      .join(orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("prio_class",
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "urgent")
          .otherwise("other"))
      .withColumn("late", (col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("long"))
      .groupBy(col("prio_class"))
      .agg(sum(col("late")).as("n_late"),
        sum(lit(1L) - col("late")).as("n_ontime"))

  val q12LateByClassSql: String =
    """SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |            THEN 'urgent' ELSE 'other' END AS prio_class,
      |  sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |           THEN 1 ELSE 0 END)::BIGINT AS n_late,
      |  sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |           THEN 0 ELSE 1 END)::BIGINT AS n_ontime
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Portable.pround

/** The remaining TPC-H CORRELATED-SUBQUERY shapes (SURVEY.md §2 K49+),
  * each decorrelated the way a 100 TB plan must run them: the
  * correlated predicate becomes one aggregate on the fact's join key,
  * reused in place, never a per-row re-scan. The DuckDB oracles keep
  * the textbook correlated form (IN / NOT EXISTS / scalar subquery)
  * so the hash gate cross-checks the decorrelation itself, not a
  * restatement of the same plan.
  *
  * House conventions throughout: money and balances quantized to
  * BIGINT (×10⁴ revenue, ×10² balances) before any aggregate or
  * compare, fractions tested CROSS-MULTIPLIED so no float threshold
  * ever exists, dimension joins broadcast, fact aggregates keyed so
  * consecutive stages reuse one shuffle.
  */
object Correlated {

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private def qtyL: Column = col("l_quantity").cast("long")

  /** K49: TPC-H Q18 shape — the IN (GROUP BY … HAVING) large-order
    * filter. The subquery decorrelates to the per-order quantity
    * aggregate itself: one shuffle on the order key with map-side
    * partials, filtered to the >250 tail (~1.4% of orders — the
    * per-order sum distribution is SF-invariant, so a constant cut
    * selects the same fraction at every scale), and only that tail
    * joins orders and the broadcast customer dim. Quantities are
    * integral by generator contract, summed as BIGINT so the
    * threshold compare is exact in both engines. */
  def q18BigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(qtyL).as("total_qty"))
      .filter(col("total_qty") > 250)
    big
      .join(orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, dir).select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_date"), col("total_qty"))
  }

  val q18BigOrdersSql: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
      |  (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem
      |   WHERE l_orderkey = o_orderkey)::BIGINT AS total_qty
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 250)""".stripMargin

  /** K50: TPC-H Q19 shape — DISJUNCTIVE join predicate (three
    * brand/size/quantity conjunct triples OR'd together). The scan
    * envelopes are hoisted: part pre-filters to the UNION of the
    * brand/size conditions and lineitem to the overall quantity
    * range 1-40 (Q19's "implied predicate" trick — both reach the
    * parquet scans as pushed filters, so the join sees only
    * candidate rows), the exact disjunction then runs as one
    * row-level filter AFTER the broadcast part join. Revenue sums in
    * ×10⁴ BIGINT; emitted with the qualifying row count so the
    * result is never a bare float. */
  def q19Disjunct(s: SparkSession, dir: String): DataFrame = {
    val revQ = floor(revenue * 10000 + lit(0.5)).cast("long")
    val p = part(s, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
      .filter((col("p_brand") === "Brand#3" && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(11, 25)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(26, 50)))
    lineitem(s, dir)
      .filter(col("l_quantity").between(1, 40))
      .select(col("l_partkey"), col("l_quantity"), revQ.as("rev_q"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter((col("p_brand") === "Brand#3" && col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#14" && col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#22" && col("l_quantity").between(20, 40)))
      .agg(count(lit(1)).as("n_items"),
        pround(sum(col("rev_q")) / 10000.0, 4).as("revenue"))
  }

  val q19DisjunctSql: String =
    """SELECT count(*) AS n_items,
      |  floor((sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT) / 10000.0) * 10000.0 + 0.5) / 10000.0 AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1  AND 10 AND l_quantity BETWEEN 1  AND 20)
      |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** K51: TPC-H Q20 shape — the NESTED-AGGREGATE share filter, here
    * "dominant supplier": a supplier shipping >1.5× the MEAN
    * supplier's share of a multi-supplier part's quantity (an
    * absolute >50% cut is vacuous on this uniform corpus — measured
    * 0 rows at every SF — while the relative-to-mean cut selects a
    * stable tail at every scale, the part_value_share convention).
    * The correlated share-of-total subquery decorrelates into the
    * per (part, supplier) aggregate plus a part-keyed WINDOW over it
    * — not a second aggregate joined back, which would reference the
    * first frame twice and (Spark materializes nothing) re-scan and
    * re-shuffle the full fact once per reference. The window form
    * scans lineitem ONCE; the only exchanges after the map-side
    * combined pair aggregate move the already-tiny pair frame.
    * Dominance is the cross-multiplied test
    * 2·sq·n_supp > 3·tq in DECIMAL(38,0): no float share is ever
    * computed, and the product can't overflow BIGINT at 100 TB
    * quantities (the burst_detect lesson). Sole-supplier parts are
    * excluded (n_supp ≥ 2) because their dominance is vacuous. */
  def q20DominantSupplier(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(qtyL).as("sq"))
      .withColumn("tq", sum(col("sq")).over(w))
      .withColumn("n_supp", count(lit(1)).over(w))
      .filter(col("n_supp") >= 2 &&
        d38(col("sq")) * d38(col("n_supp")) * 2 > d38(col("tq")) * 3)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts_dominated"))
      .join(broadcast(supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts_dominated"))
  }

  val q20DominantSupplierSql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS sq
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_suppkey, s_name, count(*) AS n_parts_dominated
      |FROM ps JOIN supplier ON l_suppkey = s_suppkey
      |WHERE sq::DECIMAL(38,0)
      |      * (SELECT count(*) FROM ps i WHERE i.l_partkey = ps.l_partkey)
      |      * 2
      |    > (SELECT sum(sq) FROM ps i WHERE i.l_partkey = ps.l_partkey)::DECIMAL(38,0)
      |      * 3
      |  AND 2 <= (SELECT count(*) FROM ps i WHERE i.l_partkey = ps.l_partkey)
      |GROUP BY 1, 2""".stripMargin

  /** K52: TPC-H Q21 shape — the EXISTS / NOT-EXISTS pair ("the one
    * supplier who held up the order"): multi-supplier orders where
    * exactly ONE supplier shipped late (>180 days after the order
    * date), credited to that supplier. Both correlated quantifiers
    * decorrelate into counts on ONE order-keyed chain: orders⋈lineitem
    * shuffles once on the order key, the per (order, supplier) late
    * flag reuses that partitioning, and the per-order supplier/late
    * counts are an order-keyed WINDOW over the flag frame (a second
    * aggregate joined back would re-run the whole join chain per
    * reference — the q20 lesson). The filter
    * n_supp ≥ 2 AND n_late = 1 IS the exists/not-exists pair; only
    * the final 100-row supplier rollup reshuffles. */
  def q21LateSolo(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
    lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 180 DAYS"), 1).otherwise(0)).as("late"))
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("late")).over(w))
      .filter(col("late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_orders"))
      .join(broadcast(supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_orders"))
  }

  val q21LateSoloSql: String =
    """WITH ls AS (
      |  SELECT l_orderkey, l_suppkey,
      |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY
      |             THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)
      |SELECT s_suppkey, s_name, count(*) AS n_orders
      |FROM ls l1 JOIN supplier ON l_suppkey = s_suppkey
      |WHERE l1.late = 1
      |  AND EXISTS (SELECT 1 FROM ls l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM ls l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.late = 1)
      |GROUP BY 1, 2""".stripMargin

  /** K53: TPC-H Q2 shape — the CORRELATED-MIN supplier pick: for each
    * small part (p_size ≤ 10, a pushed dim filter standing in for
    * Q2's region/type cut), the supplier(s) of MINIMUM account
    * balance among those who actually shipped it. The correlated
    * `= (SELECT min …)` decorrelates into a per-part min WINDOW over
    * the distinct ship pairs with an equality filter; ties are kept,
    * exactly as the correlated form keeps them, because balances
    * compare as ×10² BIGINT — a float min would make tie membership
    * engine-dependent. The
    * part filter broadcasts INTO the pair extraction, so the distinct
    * runs on the pruned fact, not the full one. */
  def q2MinBalSupplier(s: SparkSession, dir: String): DataFrame = {
    val balQ = floor(col("s_acctbal") * 100 + lit(0.5)).cast("long")
    val smallParts = part(s, dir).filter(col("p_size") <= 10)
      .select(col("p_partkey"), col("p_size"))
    val pairs = lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_size"), col("l_suppkey"))
      .distinct()
    val supp = broadcast(supplier(s, dir)
      .select(col("s_suppkey"), col("s_name"), balQ.as("bal_q")))
    // per-part min + tie-keeping as ONE part-keyed window chain (a
    // min-aggregate joined back would reference the pair frame twice
    // and re-derive it from the fact per reference — the q20 lesson)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
    pairs.join(supp, col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_q", min(col("bal_q")).over(w))
      .filter(col("bal_q") === col("min_q"))
      .select(col("p_partkey"), col("p_size"), col("s_suppkey"), col("s_name"),
        pround(col("bal_q") / 100.0, 2).as("acctbal"))
  }

  val q2MinBalSupplierSql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT p_partkey, p_size, l_suppkey
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_size <= 10),
      |wb AS (
      |  SELECT p_partkey, p_size, s_suppkey, s_name,
      |    floor(s_acctbal * 100 + 0.5)::BIGINT AS bal_q
      |  FROM pairs JOIN supplier ON l_suppkey = s_suppkey)
      |SELECT p_partkey, p_size, s_suppkey, s_name,
      |  floor((bal_q / 100.0) * 100.0 + 0.5) / 100.0 AS acctbal
      |FROM wb w1
      |WHERE bal_q = (SELECT min(bal_q) FROM wb w2
      |               WHERE w2.p_partkey = w1.p_partkey)""".stripMargin

  /** K54: TPC-H Q16 shape — supplier-count-per-part-class with a
    * NOT IN exclusion: distinct suppliers per (brand, size) among
    * parts they shipped, excluding low-balance suppliers
    * (s_acctbal < 1000 — Q16's complaint-supplier NOT IN; a < 0 cut
    * is vacuous at the smallest SF where all ten suppliers are
    * positive, while this one excludes a real handful at every
    * scale). The NOT IN
    * set is a ~handful of keys → a BROADCAST anti join on the fact
    * BEFORE anything widens; the distinct count is Spark's standard
    * two-phase expansion (exact, not a sketch — the class alphabet
    * bounds the output at |brands|×|sizes| rows, and each class's
    * distinct set is supplier-bounded, so no group can blow memory
    * at any SF). */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val balQ = floor(col("s_acctbal") * 100 + lit(0.5)).cast("long")
    val excluded = supplier(s, dir).filter(balQ < 100000).select(col("s_suppkey"))
    lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16SupplierCntSql: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_suppkey NOT IN (
      |  SELECT s_suppkey FROM supplier
      |  WHERE floor(s_acctbal * 100 + 0.5)::BIGINT < 100000)
      |GROUP BY 1, 2""".stripMargin
}

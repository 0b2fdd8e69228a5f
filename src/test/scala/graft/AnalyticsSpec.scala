package graft

import org.apache.spark.sql.Row

class AnalyticsSpec extends SparkSpec {

  test("q1_agg groups by flag/status and sums") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    val schema = rows.head.schema.fieldNames.toSeq
    assert(schema == Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "sum_charge", "avg_qty", "avg_disc", "count_order"))
    // group keys are unique
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    // count_order sums to the filtered row count
    val expected = Tables.lineitem(spark, sf)
      .filter("l_shipdate <= timestamp'1998-09-02 00:00:00'").count()
    assert(rows.map(_.getLong(8)).sum == expected)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries key with an oracle has matching column sets are aliased") {
    // Each oracle-able query must declare SQL; keys must be a subset.
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

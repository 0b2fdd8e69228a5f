package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainPrep

class TrainPrepSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sample_split: deterministic, exhaustive, roughly 80/10/10") {
    val out = run("sample_split").collect()
    val bySplit = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = Tables.documents(spark, sf).count()
    assert(bySplit.values.sum == total)
    assert(bySplit.keySet == Set("train", "val", "test"))
    val trainFrac = bySplit("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // deterministic: same result twice
    val again = run("sample_split").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(again == bySplit)
  }

  test("seq_pack: bins contiguous from 0, tokens conserved, fill near budget") {
    val rows = run("seq_pack").orderBy("bin").collect()
    val bins = rows.map(_.getLong(0))
    assert(bins.head == 0 && bins.sameElements(bins.head to bins.last))
    val totalTok = rows.map(_.getLong(2)).sum
    val expected = Tables.documents(spark, sf)
      .select(sum(graft.functions.TextFns.wsTokenCount(col("text")).cast("long")))
      .collect()(0).getLong(0)
    assert(totalTok == expected)
    // every bin except the last holds at least the budget boundary:
    // a doc lands in bin k iff its preceding cumsum is in [512k, 512k+512)
    assert(rows.init.forall(_.getLong(2) > 0))
  }
}

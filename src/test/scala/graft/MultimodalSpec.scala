package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("mm_schema: payload bytes survive the binary column round-trip") {
    val total = run("mm_schema").agg(sum("total_bytes")).collect()(0).getLong(0)
    val expected = Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(total == expected) // ASCII corpus: chars == bytes
    assert(run("mm_schema").count() == 3) // three mime buckets
  }

  test("decodeStub: deterministic, bounded features") {
    val f = Multimodal.decodeStub("Hello!!!".getBytes("UTF-8"))
    assert(f.length == 8)
    assert(f.sameElements(Multimodal.decodeStub("Hello!!!".getBytes("UTF-8"))))
    assert(f.forall(v => v >= 0 && v <= 1))
    assert(math.abs(f(0) - 'H'.toInt / 255.0) < 1e-12)
  }

  test("mm_decode: one row per doc, features present") {
    val out = run("mm_decode")
    assert(out.count() == Tables.documents(spark, sf).count())
    val r = out.orderBy("doc_id").collect()(0)
    assert((0 until 8).forall(i => r.getAs[Double](s"f$i") >= 0))
  }

  test("mm_framesample: strided frames, full frames except possibly last") {
    val rows = run("mm_framesample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % Multimodal.FrameStride == 0)
      assert(r.getAs[Int]("frame_len") <= Multimodal.FrameBytes)
    }
    // every doc contributes its frame 0
    val docsWithFrame0 = rows.count(_.getAs[Int]("frame_idx") == 0)
    assert(docsWithFrame0 == Tables.documents(spark, sf).count())
  }
}

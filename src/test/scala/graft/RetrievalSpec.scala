package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {

  private def fused = SparkEntry.queries("rank_fusion")(spark, sf)

  test("rank_fusion: FusedK rows, query doc excluded, every row from >=1 leg") {
    val rows = fused.collect()
    assert(rows.length == Retrieval.FusedK)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") != Retrieval.QVec.toLong)
      val lex = r.getAs[Long]("lex_rank"); val vec = r.getAs[Long]("vec_rank")
      assert(lex > 0 || vec > 0, s"row with no leg: $r")
      assert(lex <= Retrieval.RfDepth && vec <= Retrieval.RfDepth)
    }
  }

  test("rank_fusion: rrf_q is the exact integer RRF of the reported ranks") {
    fused.collect().foreach { r =>
      val lex = r.getAs[Long]("lex_rank"); val vec = r.getAs[Long]("vec_rank")
      val expect =
        (if (lex > 0) Retrieval.RrfScale / (Retrieval.RrfK + lex) else 0L) +
        (if (vec > 0) Retrieval.RrfScale / (Retrieval.RrfK + vec) else 0L)
      assert(r.getAs[Long]("rrf_q") == expect, s"rrf mismatch: $r")
    }
  }

  test("rank_fusion: leg ranks are distinct within each leg") {
    val rows = fused.collect()
    val lex = rows.map(_.getAs[Long]("lex_rank")).filter(_ > 0)
    val vec = rows.map(_.getAs[Long]("vec_rank")).filter(_ > 0)
    assert(lex.distinct.length == lex.length)
    assert(vec.distinct.length == vec.length)
  }

  test("rank_fusion: vec leg rank-1 equals the local argmax cosine vs the query vector") {
    // local replay of the semantic leg on the raw embeddings —
    // the same round-then-order contract as the operator
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toMap
    val q = embs(Retrieval.QVec.toLong)
    val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    def cos(v: Array[Float]): Double = {
      val dot = q.indices.map(i => q(i).toDouble * v(i).toDouble).sum
      dot / (qn * math.sqrt(v.map(x => x.toDouble * x.toDouble).sum))
    }
    val best = embs.toSeq.filter(_._1 != Retrieval.QVec.toLong)
      .map { case (id, v) => (id, Portable.jround(cos(v), 4)) }
      .minBy { case (id, c) => (-c, id) }._1
    val rank1 = fused.filter(col("vec_rank") === 1L).collect()
    // rank-1 of the vec leg survives fusion only if its fused score
    // clears the cut; when present it must be the local argmax
    rank1.foreach(r => assert(r.getAs[Long]("doc_id") == best))
    assert(rank1.length <= 1)
  }
}

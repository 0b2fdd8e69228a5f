package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Portable.pround
import graft.functions.VecFns
import graft.queries.TextOps

/** Hybrid-retrieval rank fusion (SURVEY.md §2 K109) — the RAG-stack
  * consumer that ties the text family (G10 BM25) to the vector family
  * (D1 exact cosine): retrieve top-[[RfDepth]] candidates per leg for
  * one query (keyword terms for the lexical leg, a query embedding
  * for the semantic leg), then fuse with Reciprocal Rank Fusion
  * (Cormack et al., SIGIR'09): score(d) = Σ_legs 1/(k + rank_leg(d)).
  *
  * Engine-portability: RRF contributions are EXACT INTEGERS —
  * [[RrfScale]] div (k + rank) in BIGINT on both engines (the
  * cross-multiplied-threshold convention) — so the fused order and
  * the hash never touch a float; leg ranks order by the ×10⁴-rounded
  * leg scores with doc_id tiebreak, making the candidate cuts
  * deterministic too.
  *
  * Scale: per-leg retrieval is the indexable stage — at 100 TB the
  * lexical leg reads the persisted inverted index (K5 build_index)
  * and the vector leg swaps to IVF/PQ (D3/K72) exactly as H7→K1
  * swaps kNN legs; this operator's exact legs are the oracle-able
  * baselines (the D1 contract). Fusion itself is candidate-sized:
  * a 2×[[RfDepth]]-row union, one rank window partitioned by leg
  * (≤ [[RfDepth]] rows per partition), one group-by-doc pivot, and a
  * TakeOrderedAndProject cut — nothing after the legs scales with the
  * corpus. Each leg's own cut plans as TakeOrderedAndProject
  * (per-partition heaps), not a global sort.
  */
object Retrieval {

  /** Candidate depth per retrieval leg. */
  val RfDepth = 50
  /** RRF smoothing constant (the standard k = 60). */
  val RrfK = 60
  /** Integer RRF scale: contribution = RrfScale div (RrfK + rank). */
  val RrfScale = 1000000000L
  /** Fused result size. */
  val FusedK = 20
  /** The query: [[TextOps.Bm25Query]] terms lexically; this vector's
    * embedding semantically (its doc is excluded from both legs). */
  val QVec = 0

  /** K109: RRF fusion of the BM25 and cosine top-[[RfDepth]] lists. */
  def rankFusion(s: SparkSession, dir: String): DataFrame = {
    val lexTop = TextOps.bm25Scored(s, dir)
      .filter(col("doc_id") =!= QVec)
      .orderBy(col("score").desc, col("doc_id")).limit(RfDepth)
      .select(col("doc_id"), col("score"), lit("lex").as("leg"))
    val q = embeddings(s, dir).filter(col("vec_id") === QVec)
      .select(col("embedding").as("qe"),
        VecFns.norm(col("embedding")).as("qn"))
    // query-norm multiplies FIRST (qn * ‖e‖) — the oracle's operand
    // order, so the cosine doubles agree bit-for-bit
    val vecTop = embeddings(s, dir).filter(col("vec_id") =!= QVec)
      .crossJoin(broadcast(q)) // 1-row scalar frame
      .select(col("vec_id").as("doc_id"),
        pround(VecFns.dot(col("qe"), col("embedding")) /
          (col("qn") * VecFns.norm(col("embedding"))), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(RfDepth)
      .select(col("doc_id"), col("score"), lit("vec").as("leg"))
    // one pass: rank within each leg, then pivot ranks per doc — the
    // union is evaluated once (a per-leg re-filter would re-run the
    // corpus-scale BM25 plan twice)
    val ranked = lexTop.unionByName(vecTop)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("leg"))
          .orderBy(col("score").desc, col("doc_id"))))
    ranked.groupBy(col("doc_id"))
      .agg(
        coalesce(max(when(col("leg") === "lex", col("rnk"))), lit(0))
          .cast("long").as("lex_rank"),
        coalesce(max(when(col("leg") === "vec", col("rnk"))), lit(0))
          .cast("long").as("vec_rank"))
      .withColumn("rrf_q",
        expr(s"(case when lex_rank > 0 then ${RrfScale}L div ($RrfK + lex_rank) else 0L end)" +
          s" + (case when vec_rank > 0 then ${RrfScale}L div ($RrfK + vec_rank) else 0L end)"))
      .orderBy(col("rrf_q").desc, col("doc_id"))
      .limit(FusedK)
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf_q"))
  }

  val rankFusionSql: String =
    s"""WITH ${TextOps.bm25ScoredCtes},
       |lexl AS (
       |  SELECT doc_id, rnk FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
       |    FROM bscore WHERE doc_id <> $QVec)
       |  WHERE rnk <= $RfDepth),
       |vsc AS (
       |  SELECT e.vec_id AS doc_id,
       |    floor((list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
       |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
       |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))) * 10000.0 + 0.5) / 10000.0 AS score
       |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = $QVec) q
       |  WHERE e.vec_id <> $QVec),
       |vecl AS (
       |  SELECT doc_id, rnk FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
       |    FROM vsc)
       |  WHERE rnk <= $RfDepth),
       |u AS (SELECT doc_id, 'lex' AS leg, rnk FROM lexl
       |      UNION ALL SELECT doc_id, 'vec' AS leg, rnk FROM vecl),
       |f AS (
       |  SELECT doc_id,
       |    coalesce(max(CASE WHEN leg = 'lex' THEN rnk END), 0)::BIGINT AS lex_rank,
       |    coalesce(max(CASE WHEN leg = 'vec' THEN rnk END), 0)::BIGINT AS vec_rank
       |  FROM u GROUP BY doc_id)
       |SELECT doc_id, lex_rank, vec_rank,
       |  ((CASE WHEN lex_rank > 0 THEN $RrfScale // ($RrfK + lex_rank) ELSE 0 END)
       | + (CASE WHEN vec_rank > 0 THEN $RrfScale // ($RrfK + vec_rank) ELSE 0 END))::BIGINT AS rrf_q
       |FROM f ORDER BY rrf_q DESC, doc_id LIMIT $FusedK""".stripMargin
}

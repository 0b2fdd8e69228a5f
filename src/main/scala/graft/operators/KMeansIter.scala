package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** I4: distributed Lloyd iterations over the embeddings table — the
  * centroid-training step behind [[Ann.annIvf]]'s assignment-only
  * "k-means-ish" seeds. Two unrolled iterations, expressed fully
  * relationally (one lazy plan, no driver-side collect):
  *
  *  - vectors explode to (vec_id, dim, qv) — map-only;
  *  - assignment joins the K×D centroid frame (broadcast: it is
  *    tiny by construction) on `dim` and min-aggregates the per-
  *    (vector, centroid) squared distance — shuffle ∝ N·K rows of
  *    longs, never N²;
  *  - re-centering is one (cid, dim)-keyed average over members.
  *
  * Everything runs in INTEGER domain: coordinates quantize to
  * floor(x·1000 + 0.5) (the [[Ann.embQuantize]] trick — engine
  * round() tie rules differ, floor(+0.5) doesn't), so distances and
  * centroid means are exact integer arithmetic — order-independent
  * and identical in DuckDB, which makes an ITERATIVE ML loop
  * hash-exact across engines. At 100 TB this is the real shape:
  * MLlib's KMeans broadcasts centroids and aggregates partial sums
  * the same way; the unrolled-relational form keeps it a single
  * Catalyst plan.
  */
object KMeansIter {

  val K = 8
  val Scale = 1000

  /** (vec_id, dim, qv) quantized coordinates. */
  private def q(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        floor(col("v").cast("double") * Scale + 0.5).cast("long").as("qv"))

  /** Argmin-centroid assignment: (vec_id, cid, dist). Ties break to
    * the smallest cid via the struct min (lexicographic), matching
    * the oracle's `ORDER BY dist, cid` row_number. */
  private def assign(pts: DataFrame, c: DataFrame): DataFrame =
    pts.join(broadcast(c), "dim")
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum((col("qv") - col("cv")) * (col("qv") - col("cv"))).as("dist"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"))

  /** Member mean per (cid, dim), floored to integer domain. The sum
    * stays far under 2^53, so the double division is exact. */
  private def recenter(pts: DataFrame, a: DataFrame): DataFrame =
    pts.join(a.select("vec_id", "cid"), "vec_id")
      .groupBy(col("cid"), col("dim"))
      .agg(floor(sum(col("qv")).cast("double") / count(lit(1))).cast("long").as("cv"))

  /** Final (vec_id, cid, dist) assignment after the two unrolled
    * Lloyd rounds — the cluster labels [[kmeansIter]] reports on and
    * [[Dedup.dedupSemantic]] blocks its pair generation by. Integer
    * domain throughout, so labels replay hash-exact in DuckDB. */
  def assignments(s: SparkSession, dir: String): DataFrame = {
    val pts = q(s, dir)
    val c0 = pts.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("dim"), col("qv").as("cv"))
    val a1 = assign(pts, c0)
    val c1 = recenter(pts, a1)
    assign(pts, c1)
  }

  def kmeansIter(s: SparkSession, dir: String): DataFrame =
    assignments(s, dir).groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("inertia"))
      .orderBy(col("cid"))

  /** Total inertia after `iters` assignment rounds (1 = initial
    * centroids, 2 = one re-centering) — spec hook for Lloyd's
    * monotonic-descent property. */
  private[graft] def inertiaAfter(s: SparkSession, dir: String, iters: Int): Long = {
    val pts = q(s, dir)
    var c = pts.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("dim"), col("qv").as("cv"))
    var a = assign(pts, c)
    for (_ <- 2 to iters) {
      c = recenter(pts, a)
      a = assign(pts, c)
    }
    a.agg(sum(col("dist"))).head.getLong(0)
  }

  /** The assignment pipeline as appendable CTEs (`a2` = final
    * labels) — shared by the I4 oracle and dedup_semantic's. */
  val kmeansCtes: String =
    s"""WITH q AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
       |    CAST(floor(unnest(embedding)::DOUBLE * $Scale + 0.5) AS BIGINT) AS qv
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, dim, qv AS cv FROM q WHERE vec_id < $K),
       |d1 AS (SELECT q.vec_id, c.cid, CAST(sum((qv - cv) * (qv - cv)) AS BIGINT) AS dist
       |       FROM q JOIN c0 c USING (dim) GROUP BY 1, 2),
       |a1 AS (SELECT vec_id, cid, dist FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1)
       |       WHERE rn = 1),
       |c1 AS (SELECT cid, dim, CAST(floor(sum(qv)::DOUBLE / count(*)) AS BIGINT) AS cv
       |       FROM a1 JOIN q USING (vec_id) GROUP BY 1, 2),
       |d2 AS (SELECT q.vec_id, c.cid, CAST(sum((qv - cv) * (qv - cv)) AS BIGINT) AS dist
       |       FROM q JOIN c1 c USING (dim) GROUP BY 1, 2),
       |a2 AS (SELECT vec_id, cid, dist FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2)
       |       WHERE rn = 1)""".stripMargin

  val kmeansIterSql: String = kmeansCtes + """
    |SELECT cid, count(*) AS n_members, CAST(sum(dist) AS BIGINT) AS inertia
    |FROM a2 GROUP BY cid ORDER BY cid""".stripMargin
}

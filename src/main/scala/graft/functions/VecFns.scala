package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels for similarity search (SURVEY.md §2 C5/D*): dot
  * product / cosine over `array<float>` embedding columns, via
  * `zip_with` + `aggregate` higher-order functions — codegen'd, no
  * UDF row-object churn in the hot path.
  */
object VecFns {

  /** Σ aᵢ·bᵢ in double precision (floats promoted before multiply). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm vectors (ANSI-safe: no /0). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Random-hyperplane LSH bucket: k sign bits of projections onto
    * fixed pseudo-random hyperplanes, packed into a long. Hyperplane
    * r (component i) is a deterministic hash-derived value in [-1,1) —
    * no stored model, identical on every executor. */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int = 7): Column = {
    val proj = (r: Int) =>
      aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x.cast("double") *
            (pmod(xxhash64(concat_ws("-", lit(seed), lit(r), i)), lit(2000003L))
              .cast("double") / 1000001.5 - 1.0)),
        lit(0.0), (acc, p) => acc + p)
    (0 until bits).map(r => when(proj(r) >= 0, 1L << r).otherwise(0L))
      .reduce(_ + _)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels for similarity search (SURVEY.md §2 C5/D*): dot
  * product / cosine over `array<float>` embedding columns, via
  * `zip_with` + `aggregate` higher-order functions — codegen'd, no
  * UDF row-object churn in the hot path.
  */
object VecFns {

  /** Σ aᵢ·bᵢ in double precision (floats promoted before multiply).
    * Dispatches to the codegen'd [[graft.plans.VecDotProduct]]
    * (registered as `vec_dot` by GraftSession) — same left-to-right
    * double accumulation as the interpreted HOF form, ~10× faster. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm vectors (ANSI-safe: no /0). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Max vector dimensionality the literal hyperplanes cover. */
  val MaxDim = 512

  /** Random-hyperplane LSH bucket: k sign bits of projections onto
    * fixed seeded-PRNG hyperplanes, packed into a long. Planes are
    * literal float arrays baked into the plan (identical on every
    * executor, no stored model), so each projection is one codegen'd
    * [[graft.plans.VecDotProduct]] — not an interpreted per-component
    * lambda. */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int = 7): Column = {
    (0 until bits).map { r =>
      val rnd = new scala.util.Random(seed * 1000 + r)
      val plane = typedLit(Array.fill(MaxDim)(rnd.nextFloat() * 2f - 1f))
      when(dot(v, plane) >= 0, 1L << r).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Banded sign-LSH keys from an already-computed
    * [[hyperplaneBucket]] COLUMN: `bands` bands of `bits` bits each,
    * every key tagged with its band index — key = (band << bits) |
    * bandBits — so one single-column equi-join means "same band AND
    * same bucket". Geometry is threshold-driven: P(vectors at angle
    * θ share ≥1 band) = 1-(1-(1-θ/π)^bits)^bands. Tight near-dup
    * thresholds (cos ≥ 0.9, θ ≈ 26°) want wide selective bands
    * (8×8); a weak threshold like cos ≥ 0.4 (θ ≈ 66°) needs narrow
    * permissive ones (2-bit × 32, per-pair miss ≈ 9e-8).
    *
    * Takes the bucket as a Column on purpose: Catalyst expressions
    * are trees, not DAGs — inlining the 64-plane projection here
    * would copy it into every band key (bands × planes dot products
    * per row; measured 19 ms/row once codegen falls back). Project
    * the bucket into a column first, then slice. */
  def bandKeysFromBucket(bucket: Column, bits: Int, bands: Int): Column = {
    require(bits * bands <= 64, "at most 64 sign planes")
    val mask = (1L << bits) - 1
    array((0 until bands).map { b =>
      lit(b.toLong << bits) +
        shiftrightunsigned(bucket, bits * b).bitwiseAND(lit(mask))
    }: _*)
  }
}

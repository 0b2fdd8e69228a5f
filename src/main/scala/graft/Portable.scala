package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine tie-free rounding for RATIONAL quantities.
  *
  * `round(x, k)` on a DOUBLE is engine-specific exactly at half-way
  * ties: Spark HALF_UPs the double's SHORTEST DECIMAL REPR
  * (BigDecimal.valueOf = Double.toString) while DuckDB rounds the
  * ×10^k-scaled binary value — when an integer ratio lands on the
  * 5·10^-(k+1) grid they can disagree (r8's one red row: cohort_ltv's
  * 541359931/8/100 prints "676699.91375" so Spark says .9138, but the
  * double is 676699.9137499999488… so DuckDB says .9137). Ratios of
  * exact integers reach that grid easily (counts over counts, cents
  * over cohort sizes), so every rounded rational emitter routes
  * through [[pround]] instead:
  *
  *   floor(x·10^k + 0.5) / 10^k
  *
  * is pure IEEE-754 arithmetic — multiply, add, floor and divide are
  * each correctly rounded and bit-identical across engines — so both
  * sides compute the SAME double, ties included. (On negatives this
  * is half-up toward +∞ rather than away-from-zero: a convention,
  * applied identically on both sides, which is all the hash gate
  * needs.) The oracle twin is [[sqlRound]], textually the same
  * formula; spec-side local recounts mirror it with [[jround]].
  *
  * Non-rational emitters (sums of arbitrary doubles, sqrt-based
  * cosines, interpolated percentiles of raw doubles) keep plain
  * round(x, k): their pre-round values cannot land exactly on the
  * decimal half-grid, so the engines' tie rules never fire.
  *
  * Scale bound: the scaled value must stay well inside 2^53 (Spark's
  * floor returns LONG and the quotient re-enters double space);
  * every consumer here rounds ratios, rates or per-entity averages —
  * magnitudes ≤ 1e12 after scaling.
  */
object Portable {
  /** Tie-free cross-engine round of a rational column to k places. */
  def pround(c: Column, k: Int): Column = {
    require(k >= 0 && k <= 9, s"pround scale $k outside sane range")
    val s = math.pow(10, k) // exact double for k ≤ 22
    floor(c * s + 0.5) / s
  }

  /** The identical formula as DuckDB SQL text. */
  def sqlRound(e: String, k: Int): String = {
    require(k >= 0 && k <= 9)
    val s = s"${math.pow(10, k).toLong}.0"
    s"floor(($e) * $s + 0.5) / $s"
  }

  /** Scalar mirror for spec-side local recounts. */
  def jround(x: Double, k: Int): Double = {
    val s = math.pow(10, k)
    math.floor(x * s + 0.5) / s
  }
}

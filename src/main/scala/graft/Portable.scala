package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine tie-free rounding for every rounded-double emitter.
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
  * cosines, interpolated percentiles of raw doubles) cannot land
  * EXACTLY on the decimal half-grid, so for them plain round(x, k)
  * would also agree — but "provably can't tie" is an argument per
  * call site, and cohort_ltv shipped red because one site's argument
  * was wrong. Every rounded-double emitter therefore routes through
  * [[pround]] unconditionally: one mechanical rule, no per-site
  * proof, and the oracle twin is textually the same arithmetic.
  *
  * Scale bound: Spark's floor returns LONG (DuckDB's returns
  * DOUBLE), so the scaled value must stay inside 2^63 — and beyond
  * 2^53 a double is already integral, making floor the identity on
  * both engines. The largest consumers (group sums of prices at
  * sf0.1, ×10^4) sit near 1e14; headroom is ~5e4×.
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

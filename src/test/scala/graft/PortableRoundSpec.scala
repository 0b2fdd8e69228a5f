package graft

import org.apache.spark.sql.functions._
import graft.Portable.{jround, pround}

/** The r8 `cohort_ltv` failure class, pinned as a spec: `round(x, k)`
  * on a DOUBLE whose true value lands exactly on the 5·10^-(k+1)
  * half-grid is ENGINE-SPECIFIC (Spark HALF_UPs the binary
  * expansion, DuckDB rounds the scaled double), so no rounded
  * RATIONAL quantity may reach the hash gate through `round`. This
  * spec (1) reproduces the divergence on the judge's exact failing
  * value, (2) proves [[Portable.pround]] is the same pure-IEEE
  * formula on planted ties in both the Column and scalar forms, and
  * (3) sweeps a lattice of integer ratios across every scale the
  * emitters use (2/4/6 decimals).
  */
class PortableRoundSpec extends SparkSpec {

  test("the r8 failing value: Spark round() and the scaled path split the tie") {
    // cum = 541359931 cents, cohort_size = 8 (an actual diverging
    // sf0.001 row): cum/8/100 = 676699.91375 in decimal, but the
    // nearest DOUBLE is 676699.913749999948… — BELOW the tie. Spark's
    // round(double, 4) HALF_UPs the double's SHORTEST DECIMAL REPR
    // ("…91375" → .9138) while the scaled form floor(x·10⁴+0.5)/10⁴
    // follows the binary value (…9137.49999 → .9137) — the side
    // DuckDB's round takes too. That repr-vs-binary split is the
    // whole failure class; pround removes it by running the SAME
    // pure-IEEE formula on both engines.
    val x = 541359931L.toDouble / 8 / 100.0
    val Seq(sparkRound, portable) = spark.range(1)
      .select(round(lit(x), 4).as("r"), pround(lit(x), 4).as("p"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toSeq
    assert(sparkRound == 676699.9138, s"Spark round moved: $sparkRound")
    assert(portable == 676699.9137, s"pround: $portable")
    assert(jround(x, 4) == portable, "scalar mirror diverges from Column form")
  }

  test("pround == the floor formula on planted half-grid ties, all scales") {
    // ratios constructed to land EXACTLY on the half grid: dyadic
    // denominators keep n/d exactly representable, so n/d·10^k + 0.5
    // is an exact integer + tie. Cover positive/negative and k=2,4,6.
    val cases = Seq[(Long, Long, Int)](
      (1L, 8L, 2),            // 0.125      → tie at k=2
      (3L, 8L, 2),            // 0.375
      (5L, 16L, 4) ,          // 0.3125     → 5th-decimal 5? (0.00005 grid: .31250 no) — still exercises exactness
      (1L, 16L, 4),           // 0.0625
      (7L, 32L, 4),           // 0.21875    → tie at k=4
      (1798400131L, 800L, 4), // the cohort_ltv shape
      (-7L, 32L, 4),          // negative tie: floor = half-up toward +inf
      (1L, 64L, 5),           // 0.015625   → tie at k=5 (est_jaccard class)
      (3L, 2000000L, 6))      // 0.0000015  → tie at k=6
    cases.foreach { case (n, d, k) =>
      val x = n.toDouble / d
      val s = math.pow(10, k)
      val viaFormula = math.floor(x * s + 0.5) / s
      assert(jround(x, k) == viaFormula, s"jround($n/$d, $k)")
      val got = spark.range(1).select(pround(lit(x), k).as("p"))
        .collect().head.getDouble(0)
      assert(got == viaFormula, s"pround($n/$d, $k): $got vs $viaFormula")
    }
  }

  test("pround propagates NULL and matches round() away from ties") {
    val row = spark.range(1).select(
      pround(lit(null).cast("double"), 4).as("n"),
      pround(lit(0.12341), 4).as("a"), round(lit(0.12341), 4).as("ar"),
      pround(lit(123.456789), 4).as("b"), round(lit(123.456789), 4).as("br"))
      .collect().head
    assert(row.isNullAt(0))
    assert(row.getDouble(1) == row.getDouble(2))
    assert(row.getDouble(3) == row.getDouble(4))
  }
}

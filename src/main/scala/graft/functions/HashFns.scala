package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash/sketch kernels for dedup (SURVEY.md §2 C*): shingling,
  * MinHash, SimHash. All pure `functions._` compositions — no UDFs —
  * so signature
  * computation costs one scan at any scale; only the (band, bucket)
  * keys ever shuffle.
  */
object HashFns {

  /** Large prime modulus for the universal-hash family. Keeping all
    * values < 2^30 means a*h+b < 2^60 — no ANSI-mode long overflow. */
  val P: Long = 1000000007L

  val NumHashes = 64
  val Bands     = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** Fixed universal-hash coefficients h_i(x) = (a_i·x + b_i) mod P.
    * Seeded PRNG at object init → identical on every JVM. */
  private val rnd = new scala.util.Random(42)
  val A: Seq[Long] = Seq.fill(NumHashes)(1L + rnd.nextInt((P - 1).toInt))
  val B: Seq[Long] = Seq.fill(NumHashes)(rnd.nextInt(P.toInt).toLong)

  /** Distinct n-gram token shingles of `text` ("w1 w2 w3" strings).
    * Docs shorter than n tokens get a single whole-doc shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextFns.wsTokens(lower(text))
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Shingle set → non-negative hashes in [0, P). */
  def shingleHashes(sh: Column): Column =
    transform(sh, s => pmod(xxhash64(s), lit(P)))

  /** MinHash signature as a higher-order fold — one pass over the
    * hash set with element-wise `least`. Fine for ad-hoc per-row use
    * (specs, small inputs); the OPERATOR path uses [[minhashSigAgg]]
    * instead: this nested-lambda form is interpreted, and its first
    * execution pays a pathological codegen-compile/fallback (~150 s
    * measured on a fresh session at sf0.1).
    *
    * (The k-outer/shingles-inner form `transform(0..k, i =>
    * array_min(transform(hashes, …)))` is worse still — after
    * CollapseProject it re-evaluates the whole shingling pipeline k
    * times per row.) */
  def minhashSig(hashes: Column): Column = {
    val a = typedLit(A)
    val b = typedLit(B)
    val idx = typedLit((0 until NumHashes).map(_.toLong))
    aggregate(hashes, typedLit(Seq.fill(NumHashes)(P)),
      (acc, h) => zip_with(acc, idx,
        (m, i) => least(m, pmod(element_at(a, (i + 1).cast("int")) * h +
          element_at(b, (i + 1).cast("int")), lit(P)))))
  }

  /** MinHash signatures via explode + groupBy — the classic
    * formulation: `posts` is (id, h) with one row per (doc, shingle
    * hash); the result is (id, sig). The [[NumHashes]] minima are
    * plain scalar `min` aggregates (whole-stage codegen, partial
    * map-side combine), so signature cost is one shuffle of the
    * postings keyed by id — the same shuffle the LSH band join
    * needs anyway at scale. */
  def minhashSigAgg(posts: DataFrame, idCol: String, hCol: String): DataFrame = {
    val mins = (0 until NumHashes).map(i =>
      min(pmod(lit(A(i)) * col(hCol) + lit(B(i)), lit(P))).as(s"s$i"))
    posts.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until NumHashes).map(i => col(s"s$i")): _*).as("sig"))
  }

  /** LSH band keys: signature → [[Bands]] strings "band:v1-v2-v3-v4".
    * Two docs share a key iff a whole signature band matches; P(catch)
    * at Jaccard j is 1-(1-j^4)^16 — ≈1 for j ≥ 0.9, ≈0.02 for j=0.2,
    * so candidate volume stays ∝ docs·bands, never docs². */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)), bnd =>
      concat_ws("-", bnd, slice(sig, bnd * RowsPerBand + 1, lit(RowsPerBand))))

  /** Bit masks 2^0..2^63 (2^63 = Long.MinValue bit pattern) — lets a
    * lambda test bit k of a hash as (h & mask_k) != 0, since
    * shiftright needs a literal count but fold indices are columns. */
  private val Pow2: Seq[Long] = (0 until 64).map(k => 1L << k)

  /** SimHash as `numBands` band values over a 64-bit sketch. Bit k is
    * sign(Σ_tokens ±1 by token-hash bit k); one aggregate pass builds
    * all 64 bit-sums, then each (64/numBands)-bit band folds to an
    * int that doubles as its LSH bucket key. Pigeonhole: hamming ≤
    * numBands-1 ⇒ at least one band equal, so candidate generation is
    * exact up to that radius. Band width trades recall for bucket
    * selectivity — 8×8-bit covers radius 7 but buckets are coarse
    * (256 values each); at web scale you'd grow the sketch to 128/256
    * bits to widen bands back out rather than shrink the radius. */
  def simhashBands(text: Column, numBands: Int = 8): Column = {
    require(64 % numBands == 0)
    val r = 64 / numBands
    val hashes = transform(TextFns.wsTokens(lower(text)), t => xxhash64(t))
    val masks = typedLit(Pow2)
    val bitSums = aggregate(hashes, typedLit(Seq.fill(64)(0L)),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L)))
    transform(sequence(lit(0), lit(numBands - 1)), bnd =>
      aggregate(slice(bitSums, bnd * r + 1, lit(r)), lit(0L),
        (acc, s) => acc * 2 + when(s > 0, 1L).otherwise(0L)))
  }

  /** SimHash band values via explode + groupBy (see [[minhashSigAgg]]
    * for why the operator path avoids the HOF form): `posts` is
    * (id, h) with one row per (doc, token hash); result is (id, sb).
    * The 64 signed bit-sums are scalar codegen'd aggregates; each
    * band then folds its bits with plain arithmetic. */
  def simhashBandsAgg(posts: DataFrame, idCol: String, hCol: String,
                      numBands: Int = 8): DataFrame = {
    require(64 % numBands == 0)
    val r = 64 / numBands
    val sums = (0 until 64).map(i =>
      sum(when(col(hCol).bitwiseAND(lit(Pow2(i))) =!= 0, 1L).otherwise(-1L)).as(s"c$i"))
    val bandCols = (0 until numBands).map { bnd =>
      (0 until r).foldLeft(lit(0L)) { (acc, j) =>
        acc * 2 + when(col(s"c${bnd * r + j}") > 0, 1L).otherwise(0L)
      }.as(s"b$bnd")
    }
    posts.groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol) +: bandCols: _*)
      .select(col(idCol), array((0 until numBands).map(i => col(s"b$i")): _*).as("sb"))
  }

  /** SimHash over a WIDE sketch: `hCols.size` independent 64-bit
    * token-hash lanes (sketch = 64·lanes bits) folded into `numBands`
    * band keys of 64·lanes/numBands bits each. The point of widening
    * (the roadmap note on [[simhashBands]]): the pigeonhole guarantee
    * needs bands > hamming radius, but bucket SELECTIVITY needs wide
    * bands — a wider sketch buys both. 128-bit/8-band = 16-bit
    * buckets (65536 values per band, vs 256 for 64-bit/8-band) while
    * still covering radius 7 exactly — the hot-bucket fix at
    * web-scale corpus sizes. Same codegen'd scalar-aggregate shape
    * as [[simhashBandsAgg]]. */
  def simhashBandsAggWide(posts: DataFrame, idCol: String, hCols: Seq[String],
                          numBands: Int = 8): DataFrame = {
    val totalBits = 64 * hCols.size
    require(totalBits % numBands == 0)
    val r = totalBits / numBands
    val sums = (0 until totalBits).map { k =>
      sum(when(col(hCols(k / 64)).bitwiseAND(lit(Pow2(k % 64))) =!= 0, 1L)
        .otherwise(-1L)).as(s"c$k")
    }
    val bandCols = (0 until numBands).map { bnd =>
      (0 until r).foldLeft(lit(0L)) { (acc, j) =>
        acc * 2 + when(col(s"c${bnd * r + j}") > 0, 1L).otherwise(0L)
      }.as(s"b$bnd")
    }
    posts.groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol) +: bandCols: _*)
      .select(col(idCol), array((0 until numBands).map(i => col(s"b$i")): _*).as("sb"))
  }

  /** Hamming distance between two simhash band arrays. Flattened to
    * scalar element_at/xor/bit_count (all codegen'd) — this sits in
    * the post-join hot filter over millions of candidate pairs, where
    * an interpreted HOF fold costs more than the join itself. */
  def bandHamming(a: Column, b: Column, numBands: Int = 8): Column =
    (0 until numBands)
      .map(i => bit_count(element_at(a, i + 1).bitwiseXOR(element_at(b, i + 1))).cast("long"))
      .reduce(_ + _)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash/sketch kernels for dedup (SURVEY.md §2 C*): shingling,
  * MinHash, SimHash. All pure `functions._` higher-order
  * compositions — map-only, codegen'd, no UDFs — so signature
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

  /** MinHash signature: [[NumHashes]] minima over the shingle hash
    * set under the fixed hash family. */
  def minhashSig(hashes: Column): Column = {
    val a = typedLit(A)
    val b = typedLit(B)
    transform(sequence(lit(0), lit(NumHashes - 1)), i =>
      array_min(transform(hashes, h =>
        pmod(element_at(a, i + 1) * h + element_at(b, i + 1), lit(P)))))
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

  /** Hamming distance between two simhash band arrays. */
  def bandHamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, c) => acc + c)
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Expression-native Bloom filter: build a bitset over a key column with
  * one distributed OR-aggregate, probe it with a pure `Column` predicate
  * that whole-stage codegen compiles into the surrounding stage — no
  * UDF, no closure, no interpreted path on either side.
  *
  * Why this exists (scale posture): several operators gate a huge fact
  * side against a dimension key set — benchmark decontamination being
  * the canonical one (reference analog: the testgen contamination posture
  * around `dk-installer.py`'s quality checks; see TextOps.contamination).
  * Broadcasting the exact STRING set costs O(total key bytes) per
  * executor; at a 10^8-shingle benchmark that is gigabytes. The Bloom
  * bitset costs ~1.2 bytes/key at 1% fpp (~120 MB for 10^8 keys), has NO
  * false negatives — so an exact verify join over the few candidates
  * that pass restores exact semantics — and its probe is k integer
  * hashes + k array reads, all codegen'd.
  *
  * Mechanics: classic (m, k) Bloom with Kirsch–Mitzenmacher double
  * hashing — g_i(x) = h1'(x) + i·h2'(x) mod m, where h1' = h1 mod m and
  * h2' = (h2 mod (m−1)) + 1 ∈ [1, m−1] are PRE-REDUCED (h1 = xxhash64(x),
  * h2 = xxhash64(x, 1)). Pre-reduction keeps every intermediate below
  * k·m ≪ 2^63, so the arithmetic is exact under ANSI mode (Spark 4
  * default: long overflow THROWS, so the usual wrap-around formulation
  * is not available), and the h2' floor of 1 keeps the k probes from
  * collapsing onto one bit when h2 ≡ 0 mod m. Build and probe share one
  * position helper, so the scheme cannot drift out of lockstep. The
  * bitset is Array[Long]; the build explodes each key
  * into its k bit positions, OR-combines per 64-bit word DISTRIBUTED
  * (`bit_or` aggregate with map-side partial combine), and collects only
  * the ≤ m/64 non-zero words to the driver — a control-plane-sized
  * collect in the spirit of the evRange/BPE pattern, not a data-plane
  * one. The probe ships the words as a broadcast literal array.
  */
object Bloom {

  /** Optimal classic-Bloom parameters for `expected` keys at false
    * positive rate `fpp`: m = ceil(-e·ln p / ln²2) bits rounded up to a
    * whole number of 64-bit words, k = round(m/e · ln 2) hashes.
    */
  def params(expected: Long, fpp: Double): (Long, Int) = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val e = math.max(1L, expected).toDouble
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-e * math.log(fpp) / (ln2 * ln2)).toLong
    val m = ((math.max(64L, mRaw) + 63L) / 64L) * 64L
    val k = math.max(1, math.round(m / e * ln2).toInt)
    (m, k)
  }

  /** The built filter: `words` is the bitset (little-endian bit order
    * within each long), `mBits` = words.length * 64, `k` = hash count.
    */
  final case class BloomBits(words: Array[Long], mBits: Long, k: Int) {

    /** Number of set bits — exposed for specs/diagnostics. */
    def cardinalityBits: Long = words.map(java.lang.Long.bitCount(_).toLong).sum

    /** Membership probe as a pure Column predicate: true for every
      * inserted key (no false negatives), true with probability ~fpp
      * for others. k conjuncts of (hash, pmod, element_at, shift, mask)
      * — all codegen'd builtins, so the test inlines into whatever
      * stage evaluates it (typically the post-scan filter).
      */
    def mightContain(key: Column): Column = {
      val wordsLit = typedLit(words.toSeq)
      bitPositions(key, mBits, k).map { pos =>
        val word = element_at(
          wordsLit,
          (shiftrightunsigned(pos, 6) + lit(1L)).cast(IntegerType))
        word.bitwiseAND(
          call_function("shiftleft", lit(1L),
            pos.bitwiseAND(lit(63L)).cast(IntegerType))) =!= lit(0L)
      }.reduce(_ && _)
    }
  }

  /** Bit positions g_0..g_{k-1} for `key` — the ONE hashing definition
    * both the build explosion and the probe use (see the overflow note
    * in the object doc for why the hashes are pre-reduced).
    */
  private def bitPositions(key: Column, mBits: Long, k: Int): Seq[Column] = {
    val h1 = pmod(xxhash64(key), lit(mBits))
    val h2 = pmod(xxhash64(key, lit(1)), lit(mBits - 1)) + lit(1L)
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits)))
  }

  /** Build a filter over `keys(keyCol)` (need not be pre-distinct —
    * duplicate inserts are idempotent). `expected` sizes the bitset; pass
    * the (approximate) distinct count. EAGER: runs the build aggregation
    * at call time (one job; collects ≤ mBits/64 rows).
    */
  def build(keys: DataFrame, keyCol: String, expected: Long,
            fpp: Double = 0.01): BloomBits = {
    val (m, k) = params(expected, fpp)
    val rows = keys
      .select(explode(array(bitPositions(col(keyCol), m, k): _*)).as("pos"))
      .select(shiftrightunsigned(col("pos"), 6).as("w"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(63L)).cast(IntegerType)).as("bit"))
      .groupBy("w").agg(bit_or(col("bit")).as("orw"))
      .collect()
    val words = Array.ofDim[Long]((m / 64L).toInt)
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    BloomBits(words, m, k)
  }

  /** Build with the expected count taken from a `count()` over the
    * distinct keys — one extra control-plane action; use when the caller
    * has no cheaper cardinality estimate.
    */
  def buildCounted(keys: DataFrame, keyCol: String,
                   fpp: Double = 0.01): BloomBits = {
    val distinctKeys = keys.select(col(keyCol)).distinct()
      .localCheckpoint(true)
    build(distinctKeys, keyCol, distinctKeys.count(), fpp)
  }
}

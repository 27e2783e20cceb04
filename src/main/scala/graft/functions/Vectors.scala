package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector expression library over `ArrayType` embedding columns
  * (SURVEY.md §2.11 X3).
  *
  * All operations are higher-order-function expression trees (zip_with /
  * aggregate / transform) — codegen'd, per-row, shuffle-free. The fold in
  * `dot` is sequential left-to-right, which makes the double-precision
  * result deterministic and oracle-reproducible bit-for-bit.
  */
object Vectors {

  /** Cast a float embedding to double once, up front — all downstream
    * arithmetic is then exact-deterministic double. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, computed as dot/(sqrt(na)*sqrt(nb)) — the
    * NATIVE codegen'd expression (functions.CosineSim), whose loop
    * replays the exact left-to-right fold order of the HOF formulation,
    * so results stay bit-identical to the DuckDB oracle mirrors.
    * Zero-norm vectors yield NULL (not NaN): Spark sorts NaN greater
    * than any number, so an unguarded 0/0 would rank first in top-k and
    * pass `>= threshold` filters. */
  def cosine(a: Column, b: Column): Column = Native.cosineSim(a, b)

  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x / n)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * ±1.0 from the parity of a 64-bit avalanche hash. Generating planes
    * from a hash (instead of materializing a weights matrix) keeps the
    * LSH signature a pure per-row expression — nothing to broadcast. */
  private def planeWeight(plane: Int, dim: Column, seed: Int): Column =
    when(pmod(xxhash64(lit(seed), lit(plane), dim), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Random-hyperplane LSH signature: bit j = sign(v · h_j). Packs
    * `nPlanes` (≤ 62) sign bits into one long bucket id. Vectors with
    * high cosine similarity land in the same bucket with prob
    * (1 - theta/pi)^nPlanes — the scale path for ANN / near-dup join:
    * groupBy(bucket) turns the O(n²) all-pairs problem into a shuffle on
    * bucket keys. */
  def lshBucket(v: Column, nPlanes: Int, seed: Int = 42): Column = {
    require(nPlanes > 0 && nPlanes <= 62, "nPlanes must be in [1,62]")
    val bits = (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeWeight(j, i, seed)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two packed-bit longs (for SimHash /
    * LSH multi-probe). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}

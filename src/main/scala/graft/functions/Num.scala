package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric aggregation helpers shared by the query inventory. */
object Num {

  /** Order-independent rounded money sum.
    *
    * `round(sum(double), d)` is not reproducible across engines or even
    * across partition counts: double addition is order-dependent, and a
    * true sum that lands within the noise of a .5 boundary flips the
    * rounded value (observed at sf0.01 — Spark and DuckDB disagreed by
    * 1 on a 1.1e9 sum). Casting every term to an exact decimal first
    * makes the aggregate associative-exact, so any partial-aggregation
    * order — 16 partitions, 32, map-side combine — produces the same
    * rounded result. Final cast back to double keeps the driver-side
    * hash representation uniform.
    *
    * SQL mirror (DuckDB):
    * `CAST(round(sum(CAST(x AS DECIMAL(25,6))), d) AS DOUBLE)`.
    */
  def moneySum(c: Column, scale: Int): Column =
    round(sum(c.cast("decimal(25,6)")), scale).cast("double")

  /** Order-independent rounded money average, exact by INTEGER
    * arithmetic.
    *
    * A rounded average cannot go through `round(double)`: when the true
    * quotient lands exactly on a half boundary (observed at sf0.001 —
    * 33610.52/8 = 4201.315), Spark's Round (shortest-decimal BigDecimal
    * of the double) and DuckDB's (exact binary expansion) disagree by a
    * cent. So: exact decimal sum → micro-unit DECIMAL(38,0), then
    * half-away-from-zero division on exact integers — floor((2a+m)/(2m))
    * with m = count·10^(6-scale) — entirely in decimal arithmetic.
    * Bit-identical in any engine, any partial-agg order, on or off the
    * boundary, and exact for |sum| up to ~1e31 money units (the
    * DECIMAL(38,0) micro-unit ceiling; a long would overflow at 9.2e12).
    *
    * SQL mirror (DuckDB), with a = abs(micro-units sum):
    * `sign · round(((2a+m) - (2a+m) % (2m)) / (2m), 0) / 10^scale`. */
  def moneyAvg(c: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 6, "scale must be in [0,6]")
    // Micro-units as DECIMAL(38,0), NOT long: a long cast silently
    // overflows past |sum| ≈ 9.2e12 money units (reachable at large
    // SFs), and a long/long double division loses exactness past 2^53.
    // Decimal keeps the whole computation exact up to |sum| ~ 1e31.
    val micro = (sum(c.cast("decimal(25,6)")) * lit(1000000L))
      .cast("decimal(38,0)")
    val sign = when(micro < 0, lit(-1.0)).otherwise(lit(1.0))
    val a = abs(micro)
    val m = (count(c) * lit(math.pow(10, 6 - scale).toLong))
      .cast("decimal(38,0)")
    val n = a + a + m
    val d2 = m + m
    // n - n%d2 is an exact multiple of d2; Spark decimal division
    // rounds the exact rational to the result scale, so an integer
    // quotient (≪ 10^32, the DECIMAL(38,6) ceiling) survives exactly.
    val q = (n - pmod(n, d2)) / d2
    (sign * q.cast("double") / lit(math.pow(10, scale))).cast("double")
  }
}

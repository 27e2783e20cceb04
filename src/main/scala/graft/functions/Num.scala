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
}

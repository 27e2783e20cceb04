package graft

import org.apache.spark.sql.functions._

import graft.functions.Num

/** Exactness guarantees of the money aggregates — in particular the
  * overflow boundary that a long-based micro-unit formulation would
  * cross silently (|sum| ≈ 9.2e12 money units). */
class NumSpec extends SparkSpec {
  import spark.implicits._

  /** Reference half-away-from-zero rounded average in BigDecimal. */
  private def expectedAvg(xs: Seq[BigDecimal], scale: Int): Double =
    (xs.sum / xs.size)
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("moneyAvg survives the long-micro-unit overflow boundary") {
    // sum = 1.2e13 > 9.2e12: (sum * 1e6) overflows a long; the decimal
    // formulation must keep the exact quotient.
    val xs = Seq(BigDecimal("4000000000000.25"),
      BigDecimal("4000000000000.25"), BigDecimal("4000000000000.50"))
    val df = xs.map(_.toDouble).toDF("v")
    val got = df.agg(Num.moneyAvg(col("v"), 2).as("a"))
      .head().getDouble(0)
    assert(got == expectedAvg(xs, 2), s"got $got")
  }

  test("moneyAvg half-boundary rounds away from zero, both signs") {
    // 33610.52 / 8 = 4201.315 — exactly on the half-cent boundary
    val pos = Seq.fill(7)(BigDecimal(0)) :+ BigDecimal("33610.52")
    val dfp = pos.map(_.toDouble).toDF("v")
    assert(dfp.agg(Num.moneyAvg(col("v"), 2)).head().getDouble(0)
      == 4201.32)
    val dfn = pos.map(x => (-x).toDouble).toDF("v")
    assert(dfn.agg(Num.moneyAvg(col("v"), 2)).head().getDouble(0)
      == -4201.32)
  }

  test("moneyAvg matches BigDecimal reference across scales") {
    val xs = Seq("12.345678", "0.000001", "999999.999999", "-7.5")
      .map(BigDecimal(_))
    val df = xs.map(_.toDouble).toDF("v")
    for (s <- 0 to 6) {
      val got = df.agg(Num.moneyAvg(col("v"), s)).head().getDouble(0)
      assert(got == expectedAvg(xs, s), s"scale $s: got $got")
    }
  }

  test("moneySum stays exact for sums past 2^53") {
    // 2^53 ≈ 9.007e15; four terms of 3e15 + a fractional tail
    val df = Seq(3.0e15, 3.0e15, 3.0e15, 0.25).toDF("v")
    val got = df.agg(Num.moneySum(col("v"), 0)).head().getDouble(0)
    assert(got == 9.0e15)
  }
}

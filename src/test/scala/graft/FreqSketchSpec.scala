package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqSketch

/** The Misra-Gries guarantees, empirically: exactness below capacity,
  * the pigeonhole presence bound, lower-bound counts within n/(cap+1),
  * and merge-invariance across partition layouts. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], cap: Int,
                     parts: Int = 4): Map[String, Long] =
    items.toDF("t").repartition(parts)
      .agg(FreqSketch.freqSketch($"t", cap).as("sk"))
      .selectExpr("explode(sk) AS e")
      .select($"e.item", $"e.count").as[(String, Long)]
      .collect().toMap

  test("below capacity the sketch is exact") {
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    assert(sketch(items, cap = 8) == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("pigeonhole: items above n/(cap+1) always present; counts are " +
    "lower bounds within the error budget") {
    // 1000 'hot' + 900 'warm' + 300 distinct singletons, capacity 9
    val items = Seq.fill(1000)("hot") ++ Seq.fill(900)("warm") ++
      (1 to 300).map("one" + _)
    val n = items.size
    val cap = 9
    val budget = n / (cap + 1) // 220
    val sk = sketch(items, cap)
    assert(sk.contains("hot") && sk.contains("warm"))
    for ((item, reported) <- sk) {
      val exact = items.count(_ == item).toLong
      assert(reported <= exact, s"$item over-reported")
      assert(exact - reported <= budget,
        s"$item short by ${exact - reported} > $budget")
    }
  }

  test("partition layout does not affect the guarantees (mergeable)") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h",
      "x1", "x2", "x3", "x4")
    for (seed <- 1 to 10; parts <- Seq(1, 3, 8)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish skew: low vocab indexes drawn far more often
      val items = List.fill(400)(
        vocab(math.min(vocab.size - 1,
          (math.abs(rnd.nextGaussian()) * 3).toInt)))
      val cap = 5
      val budget = items.size / (cap + 1)
      val sk = sketch(items, cap, parts)
      val exact = items.groupBy(identity).map { case (k, v) =>
        k -> v.size.toLong }
      for ((k, c) <- exact if c > budget)
        assert(sk.contains(k),
          s"seed=$seed parts=$parts: $k (freq $c > $budget) missing")
      for ((k, r) <- sk) {
        assert(r <= exact.getOrElse(k, 0L),
          s"seed=$seed parts=$parts: $k over-reported")
        assert(exact.getOrElse(k, 0L) - r <= budget,
          s"seed=$seed parts=$parts: $k error over budget")
      }
    }
  }

  test("SQL surface: freq_sketch via GraftExtensions") {
    val got = Seq("x", "x", "y").toDF("t")
      .selectExpr("freq_sketch(t, 4) AS sk")
      .selectExpr("explode(sk) AS e").select($"e.item", $"e.count")
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 2L, "y" -> 1L))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("binned range join equals the theta join, any bin width") {
    val points = spark.range(0, 2000).toDF("id")
      .withColumn("p", (col("id") * 37 % 1000).cast("double"))
    val intervals = Seq(
      (1L, 0.0, 100.0), (2L, 50.0, 149.9), (3L, 900.0, 999.0),
      (4L, 0.0, 999.0), (5L, 500.0, 500.0)) // degenerate single point
      .toDF("iid", "lo", "hi")
    val theta = points.join(intervals,
        col("p").between(col("lo"), col("hi")))
      .select("id", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(10.0, 100.0, 1000.0)) {
      val binned = RangeJoin
        .pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("id", "iid").as[(Long, Long)].collect().toSet
      assert(binned == theta, s"binWidth=$w")
    }
  }

  test("plans as an equi shuffle join, not a nested loop") {
    val points = spark.range(0, 100).toDF("id")
      .withColumn("p", col("id").cast("double"))
    val intervals = spark.range(0, 10).toDF("iid")
      .withColumn("lo", col("iid") * 10.0)
      .withColumn("hi", col("iid") * 10.0 + 15.0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin
        .pointInInterval(points, "p", intervals, "lo", "hi", 10.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan.take(1500))
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("intervalOverlap matches the theta join exactly, without " +
    "duplicates, across multi-bin spans") {
    val left = (1L to 30L).map(i => (i, i * 7.0, i * 7.0 + 40.0))
      .toDF("lid", "ls", "le")
    val right = (1L to 25L).map(j => (j, j * 11.0, j * 11.0 + 3.0))
      .toDF("rid", "rs", "re")
    val got = graft.operators.RangeJoin
      .intervalOverlap(left, "ls", "le", right, "rs", "re", binWidth = 10)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val expected = left.join(right,
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == expected.sorted)
    assert(got.size == got.toSet.size, "duplicate pairs emitted")
    assert(expected.nonEmpty)
  }

  test("intervalOverlap is exact on a negative/fractional domain " +
    "(floor-binning must stay consistent below zero)") {
    val left = (-15L to 15L).map(i => (i, i * 3.5 - 2.0, i * 3.5 + 6.0))
      .toDF("lid", "ls", "le")
    val right = (-12L to 12L).map(j => (j, j * 5.0 - 1.5, j * 5.0 + 2.5))
      .toDF("rid", "rs", "re")
    val got = graft.operators.RangeJoin
      .intervalOverlap(left, "ls", "le", right, "rs", "re", binWidth = 4)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val expected = left.join(right,
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == expected.sorted)
    assert(got.size == got.toSet.size)
    assert(expected.nonEmpty)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("same-bucketed join plans with zero exchange and zero sort") {
    val facts = spark.range(0, 10000).toDF("k")
      .withColumn("v", col("k") * 3)
    val dims = spark.range(0, 1000).toDF("k")
      .withColumn("name", concat(lit("n"), col("k")))
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)
    // disable auto-broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cogroupedJoin(spark, "b_facts", "b_dims", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(2000))
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(joined.count() == 1000)
      // correctness of the co-located join
      val s = joined.agg(sum("v")).head().getLong(0)
      assert(s == (0L until 1000L).map(_ * 3).sum)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}

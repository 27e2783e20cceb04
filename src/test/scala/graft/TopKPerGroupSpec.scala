package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopK

class TopKPerGroupSpec extends SparkSpec {

  import spark.implicits._

  private def df = spark.range(0, 10000).toDF("id")
    .withColumn("g", col("id") % 7)
    .withColumn("score", (col("id") * 2654435761L % 1000003).cast("long"))

  test("custom TopKPerGroup equals the window formulation") {
    val viaCustom = TopK.perGroup(df, Seq("g"),
        Seq(TopK.desc("score"), TopK.asc("id")), k = 5)
      .select("g", "id", "score")
      .orderBy("g", "id").collect().toSeq
    val w = Window.partitionBy("g")
      .orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .select("g", "id", "score")
      .orderBy("g", "id").collect().toSeq
    assert(viaCustom == viaWindow)
  }

  test("physical plan uses TopKPerGroupExec with one hash exchange, " +
    "no Window, no full sort") {
    val plan = TopK.perGroup(df, Seq("g"), Seq(TopK.desc("score")), 3)
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("TopKPerGroup ["), plan.take(1500))
    assert(plan.contains("hashpartitioning(g"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("Sort "), plan.take(1500))
  }

  test("extension-free fallback formulation matches the custom plan") {
    // perGroup falls back to this row_number() path at call time when
    // the session lacks GraftExtensions (instead of an opaque planner
    // assertion at action time); prove the two paths agree.
    val keys = Seq(TopK.desc("score"), TopK.asc("id"))
    val viaCustom = TopK.perGroup(df, Seq("g"), keys, k = 4)
      .select("g", "id", "score").orderBy("g", "id").collect().toSeq
    val viaFallback = TopK.windowFallback(df, Seq("g"), keys, k = 4)
      .select("g", "id", "score").orderBy("g", "id").collect().toSeq
    assert(viaCustom == viaFallback)
  }

  test("groups smaller than k emit all their rows; ties break by order") {
    val tiny = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "b", 1L))
      .toDF("id", "g", "score")
    val got = TopK.perGroup(tiny, Seq("g"),
        Seq(TopK.desc("score"), TopK.asc("id")), k = 5)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
    val top1 = TopK.perGroup(tiny, Seq("g"),
        Seq(TopK.desc("score"), TopK.asc("id")), k = 1)
      .filter(col("g") === "a").select("id").as[Long].collect().toSeq
    assert(top1 == Seq(1L)) // tie on score broken by id asc
  }
}

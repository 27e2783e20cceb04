package graft

import org.apache.spark.sql.functions._

class JaccardPruneRuleSpec extends SparkSpec {

  import spark.implicits._

  // spark.range source (not a LocalRelation — ConvertToLocalRelation
  // would fold a literal Seq fixture before the rule's effect is
  // observable). id 1: j=0.6; id 2: size ratio 1/8 → pruned; id 3: j=1.
  private def pairs = spark.range(1, 4).toDF("id")
    .withColumn("sa",
      when(col("id") === 1, array(lit("a"), lit("b"), lit("c"), lit("d")))
        .when(col("id") === 2, array((1 to 8).map(i => lit(s"t$i")): _*))
        .otherwise(array(lit("x"), lit("y"))))
    .withColumn("sb",
      when(col("id") === 1, array(lit("a"), lit("b"), lit("c"), lit("e")))
        .when(col("id") === 2, array(lit("t1")))
        .otherwise(array(lit("x"), lit("y"))))

  private def naiveJaccardFilter =
    pairs.filter(
      size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))).cast("double") >= 0.5)

  test("rule injects the size-ratio prune, exactly once (idempotent)") {
    val opt = naiveJaccardFilter.queryExecution.optimizedPlan.toString
    assert(opt.contains("least(size"), opt)
    assert(opt.contains("greatest(size"), opt)
    // fixpoint iteration must not stack duplicate prunes
    assert("least\\(size".r.findAllIn(opt).size == 1, opt)
  }

  test("pruned filter keeps exactly the qualifying pairs") {
    val got = naiveJaccardFilter.select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L)) // pair 2 pruned by ratio AND truly below
  }

  test("rule leaves unrelated filters untouched") {
    val plain = pairs.filter(size(col("sa")) > 1)
    assert(!plain.queryExecution.optimizedPlan.toString
      .contains("greatest(size"))
  }
}

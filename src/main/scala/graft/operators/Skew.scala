package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / builder mandate: "skewed
  * keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; these explicit
  * shapes cover what AQE cannot: a hash AGGREGATE whose hot key floods
  * one reducer, and a join where one side must be exploded. Both are
  * deterministic (salt = hash of stable columns, not rand()) so results
  * stay oracle-reproducible.
  */
object Skew {

  /** Two-stage salted aggregation: groupBy(key, salt) partial → strip
    * salt → final groupBy(key). The hot key's rows spread over
    * `saltBuckets` reducers in stage 1; stage 2 touches only
    * #distinct-keys × saltBuckets pre-aggregated rows. `saltCol` must
    * be a deterministic per-row expression (e.g. a row id column) —
    * NOT rand(), so re-execution after task retry is identical.
    *
    * `partialAggs` must be re-aggregable (sum/count/min/max — the
    * algebraic ones); pass the matching `finalAggs` that re-combines
    * them (e.g. partial count -> final sum). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltCol: Column,
                saltBuckets: Int, partialAggs: Seq[Column],
                finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltCol), lit(saltBuckets)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted join for a skewed BIG side against a small-ish right side:
    * big rows get a deterministic salt in [0, buckets); the right side
    * is exploded × buckets so every (key, salt) pair finds its match.
    * Right-side blowup = |right| × buckets — use only when right is
    * orders of magnitude smaller (else AQE skew-join is the tool). */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
                 saltSource: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }
}

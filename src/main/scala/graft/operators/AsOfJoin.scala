package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row
  * with `right.ts <= left.ts` on the same key (the time-series
  * enrichment join Spark has no built-in operator for; the builder
  * prompt's canonical custom-operator example).
  *
  * Composition, not a custom plan: tag both sides, union them, and run
  * ONE per-key window pass ordered by (ts, side) with
  * `last(right_payload, ignoreNulls)` over an unbounded-preceding
  * frame — right rows sort before left rows at equal timestamps, so
  * the match is inclusive. Cost at scale: one shuffle on the key and a
  * per-key sort — identical to the sort-merge join the problem needs
  * anyway; never an n×m range cross product.
  */
object AsOfJoin {

  /** Left-outer as-of join. Right payload columns (everything except
    * `key` and `rightTs`) are appended to the left row, null when no
    * right row precedes (backward) / follows (forward) it. `rightTs`
    * is also surfaced as `matched_ts`.
    *
    * `forward = true` matches the NEAREST following right row
    * (`right.ts >= left.ts`) instead of the most recent preceding one —
    * the same window pass run in reverse time order.
    *
    * `toleranceSec` nullifies a match further than the given gap (in
    * seconds for timestamp columns; in the column's own units for
    * numerics) — the pandas `merge_asof(tolerance=...)` contract. The
    * match is computed first and the gap test is a map-only post-pass,
    * so tolerance adds zero shuffles. */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               forward: Boolean = false,
               toleranceSec: Option[Long] = None): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != rightTs)
    val rTagged = right.select(
      col(key),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      struct((col(rightTs).as("matched_ts") +:
        payloadCols.map(col(_))): _*).as("__rpay"))
    val lCols = left.columns
    val lTagged = left.select(
      col(key),
      col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(rTagged.schema("__rpay").dataType).as("__rpay"),
      struct(lCols.map(col(_)): _*).as("__lrow"))
    val unioned = rTagged
      .withColumn("__lrow",
        lit(null).cast(lTagged.schema("__lrow").dataType))
      .unionByName(lTagged)
    // forward = the same pass in reverse time order: right rows still
    // sort before left rows at equal timestamps, keeping >= inclusive
    val tsOrd = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val ok = toleranceSec match {
      case Some(tol) =>
        col("__match").isNotNull &&
          abs(col("__ts").cast("double") -
            col("__match.matched_ts").cast("double")) <= tol.toDouble
      case None => lit(true)
    }
    val leftOut = lCols.map(c => col(s"__lrow.$c").as(c))
    val rightOut = when(ok, col("__match.matched_ts")).as("matched_ts") +:
      payloadCols.map(c => when(ok, col(s"__match.$c")).as(c))
    matched.select((leftOut ++ rightOut): _*)
  }
}

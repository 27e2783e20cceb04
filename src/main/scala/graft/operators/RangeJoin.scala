package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — point-in-interval matching, the second operator family
  * Spark lacks a native strategy for (it plans theta joins as
  * BroadcastNestedLoopJoin: O(points × intervals)).
  *
  * Scale shape: BIN the domain. Each interval explodes to the bins it
  * covers, each point keys to its bin, and the match becomes an
  * EQUI-join on the bin id plus an exact residual filter — one shuffle
  * on uniformly-distributed bin keys instead of a nested loop. Bin
  * width should be on the order of the typical interval length: wider
  * bins mean fewer replicas per interval but more false candidates per
  * bin. */
object RangeJoin {

  /** Join `points` to every interval containing them
    * (`start <= p <= end`, inclusive). Numeric domain. */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, startCol: String,
                      endCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedP = points
      .withColumn("__bin", floor(col(pCol) / binWidth).cast("long"))
    val binnedI = intervals
      .withColumn("__bin", explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    binnedP.join(binnedI, Seq("__bin"))
      .filter(col(pCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** Interval-interval OVERLAP join: every (left, right) pair with
    * `lStart <= rEnd AND rStart <= lEnd` (inclusive). The genomics/
    * session-correlation shape a nested-loop theta join makes
    * O(|L|·|R|).
    *
    * Same binning idea as [[pointInInterval]], plus a duplicate-free
    * trick: overlapping intervals share every bin of their overlap
    * region, so a naive bin equi-join emits one candidate per shared
    * bin. Instead of a post-join `distinct` (a second shuffle over the
    * full result), keep only the candidate whose join bin is the FIRST
    * bin of the overlap region — `floor(max(lStart, rStart)/w)` — which
    * exists for every true pair and is unique per pair. Result: one
    * equi-join shuffle on uniform bin keys, zero dedup work.
    * Caller supplies disjoint column names on the two sides. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin", explode(sequence(
        floor(col(s) / binWidth).cast("long"),
        floor(col(e) / binWidth).cast("long"))))
    binned(left, lStart, lEnd)
      .join(binned(right, rStart, rEnd), Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") ===
        floor(greatest(col(lStart), col(rStart)) / binWidth).cast("long"))
      .drop("__bin")
  }
}

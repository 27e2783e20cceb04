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
}

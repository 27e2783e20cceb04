import org.apache.spark.sql.{Column, DataFrame, SparkSession}

package object graft {
  /** The driver contract's query shape: (session, sfDir) → result. */
  type Q = (SparkSession, String) => DataFrame

  /** A registered operator query: Spark definition + optional ANSI-SQL
    * oracle mirror for the DuckDB differential check. A query without an
    * oracle would get the driver's weaker rows-only check; as of round 4
    * every registered query carries one — seeded-hash/sketch operators
    * expose a portable surface (exact truth counts + invariant bits)
    * instead of their impl-specific values. */
  final case class QueryDef(name: String, fn: Q, oracle: Option[String],
                            kind: String = QueryDef.Query)

  object QueryDef {
    /** Pure query-engine work (scan → compute); bench-comparable across
      * rounds. */
    val Query = "query"
    /** End-to-end zone-IO pipeline (write files → read back → query):
      * its bench time measures tempdir file IO as much as plan
      * execution, so Bench reports it under a separate total. */
    val Pipeline = "pipeline"
  }

  /** Guard for operators whose pair count is quadratic in (a block of)
    * their input: refuse inputs larger than `maxRows` with ONE cheap
    * limited count (reads at most maxRows+1 rows, no full scan) instead
    * of silently planning a 10¹⁰-pair self-join at scale. Returns the
    * input unchanged so it chains. Raise the fence consciously if you
    * really mean it. */
  def fenceQuadratic(df: DataFrame, maxRows: Int, what: String,
                     alternative: String): DataFrame = {
    val probe = df.limit(maxRows + 1).count()
    require(probe <= maxRows,
      s"$what is O(n²) and fenced at $maxRows rows; input exceeds it — " +
        s"$alternative at scale, or raise maxRows explicitly")
    df
  }

  /** Scale-out guard for CPU-dense per-row operators (tokenization,
    * hashing, shingling, vector math).
    *
    * A small table often arrives as ONE parquet row group → one scan
    * task, so per-row compute serializes onto a single core no matter
    * the cluster size. When the source exposes fewer partitions than the
    * configured shuffle width, insert one exchange up front — hashed on
    * `keys` when given (so a downstream groupBy/join on the same keys
    * REUSES the partitioning instead of adding a second shuffle), else
    * round-robin. When the input is already parallel — the 100 TB case,
    * thousands of splits — this is a no-op, so the guard never costs an
    * exchange at scale. */
  def scaleOut(df: DataFrame, keys: Column*): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val width = conf.numShufflePartitions
    // Plan-side split estimate: sum the analyzed plan's leaf-relation
    // size stats (precomputed file lengths for file sources — no IO) and
    // divide by the scan split size, mirroring FilePartition packing.
    // Deliberately NOT df.rdd.getNumPartitions: touching .rdd forces a
    // full physical-planning pass per call and pins a plan AQE can no
    // longer re-optimize.
    val bytesPerSplit = math.max(conf.filesMaxPartitionBytes, 1L)
    // Non-file leaves (LogicalRDD, in-memory relations) report the
    // defaultSizeInBytes sentinel, not a real size — counting it would
    // make every such frame look "big" and silently skip the widening
    // this guard exists for. Treat sentinel-sized leaves as unknown/
    // small so in-memory test frames still get spread across cores.
    val sentinel = BigInt(conf.defaultSizeInBytes)
    val leafBytes = df.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).filter(_ < sentinel).sum
    val estSplits = leafBytes / bytesPerSplit
    if (estSplits >= width) df
    else if (keys.nonEmpty) df.repartition(width, keys: _*)
    else df.repartition(width)
  }
}

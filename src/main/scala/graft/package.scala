import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** The driver contract's query shape: (session, sfDir) → result. */
  type Q = (SparkSession, String) => DataFrame

  /** A registered operator query: Spark definition + optional ANSI-SQL
    * oracle mirror for the DuckDB differential check. Queries without an
    * oracle get the driver's weaker rows-only check (non-SQL-expressible
    * ops: seeded-hash LSH, approx sketches). */
  final case class QueryDef(name: String, fn: Q, oracle: Option[String])
}

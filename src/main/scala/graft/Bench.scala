package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Methodology: each query is executed twice — one warm-up run (pays
  * Catalyst planning + whole-stage-codegen Janino compilation +
  * classloading, which measured as the dominant cost for sub-second
  * queries) and one timed steady-state run. Execution drains through
  * the `noop` sink, which materializes the complete plan including
  * final sorts (a bare `count()` lets the optimizer drop ORDER BY).
  */
object Bench {

  private def execute(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec =
        try {
          execute(fn(spark, sfDir)) // warm-up: plan + codegen + JIT
          val t0 = System.nanoTime()
          execute(fn(spark, sfDir)) // timed steady-state run
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

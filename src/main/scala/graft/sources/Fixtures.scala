package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K10: deterministic sample-data generator — the reference's test
  * fixture writer (/root/reference/data-upload-script.py:28-117)
  * re-expressed as seeded hash expressions over `spark.range`.
  *
  * The reference uses unseeded numpy randomness (shapes are fixtures,
  * values are not golden); here every value derives from
  * xxhash64(seed, field, id), so the SAME rows come out on any cluster,
  * any partitioning, any run — generation is embarrassingly parallel
  * (range splits, no shuffle) and usable as a reproducible test input
  * at any target row count.
  */
object Fixtures {

  /** Uniform [0,1) double from a per-(field,row) hash. */
  private def u(field: String, id: Column): Column =
    pmod(xxhash64(lit(field), id), lit(1000000L)).cast("double") / 1e6

  private def pick(field: String, id: Column, xs: Seq[String]): Column =
    element_at(array(xs.map(lit): _*),
      pmod(xxhash64(lit(field), id), lit(xs.size)).cast("int") + 1)

  private def uniform(field: String, id: Column, lo: Double,
                      hi: Double): Column =
    round(lit(lo) + u(field, id) * (hi - lo), 2)

  val regions = Seq("North", "South", "East", "West", "Central")

  /** sales — reference data-upload-script.py:28-55. */
  def sales(spark: SparkSession, n: Long = 1000L): DataFrame = {
    val id = col("id")
    spark.range(1, n + 1).select(
      format_string("TXN-%06d", id).as("transaction_id"),
      // 30-day range, evenly spaced
      timestamp_seconds(lit(1704067200L) +
        (id - 1) * (30L * 86400 / n)).as("date"),
      pick("product", id, Seq("Widget", "Gadget", "Gizmo", "Doohickey",
        "Thingamajig", "Contraption", "Apparatus", "Device")).as("product"),
      pick("region", id, regions).as("region"),
      (pmod(xxhash64(lit("qty"), id), lit(9)) + 1).cast("int").as("quantity"),
      uniform("unit_price", id, 10.0, 1000.0).as("unit_price"))
      .withColumn("total_price",
        round(col("quantity") * col("unit_price"), 2))
  }

  /** customers — reference data-upload-script.py:57-92. */
  def customers(spark: SparkSession, n: Long = 500L): DataFrame = {
    val id = col("id")
    val first = pick("first", id, Seq("James", "Mary", "John", "Patricia",
      "Robert", "Jennifer", "Michael", "Linda", "William", "Elizabeth"))
    val last = pick("last", id, Seq("Smith", "Johnson", "Williams",
      "Brown", "Jones", "Garcia", "Miller", "Davis", "Rodriguez",
      "Martinez"))
    spark.range(1, n + 1).select(
      format_string("CUST-%05d", id).as("customer_id"),
      first.as("first_name"),
      last.as("last_name"),
      lower(concat(first, lit("."), last, lit("@example.com"))).as("email"),
      pick("region", id, regions).as("region"),
      // segment weights p=[.2,.5,.3] via threshold on the uniform
      when(u("segment", id) < 0.2, "Premium")
        .when(u("segment", id) < 0.7, "Standard")
        .otherwise("Basic").as("segment"),
      // 3-year range
      timestamp_seconds(lit(1609459200L) +
        (id - 1) * (3L * 365 * 86400 / n)).as("join_date"),
      uniform("ltv", id, 100.0, 10000.0).as("lifetime_value"))
  }

  /** products — reference data-upload-script.py:94-117. */
  def products(spark: SparkSession, n: Long = 100L): DataFrame = {
    val id = col("id")
    spark.range(1, n + 1).select(
      format_string("PROD-%04d", id).as("product_id"),
      concat_ws(" ",
        pick("brand", id, Seq("TechPro", "Electronica", "GadgetCo",
          "DigiPlus", "SmartTech", "FutureBrand")),
        pick("ptype", id, Seq("Laptop", "Smartphone", "Tablet",
          "Headphones", "Monitor", "Keyboard", "Mouse", "Speaker")),
        pick("suffix", id, Seq("Pro", "Lite", "Plus", "Max", "")))
        .as("product_name"),
      pick("category", id, Seq("Electronics", "Computing", "Audio",
        "Accessories")).as("category"),
      uniform("price", id, 10.0, 2000.0).as("price"),
      (u("in_stock", id) < 0.8).as("in_stock"),
      pmod(xxhash64(lit("stock"), id), lit(1000)).cast("int")
        .as("stock_quantity"),
      timestamp_seconds(lit(1577836800L) +
        (id - 1) * (4L * 365 * 86400 / n)).as("launch_date"))
  }

  /** S10 fixtures: the API-side sample payloads the reference's
    * `POST /data` Lambda synthesizes per dataType
    * (ingest-data-lambda.py:135-180) — sales/user/metrics/generic JSON
    * bodies. uuid4()/now() become id-derived values so the metadata an
    * ingest run derives (sizeBytes, layout) is oracle-checkable: both
    * engines can rebuild the exact body strings from `range`. */
  def apiPayloads(spark: SparkSession, n: Long = 200L): DataFrame = {
    val id = col("id")
    val day = format_string("%02d", pmod(id, lit(28)) + 1)
    val ts = concat(lit("2024-01-"), day, lit("T00:00:00"))
    val sales = concat(lit("{\"date\":\"2024-01-"), day,
      lit("\",\"items\":[{\"product\":\"Widget A\",\"quantity\":"),
      (pmod(id, lit(9)) + 1).cast("string"),
      lit(",\"price\":10.99}],\"total\":"),
      format_string("%.2f", pmod(id, lit(500)).cast("double") + 0.99),
      lit(",\"customer\":{\"id\":\"CUST-"),
      format_string("%08d", pmod(id * 7919L, lit(100000000L))),
      lit("\",\"region\":\"Northeast\"}}"))
    val user = concat(lit("{\"userId\":\"USER-"),
      format_string("%08d", pmod(id * 104729L, lit(100000000L))),
      lit("\",\"name\":\"Sample User\",\"email\":\"user@example.com\"," +
        "\"preferences\":{\"theme\":\""),
      element_at(array(lit("dark"), lit("light")),
        pmod(id, lit(2)).cast("int") + 1),
      lit("\",\"notifications\":true},\"lastLogin\":\""), ts, lit("\"}"))
    val metrics = concat(lit("{\"timestamp\":\""), ts,
      lit("\",\"cpu\":"),
      format_string("%.1f", pmod(id, lit(100)).cast("double") + 0.5),
      lit(",\"memory\":68.3,\"disk\":56.2," +
        "\"network\":{\"in\":1024,\"out\":2048}}"))
    val generic = concat(lit("{\"timestamp\":\""), ts,
      lit("\",\"sample\":true,\"value\":12345," +
        "\"message\":\"This is sample data of type: generic\"}"))
    val kind = pmod(id, lit(4))
    spark.range(1, n + 1).select(
      format_string("API-%06d", id).as("id"),
      element_at(
        array(lit("sales"), lit("user"), lit("metrics"), lit("generic")),
        kind.cast("int") + 1).as("dataType"),
      lit("api-sample").as("source"),
      lit(null).cast("string").as("owner"),
      when(kind === 0, sales).when(kind === 1, user)
        .when(kind === 2, metrics).otherwise(generic).as("data"))
  }

  /** Write all three fixture families into the raw zone in the given
    * format — the reference's upload_sample_data. */
  def writeAll(spark: SparkSession, root: String, fmt: String): Unit = {
    Lake.writeZone(sales(spark), root, Lake.Raw, "sales", fmt)
    Lake.writeZone(customers(spark), root, Lake.Raw, "customers", fmt)
    Lake.writeZone(products(spark), root, Lake.Raw, "products", fmt)
  }

  /** X3 fixture: a CLUSTERED embedding corpus — the data shape on
    * which IVF partition pruning shows its production fraction
    * (nProbe ≪ nCells), which the driver's deliberately near-uniform
    * `embeddings` table cannot (its true top-k spans nearly every
    * cell — FIXTURES.md documents that as the adversarial recall
    * case).
    *
    * ENGINE-REPLAYABLE like every fixture here: no RNG —
    * `cluster(id) = md5prefix32(id‖"|cl") mod nClusters`, and
    * component j of vector id is
    *
    *   (md5u(cl‖"@"‖j‖"|cc")·2−1) + (md5u(id‖"@"‖j‖"|cn")·2−1)·eps
    *
    * with md5u = first-32-md5-bits / 2³², so every cluster is a tight
    * eps-ball around a pseudo-random center in [−1,1)^dim and a DuckDB
    * oracle regenerates the exact doubles (same IEEE ops in the same
    * order — the portable-hash replay convention).
    *
    * Default cluster count = [[scaledClusters]]: population per
    * cluster stays ~128 as n grows — the IVF sizing rule (cells
    * constant-sized, cell COUNT grows with the corpus), which is what
    * keeps a fixed refineFactor·k ADC shortlist sufficient at every
    * scale (a tight cluster is indistinguishable to PQ codes, so the
    * shortlist must cover the query's whole cluster: bounded
    * population ⇒ bounded shortlist). */
  def scaledClusters(n: Long): Int = math.max(64L, n / 128L).toInt

  def clusteredEmbeddings(spark: SparkSession, n: Long, dim: Int = 16,
                          nClusters: Int = 0,
                          eps: Double = 0.05): DataFrame = {
    val nCl = if (nClusters > 0) nClusters else scaledClusters(n)
    require(n > 0 && dim > 0, "n, dim > 0")
    def md5u(c: Column): Column =
      graft.functions.Native.md5Prefix32(c).cast("double") /
        lit(4294967296.0)
    val id = col("id")
    val cl = pmod(graft.functions.Native.md5Prefix32(
      concat(id.cast("string"), lit("|cl"))), lit(nCl.toLong))
    spark.range(n).select(id.as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (md5u(concat(cl.cast("string"), lit("@"), j.cast("string"),
          lit("|cc"))) * lit(2.0) - lit(1.0)) +
        (md5u(concat(id.cast("string"), lit("@"), j.cast("string"),
          lit("|cn"))) * lit(2.0) - lit(1.0)) * lit(eps))
        .as("embedding"))
  }
}

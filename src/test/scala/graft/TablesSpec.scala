package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift canary for the driver-provided testdata.
  *
  * Round-9 lesson: the driver regenerated `/root/testdata` mid-round and
  * `events.ts` silently changed from parquet TIMESTAMP(NANOS) to plain
  * TIMESTAMP micros — 8 queries died at analysis time with no test
  * naming the cause. These asserts pin the dtype contract every loader
  * depends on, so the next regeneration fails as ONE named test instead
  * of a scatter of downstream analysis errors.
  */
class TablesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    // o_orderdate / l_shipdate: either timestamp flavor is in-contract —
    // the generator ships naive micros (reads NTZ under
    // inferTimestampNTZ); query literals compare fine against both.
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private val eitherTs = Set[DataType](TimestampType, TimestampNTZType)

  test("testdata table dtypes match the contract every loader assumes") {
    expected.foreach { case (table, cols) =>
      val got = Tables.load(spark, sf, table).schema
        .map(f => f.name -> f.dataType)
      val ok = got.size == cols.size && got.zip(cols).forall {
        case ((gn, gt), (en, et)) =>
          gn == en && (gt == et || (eitherTs(gt) && eitherTs(et)))
      }
      assert(ok, s"schema drift in $table: $got != $cols")
    }
  }

  test("events.ts parquet encoding is one the adaptive loader handles") {
    // Raw read: the only column allowed to drift. Accepted encodings:
    //  - LongType      (TIMESTAMP(NANOS) via nanosAsLong — pre-round-10)
    //  - TimestampType / TimestampNTZType (plain micros — current)
    // Anything else must fail HERE, by name, not in 8 downstream queries.
    val raw = Tables.load(spark, sf, "events").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)(raw),
      s"events.ts drifted to unhandled encoding $raw — extend Tables.events")
    val rest = Tables.load(spark, sf, "events").schema
      .filter(_.name != "ts").map(f => f.name -> f.dataType)
    assert(rest == Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))
  }

  test("Tables.events normalizes ts to epoch-nanos long for any encoding") {
    // Whatever the file ships, the loader contract is epoch-nanos long.
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == LongType)
    // Value-exactness probe: round-tripping through eventsWithTime must
    // agree with DuckDB's UTC interpretation — spot-check the min ts
    // lands in the generator's 2024 window, not shifted by a timezone.
    val minTs = ev.agg(min(col("ts"))).head.getLong(0)
    val y = Tables.eventsWithTime(spark, sf)
      .agg(min(year(col("event_time")))).head.getInt(0)
    assert(minTs > 1600000000L * 1000000000L, s"ts not epoch-nanos: $minTs")
    assert(y >= 2023 && y <= 2025, s"event_time year drifted: $y")
  }

  test("both timestamp encodings of the same instants normalize to " +
    "identical epoch-nanos (seeded randomized round-trip)") {
    import org.apache.spark.sql.functions._
    // 200 seeded random micro-precision instants across 1970-2100,
    // written as TIMESTAMP and TIMESTAMP_NTZ parquet; the loader must
    // produce the same nanos for both — any tz or unit slip diverges.
    val rnd = new scala.util.Random(42)
    val micros = Seq.fill(200)(
      math.abs(rnd.nextLong()) % (4102444800L * 1000000L))
    val dir = java.nio.file.Files.createTempDirectory("graft_enc").toString
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize(micros.zipWithIndex.map {
        case (us, i) => org.apache.spark.sql.Row(i.toLong, us)
      }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("us",
          org.apache.spark.sql.types.LongType))))
      .select(col("event_id"), lit(0L).as("user_id"),
        lit("t").as("event_type"), lit(0.0).as("value"),
        lit("{}").as("props"), col("us"))
    base.withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.mode("overwrite").parquet(s"$dir/tz/events.parquet")
    base.withColumn("ts",
        timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    assert(Tables.load(spark, s"$dir/tz", "events")
      .schema("ts").dataType == TimestampType)
    assert(Tables.load(spark, s"$dir/ntz", "events")
      .schema("ts").dataType == TimestampNTZType)
    def nanos(sub: String): Map[Long, Long] =
      Tables.events(spark, s"$dir/$sub").select("event_id", "ts")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (tz, ntz) = (nanos("tz"), nanos("ntz"))
    val expect = micros.zipWithIndex
      .map { case (us, i) => i.toLong -> us * 1000L }.toMap
    assert(tz == expect, "TimestampType path diverged from epoch-nanos")
    assert(ntz == expect, "NTZ path diverged from epoch-nanos")
  }

  test("Tables.events normalizes a synthetic TimestampType encoding too") {
    // The current files ship NTZ; cover the with-timezone branch by
    // writing a tiny TimestampType parquet and loading through Tables.
    val dir = java.nio.file.Files.createTempDirectory("graft_tts").toString
    spark.sql(
      """SELECT 1L AS event_id, TIMESTAMP'2024-03-01 12:00:00' AS ts,
        |2L AS user_id, 'click' AS event_type, 1.5 AS value,
        |'{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == LongType)
    assert(ev.head.getAs[Long]("ts") ==
      java.time.Instant.parse("2024-03-01T12:00:00Z").getEpochSecond
        * 1000000000L)
  }
}

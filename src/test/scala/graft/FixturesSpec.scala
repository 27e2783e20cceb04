package graft

import java.nio.file.Files

import graft.sources.{Catalog, Fixtures, Lake}

class FixturesSpec extends SparkSpec {

  test("fixture generators are deterministic and schema-faithful") {
    val s1 = Fixtures.sales(spark, 200)
    val s2 = Fixtures.sales(spark, 200)
    assert(s1.collect().toSeq == s2.collect().toSeq) // same rows, any run
    assert(s1.columns.toSeq == Seq("transaction_id", "date", "product",
      "region", "quantity", "unit_price", "total_price"))
    val c = Fixtures.customers(spark, 100)
    assert(c.count() == 100)
    assert(c.columns.contains("segment") && c.columns.contains("email"))
    val p = Fixtures.products(spark, 50)
    assert(p.count() == 50)
    // derived column really is quantity × unit_price
    import org.apache.spark.sql.functions._
    val bad = s1.filter(
      abs(col("total_price") - round(col("quantity") * col("unit_price"), 2))
        > 0.001).count()
    assert(bad == 0)
  }

  test("apiPayloads: deterministic valid-JSON bodies of all four " +
    "reference sample shapes (ingest-data-lambda.py:135-180)") {
    import org.apache.spark.sql.functions._
    val p1 = Fixtures.apiPayloads(spark, 100)
    val p2 = Fixtures.apiPayloads(spark, 100)
    assert(p1.collect().toSeq == p2.collect().toSeq)
    assert(p1.columns.toSeq ==
      Seq("id", "dataType", "source", "owner", "data"))
    val kinds = p1.select("dataType").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("sales", "user", "metrics", "generic"))
    // every body parses as JSON and carries its type's marker field
    val parsed = p1.withColumn("k",
      coalesce(get_json_object(col("data"), "$.total"),
        get_json_object(col("data"), "$.userId"),
        get_json_object(col("data"), "$.cpu"),
        get_json_object(col("data"), "$.sample")))
    assert(parsed.filter(col("k").isNull).count() == 0)
  }

  test("writeAll lands all three fixture families in the raw zone") {
    val root = Files.createTempDirectory("graft_fixtures").toString
    Fixtures.writeAll(spark, root, "parquet")
    for (ds <- Seq("sales", "customers", "products")) {
      val back = Lake.read(spark, Lake.zonePath(root, Lake.Raw, ds),
        "parquet")
      assert(back.count() > 0, ds)
    }
  }

  test("registerPersistent creates a queryable external table; " +
    "drop keeps the data") {
    val root = Files.createTempDirectory("graft_cat").toString
    Fixtures.products(spark, 30).write.parquet(s"$root/products")
    Catalog.registerPersistent(spark, "fixture_products", s"$root/products")
    assert(spark.sql("SELECT count(*) FROM fixture_products")
      .head().getLong(0) == 30)
    // external semantics: dropping the table must not delete the files
    spark.sql("DROP TABLE fixture_products")
    assert(spark.read.parquet(s"$root/products").count() == 30)
  }
}

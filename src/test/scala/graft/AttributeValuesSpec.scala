package graft

import org.apache.spark.sql.functions._

import graft.functions.AttributeValues

class AttributeValuesSpec extends SparkSpec {

  import spark.implicits._

  test("scalar tags decode with reference coercions") {
    val df = Seq(
      """{"a":{"S":"hi"},"b":{"N":"2"},"c":{"BOOL":false},"d":{"NULL":true}}""")
      .toDF("raw")
    val item = AttributeValues.parseItem(col("raw"))
    val r = df.select(
      AttributeValues.str(item.getItem("a")).as("s"),
      AttributeValues.num(item.getItem("b")).as("n"),
      AttributeValues.bool(item.getItem("c")).as("bl"),
      AttributeValues.isNullTag(item.getItem("d")).as("nl")).head()
    assert(r.getString(0) == "hi")
    assert(r.getDouble(1) == 2.0) // N decodes as float, like the reference
    assert(!r.getBoolean(2))
    assert(r.getBoolean(3))
  }

  test("sets canonicalize: distinct + sorted; BS base64-decodes") {
    val df = Seq(
      """{"ss":{"SS":["b","a","b"]},"ns":{"NS":["10","2"]},"bs":{"BS":["aGk="]}}""")
      .toDF("raw")
    val item = AttributeValues.parseItem(col("raw"))
    val r = df.select(
      AttributeValues.strSet(item.getItem("ss")).as("ss"),
      AttributeValues.numSet(item.getItem("ns")).as("ns"),
      AttributeValues.binSet(item.getItem("bs")).as("bs")).head()
    assert(r.getSeq[String](0) == Seq("a", "b"))
    assert(r.getSeq[Double](1) == Seq(2.0, 10.0)) // numeric, not lexicographic
    assert(r.getSeq[String](2) == Seq("6869")) // "hi" in hex
  }

  test("itemToJson: recursion, sorted keys, string escaping") {
    val df = Seq(
      ("""{"z":{"S":"q\"uo\\te"},"a":{"L":[{"N":"1"},{"M":{"k":{"BOOL":true}}}]}}""", 1))
      .toDF("raw", "id")
    val json = df.select(
      AttributeValues.itemToJson(AttributeValues.parseItem(col("raw")), 3))
      .as[String].head()
    // keys sorted (a before z), nested L/M decoded, quote+backslash escaped
    assert(json ==
      """{"a":[1.0,{"k":true}],"z":"q\"uo\\te"}""")
    // and it parses back as real JSON
    val round = df.sparkSession.range(1).select(
      from_json(lit(json), org.apache.spark.sql.types.DataTypes
        .createMapType(org.apache.spark.sql.types.DataTypes.StringType,
          org.apache.spark.sql.types.DataTypes.StringType)))
    assert(round.head() != null)
  }

  test("nesting beyond depth decodes to null, not an error") {
    val df = Seq(
      """{"d":{"M":{"x":{"M":{"y":{"M":{"z":{"M":{"w":{"S":"deep"}}}}}}}}}}""")
      .toDF("raw")
    // depth 2: the M at level 3 falls off the schema → null
    val json = df.select(
      AttributeValues.itemToJson(AttributeValues.parseItem(col("raw"), 2), 2))
      .as[String].head()
    assert(json == """{"d":{"x":{"y":null}}}""")
  }
}

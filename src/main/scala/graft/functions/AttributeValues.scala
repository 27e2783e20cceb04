package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P12: the tagged semi-structured type-coercion suite — DynamoDB
  * AttributeValue JSON (`{"S": …}`, `{"N": …}`, `{"BOOL": …}`,
  * `{"NULL": …}`, `{"L": […]}`, `{"M": {…}}`, `{"SS": […]}`,
  * `{"NS": […]}`, `{"BS": […]}`) decoded with `from_json` + recursive
  * coercion expressions, mirroring the reference's parser
  * (/root/reference/python-data-ingestions/index-data-lambda.py:413-441):
  * numbers → double, BOOL passthrough, NULL → null, L/M recursive,
  * SS/NS/BS as sets (canonicalized sorted-distinct here — Python `set`
  * is unordered, a Spark column needs a total order), BS base64-decoded.
  *
  * Everything is a pure expression tree: `from_json` parse once, then
  * field coercions — codegen-friendly, no UDF. Recursion is bounded at
  * expression-build time by `depth` (tag nesting deeper than `depth`
  * decodes as null, like the reference would stack-overflow-guard).
  */
object AttributeValues {

  /** Struct schema of one AttributeValue, with L/M nested to `depth`. */
  def schema(depth: Int): StructType = {
    val base = Seq(
      StructField("S", StringType),
      StructField("N", StringType),
      StructField("BOOL", BooleanType),
      StructField("NULL", BooleanType),
      StructField("SS", ArrayType(StringType)),
      StructField("NS", ArrayType(StringType)),
      StructField("BS", ArrayType(StringType)))
    if (depth <= 0) StructType(base)
    else StructType(base ++ Seq(
      StructField("L", ArrayType(schema(depth - 1))),
      StructField("M", MapType(StringType, schema(depth - 1)))))
  }

  /** Schema of a whole DynamoDB item: attr name → AttributeValue. */
  def itemSchema(depth: Int): MapType = MapType(StringType, schema(depth))

  /** Parse one AttributeValue JSON document. */
  def parse(json: Column, depth: Int = 3): Column =
    from_json(json, schema(depth))

  /** Parse a whole-item JSON document (map of attr → AttributeValue). */
  def parseItem(json: Column, depth: Int = 3): Column =
    from_json(json, itemSchema(depth))

  // ---- typed scalar coercions (reference lines 423-431) -------------
  def str(v: Column): Column = v.getField("S")
  def num(v: Column): Column = v.getField("N").cast("double")
  def bool(v: Column): Column = v.getField("BOOL")
  def isNullTag(v: Column): Column = v.getField("NULL").isNotNull

  // ---- set coercions (reference lines 434-441), canonical order -----
  def strSet(v: Column): Column =
    array_sort(array_distinct(v.getField("SS")))
  def numSet(v: Column): Column =
    array_sort(array_distinct(
      transform(v.getField("NS"), _.cast("double"))))
  /** BS: base64-decode each member; canonicalized as sorted hex. */
  def binSet(v: Column): Column =
    array_sort(array_distinct(
      transform(v.getField("BS"), b => lower(hex(unbase64(b))))))

  /** Map entries sorted by key — explicit comparator because the entry
    * structs carry complex values array_sort can't order naturally. */
  private def sortedEntries(m: Column): Column =
    array_sort(map_entries(m), (a: Column, b: Column) =>
      when(a.getField("key") < b.getField("key"), lit(-1))
        .when(a.getField("key") > b.getField("key"), lit(1))
        .otherwise(lit(0)))

  private def jsonStr(s: Column): Column =
    concat(lit("\""),
      regexp_replace(regexp_replace(s, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\""))

  private def jsonNum(n: Column): Column = n.cast("double").cast("string")

  /** Recursive decode of one AttributeValue to canonical JSON text —
    * the Spark analog of the reference's "DynamoDB JSON → regular JSON"
    * conversion, with deterministic set/map ordering. Tag precedence
    * matches the reference's if/elif chain exactly. */
  def toJson(v: Column, depth: Int): Column = {
    val scalarArms = when(v.isNull, lit(null).cast("string"))
      .when(v.getField("S").isNotNull, jsonStr(v.getField("S")))
      .when(v.getField("N").isNotNull, jsonNum(v.getField("N")))
      .when(v.getField("BOOL").isNotNull,
        when(v.getField("BOOL"), lit("true")).otherwise(lit("false")))
      .when(v.getField("NULL").isNotNull, lit("null"))
    val nestedArms =
      if (depth <= 0) scalarArms
      else scalarArms
        .when(v.getField("L").isNotNull,
          concat(lit("["),
            concat_ws(",",
              transform(v.getField("L"), e => toJson(e, depth - 1))),
            lit("]")))
        .when(v.getField("M").isNotNull,
          concat(lit("{"),
            concat_ws(",",
              transform(sortedEntries(v.getField("M")),
                kv => concat(jsonStr(kv.getField("key")), lit(":"),
                  toJson(kv.getField("value"), depth - 1)))),
            lit("}")))
    nestedArms
      .when(v.getField("SS").isNotNull,
        concat(lit("["),
          concat_ws(",", transform(strSet(v), jsonStr(_))), lit("]")))
      .when(v.getField("NS").isNotNull,
        concat(lit("["),
          concat_ws(",",
            transform(numSet(v), x => x.cast("string"))), lit("]")))
      .when(v.getField("BS").isNotNull,
        concat(lit("["),
          concat_ws(",", transform(binSet(v), jsonStr(_))), lit("]")))
      .otherwise(lit("null"))
  }

  /** Whole item → canonical JSON object text (attr names sorted). */
  def itemToJson(item: Column, depth: Int = 3): Column =
    when(item.isNull, lit(null).cast("string"))
      .otherwise(concat(lit("{"),
        concat_ws(",",
          transform(sortedEntries(item),
            kv => concat(jsonStr(kv.getField("key")), lit(":"),
              toJson(kv.getField("value"), depth)))),
        lit("}")))
}

package graft

import graft.config.Config.{InputFeatures, SchemaInference}
import graft.features.Features
import org.apache.spark.sql.types._

/** Input feature semantics (reference: input.py:163-286) + the JSON-schema
  * converter (utils/spark.py:28-113). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a", "x"), (2, "b", "y"), (3, "c", "z"))
    .toDF("id", "name", "junk")

  test("filter/drop/select compose in reference order") {
    val out = Features.applyAll(df, InputFeatures(
      filterExpression = Some("id >= 2"),
      dropColumns = Seq("junk"),
      selectColumns = Seq("id")))
    assert(out.columns.toSeq === Seq("id"))
    assert(out.as[Int].collect().toSet === Set(2, 3))
  }

  test("CDC-injected filter is AND-combined with the configured one") {
    val out = Features.applyAll(df, InputFeatures(
      filterExpression = Some("id >= 2")), extraFilter = Some("id <= 2"))
    assert(out.select("id").as[Int].collect().toSeq === Seq(2))
  }

  test("schema inference parses a JSON column with a DDL schema") {
    val j = Seq((1, """{"a": 5, "b": "hi"}""")).toDF("id", "payload")
    val out = Features.applySchemaInference(j,
      SchemaInference("payload", "parsed", schemaDdl = Some("a INT, b STRING")))
    val row = out.selectExpr("parsed.a", "parsed.b").collect()(0)
    assert(row.getInt(0) === 5 && row.getString(1) === "hi")
  }

  test("JSON-schema converter maps types incl. nested object/array (utils/spark.py:28-113)") {
    val schema = Features.jsonSchemaToSpark(
      """{"type":"object","properties":{
        | "s":{"type":"string","description":"a string"},
        | "i":{"type":"integer"},
        | "n":{"type":"number"},
        | "t":{"type":"string","format":"date-time"},
        | "o":{"type":"object","properties":{"x":{"type":"boolean"}}},
        | "arr":{"type":"array","items":{"type":"long"}},
        | "objs":{"type":"array","items":{"type":"object",
        |   "properties":{"y":{"type":"double"}}}}}}""".stripMargin)
    def f(n: String) = schema(n).dataType
    assert(f("s") === StringType)
    assert(f("i") === IntegerType)
    assert(f("n") === FloatType)          // number→Float like the reference
    assert(f("t") === TimestampType)      // format wins over type
    assert(f("o") === StructType(Seq(StructField("x", BooleanType))))
    assert(f("arr") === ArrayType(LongType))
    assert(f("objs") === ArrayType(StructType(Seq(StructField("y", DoubleType)))))
    assert(schema("s").metadata.getString("comment") === "a string")
  }

  test("avro payloads decode against the writer schema into typed structs") {
    val avroSchema =
      """{"type":"record","name":"Rec","fields":[
        | {"name":"a","type":"int"},{"name":"b","type":"string"}]}""".stripMargin
    // encode two records with avro-core (what a registry producer would do)
    def encode(a: Int, b: String): Array[Byte] = {
      val schema = new org.apache.avro.Schema.Parser().parse(avroSchema)
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("a", a); rec.put("b", b)
      val out = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema).write(rec, enc)
      enc.flush()
      out.toByteArray
    }
    val df = Seq((1L, encode(5, "hi")), (2L, encode(7, "yo")))
      .toDF("id", "payload")
    val out = Features.applyAvroDecode(df, "payload", "parsed",
      avroSchema, "a INT, b STRING")
    val rows = out.selectExpr("id", "parsed.a", "parsed.b")
      .as[(Long, Int, String)].collect().toSet
    assert(rows === Set((1L, 5, "hi"), (2L, 7, "yo")))
  }
}

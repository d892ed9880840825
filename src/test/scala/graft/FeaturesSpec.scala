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

  // ------------------------------------------------- schema registry

  /** Confluent-style stub: /subjects/{s}/versions/latest with basic auth
    * (the wire call confluent_kafka makes for the reference's
    * read_from_schema_registry, utils/spark.py:145-177). */
  private def withRegistryStub(subjects: Map[String, (String, String)])
                              (f: String => Unit): Unit = {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        def send(code: Int, body: String): Unit = {
          val b = body.getBytes("UTF-8")
          ex.sendResponseHeaders(code, b.length)
          ex.getResponseBody.write(b); ex.close()
        }
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val expected = "Basic " + java.util.Base64.getEncoder
          .encodeToString("rk:rs".getBytes("UTF-8"))
        if (!auth.contains(expected)) { send(401, """{"error_code":401}"""); return }
        val Pat = "/subjects/([^/]+)/versions/latest".r
        ex.getRequestURI.getPath match {
          case Pat(subj) => subjects.get(subj) match {
            case Some((tpe, schema)) =>
              val m = new com.fasterxml.jackson.databind.ObjectMapper()
              val node = m.createObjectNode()
              node.put("subject", subj); node.put("id", 7); node.put("version", 3)
              if (tpe != "AVRO") node.put("schemaType", tpe)
              node.put("schema", schema)
              send(200, m.writeValueAsString(node))
            case None => send(404, """{"error_code":40401,"message":"not found"}""")
          }
          case _ => send(404, """{"error_code":404}""")
        }
      }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("schema inference fetches a JSON schema from the registry stub") {
    val jsonSchema =
      """{"type":"object","properties":{"a":{"type":"integer"},"b":{"type":"string"}}}"""
    withRegistryStub(Map("orders-value" -> ("JSON", jsonSchema))) { base =>
      val df = Seq((1L, """{"a":5,"b":"hi"}""")).toDF("id", "payload")
      val out = Features.applySchemaInference(df, SchemaInference(
        "payload", "parsed",
        registryAddress = Some(base), registrySubject = Some("orders-value"),
        registryClientId = Some("rk"), registryClientSecret = Some("rs")))
      assert(out.selectExpr("parsed.a", "parsed.b")
        .as[(Int, String)].collect().toSeq === Seq((5, "hi")))
    }
  }

  test("registry client surfaces auth failures and missing subjects") {
    withRegistryStub(Map.empty) { base =>
      val bad = new graft.sources.SchemaRegistryClient(base, Some("rk"), Some("wrong"))
      val e1 = intercept[graft.sources.SchemaRegistryRequestException](
        bad.latestVersion("s"))
      assert(e1.getMessage.contains("401"))
      val ok = new graft.sources.SchemaRegistryClient(base, Some("rk"), Some("rs"))
      val e2 = intercept[graft.sources.SchemaRegistryRequestException](
        ok.latestVersion("nope"))
      assert(e2.getMessage.contains("404"))
    }
  }

  test("registry-fetched avro writer schema drives the avro decode path") {
    val avroSchema =
      """{"type":"record","name":"Rec","fields":[
        | {"name":"a","type":"int"},{"name":"b","type":"string"}]}""".stripMargin
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
    withRegistryStub(Map("recs-value" -> ("AVRO", avroSchema))) { base =>
      val client = new graft.sources.SchemaRegistryClient(base, Some("rk"), Some("rs"))
      val fetched = client.latestVersion("recs-value")
      assert(fetched.schemaType === "AVRO" && fetched.version === 3)
      val df = Seq((1L, encode(9, "reg"))).toDF("id", "payload")
      val out = Features.applyAvroDecode(df, "payload", "parsed",
        fetched.schemaStr, "a INT, b STRING")
      assert(out.selectExpr("parsed.a", "parsed.b")
        .as[(Int, String)].collect().toSeq === Seq((9, "reg")))
    }
  }
}

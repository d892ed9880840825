package graft.features

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Config.{InputFeatures, SchemaInference}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Input post-step features (reference:
 * core/execution/operator/spark_task/input.py:163-286). All are plain
 * declarative transforms, so filters and projections applied here reach
 * Catalyst *before* any action — pushdown to the scan is automatic.
 *
 * Application order matches the reference's `post_do_step_features` list
 * (input.py:31-37): filter → schema-inference → drop → select.
 */
object Features {

  def applyFilter(df: DataFrame, expression: String): DataFrame =
    df.filter(expression)

  def applyDrop(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty) df else df.drop(cols: _*)

  def applySelect(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty) df else df.select(cols.map(col): _*)

  /** `schema_inference_from_registry` (input.py:227-286): parse a JSON
    * string column into a typed struct with `from_json`, schema from a
    * Spark DDL string, a JSON-schema document, or the latest version of a
    * Confluent schema-registry subject (core/utils/spark.py:180-204 —
    * registry-fetched JSON schema through the same JSON-schema→Spark
    * conversion as the file path). */
  def applySchemaInference(df: DataFrame, si: SchemaInference): DataFrame = {
    val schema: StructType = (si.schemaDdl, si.schemaJsonFile) match {
      case (Some(ddl), _) => StructType.fromDDL(ddl)
      case (None, Some(file)) =>
        jsonSchemaToSpark(java.nio.file.Files.readString(java.nio.file.Paths.get(file)))
      case (None, None) if si.registryAddress.isDefined && si.registrySubject.isDefined =>
        val client = new graft.sources.SchemaRegistryClient(
          si.registryAddress.get, si.registryClientId, si.registryClientSecret)
        jsonSchemaToSpark(client.latestVersion(si.registrySubject.get).schemaStr)
      case _ => throw new IllegalArgumentException(
        "schema_inference needs schema_ddl, schema_json_file, or " +
          "schema_registry_address + schema_registry_subject")
    }
    df.withColumn(si.targetColumn,
      from_json(col(si.sourceColumn).cast("string"), schema))
  }

  /** Apply the full post-step chain in reference order; CDC-injected
    * filters are AND-combined with the configured one (input.py:133-145). */
  def applyAll(df: DataFrame, f: InputFeatures,
               extraFilter: Option[String] = None): DataFrame = {
    // parenthesized: an OR in the user filter must not escape the CDC
    // range bound via AND/OR precedence
    val filterExpr = (f.filterExpression, extraFilter) match {
      case (Some(a), Some(b)) => Some(s"($a) AND ($b)")
      case (a, b) => a.orElse(b)
    }
    var out = df
    filterExpr.foreach(e => out = applyFilter(out, e))
    f.schemaInference.foreach(si => out = applySchemaInference(out, si))
    out = applyDrop(out, f.dropColumns)
    out = applySelect(out, f.selectColumns)
    out
  }

  /**
   * Avro payload decoding without the spark-avro module (absent from this
   * environment; avro-core ships with Spark itself): each binary payload
   * is decoded against the writer schema with GenericDatumReader, emitted
   * as Avro's canonical JSON encoding, and parsed into a typed struct by
   * `from_json` — covering the `from_avro` half of the
   * schema_inference_from_registry feature (input.py:227-286) offline.
   *
   * @param avroSchemaJson the Avro writer schema (registry-fetched in the
   *                       reference; supplied literally here)
   * @param sparkDdl       struct DDL for the decoded payload
   */
  def applyAvroDecode(df: DataFrame, sourceColumn: String, targetColumn: String,
                      avroSchemaJson: String, sparkDdl: String): DataFrame = {
    val toJson = udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else {
        val schema = new org.apache.avro.Schema.Parser().parse(avroSchemaJson)
        val reader = new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](schema)
        val decoder = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(payload, null)
        reader.read(null, decoder).toString // Avro's canonical JSON form
      }
    }
    df.withColumn(targetColumn,
      from_json(toJson(col(sourceColumn)), StructType.fromDDL(sparkDdl)))
  }

  // ------------------------------------------ JSON-schema → StructType

  /** Recursive JSON-Schema → Spark schema converter
    * (reference: core/utils/spark.py:28-113). `format` wins over `type`;
    * mapping: object→Struct, array→Array, number→Float, long→Long,
    * double→Double, boolean→Boolean, integer→Integer,
    * date-time→Timestamp, date→Date, default string; `description`
    * becomes a `comment` metadata entry. */
  def jsonSchemaToSpark(schemaJson: String): StructType = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    structOf(m.readTree(schemaJson))
  }

  private def scalarType(t: String): DataType = t match {
    case "number" => FloatType
    case "long" => LongType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "integer" => IntegerType
    case "date-time" => TimestampType
    case "date" => DateType
    case _ => StringType
  }

  private def typeName(n: JsonNode): String =
    Option(n.get("format")).map(_.asText())
      .orElse(Option(n.get("type")).map(_.asText()))
      .getOrElse("string")

  private def dataTypeOf(n: JsonNode): DataType = typeName(n) match {
    case "object" => structOf(n)
    case "array" => ArrayType(dataTypeOf(n.get("items")))
    case t => scalarType(t)
  }

  private def structOf(n: JsonNode): StructType = {
    import scala.jdk.CollectionConverters._
    val props = n.get("properties")
    StructType(props.properties().asScala.toSeq.map { e =>
      val meta = Option(e.getValue.get("description"))
        .map(d => new MetadataBuilder().putString("comment", d.asText()).build())
        .getOrElse(Metadata.empty)
      StructField(e.getKey, dataTypeOf(e.getValue), nullable = true, meta)
    })
  }
}

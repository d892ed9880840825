package graft.config

import com.fasterxml.jackson.databind.JsonNode

/**
 * Declarative task model — the Spark-native shape of the reference's
 * pydantic config schemas (reference: core/schemas/input.py:17-77,
 * output.py:12-86, refresh.py:6-54, deploy.py:186-241).
 *
 * A task = named inputs → one execution → named outputs, plus a refresh
 * policy and a state location. Everything is data; the runner
 * ([[graft.task.SparkTask]]) interprets it.
 */
object Config {

  /** Input feature set (core/schemas/features.py:21-105,176-194). */
  final case class InputFeatures(
      filterExpression: Option[String] = None,
      dropColumns: Seq[String] = Nil,
      selectColumns: Seq[String] = Nil,
      // schema_inference_from_registry: parse `sourceColumn` (JSON text)
      // into `targetColumn` using a Spark DDL or JSON-schema file
      schemaInference: Option[SchemaInference] = None,
      changeData: Option[ChangeData] = None)

  final case class SchemaInference(
      sourceColumn: String,
      targetColumn: String,
      schemaDdl: Option[String] = None,
      schemaJsonFile: Option[String] = None,
      // Confluent registry fetch (core/utils/spark.py:145-204):
      // latest version of `registrySubject` from `registryAddress`,
      // basic-auth'd with clientId/clientSecret
      registryAddress: Option[String] = None,
      registrySubject: Option[String] = None,
      registryClientId: Option[String] = None,
      registryClientSecret: Option[String] = None)

  /** CDC feature config (features.py ChangeFeature; §2.7).
    * `changeFeatureType`: "attribute" (range filter on a column) or
    * "file_path_cdc_feed" (ingest only files modified since last run). */
  final case class ChangeData(
      attribute: String,
      valueType: String = "integer", // integer | date | timestamp
      startValue: Option[String] = None,
      endValue: Option[String] = None,
      changeFeatureType: String = "attribute")

  final case class InputConf(
      name: String,
      path: String,
      source: String,                  // csv | parquet | json | jdbc | kafka | odata | graft (managed)
      sourceType: String = "file",     // file | table
      sourceExtractType: String = "batch", // batch | stream
      features: InputFeatures = InputFeatures(),
      options: Map[String, String] = Map.empty,
      schemaDdl: Option[String] = None)

  /** One declarative data-quality gate on an output: `rule` in the
    * Expectations DSL (see `Expectations.parseRules`), `severity`
    * using the step-result protocol's event severities — FAIL aborts
    * the write, CONTINUE records the verdict and proceeds. */
  final case class OutputExpectation(
      rule: String,
      severity: String = "FAIL")       // FAIL | CONTINUE

  /** Drift monitoring per output (`Expectations.metricsProfile` +
    * `driftCheck`): each batch's integer metrics are judged against
    * the metrics table's accumulated history; verdicts record in the
    * state store, and `severity = FAIL` aborts the write on any
    * drifted metric (the failed batch's profile is NOT appended, so a
    * bad load can never poison its own baseline). */
  final case class OutputDrift(
      metrics: String,                  // metrics DSL (count | nulls:c | distinct:c)
      metricsPath: String,              // managed table accumulating the history
      tolerancePpm: Long = 200000L,
      severity: String = "CONTINUE")    // FAIL | CONTINUE

  final case class OutputConf(
      name: String,
      path: String,
      sink: String = "graft",
      sinkType: String = "file",
      writeType: String = "append",    // append | overwrite | scd1 | scd2 | scd3
      keyAttributes: Seq[String] = Nil,
      columnAttributes: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty,
      triggerMode: Option[String] = None,      // once | availableNow | processingTime=...
      checkpointLocation: Option[String] = None,
      expectations: Seq[OutputExpectation] = Nil,
      drift: Option[OutputDrift] = None)

  final case class RefreshPolicy(
      refreshType: String = "incremental",     // stream | incremental | backfill
      interval: String = "day",
      startValue: Option[String] = None,
      endValue: Option[String] = None)

  final case class TaskConf(
      name: String,
      inputs: Seq[InputConf],
      executionClass: Option[String] = None,   // graft.task.Transform impl FQCN
      executionSql: Option[String] = None,     // or a SQL-text transform
      executionCode: Option[String] = None,    // or Scala source evaluating to a Transform
      outputs: Seq[OutputConf],
      refreshPolicy: RefreshPolicy = RefreshPolicy(),
      stateLocation: Option[String] = None,
      sparkConf: Map[String, String] = Map.empty)

  // ------------------------------------------------------------- JSON

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  import scala.jdk.CollectionConverters._

  private def strSeq(n: JsonNode, field: String): Seq[String] =
    Option(n.get(field)).map {
      case a if a.isArray => a.elements().asScala.map(_.asText()).toSeq
      case s => s.asText().split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }.getOrElse(Nil)

  private def strMap(n: JsonNode, field: String): Map[String, String] =
    Option(n.get(field)).map { o =>
      o.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)

  private def optStr(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText())

  private def parseFeatures(n: JsonNode): InputFeatures = {
    if (n == null) return InputFeatures()
    InputFeatures(
      filterExpression = optStr(n, "filter_expression"),
      dropColumns = strSeq(n, "drop_columns"),
      selectColumns = strSeq(n, "select_columns"),
      schemaInference = Option(n.get("schema_inference")).map { s =>
        SchemaInference(s.get("source_column").asText(), s.get("target_column").asText(),
          optStr(s, "schema_ddl"), optStr(s, "schema_json_file"),
          registryAddress = optStr(s, "schema_registry_address"),
          registrySubject = optStr(s, "schema_registry_subject"),
          registryClientId = optStr(s, "client_id"),
          registryClientSecret = optStr(s, "client_secret"))
      },
      changeData = Option(n.get("change_data")).map { c =>
        ChangeData(c.get("attribute").asText(),
          optStr(c, "value_type").getOrElse("integer"),
          optStr(c, "start_value"), optStr(c, "end_value"),
          optStr(c, "change_feature_type").getOrElse("attribute"))
      })
  }

  /** Parse a task config JSON document (the `task.json` the reference CLI
    * consumes, core/task/spark/cli.py:68-84). */
  def parseTask(json: String): TaskConf = {
    val n = mapper.readTree(json)
    TaskConf(
      name = n.get("name").asText(),
      inputs = Option(n.get("inputs")).map(_.elements().asScala.toSeq).getOrElse(Nil).map { i =>
        InputConf(
          name = i.get("name").asText(),
          path = i.get("path").asText(),
          source = i.get("source").asText(),
          sourceType = optStr(i, "source_type").getOrElse("file"),
          sourceExtractType = optStr(i, "source_extract_type").getOrElse("batch"),
          features = parseFeatures(i.get("features")),
          options = strMap(i, "options"),
          schemaDdl = optStr(i, "source_schema"))
      },
      executionClass = optStr(n, "execution_class"),
      executionSql = optStr(n, "execution_sql"),
      executionCode = optStr(n, "execution_code"),
      outputs = Option(n.get("outputs")).map(_.elements().asScala.toSeq).getOrElse(Nil).map { o =>
        OutputConf(
          name = o.get("name").asText(),
          path = o.get("path").asText(),
          sink = optStr(o, "sink").getOrElse("graft"),
          sinkType = optStr(o, "sink_type").getOrElse("file"),
          writeType = optStr(o, "write_type").getOrElse("append"),
          keyAttributes = strSeq(o, "key_attributes"),
          columnAttributes = strSeq(o, "column_attributes"),
          partitionBy = strSeq(o, "partition_by"),
          options = strMap(o, "options"),
          triggerMode = optStr(o, "trigger"),
          checkpointLocation = optStr(o, "checkpoint_location"),
          expectations = Option(o.get("expectations"))
            .map(_.elements().asScala.toSeq).getOrElse(Nil).map { e =>
              OutputExpectation(
                rule = e.get("rule").asText(),
                severity = optStr(e, "severity").getOrElse("FAIL"))
            },
          drift = Option(o.get("drift")).map { d =>
            OutputDrift(
              metrics = d.get("metrics").asText(),
              metricsPath = d.get("metrics_path").asText(),
              tolerancePpm = Option(d.get("tolerance_ppm"))
                .map(_.asLong()).getOrElse(200000L),
              severity = optStr(d, "severity").getOrElse("CONTINUE"))
          })
      },
      refreshPolicy = Option(n.get("refresh_policy")).map { r =>
        RefreshPolicy(optStr(r, "type").getOrElse("incremental"),
          optStr(r, "interval").getOrElse("day"),
          optStr(r, "start_value"), optStr(r, "end_value"))
      }.getOrElse(RefreshPolicy()),
      stateLocation = optStr(n, "state_location"),
      sparkConf = strMap(n, "spark_config"))
  }

  /** Validation rules from the reference (input.py:41-72, output.py:38-80,
    * task.py:211-266): table paths look like `cat.schema.table`, file paths
    * like paths; stream inputs require a stream refresh policy; execution
    * must exist; output names unique. Returns the list of violations. */
  def validate(t: TaskConf): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (t.name.isEmpty) errs += "task name empty"
    if (t.inputs.isEmpty) errs += "task has no inputs"
    if (t.outputs.isEmpty) errs += "task has no outputs"
    if (t.executionClass.isEmpty && t.executionSql.isEmpty && t.executionCode.isEmpty)
      errs += "task has neither execution_class nor execution_sql nor execution_code"
    val dupIn = t.inputs.groupBy(_.name).collect { case (k, v) if v.size > 1 => k }
    if (dupIn.nonEmpty) errs += s"duplicate input names: ${dupIn.mkString(",")}"
    val dupOut = t.outputs.groupBy(_.name).collect { case (k, v) if v.size > 1 => k }
    if (dupOut.nonEmpty) errs += s"duplicate output names: ${dupOut.mkString(",")}"
    t.inputs.foreach { i =>
      val tableLike = i.path.matches("[\\w]+\\.[\\w]+\\.[\\w]+")
      if (i.sourceType == "table" && !tableLike)
        errs += s"input ${i.name}: source_type=table but path '${i.path}' is not catalog.schema.table"
      if (i.sourceType == "file" && tableLike)
        errs += s"input ${i.name}: source_type=file but path '${i.path}' looks like a table"
      if (i.sourceExtractType == "stream" && t.refreshPolicy.refreshType != "stream")
        errs += s"input ${i.name}: stream extract requires refresh_policy.type=stream"
    }
    t.outputs.foreach { o =>
      if (!Set("append", "overwrite", "selective_overwrite",
          "scd1", "scd2", "scd3").contains(o.writeType))
        errs += s"output ${o.name}: unknown write_type ${o.writeType}"
      if (o.writeType == "selective_overwrite" && o.partitionBy.isEmpty)
        errs += s"output ${o.name}: selective_overwrite requires partition_by"
      if (Set("scd1", "scd2", "scd3").contains(o.writeType) && o.keyAttributes.isEmpty)
        errs += s"output ${o.name}: ${o.writeType} requires key_attributes"
      if (o.writeType == "scd3" && o.columnAttributes.isEmpty)
        errs += s"output ${o.name}: scd3 requires column_attributes"
      o.drift.foreach { d =>
        try graft.operators.Expectations.parseMetrics(d.metrics)
        catch { case e: IllegalArgumentException =>
          errs += s"output ${o.name}: drift metrics — ${e.getMessage}" }
        if (!Set("FAIL", "CONTINUE").contains(d.severity.toUpperCase))
          errs += s"output ${o.name}: drift severity must be FAIL or CONTINUE, got ${d.severity}"
        if (d.tolerancePpm < 0)
          errs += s"output ${o.name}: drift tolerance_ppm must be >= 0"
        if (d.metricsPath.isEmpty)
          errs += s"output ${o.name}: drift metrics_path empty"
      }
    }
    if (t.refreshPolicy.refreshType == "backfill" &&
        (t.refreshPolicy.startValue.isEmpty || t.refreshPolicy.endValue.isEmpty))
      errs += "backfill refresh requires start_value and end_value"
    errs.result()
  }
}

package graft

import graft.config.Config
import graft.config.Config._
import graft.meta.Meta
import graft.secrets.MapSecretBackend
import graft.table.ManagedTable
import graft.task.{SimpleTransform, SparkTask, TaskValidationError}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Identity transform resolvable by reflection (execution "module" mode). */
class IdentityTransform extends SimpleTransform {
  def transform(input: DataFrame): DataFrame = input
}

/** End-to-end task lifecycle (mirrors reference test_batch.py:43 csv→append,
  * :668 CDC two runs, :337 secrets; config parse/validation task.py:211-266). */
class TaskSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq((1, "one", 10), (2, "two", 20), (3, "three", 30))
    .toDF("id", "name", "offset")

  test("task JSON parses into the full config model") {
    val t = Config.parseTask(
      """{"name":"t1",
        | "inputs":[{"name":"in1","path":"/tmp/x.csv","source":"csv",
        |   "features":{"filter_expression":"id > 1","drop_columns":"junk",
        |     "change_data":{"attribute":"id","value_type":"integer"}},
        |   "options":{"header":"false"}}],
        | "execution_sql":"SELECT * FROM in1",
        | "outputs":[{"name":"out1","path":"/tmp/t","write_type":"scd1",
        |   "key_attributes":["id"],"options":{"now":"2026-01-01 00:00:00"}}],
        | "refresh_policy":{"type":"incremental"},
        | "state_location":"/tmp/state"}""".stripMargin)
    assert(t.name === "t1")
    assert(t.inputs.head.features.filterExpression === Some("id > 1"))
    assert(t.inputs.head.features.changeData.get.attribute === "id")
    assert(t.outputs.head.keyAttributes === Seq("id"))
    assert(Config.validate(t) === Nil)
  }

  test("validation catches missing keys, bad write type, stream mismatch") {
    val bad = TaskConf("t", inputs = Seq(
      InputConf("in1", "/tmp/f", "csv", sourceExtractType = "stream")),
      executionSql = Some("SELECT 1"),
      outputs = Seq(
        OutputConf("o1", "/tmp/t", writeType = "scd1"),
        OutputConf("o2", "/tmp/t", writeType = "bogus")))
    val errs = Config.validate(bad)
    assert(errs.exists(_.contains("scd1 requires key_attributes")))
    assert(errs.exists(_.contains("unknown write_type")))
    assert(errs.exists(_.contains("requires refresh_policy.type=stream")))
    assertThrows[TaskValidationError] { SparkTask.run(spark, bad) }
  }

  test("csv → filter feature → sql transform → append → re-read (test_batch.py:43)") {
    val srcDir = tmpDir("task_csv_src")
    data.write.option("header", "true").csv(srcDir)
    val sink = tmpDir("task_csv_sink")
    val t = TaskConf("e2e",
      inputs = Seq(InputConf("in1", srcDir, "csv",
        features = InputFeatures(filterExpression = Some("id > 1")))),
      executionSql = Some("SELECT id, name, offset FROM in1"),
      outputs = Seq(OutputConf("out1", sink, writeType = "append",
        options = Map("now" -> "2026-01-01 00:00:00"))))
    SparkTask.run(spark, t)
    val back = ManagedTable(spark, sink).read
    assert(back.count() === 2)
    assert(back.select("id").as[Int].collect().toSet === Set(2, 3))
    assert(back.columns.contains(Meta.ValidToTs))
  }

  test("output expectations: FAIL aborts the write, CONTINUE records and proceeds") {
    val srcDir = tmpDir("task_exp_src")
    data.write.parquet(srcDir) // offsets 10,20,30
    val sink = tmpDir("task_exp_sink")
    val state = tmpDir("task_exp_state")
    def conf(exp: OutputExpectation*) = TaskConf("exp",
      inputs = Seq(InputConf("in1", srcDir, "parquet")),
      executionSql = Some("SELECT id, name, offset FROM in1"),
      outputs = Seq(OutputConf("out1", sink, writeType = "append",
        expectations = exp)),
      stateLocation = Some(state))

    // severity=FAIL on a failing range rule: the write must be ABORTED
    val boom = intercept[SparkTask.ExpectationViolation] {
      SparkTask.run(spark, conf(
        OutputExpectation("range:offset:0:15", "FAIL"),
        OutputExpectation("not_null:id", "FAIL")))
    }
    assert(boom.getMessage.contains("in_range(offset)") &&
      boom.getMessage.contains("2 violations"), boom.getMessage)
    assert(ManagedTable(spark, sink).latestVersion === None,
      "FAIL severity must abort before any data lands")
    // ...but the verdicts were recorded before the abort
    val st = new graft.state.StateStore(
      spark.sparkContext.hadoopConfiguration, state)
    val recorded = st.get("expectations", "out1").get
    assert(recorded.contains(""""rule":"in_range"""") &&
      recorded.contains(""""passed":false"""), recorded)

    // severity=CONTINUE: same failing rule records and the write proceeds
    SparkTask.run(spark, conf(OutputExpectation("range:offset:0:15", "CONTINUE")))
    assert(ManagedTable(spark, sink).read.count() === 3,
      "CONTINUE severity must let the write proceed")
    assert(st.get("expectations", "out1").get.contains(""""passed":false"""))

    // a passing rule set under FAIL writes normally
    SparkTask.run(spark, conf(OutputExpectation("range:offset:0:100", "FAIL")))
    assert(ManagedTable(spark, sink).read.count() === 6)
    assert(st.get("expectations", "out1").get.contains(""""passed":true"""))

    // a multi-rule DSL entry is ambiguous for severity — refuse loudly
    val multi = intercept[TaskValidationError] {
      SparkTask.run(spark, conf(
        OutputExpectation("not_null:id;not_null:name", "FAIL")))
    }
    assert(multi.getMessage.contains("exactly one"), multi.getMessage)
  }

  test("output drift: history accumulates, FAIL aborts on anomaly, failed profile withheld") {
    val srcA = tmpDir("task_drift_a"); val srcB = tmpDir("task_drift_b")
    data.write.parquet(srcA)                               // 3 rows, stable
    (data.unionAll(data).unionAll(data)).write.parquet(srcB) // 9 rows: 3x anomaly
    val sink = tmpDir("task_drift_sink")
    val state = tmpDir("task_drift_state")
    val metrics = tmpDir("task_drift_metrics")
    def conf(src: String, severity: String) = TaskConf("drift",
      inputs = Seq(InputConf("in1", src, "parquet")),
      executionSql = Some("SELECT id, name, offset FROM in1"),
      outputs = Seq(OutputConf("out1", sink, writeType = "append",
        drift = Some(OutputDrift("count; distinct:id", metrics,
          tolerancePpm = 300000L, severity = severity)))),
      stateLocation = Some(state))
    // epochs 1..2: stable loads accumulate history and pass
    SparkTask.run(spark, conf(srcA, "FAIL"))
    SparkTask.run(spark, conf(srcA, "FAIL"))
    assert(ManagedTable(spark, metrics).read.count() === 4L) // 2 epochs x 2 metrics
    assert(ManagedTable(spark, sink).read.count() === 6L)
    // anomalous 3x load under FAIL: aborted, profile withheld from history
    val boom = intercept[SparkTask.DriftViolation] {
      SparkTask.run(spark, conf(srcB, "FAIL"))
    }
    assert(boom.getMessage.contains("row_count"), boom.getMessage)
    assert(ManagedTable(spark, sink).read.count() === 6L,
      "FAIL drift must abort before any data lands")
    assert(ManagedTable(spark, metrics).read.count() === 4L,
      "a failed batch must not poison its own baseline")
    // verdicts recorded before the abort
    val st = new graft.state.StateStore(
      spark.sparkContext.hadoopConfiguration, state)
    val rec = st.get("drift", "out1").get
    assert(rec.contains(""""metric":"row_count"""") &&
      rec.contains(""""passed":false"""), rec)
    // same anomaly under CONTINUE: records, writes, and joins the history
    SparkTask.run(spark, conf(srcB, "CONTINUE"))
    assert(ManagedTable(spark, sink).read.count() === 15L)
    assert(ManagedTable(spark, metrics).read.count() === 6L)
  }

  test("reflection-resolved Transform class executes") {
    val srcDir = tmpDir("task_refl_src")
    data.write.parquet(srcDir)
    val sink = tmpDir("task_refl_sink")
    val t = TaskConf("refl",
      inputs = Seq(InputConf("in1", srcDir, "parquet")),
      executionClass = Some("graft.IdentityTransform"),
      outputs = Seq(OutputConf("out1", sink, writeType = "overwrite")))
    SparkTask.run(spark, t)
    assert(ManagedTable(spark, sink).read.count() === 3)
  }

  test("exec-a-string: toolbox-compiled Scala source runs as the execution fn") {
    val srcDir = tmpDir("task_code_src")
    data.write.parquet(srcDir)
    val sink = tmpDir("task_code_sink")
    val t = TaskConf("code",
      inputs = Seq(InputConf("in1", srcDir, "parquet")),
      executionCode = Some(
        """new graft.task.SimpleTransform {
          |  def transform(input: org.apache.spark.sql.DataFrame) =
          |    input.filter("offset >= 20").withColumn("doubled",
          |      org.apache.spark.sql.functions.col("offset") * 2)
          |}""".stripMargin),
      outputs = Seq(OutputConf("out1", sink, writeType = "overwrite")))
    SparkTask.run(spark, t)
    val back = ManagedTable(spark, sink).read
    assert(back.select("id", "doubled").as[(Int, Int)].collect().toSet ===
      Set((2, 40), (3, 60)))
  }

  test("exec-a-string failures surface at build time with the compiler message") {
    // syntax/type errors -> ExecutionFuncInitializeError analogue
    val bad = intercept[IllegalArgumentException](
      SparkTask.scalaTransform("this is not scala }{"))
    assert(bad.getMessage.contains("execution_code failed"))
    // valid scala that is not a Transform -> clear type error
    val notT = intercept[IllegalArgumentException](
      SparkTask.scalaTransform("42"))
    assert(notT.getMessage.contains("must evaluate to a graft.task.Transform"))
    // validation requires one of the three execution modes
    val errs = Config.validate(TaskConf("x",
      inputs = Seq(InputConf("i", "/tmp/p", "parquet")),
      outputs = Seq(OutputConf("o", "/tmp/q"))))
    assert(errs.exists(_.contains("execution_code")))
  }

  test("secrets template {{scope/key}} resolves in paths and options (test_batch.py:337)") {
    val srcDir = tmpDir("task_sec_src")
    data.write.parquet(srcDir)
    val sink = tmpDir("task_sec_sink")
    val t = TaskConf("sec",
      inputs = Seq(InputConf("in1", "{{paths/src}}", "parquet")),
      executionSql = Some("SELECT * FROM in1"),
      outputs = Seq(OutputConf("out1", sink, writeType = "append",
        options = Map("now" -> "{{times/t0}}"))))
    val backend = new MapSecretBackend(Map(
      ("paths", "src") -> srcDir, ("times", "t0") -> "2026-01-01 00:00:00"))
    SparkTask.run(spark, t, Some(backend))
    val back = ManagedTable(spark, sink).read
    assert(back.count() === 3)
    assert(back.select(col(Meta.ValidToTs).cast("string")).distinct()
      .as[String].head() === "2026-01-01 00:00:00")
  }

  test("scd1 through the task layer is an upsert") {
    val srcDir = tmpDir("task_scd1_src")
    val sink = tmpDir("task_scd1_sink")
    data.write.mode("overwrite").parquet(srcDir)
    def conf(now: String) = TaskConf("scd1t",
      inputs = Seq(InputConf("in1", srcDir, "parquet")),
      executionSql = Some("SELECT * FROM in1"),
      outputs = Seq(OutputConf("out1", sink, writeType = "scd1",
        keyAttributes = Seq("id"), options = Map("now" -> now))))
    SparkTask.run(spark, conf("2026-01-01 00:00:00"))
    Seq((2, "TWO", 21), (4, "four", 40)).toDF("id", "name", "offset")
      .write.mode("overwrite").parquet(srcDir)
    SparkTask.run(spark, conf("2026-02-01 00:00:00"))
    val back = ManagedTable(spark, sink).read
    assert(back.count() === 4)
    assert(back.filter($"id" === 2).select("name").as[String].head() === "TWO")
  }

  test("CDC incremental: second run only ingests rows past the watermark (test_batch.py:668)") {
    val srcDir = tmpDir("task_cdc_src")
    val sink = tmpDir("task_cdc_sink")
    val state = tmpDir("task_cdc_state")
    def conf(now: String) = TaskConf("cdct",
      inputs = Seq(InputConf("in1", srcDir, "parquet",
        features = InputFeatures(changeData = Some(ChangeData("id", "integer"))))),
      executionSql = Some("SELECT * FROM in1"),
      outputs = Seq(OutputConf("out1", sink, writeType = "append",
        options = Map("now" -> now))),
      stateLocation = Some(state))

    data.write.mode("overwrite").parquet(srcDir)
    SparkTask.run(spark, conf("2026-01-01 00:00:00"))
    assert(ManagedTable(spark, sink).read.count() === 3)

    // new data arrives (ids 4,5) alongside the old rows
    data.unionByName(Seq((4, "four", 40), (5, "five", 50)).toDF("id", "name", "offset"))
      .write.mode("overwrite").parquet(srcDir)
    SparkTask.run(spark, conf("2026-02-01 00:00:00"))
    val back = ManagedTable(spark, sink).read
    assert(back.count() === 5) // 3 + only the 2 new, not 3+5
    assert(back.groupBy("id").count().filter($"count" > 1).count() === 0)

    // third run, nothing new → no rows appended
    SparkTask.run(spark, conf("2026-03-01 00:00:00"))
    assert(ManagedTable(spark, sink).read.count() === 5)
  }

  test("streaming input: foreachBatch reuses the batch append writer (test_stream.py:31)") {
    val srcDir = tmpDir("task_stream_src")
    val sink = tmpDir("task_stream_sink")
    val state = tmpDir("task_stream_state")
    data.write.parquet(srcDir)
    val t = TaskConf("streamt",
      inputs = Seq(InputConf("in1", srcDir, "parquet",
        sourceExtractType = "stream",
        schemaDdl = Some("id INT, name STRING, offset INT"))),
      executionSql = Some("SELECT * FROM in1"),
      outputs = Seq(OutputConf("out1", sink, writeType = "append",
        options = Map("now" -> "2026-01-01 00:00:00"))),
      refreshPolicy = RefreshPolicy(refreshType = "stream"),
      stateLocation = Some(state))
    SparkTask.run(spark, t)
    val back = ManagedTable(spark, sink).read
    assert(back.count() === 3)
    assert(back.columns.contains(Meta.ValidToTs))
  }

  test("crash-replayed micro-batch is skipped: foreachBatch append is exactly-once") {
    val srcDir = tmpDir("task_eo_src")
    val sink = tmpDir("task_eo_sink")
    val state = tmpDir("task_eo_state")
    data.write.parquet(srcDir)
    val t = TaskConf("streamt",
      inputs = Seq(InputConf("in1", srcDir, "parquet",
        sourceExtractType = "stream",
        schemaDdl = Some("id INT, name STRING, offset INT"))),
      executionSql = Some("SELECT * FROM in1"),
      outputs = Seq(OutputConf("out1", sink, writeType = "append",
        options = Map("now" -> "2026-01-01 00:00:00"))),
      refreshPolicy = RefreshPolicy(refreshType = "stream"),
      stateLocation = Some(state))
    SparkTask.run(spark, t)
    assert(ManagedTable(spark, sink).read.count() === 3)
    // the epoch high-water rode the sink commit atomically
    val checkpoint = s"$state/checkpoints/out1"
    val appId = s"graft-stream:$checkpoint"
    assert(ManagedTable(spark, sink).lastTxnVersion(appId) === Some(0L))

    // crash between sink commit and checkpoint advance: the engine wrote
    // the sink but lost the checkpoint's commit marker — on restart,
    // Structured Streaming redelivers batch 0 with the SAME epoch id
    val commits = new java.io.File(s"$checkpoint/commits")
    val markers = commits.listFiles()
    assert(markers.exists(!_.getName.startsWith(".")),
      "expected a committed batch marker to remove")
    // remove crc shadows too: a stale .crc makes the local FS refuse the
    // re-written marker, which Spark misreads as a concurrent writer
    markers.foreach(f => assert(f.delete()))
    SparkTask.run(spark, t)
    assert(ManagedTable(spark, sink).read.count() === 3,
      "the replayed epoch must be skipped, not double-appended")
    assert(ManagedTable(spark, sink).read.select("id").as[Int].collect().sorted
      === Array(1, 2, 3))

    // fresh data makes a NEW epoch: the high-water must not block it
    Seq((4, "four", 40)).toDF("id", "name", "offset").write.mode("append").parquet(srcDir)
    SparkTask.run(spark, t)
    assert(ManagedTable(spark, sink).read.count() === 4)
    assert(ManagedTable(spark, sink).lastTxnVersion(appId) === Some(1L))
  }
}

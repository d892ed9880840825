package graft

import graft.contract.ProjectContract
import graft.meta.DataObjects
import graft.meta.DataObjects._
import graft.runner.PipelineRunner.Succeeded
import graft.table.ManagedTable
import graft.write.{WriteOptions, Writers}
import org.apache.spark.sql.types._

/** Project contract parse/validate/run + identity/generated/default column
  * semantics (reference: framework contract + core/utils/delta.py:12-132). */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  private val contractJson =
    """{"name": "proj1",
      | "schemas": [{"name": "core",
      |   "tables": [{"name": "dim_x",
      |     "columns": [
      |       {"name": "sk", "type": "bigint", "identity": true, "identity_start": 100, "identity_step": 10},
      |       {"name": "id", "type": "int", "nullable": false},
      |       {"name": "name", "type": "string", "comment": "display name"},
      |       {"name": "name_upper", "type": "string", "generate_expr": "upper(name)"},
      |       {"name": "status", "type": "string", "default": "active"}],
      |     "partition_by": ["status"]}],
      |   "views": [{"name": "v_x", "query": "SELECT id, name FROM dim_x"}],
      |   "volumes": [{"name": "raw", "location": "/tmp/vol"}]}],
      | "pipelines": [{"name": "daily", "tasks": [
      |   {"name": "t1", "inputs": [{"name":"i","path":"/tmp/i.parquet","source":"parquet"}],
      |    "execution_sql": "SELECT * FROM i",
      |    "outputs": [{"name":"o","path":"/tmp/o","write_type":"append"}]}]}]}""".stripMargin

  test("contract parses the full object tree") {
    val p = ProjectContract.parse(contractJson)
    assert(p.name === "proj1")
    val t = p.schemas.head.tables.head
    assert(t.columns.map(_.name) === Seq("sk", "id", "name", "name_upper", "status"))
    assert(t.columns.head.identity && t.columns.head.identityStart === 100)
    assert(t.partitionBy === Seq("status"))
    assert(p.schemas.head.views.head.query.contains("dim_x"))
    assert(p.pipelines.head.tasks.head.conf.executionSql.isDefined)
    assert(ProjectContract.validate(p) === Nil)
    assert(ProjectContract.validateViews(spark, p) === Nil)
  }

  test("validation catches bad types, dup columns, bad partition col, cycles, bad view SQL") {
    val bad = ProjectContract.parse(
      """{"name": "p",
        | "schemas": [{"name": "s", "tables": [
        |   {"name": "t", "columns": [
        |     {"name": "a", "type": "nottype"},
        |     {"name": "a", "type": "int"}],
        |    "partition_by": ["zzz"]}],
        |  "views": [{"name": "v", "query": "SELEKT nope FROM"}]}],
        | "pipelines": [{"name": "pl", "tasks": [
        |   {"name": "x", "depends_on": ["y"],
        |    "inputs": [{"name":"i","path":"/tmp/i","source":"parquet"}],
        |    "execution_sql": "SELECT 1",
        |    "outputs": [{"name":"o","path":"/tmp/o","write_type":"append"}]},
        |   {"name": "y", "depends_on": ["x"],
        |    "inputs": [{"name":"i","path":"/tmp/i","source":"parquet"}],
        |    "execution_sql": "SELECT 1",
        |    "outputs": [{"name":"o","path":"/tmp/o","write_type":"append"}]}]}]}""".stripMargin)
    val errs = ProjectContract.validate(bad)
    assert(errs.exists(_.contains("unparseable type")))
    assert(errs.exists(_.contains("duplicate columns")))
    assert(errs.exists(_.contains("partition column zzz")))
    assert(errs.exists(_.contains("cycle")))
    val viewErrs = ProjectContract.validateViews(spark, bad)
    assert(viewErrs.exists(_.contains("view s.v")))
  }

  test("validation catches empty grant principals/privileges and unknown permission levels") {
    val bad = ProjectContract.parse(
      """{"name": "p",
        | "schemas": [{"name": "s",
        |  "grants": [{"principal": "", "privileges": ["USE_SCHEMA"]}],
        |  "tables": [{"name": "t",
        |   "grants": [{"principal": "analysts", "privileges": []}],
        |   "columns": [{"name": "a", "type": "int"}]}]}],
        | "pipelines": [{"name": "pl",
        |  "permissions": [{"principal": "g", "level": "CAN_FLY"}],
        |  "tasks": [
        |   {"name": "x",
        |    "inputs": [{"name":"i","path":"/tmp/i","source":"parquet"}],
        |    "execution_sql": "SELECT 1",
        |    "outputs": [{"name":"o","path":"/tmp/o","write_type":"append"}]}]}]}""".stripMargin)
    val errs = ProjectContract.validate(bad)
    assert(errs.exists(_.contains("grant with empty principal")))
    assert(errs.exists(_.contains("has no privileges")))
    assert(errs.exists(_.contains("unknown permission level 'CAN_FLY'")))
  }

  test("structType maps identity to long and carries comment/default metadata") {
    val p = ProjectContract.parse(contractJson)
    val st = DataObjects.structType(p.schemas.head.tables.head)
    assert(st("sk").dataType === LongType)
    assert(st("name").metadata.getString("comment") === "display name")
    assert(st("status").metadata.getString("default") === "active")
    assert(st("name_upper").metadata.getString("generationExpression") === "upper(name)")
  }

  test("identity/generated/default semantics applied across two batches") {
    val p = ProjectContract.parse(contractJson)
    val t = p.schemas.head.tables.head
    val path = tmpDir("dim_x")
    val b1 = Seq((1, "alice", null.asInstanceOf[String]),
                 (2, "bob", "inactive")).toDF("id", "name", "status")
    val out1 = DataObjects.applyColumnSemantics(spark, t, path, b1)
    Writers.append(spark, path, out1, WriteOptions(now = Some("2026-01-01 00:00:00")))
    val r1 = ManagedTable(spark, path).read.orderBy("sk")
      .select("sk", "id", "name_upper", "status")
      .as[(Long, Int, String, String)].collect().toSeq
    assert(r1 === Seq((100L, 1, "ALICE", "active"), (110L, 2, "BOB", "inactive")))

    // second batch continues the identity sequence from the stored max
    val b2 = Seq((3, "carol", "active")).toDF("id", "name", "status")
    val out2 = DataObjects.applyColumnSemantics(spark, t, path, b2)
    Writers.append(spark, path, out2, WriteOptions(now = Some("2026-02-01 00:00:00")))
    val skMax = ManagedTable(spark, path).read.agg(org.apache.spark.sql.functions.max($"sk"))
      .collect()(0).getLong(0)
    assert(skMax === 120L)
  }

  test("identity assignment is distributed: gap-free over many partitions, no " +
       "single-partition window") {
    val df = spark.range(0, 10000).toDF("id").repartition(13)
    val out = DataObjects.assignIdentity(spark, df, "sk", current = 99L, step = 10L)
    // no global window / single-partition exchange anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(400))
    assert(!plan.contains("SinglePartition"), plan.take(400))
    assert(out.rdd.getNumPartitions === 13)
    // gap-free sequence continuing from current, stepping by step
    val sks = out.select("sk").as[Long].collect().sorted
    assert(sks.toSeq === (1L to 10000L).map(99L + _ * 10L))
  }

  test("views resolve over registered managed tables") {
    val p = ProjectContract.parse(contractJson)
    val path = tmpDir("view_t")
    Writers.append(spark, path,
      Seq((1, "x", "A", "active", 5L)).toDF("id", "name", "name_upper", "status", "sk"),
      WriteOptions(now = Some("2026-01-01 00:00:00")))
    DataObjects.registerTable(spark, "dim_x", path)
    DataObjects.createView(spark, p.schemas.head.views.head)
    assert(spark.sql("SELECT name FROM v_x").as[String].collect().toSeq === Seq("x"))
  }

  test("contract pipeline runs end-to-end through the DAG runner") {
    val src = tmpDir("contract_src")
    Seq((1, "a")).toDF("id", "v").write.parquet(src)
    val sink = tmpDir("contract_sink")
    val json =
      s"""{"name": "p2", "pipelines": [{"name": "pl", "tasks": [
         |  {"name": "t1", "inputs": [{"name":"i","path":"$src","source":"parquet"}],
         |   "execution_sql": "SELECT * FROM i",
         |   "outputs": [{"name":"o","path":"$sink","write_type":"append",
         |     "options": {"now": "2026-01-01 00:00:00"}}]}]}]}""".stripMargin
    val p = ProjectContract.parse(json)
    assert(ProjectContract.validate(p) === Nil)
    val statuses = ProjectContract.runPipeline(spark, p, "pl")
    assert(statuses("t1") === Succeeded)
    assert(ManagedTable(spark, sink).read.count() === 1)
  }
}

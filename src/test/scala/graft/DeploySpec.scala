package graft

import graft.contract.{DeployDescriptor, ProjectContract}
import com.fasterxml.jackson.databind.ObjectMapper

/** Deploy config-gen surface: pipeline → Databricks-Jobs-style JSON
  * (reference deploy layer renders Terraform for the same shape). */
class DeploySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val project = ProjectContract.parse(
    """{"name": "proj",
      | "pipelines": [{"name": "daily", "tasks": [
      |   {"name": "extract",
      |    "inputs": [{"name":"i","path":"/tmp/i","source":"parquet"}],
      |    "execution_sql": "SELECT 1",
      |    "outputs": [{"name":"o","path":"/tmp/o","write_type":"append"}]},
      |   {"name": "load", "depends_on": ["extract"],
      |    "inputs": [{"name":"i","path":"/tmp/o","source":"graft"}],
      |    "execution_sql": "SELECT 1",
      |    "outputs": [{"name":"o2","path":"/tmp/o2","write_type":"append"}]}]}]}""".stripMargin)

  test("job document is valid JSON with tasks, dependencies, cluster, CLI invocation") {
    val json = DeployDescriptor.jobJson(project, project.pipelines.head)
    val n = new ObjectMapper().readTree(json) // throws if invalid
    assert(n.get("name").asText() === "proj/daily")
    val tasks = n.get("tasks")
    assert(tasks.size() === 2)
    val load = tasks.get(1)
    assert(load.get("task_key").asText() === "load")
    assert(load.get("depends_on").get(0).get("task_key").asText() === "extract")
    assert(load.get("spark_jar_task").get("main_class_name").asText() === "graft.Cli")
    assert(load.get("new_cluster").get("spark_version").asText().nonEmpty)
    val params = load.get("spark_jar_task").get("parameters")
    assert(params.get(0).asText() === "run")
    assert(params.get(2).asText().endsWith("load.json"))
  }

  test("projectJobs emits one document per pipeline") {
    val jobs = DeployDescriptor.projectJobs(project)
    assert(jobs.keySet === Set("daily"))
  }

  test("terraform stack renders catalog var, data objects, and the job graph") {
    val full = ProjectContract.parse(
      """{"name": "proj",
        | "schemas": [{"name": "core",
        |  "grants": [{"principal": "data-eng", "privileges": ["USE_SCHEMA"]}],
        |  "tables": [
        |   {"name": "dim", "comment": "dim table",
        |    "grants": [{"principal": "analysts", "privileges": ["SELECT"]},
        |               {"principal": "etl@corp.example.com", "privileges": ["SELECT", "MODIFY"]}],
        |    "columns": [{"name": "sk", "type": "bigint", "identity": true},
        |                {"name": "d", "type": "date"}],
        |    "partition_by": ["d"]},
        |   {"name": "ext", "location": "s3://bucket/ext",
        |    "columns": [{"name": "x", "type": "int"}]}],
        |  "views": [{"name": "v1", "query": "SELECT sk FROM dim",
        |    "grants": [{"principal": "analysts", "privileges": ["SELECT"]}]}],
        |  "volumes": [{"name": "raw", "location": "s3://bucket/raw",
        |    "grants": [{"principal": "ingest", "privileges": ["READ_VOLUME", "WRITE_VOLUME"]}]}]}],
        | "pipelines": [{"name": "daily",
        |  "permissions": [{"principal": "data-eng", "level": "CAN_MANAGE"},
        |                  {"principal": "oncall@corp.example.com", "level": "CAN_MANAGE_RUN"}],
        |  "tasks": [
        |   {"name": "extract",
        |    "inputs": [{"name":"i","path":"/tmp/i","source":"parquet"}],
        |    "execution_sql": "SELECT 1",
        |    "outputs": [{"name":"o","path":"/tmp/o","write_type":"append"}]},
        |   {"name": "load", "depends_on": ["extract"],
        |    "inputs": [{"name":"i","path":"/tmp/o","source":"graft"}],
        |    "execution_sql": "SELECT 1",
        |    "outputs": [{"name":"o2","path":"/tmp/o2","write_type":"append"}]}]}]}"""
        .stripMargin)
    val n = new ObjectMapper().readTree(DeployDescriptor.terraformJson(full))

    assert(n.get("variable").get("databricks_catalog").get("type").asText() === "string")
    val res = n.get("resource")
    assert(res.get("databricks_schema").get("core").get("name").asText() === "core")

    val dim = res.get("databricks_table").get("core_dim")
    assert(dim.get("catalog_name").asText() === "${var.databricks_catalog}")
    assert(dim.get("table_type").asText() === "MANAGED")
    assert(dim.get("partitions").get(0).asText() === "d")
    assert(dim.get("depends_on").get(0).asText() === "databricks_schema.core")
    // identity column maps to identity="default" like the reference
    val sk = dim.get("column").get(0)
    assert(sk.get("identity").asText() === "default" && sk.get("type").asText() === "bigint")

    assert(res.get("databricks_table").get("core_ext").get("table_type").asText() === "EXTERNAL")
    val view = res.get("databricks_table").get("core_v1")
    assert(view.get("table_type").asText() === "VIEW")
    assert(view.get("view_definition").asText() === "SELECT sk FROM dim")
    assert(res.get("databricks_volume").get("core_raw").get("volume_type").asText() === "EXTERNAL")

    val job = res.get("databricks_job").get("proj_daily")
    assert(job.get("job_cluster").get(0).get("new_cluster").get("spark_version").asText().nonEmpty)
    val tasks = job.get("task")
    assert(tasks.size() === 2)
    assert(tasks.get(0).get("job_cluster_key").asText() === "main")
    assert(tasks.get(1).get("depends_on").get(0).get("task_key").asText() === "extract")
    // reference semantics: retries, default schedule, autoscaled cluster,
    // job-id output (databricks.py:519-643)
    assert(tasks.get(0).get("max_retries").asInt() === 3)
    assert(job.get("schedule").get("quartz_cron_expression").asText() === "0 0 0 * * ?")
    assert(job.get("schedule").get("pause_status").asText() === "UNPAUSED")
    val nc = job.get("job_cluster").get(0).get("new_cluster")
    assert(nc.get("autoscale").get("max_workers").asInt() === 3)
    assert(nc.get("runtime_engine").asText() === "STANDARD")
    assert(n.get("output").get("proj_daily_job_id").get("value").asText()
      === "${databricks_job.proj_daily.id}")

    // grants render one databricks_grants resource per securable,
    // referencing the securable's resource id (the dependency edge)
    val grants = res.get("databricks_grants")
    assert(grants.get("core").get("schema").asText() === "${databricks_schema.core.id}")
    assert(grants.get("core").get("grant").get(0).get("principal").asText() === "data-eng")
    val dimG = grants.get("core_dim")
    assert(dimG.get("table").asText() === "${databricks_table.core_dim.id}")
    assert(dimG.get("grant").get(1).get("privileges").get(1).asText() === "MODIFY")
    assert(grants.get("core_v1").get("table").asText() === "${databricks_table.core_v1.id}")
    assert(grants.get("core_raw").get("volume").asText() === "${databricks_volume.core_raw.id}")
    assert(grants.get("core_ext") === null, "grant-less securables emit no resource")

    // job permissions: user vs group principal shapes
    val perm = res.get("databricks_permissions").get("proj_daily_job")
    assert(perm.get("job_id").asText() === "${databricks_job.proj_daily.id}")
    val acl = perm.get("access_control")
    assert(acl.get(0).get("group_name").asText() === "data-eng")
    assert(acl.get(0).get("permission_level").asText() === "CAN_MANAGE")
    assert(acl.get(1).get("user_name").asText() === "oncall@corp.example.com")
  }

  test("terraform stack matches the checked-in golden file byte for byte") {
    val full = ProjectContract.parse(
      """{"name": "proj",
        | "schemas": [{"name": "core",
        |  "grants": [{"principal": "data-eng", "privileges": ["USE_SCHEMA"]}],
        |  "tables": [
        |   {"name": "dim", "comment": "dim table",
        |    "grants": [{"principal": "analysts", "privileges": ["SELECT"]}],
        |    "columns": [{"name": "sk", "type": "bigint", "identity": true},
        |                {"name": "d", "type": "date"}],
        |    "partition_by": ["d"]},
        |   {"name": "ext", "location": "s3://bucket/ext",
        |    "columns": [{"name": "x", "type": "int"}]}],
        |  "views": [{"name": "v1", "query": "SELECT sk FROM dim"}],
        |  "volumes": [{"name": "raw", "location": "s3://bucket/raw",
        |    "grants": [{"principal": "ingest", "privileges": ["READ_VOLUME"]}]}]}],
        | "pipelines": [{"name": "daily",
        |  "refresh_policy": {"cron_expression": "0 30 6 * * ?", "timezone_id": "Europe/Berlin"},
        |  "tags": {"team": "data-eng"},
        |  "permissions": [{"principal": "data-eng", "level": "CAN_MANAGE"},
        |                  {"principal": "oncall@corp.example.com", "level": "CAN_MANAGE_RUN"}],
        |  "tasks": [
        |   {"name": "extract",
        |    "inputs": [{"name":"i","path":"/tmp/i","source":"parquet"}],
        |    "execution_sql": "SELECT 1",
        |    "outputs": [{"name":"o","path":"/tmp/o","write_type":"append"}]},
        |   {"name": "load", "depends_on": ["extract"],
        |    "inputs": [{"name":"i","path":"/tmp/o","source":"graft"}],
        |    "execution_sql": "SELECT 1",
        |    "outputs": [{"name":"o2","path":"/tmp/o2","write_type":"append"}]}]}]}"""
        .stripMargin)
    val got = DeployDescriptor.terraformJson(full,
      DeployDescriptor.ClusterSpec(
        sparkConf = Map("spark.sql.shuffle.partitions" -> "auto"),
        photon = true, tags = Map("cost-center" -> "42")))
    val want = new String(
      getClass.getResourceAsStream("/golden/proj_daily.tf.json").readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(got === want,
      "rendered .tf.json diverged from src/test/resources/golden/proj_daily.tf.json")
  }
}

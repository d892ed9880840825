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
}

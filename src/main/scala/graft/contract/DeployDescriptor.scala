package graft.contract

import graft.contract.ProjectContract.{Pipeline, Project}

/**
 * Deployment-descriptor generation: render a project pipeline as a
 * Databricks-Jobs-style workflow document (one job per pipeline, one
 * task per pipeline task, `depends_on` preserved, each task invoking the
 * engine CLI with its task config).
 *
 * This is the config-generation surface of the reference's deploy layer
 * (reference: core/deploy/terraform/databricks.py:54-645,
 * framework/contract/strategy/deploy.py:281-1273 — which renders
 * Terraform resources for Databricks jobs). We emit the job JSON
 * directly; applying it with any IaC tool is out of scope, matching the
 * "config-gen surface" the checklist asks for.
 */
object DeployDescriptor {

  final case class ClusterSpec(
      sparkVersion: String = "15.4.x-scala2.13",
      nodeTypeId: String = "i3.xlarge",
      numWorkers: Int = 2,
      sparkConf: Map[String, String] = Map.empty)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def jsonObj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s""""${esc(k)}": $v""" }.mkString("{", ", ", "}")

  private def jsonStr(s: String): String = s""""${esc(s)}""""

  /** One pipeline → one jobs document. `taskConfDir` is where the per-task
    * config JSONs are expected on the target workspace. */
  def jobJson(project: Project, pipeline: Pipeline,
              cluster: ClusterSpec = ClusterSpec(),
              taskConfDir: String = "/Workspace/graft/tasks"): String = {
    val clusterJson = jsonObj(Seq(
      "spark_version" -> jsonStr(cluster.sparkVersion),
      "node_type_id" -> jsonStr(cluster.nodeTypeId),
      "num_workers" -> cluster.numWorkers.toString,
      "spark_conf" -> jsonObj(cluster.sparkConf.toSeq.map {
        case (k, v) => k -> jsonStr(v) })))
    val tasks = pipeline.tasks.map { t =>
      val depends =
        if (t.dependsOn.isEmpty) ""
        else s""", "depends_on": [${t.dependsOn.map(d =>
          jsonObj(Seq("task_key" -> jsonStr(d)))).mkString(", ")}]"""
      s"""{"task_key": ${jsonStr(t.name)},
         | "spark_jar_task": ${jsonObj(Seq(
              "main_class_name" -> jsonStr("graft.Cli"),
              "parameters" -> s"""["run", "-t", ${jsonStr(s"$taskConfDir/${t.name}.json")}]"""))},
         | "new_cluster": $clusterJson$depends}""".stripMargin.replace("\n", "")
    }
    s"""{"name": ${jsonStr(s"${project.name}/${pipeline.name}")},
       | "format": "MULTI_TASK",
       | "tasks": [${tasks.mkString(", ")}]}""".stripMargin.replace("\n", "")
  }

  /** All pipelines of a project → (pipelineName → job document). */
  def projectJobs(project: Project, cluster: ClusterSpec = ClusterSpec()): Map[String, String] =
    project.pipelines.map(p => p.name -> jobJson(project, p, cluster)).toMap
}

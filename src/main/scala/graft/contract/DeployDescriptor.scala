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

  /** Job-cluster shape — the reference's `SparkPipelineCluster`
    * (core/schemas/deploy.py:34-70): auto-scaling bounds, photon runtime
    * selection, and custom tags, with the same defaults. */
  final case class ClusterSpec(
      sparkVersion: String = "15.4.x-scala2.13",
      nodeTypeId: String = "i3.xlarge",
      numWorkers: Int = 2,
      sparkConf: Map[String, String] = Map.empty,
      autoScale: Boolean = true,
      minWorkers: Int = 1,
      maxWorkers: Int = 3,
      photon: Boolean = false,
      tags: Map[String, String] = Map.empty)

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

  // ---------------------------------------------------- terraform stack

  /** Terraform resource-id sanitizer (databricks.py
    * `replace_special_symbols`). */
  private def rid(s: String): String = s.replaceAll("[^A-Za-z0-9_]", "_")

  /**
   * Full Terraform stack for a project in Terraform's JSON syntax
   * (`.tf.json`) — the declarative equivalent of the reference's CDKTF
   * stack (databricks.py:248-420 data objects, :502-645 job workflow):
   * a `databricks_catalog` variable, one `databricks_schema` per schema,
   * `databricks_table` resources for tables (identity columns mapped to
   * `identity = "default"`, partition columns, MANAGED vs EXTERNAL on
   * location) and views (`table_type = "VIEW"` + `view_definition`),
   * `databricks_volume` resources, and one `databricks_job` per pipeline
   * with a shared job cluster and the task depends_on graph. Tables and
   * volumes depend on their schema resource, exactly like the reference's
   * `depends_on=[schema]`.
   */
  def terraformJson(project: Project, cluster: ClusterSpec = ClusterSpec(),
                    taskConfDir: String = "/Workspace/graft/tasks"): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()

    // variable "databricks_catalog" (databricks.py:261-263)
    root.putObject("variable").putObject("databricks_catalog")
      .put("type", "string")
    val catalogRef = "${var.databricks_catalog}"

    val resource = root.putObject("resource")
    val schemas = resource.putObject("databricks_schema")
    val tables = resource.putObject("databricks_table")
    val volumes = resource.putObject("databricks_volume")

    project.schemas.foreach { s =>
      val sid = rid(s.name)
      val sn = schemas.putObject(sid)
      sn.put("name", s.name)
      sn.put("catalog_name", catalogRef)

      s.tables.foreach { t =>
        val tn = tables.putObject(rid(s"${s.name}_${t.name}"))
        tn.put("name", t.name)
        tn.put("schema_name", s.name)
        tn.put("catalog_name", catalogRef)
        tn.put("table_type", if (t.location.isEmpty) "MANAGED" else "EXTERNAL")
        tn.put("data_source_format", "DELTA")
        t.location.foreach(tn.put("storage_location", _))
        t.comment.foreach(tn.put("comment", _))
        if (t.partitionBy.nonEmpty) {
          val p = tn.putArray("partitions"); t.partitionBy.foreach(p.add)
        }
        if (t.properties.nonEmpty) {
          val p = tn.putObject("properties")
          t.properties.foreach { case (k, v) => p.put(k, v) }
        }
        val cols = tn.putArray("column")
        t.columns.foreach { c =>
          val cn = cols.addObject()
          cn.put("name", c.name)
          cn.put("type", if (c.identity) "bigint" else c.dataType)
          cn.put("nullable", c.nullable)
          c.comment.foreach(cn.put("comment", _))
          if (c.identity) cn.put("identity", "default")
        }
        tn.putArray("depends_on").add(s"databricks_schema.$sid")
      }

      s.views.foreach { v =>
        val vn = tables.putObject(rid(s"${s.name}_${v.name}"))
        vn.put("name", v.name)
        vn.put("schema_name", s.name)
        vn.put("catalog_name", catalogRef)
        vn.put("table_type", "VIEW")
        vn.put("view_definition", v.query)
        vn.putArray("depends_on").add(s"databricks_schema.$sid")
      }

      s.volumes.foreach { v =>
        val vn = volumes.putObject(rid(s"${s.name}_${v.name}"))
        vn.put("name", v.name)
        vn.put("schema_name", s.name)
        vn.put("catalog_name", catalogRef)
        vn.put("volume_type", if (v.location.isEmpty) "MANAGED" else "EXTERNAL")
        if (v.location.nonEmpty) vn.put("storage_location", v.location)
        vn.putArray("depends_on").add(s"databricks_schema.$sid")
      }
    }

    // databricks_grants: one resource per securable that declares grants
    // (Unity Catalog model — grants on schemas/tables/views/volumes are
    // data-object privileges; job access lives in databricks_permissions
    // below). The ${...id} references give Terraform the dependency edge.
    val grantSecurables: Seq[(String, String, String, Seq[graft.meta.DataObjects.Grant])] =
      project.schemas.flatMap { s =>
        val sid = rid(s.name)
        Seq(("schema", sid, s"$${databricks_schema.$sid.id}", s.grants)) ++
          (s.tables.map(t => ("table", rid(s"${s.name}_${t.name}"), t.grants)) ++
            s.views.map(v => ("table", rid(s"${s.name}_${v.name}"), v.grants)))
            .map { case (kind, id, gs) =>
              (kind, id, s"$${databricks_table.$id.id}", gs) } ++
          s.volumes.map { v =>
            val vid = rid(s"${s.name}_${v.name}")
            ("volume", vid, s"$${databricks_volume.$vid.id}", v.grants)
          }
      }.filter(_._4.nonEmpty)
    if (grantSecurables.nonEmpty) {
      val gr = resource.putObject("databricks_grants")
      grantSecurables.foreach { case (kind, id, ref, gs) =>
        val gn = gr.putObject(id)
        gn.put(kind, ref)
        val arr = gn.putArray("grant")
        gs.foreach { g =>
          val one = arr.addObject()
          one.put("principal", g.principal)
          val pv = one.putArray("privileges")
          g.privileges.foreach(pv.add)
        }
      }
    }

    // one databricks_job per pipeline (databricks.py:502-645): shared
    // auto-scaling job cluster with runtime selection and tags, tasks
    // with retries + the depends_on graph, the pipeline's schedule
    // (JobSchedule: quartz cron + timezone + pause status), and a
    // TerraformOutput exposing each job's id (databricks.py:638-643)
    if (project.pipelines.nonEmpty) {
      val jobs = resource.putObject("databricks_job")
      project.pipelines.foreach { p =>
        val jn = jobs.putObject(rid(s"${project.name}_${p.name}"))
        jn.put("name", s"${project.name}/${p.name}")
        val jc = jn.putArray("job_cluster").addObject()
        jc.put("job_cluster_key", "main")
        val nc = jc.putObject("new_cluster")
        nc.put("spark_version", cluster.sparkVersion)
        nc.put("node_type_id", cluster.nodeTypeId)
        if (cluster.autoScale) {
          val as = nc.putObject("autoscale")
          as.put("min_workers", cluster.minWorkers)
          as.put("max_workers", cluster.maxWorkers)
        } else nc.put("num_workers", cluster.numWorkers)
        nc.put("runtime_engine", if (cluster.photon) "PHOTON" else "STANDARD")
        if (cluster.tags.nonEmpty) {
          val ct = nc.putObject("custom_tags")
          cluster.tags.foreach { case (k, v) => ct.put(k, v) }
        }
        if (cluster.sparkConf.nonEmpty) {
          val sc = nc.putObject("spark_conf")
          cluster.sparkConf.foreach { case (k, v) => sc.put(k, v) }
        }
        val tasks = jn.putArray("task")
        p.tasks.foreach { t =>
          val tn = tasks.addObject()
          tn.put("task_key", t.name)
          tn.put("job_cluster_key", "main")
          tn.put("max_retries", 3) // reference JobTask default, databricks.py:592
          val jar = tn.putObject("spark_jar_task")
          jar.put("main_class_name", "graft.Cli")
          val params = jar.putArray("parameters")
          Seq("run", "-t", s"$taskConfDir/${t.name}.json").foreach(params.add)
          if (t.dependsOn.nonEmpty) {
            val deps = tn.putArray("depends_on")
            t.dependsOn.foreach(d => deps.addObject().put("task_key", d))
          }
        }
        val sch = jn.putObject("schedule")
        sch.put("quartz_cron_expression", p.schedule.cronExpression)
        sch.put("timezone_id", p.schedule.timezoneId)
        sch.put("pause_status", p.schedule.status)
        if (p.tags.nonEmpty) {
          val tg = jn.putObject("tags")
          p.tags.foreach { case (k, v) => tg.put(k, v) }
        }
      }
      // databricks_permissions per pipeline job: one access_control
      // entry per (principal, level). Principals containing '@' render
      // as user_name, others as group_name — the two shapes a contract
      // can express without a workspace lookup.
      val withPerms = project.pipelines.filter(_.permissions.nonEmpty)
      if (withPerms.nonEmpty) {
        val perms = resource.putObject("databricks_permissions")
        withPerms.foreach { p =>
          val id = rid(s"${project.name}_${p.name}")
          val pn = perms.putObject(s"${id}_job")
          pn.put("job_id", s"$${databricks_job.$id.id}")
          val acl = pn.putArray("access_control")
          p.permissions.foreach { perm =>
            val one = acl.addObject()
            if (perm.principal.contains("@")) one.put("user_name", perm.principal)
            else one.put("group_name", perm.principal)
            one.put("permission_level", perm.level)
          }
        }
      }
      val outputs = root.putObject("output")
      project.pipelines.foreach { p =>
        val id = rid(s"${project.name}_${p.name}")
        outputs.putObject(s"${id}_job_id")
          .put("value", s"$${databricks_job.$id.id}")
      }
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}

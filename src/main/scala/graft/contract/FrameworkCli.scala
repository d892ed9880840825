package graft.contract

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

/**
 * Framework CLI verbs beyond run/validate (reference:
 * projectoneflow-framework/.../framework/cli/cli.py:63-68 wires
 * blueprint / ci / validate / deploy / destroy / run;
 * blueprint.py:17-220 generates contract & dataset & pipeline templates
 * into fresh folders; ci/cli.py:20-120 validates project folders in a
 * CI job and publishes the result).
 *
 * The blueprint templates emitted here round-trip through
 * [[ProjectContract.parse]] + [[ProjectContract.validate]] by
 * construction. The CI verb's "publish" half posts no MR comment (the
 * reference's gitlab client needs a CI platform); the report it would
 * post is written as JSON to a file / stdout — the same content, a local
 * sink.
 */
object FrameworkCli {

  // ------------------------------------------------------- blueprints

  /** Project-contract template (blueprint.py `generate_contract`):
    * a minimal valid project with one schema, one table, one pipeline
    * whose single task appends a CSV into a managed table. */
  def contractTemplate(name: String): String =
    s"""{
       |  "name": "$name",
       |  "schemas": [
       |    {
       |      "name": "${name}_schema",
       |      "tables": [
       |        {
       |          "name": "example_table",
       |          "comment": "replace with your table",
       |          "columns": [
       |            {"name": "id", "type": "bigint", "nullable": false},
       |            {"name": "value", "type": "string"}
       |          ]
       |        }
       |      ],
       |      "views": [],
       |      "volumes": []
       |    }
       |  ],
       |  "pipelines": [
       |    {
       |      "name": "${name}_pipeline",
       |      "tasks": [
       |        {
       |          "name": "ingest_example",
       |          "execution_sql": "SELECT * FROM src",
       |          "inputs": [
       |            {"name": "src", "path": "data/in.csv", "source": "csv"}
       |          ],
       |          "outputs": [
       |            {"name": "out", "path": "data/example_table", "sink": "graft",
       |             "write_type": "append"}
       |          ]
       |        }
       |      ]
       |    }
       |  ]
       |}""".stripMargin

  /** Dataset-object template (blueprint.py `generate_dataset`,
    * dataset_object_type choices schema|table|view). */
  def datasetTemplate(name: String, dtype: String): String = dtype match {
    case "schema" =>
      s"""{"name": "$name", "tables": [], "views": [], "volumes": []}"""
    case "table" =>
      s"""{
         |  "name": "$name",
         |  "comment": "replace with your table",
         |  "columns": [
         |    {"name": "id", "type": "bigint", "nullable": false},
         |    {"name": "value", "type": "string"}
         |  ]
         |}""".stripMargin
    case "view" =>
      s"""{"name": "$name", "query": "SELECT 1 AS id"}"""
    case other =>
      throw new IllegalArgumentException(
        s"dataset type '$other' not one of schema|table|view")
  }

  /** Pipeline template (blueprint.py `generate_pipeline`). */
  def pipelineTemplate(name: String): String =
    s"""{
       |  "name": "$name",
       |  "tasks": [
       |    {
       |      "name": "task_1",
       |      "execution_sql": "SELECT * FROM src",
       |      "inputs": [{"name": "src", "path": "data/in.csv", "source": "csv"}],
       |      "outputs": [{"name": "out", "path": "data/out_table", "sink": "graft",
       |                   "write_type": "append"}]
       |    }
       |  ]
       |}""".stripMargin

  /** Generate a blueprint into `folder/name/name.json` (contract) or
    * `folder/name.json` (dataset/pipeline), refusing to overwrite —
    * blueprint.py:120-127 exits when the target exists. Contract
    * blueprints also get the working subfolders. Returns the file. */
  def generateBlueprint(kind: String, name: String, folder: String,
                        dtype: String = "schema"): Path = {
    val base = Paths.get(folder).toAbsolutePath
    val (dir, content) = kind match {
      case "contract" => (base.resolve(name), contractTemplate(name))
      case "dataset" => (base, datasetTemplate(name, dtype))
      case "pipeline" => (base, pipelineTemplate(name))
      case other =>
        throw new IllegalArgumentException(
          s"blueprint kind '$other' not one of contract|dataset|pipeline")
    }
    val file = dir.resolve(s"$name.json")
    if (kind == "contract" && Files.exists(dir))
      throw new IllegalStateException(
        s"contract folder $dir already exists; choose a different name")
    if (Files.exists(file))
      throw new IllegalStateException(s"$file already exists")
    Files.createDirectories(dir)
    Files.write(file, content.getBytes(StandardCharsets.UTF_8))
    if (kind == "contract")
      Seq("datasets", "pipelines", "data").foreach(s =>
        Files.createDirectories(dir.resolve(s)))
    file
  }

  // --------------------------------------------------------------- ci

  final case class CiProjectResult(folder: String, project: Option[String],
                                   errors: Seq[String]) {
    def ok: Boolean = errors.isEmpty
  }

  /** CI validation over project folders (ci/cli.py `validate`): each
    * folder must hold a `<folder-name>.json` (or a single top-level
    * .json) contract; parse + full validation per project. */
  def ciValidate(folders: Seq[String]): Seq[CiProjectResult] =
    folders.map { f =>
      val dir = Paths.get(f).toAbsolutePath
      val candidate = dir.resolve(s"${dir.getFileName}.json")
      val contractFile =
        if (Files.isRegularFile(candidate)) Some(candidate)
        else {
          import scala.jdk.CollectionConverters._
          if (!Files.isDirectory(dir)) None
          else Files.list(dir).iterator().asScala
            .filter(p => p.toString.endsWith(".json")).toSeq match {
              case Seq(one) => Some(one)
              case _ => None
            }
        }
      contractFile match {
        case None =>
          CiProjectResult(f, None, Seq(s"no contract json found in $dir"))
        case Some(file) =>
          try {
            val p = ProjectContract.parse(Files.readString(file))
            CiProjectResult(f, Some(p.name), ProjectContract.validate(p))
          } catch {
            case e: Exception =>
              CiProjectResult(f, None, Seq(s"unparseable contract: ${e.getMessage}"))
          }
      }
    }

  /** The report the reference posts as an MR comment
    * (ci/comment.py), rendered as JSON. */
  def ciReportJson(results: Seq[CiProjectResult]): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("ok", results.forall(_.ok))
    val arr = root.putArray("projects")
    results.foreach { r =>
      val n = arr.addObject()
      n.put("folder", r.folder)
      r.project.foreach(n.put("project", _))
      n.put("ok", r.ok)
      val errs = n.putArray("errors")
      r.errors.foreach(errs.add)
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  // ------------------------------------------------------------- main

  /** `blueprint generate contract -c name [-f folder]`
    * `blueprint generate dataset -n name [-t schema|table|view] [-f folder]`
    * `blueprint generate pipeline -n name [-f folder]`
    * `ci validate -f folder1,folder2 [-o report.json]` */
  def main(args: Array[String]): Unit = {
    def fail(msg: String): Nothing = { System.err.println(msg); sys.exit(2) }
    if (args.length < 2) fail("usage: blueprint generate <kind> ... | ci validate -f dirs")
    val opts = args.drop(2).sliding(2, 2).collect {
      case Array(k, v) => k.stripPrefix("--").stripPrefix("-") -> v
    }.toMap

    (args(0), args(1)) match {
      case ("blueprint", "generate") =>
        // argv: blueprint generate <kind> -c/-n name [-f folder] [-t dtype]
        val rest = args.drop(2)
        val kind = rest.headOption.getOrElse(fail("blueprint kind required"))
        val kopts = rest.drop(1).sliding(2, 2).collect {
          case Array(k, v) => k.stripPrefix("--").stripPrefix("-") -> v
        }.toMap
        val name = kopts.get("c").orElse(kopts.get("n"))
          .getOrElse(fail("-c/-n name required"))
        val file = generateBlueprint(kind, name,
          kopts.getOrElse("f", "."), kopts.getOrElse("t", "schema"))
        println(s"Created $kind blueprint at $file")

      case ("ci", "validate") =>
        val folders = opts.getOrElse("f", fail("-f folders required"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val results = ciValidate(folders)
        val report = ciReportJson(results)
        opts.get("o") match {
          case Some(out) =>
            Files.write(Paths.get(out), report.getBytes(StandardCharsets.UTF_8))
            println(s"report written to $out")
          case None => println(report)
        }
        if (!results.forall(_.ok)) sys.exit(1)

      case (a, b) => fail(s"unknown verb $a $b")
    }
  }
}

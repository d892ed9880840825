package graft

import graft.contract.{FrameworkCli, ProjectContract}
import java.nio.file.{Files, Paths}

/** Blueprint generation + CI validation verbs (reference
  * framework/cli/blueprint.py:17-220, framework/ci/cli.py:20-120). */
class FrameworkCliSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def tmp(prefix: String) =
    Files.createTempDirectory(s"graft_cli_$prefix").toString

  test("contract blueprint round-trips through parse + validate") {
    val folder = tmp("bp")
    val file = FrameworkCli.generateBlueprint("contract", "proj1", folder)
    val project = ProjectContract.parse(Files.readString(file))
    assert(project.name === "proj1")
    assert(ProjectContract.validate(project).isEmpty)
    // working subfolders created (blueprint.py get_folder_name analogue)
    Seq("datasets", "pipelines", "data").foreach(s =>
      assert(Files.isDirectory(Paths.get(folder, "proj1", s))))
    // refusing to overwrite an existing contract folder
    intercept[IllegalStateException](
      FrameworkCli.generateBlueprint("contract", "proj1", folder))
  }

  test("dataset + pipeline blueprints emit valid objects") {
    val folder = tmp("bpds")
    FrameworkCli.generateBlueprint("dataset", "s1", folder, dtype = "schema")
    FrameworkCli.generateBlueprint("dataset", "t1", folder, dtype = "table")
    FrameworkCli.generateBlueprint("dataset", "v1", folder, dtype = "view")
    FrameworkCli.generateBlueprint("pipeline", "p1", folder)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    Seq("s1", "t1", "v1", "p1").foreach { n =>
      val node = m.readTree(Files.readString(Paths.get(folder, s"$n.json")))
      assert(node.get("name").asText() === n)
    }
    // the table object parses as a contract TableDef column set
    val t = m.readTree(Files.readString(Paths.get(folder, "t1.json")))
    assert(t.get("columns").size() === 2)
    intercept[IllegalArgumentException](
      FrameworkCli.generateBlueprint("dataset", "x", folder, dtype = "nope"))
    intercept[IllegalArgumentException](
      FrameworkCli.generateBlueprint("nope", "x", folder))
  }

  test("ci validate reports per-project results and flags invalid contracts") {
    val base = tmp("ci")
    // valid project from the blueprint
    FrameworkCli.generateBlueprint("contract", "good", base)
    // invalid project: duplicate columns
    val badDir = Paths.get(base, "bad")
    Files.createDirectories(badDir)
    Files.write(badDir.resolve("bad.json"),
      """{"name":"bad","schemas":[{"name":"s","tables":[
        |{"name":"t","columns":[{"name":"id","type":"int"},
        |{"name":"id","type":"int"}]}]}],"pipelines":[]}"""
        .stripMargin.getBytes("UTF-8"))
    // folder with no contract at all
    val emptyDir = Paths.get(base, "empty")
    Files.createDirectories(emptyDir)

    val results = FrameworkCli.ciValidate(Seq(
      s"$base/good", s"$base/bad", s"$base/empty"))
    assert(results.map(_.ok) === Seq(true, false, false))
    assert(results(1).errors.exists(_.contains("duplicate columns")))
    assert(results(2).errors.exists(_.contains("no contract json")))

    val report = FrameworkCli.ciReportJson(results)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(report)
    assert(!node.get("ok").asBoolean())
    assert(node.get("projects").size() === 3)
    assert(node.get("projects").get(0).get("project").asText() === "good")
  }
}

package graft

import graft.config.Config._
import graft.sources.{ExcelSource, FileOps}
import graft.table.ManagedTable
import graft.task.SparkTask
import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Zip decompression, xlsx parsing, file-modified CDC, deferred post-task
  * file ops (reference file_source.py / runtime). */
class FileSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writeZip(path: String, entries: (String, String)*): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
  }

  test("unzip extracts entries; zip csv path reads transparently") {
    val dir = tmpDir("zip")
    Files.createDirectories(Paths.get(dir))
    val zipPath = s"$dir/data.zip"
    writeZip(zipPath, "part1.csv" -> "id,name\n1,a\n2,b\n",
      "part2.csv" -> "id,name\n3,c\n")
    val df = graft.sources.SourceRead.readBatch(spark,
      InputConf("z", zipPath, "csv"))
    assert(df.count() === 3)
    assert(df.columns.toSeq === Seq("id", "name"))
  }

  test("unzip rejects path traversal") {
    val dir = tmpDir("zipevil")
    Files.createDirectories(Paths.get(dir))
    val zipPath = s"$dir/evil.zip"
    writeZip(zipPath, "../escape.txt" -> "nope")
    assertThrows[IllegalArgumentException] { FileOps.unzip(zipPath, s"$dir/out") }
  }

  // --------------------------------------------------------------- xlsx

  private def writeXlsx(path: String): Unit = {
    val workbook =
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        | <sheets><sheet name="Data" sheetId="1" r:id="rId1"/>
        |         <sheet name="Other" sheetId="2" r:id="rId2"/></sheets>
        |</workbook>""".stripMargin
    val rels =
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        | <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
        | <Relationship Id="rId2" Type="w" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin
    val shared =
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        | <si><t>id</t></si><si><t>name</t></si><si><t>alice</t></si><si><t>bob</t></si>
        |</sst>""".stripMargin
    val sheet1 =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        | <sheetData>
        |  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |  <row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>2</v></c></row>
        |  <row r="3"><c r="A3"><v>2</v></c><c r="B3" t="s"><v>3</v></c></row>
        |  <row r="4"><c r="A4"><v>3</v></c><c r="B4" t="inlineStr"><is><t>inline</t></is></c></row>
        | </sheetData>
        |</worksheet>""".stripMargin
    val sheet2 =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        | <sheetData><row r="1"><c r="A1"><v>99</v></c></row></sheetData>
        |</worksheet>""".stripMargin
    writeZip(path,
      "xl/workbook.xml" -> workbook,
      "xl/_rels/workbook.xml.rels" -> rels,
      "xl/sharedStrings.xml" -> shared,
      "xl/worksheets/sheet1.xml" -> sheet1,
      "xl/worksheets/sheet2.xml" -> sheet2)
  }

  test("xlsx: header row, shared+inline strings, numbers") {
    val dir = tmpDir("xlsx")
    Files.createDirectories(Paths.get(dir))
    val p = s"$dir/book.xlsx"
    writeXlsx(p)
    val df = ExcelSource.read(spark, p)
    assert(df.columns.toSeq === Seq("id", "name"))
    val rows = df.as[(String, String)].collect().toSeq
    assert(rows === Seq(("1", "alice"), ("2", "bob"), ("3", "inline")))
  }

  test("xlsx: sheet selection and cell range") {
    val dir = tmpDir("xlsx2")
    Files.createDirectories(Paths.get(dir))
    val p = s"$dir/book.xlsx"
    writeXlsx(p)
    val other = ExcelSource.read(spark, p,
      ExcelSource.Options(sheet = Some("Other"), header = false))
    assert(other.collect().map(_.getString(0)).toSeq === Seq("99"))
    val ranged = ExcelSource.read(spark, p,
      ExcelSource.Options(header = false, cellRange = Some("A2:B3")))
    assert(ranged.count() === 2)
    assert(ranged.columns.toSeq === Seq("_c0", "_c1"))
  }

  test("cell ref parsing handles multi-letter columns") {
    assert(ExcelSource.parseCellRef("A1") === (0, 0))
    assert(ExcelSource.parseCellRef("Z10") === (9, 25))
    assert(ExcelSource.parseCellRef("AA3") === (2, 26))
  }

  // ----------------------------------------------------- file-path CDC

  test("file-modified CDC ingests only files newer than the watermark") {
    val srcDir = tmpDir("fcdc_src")
    val sink = tmpDir("fcdc_sink")
    val state = tmpDir("fcdc_state")
    Files.createDirectories(Paths.get(srcDir))
    def conf(now: String) = TaskConf("fcdc",
      inputs = Seq(InputConf("in1", srcDir, "csv",
        features = InputFeatures(changeData = Some(ChangeData(
          "mtime", changeFeatureType = "file_path_cdc_feed"))))),
      executionSql = Some("SELECT * FROM in1"),
      outputs = Seq(OutputConf("out", sink, writeType = "append",
        options = Map("now" -> now))),
      stateLocation = Some(state))

    Files.writeString(Paths.get(s"$srcDir/a.csv"), "id,v\n1,x\n")
    SparkTask.run(spark, conf("2026-01-01 00:00:00"))
    assert(ManagedTable(spark, sink).read.count() === 1)

    Thread.sleep(1100) // mtime granularity
    Files.writeString(Paths.get(s"$srcDir/b.csv"), "id,v\n2,y\n3,z\n")
    SparkTask.run(spark, conf("2026-02-01 00:00:00"))
    val t = ManagedTable(spark, sink).read
    assert(t.count() === 3) // 1 + only the 2 new rows, file a not re-read
  }

  test("file-modified CDC raises NoSourceData when nothing changed") {
    val srcDir = tmpDir("fcdc_empty")
    Files.createDirectories(Paths.get(srcDir))
    assertThrows[FileOps.NoSourceData] {
      FileOps.modifiedFiles(spark.sparkContext.hadoopConfiguration,
        srcDir, 0L, System.currentTimeMillis())
    }
  }

  // ------------------------------------------------------ post-task ops

  test("deferred post-task deletes run at cleanup, errors contained") {
    val rt = new FileOps.PostTaskRuntime
    val dir = tmpDir("posttask")
    Files.createDirectories(Paths.get(dir))
    val f = Paths.get(s"$dir/victim.txt")
    Files.writeString(f, "bye")
    rt.deleteAtExit(spark.sparkContext.hadoopConfiguration, f.toString)
    rt.atExit(() => throw new RuntimeException("contained"))
    assert(rt.pending === 2)
    assert(Files.exists(f))
    rt.cleanup()
    assert(!Files.exists(f))
    assert(rt.pending === 0)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.util.zip.ZipFile
import scala.xml.XML

/**
 * Excel (.xlsx) source with sheet / header / range options — the surface
 * of the reference's Excel path (reference: file_source.py:1014-1136:
 * pandas `read_excel` on the driver with sheet/header/range; range parse
 * :204-214). Our implementation parses the OOXML container directly
 * (a zip of XML parts) with scala-xml — zero external dependencies.
 *
 * Like the reference, the workbook is materialized on the driver and
 * turned into a DataFrame via `createDataFrame` — the right trade for
 * workbook-sized data (Excel files are small by construction; large data
 * belongs in parquet/csv sources).
 *
 * Cell semantics: shared strings (`t="s"`), inline strings
 * (`t="inlineStr"`), formula strings (`t="str"`), booleans (`t="b"`),
 * numbers (default) — all surfaced as strings; casting is the caller's
 * schema concern, mirroring csv-without-inferSchema.
 */
object ExcelSource {

  final case class Options(
      sheet: Option[String] = None,   // sheet name; default = first sheet
      header: Boolean = true,         // first row (of range) as column names
      cellRange: Option[String] = None) // e.g. "B2:D10"

  /** "B7" → (rowIdx 6, colIdx 1), zero-based. */
  def parseCellRef(ref: String): (Int, Int) = {
    val (letters, digits) = ref.span(_.isLetter)
    val col = letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1
    (digits.toInt - 1, col)
  }

  private def zipEntryXml(zip: ZipFile, name: String): Option[scala.xml.Elem] =
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      try XML.load(in) finally in.close()
    }

  def read(spark: SparkSession, path: String, opts: Options = Options()): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val workbook = zipEntryXml(zip, "xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: not an xlsx (no workbook.xml)"))
      val rels = zipEntryXml(zip, "xl/_rels/workbook.xml.rels").get
      val relTargets = (rels \\ "Relationship")
        .map(r => (r \ "@Id").text -> (r \ "@Target").text).toMap

      val sheets = (workbook \\ "sheet").map { s =>
        val rid = s.attributes.asAttrMap
          .collectFirst { case (k, v) if k.endsWith(":id") || k == "id" => v }.get
        (s \ "@name").text -> rid
      }
      val (sheetName, rid) = opts.sheet match {
        case Some(n) => sheets.find(_._1 == n).getOrElse(
          throw new IllegalArgumentException(
            s"sheet '$n' not found; has: ${sheets.map(_._1).mkString(",")}"))
        case None => sheets.head
      }
      val target = relTargets(rid).stripPrefix("/xl/").stripPrefix("./")
      val sheetXml = zipEntryXml(zip, s"xl/$target").getOrElse(
        throw new IllegalArgumentException(s"sheet part xl/$target missing"))

      val shared: IndexedSeq[String] =
        zipEntryXml(zip, "xl/sharedStrings.xml")
          .map(ss => (ss \\ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq)
          .getOrElse(IndexedSeq.empty)

      // sparse cell map (row, col) -> value
      val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
      var maxRow = -1
      var maxCol = -1
      for (row <- sheetXml \\ "row"; c <- row \ "c") {
        val (r, cIdx) = parseCellRef((c \ "@r").text)
        val t = (c \ "@t").text
        val value = t match {
          case "s" => shared((c \ "v").text.toInt)
          case "inlineStr" => (c \\ "t").map(_.text).mkString
          case "b" => if ((c \ "v").text == "1") "true" else "false"
          case _ => (c \ "v").text // numbers, formula strings carry <v>
        }
        if (value.nonEmpty) {
          cells((r, cIdx)) = value
          if (r > maxRow) maxRow = r
          if (cIdx > maxCol) maxCol = cIdx
        }
      }

      // apply range bounds (reference range parse file_source.py:204-214)
      val (r0, c0, r1, c1) = opts.cellRange match {
        case Some(rg) =>
          val Array(a, b) = rg.split(":", 2)
          val (ra, ca) = parseCellRef(a)
          val (rb, cb) = parseCellRef(b)
          (ra, ca, rb, cb)
        case None => (0, 0, maxRow, maxCol)
      }
      require(r1 >= r0 && c1 >= c0, s"empty or inverted range for $path")

      val grid: Seq[Seq[String]] = (r0 to r1).map { r =>
        (c0 to c1).map(c => cells.getOrElse((r, c), null))
      }
      val (names, data) =
        if (opts.header && grid.nonEmpty)
          (grid.head.zipWithIndex.map { case (h, i) =>
            Option(h).filter(_.nonEmpty).getOrElse(s"_c$i") }, grid.tail)
        else ((c0 to c1).map(i => s"_c${i - c0}"), grid)

      val schema = StructType(names.map(n => StructField(n, StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.map(Row.fromSeq(_)), 1).toJavaRDD(),
        schema)
    } finally zip.close()
  }
}

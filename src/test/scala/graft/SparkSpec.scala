package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Shared local SparkSession + golden-comparison helpers for all specs
  * (mirrors the reference's assertDataFrameEqual style,
  * tests/integration_tests/test_batch.py:31). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf: String = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(s"graft_test_$prefix").toString + "/t"

  /** Order-insensitive full comparison on collected rows. */
  def assertSameRows(actual: DataFrame, expected: DataFrame): Unit = {
    assert(actual.columns.sorted.toSeq === expected.columns.sorted.toSeq,
      "column sets differ")
    val cols = actual.columns.sorted.toSeq
    def canon(df: DataFrame): Seq[String] =
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().toSeq.map(_.toSeq.map(v => if (v == null) "" else v.toString)
          .mkString("|")).sorted
    assert(canon(actual) === canon(expected))
  }

  def rowsOf(df: DataFrame): Seq[Row] = df.collect().toSeq
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.table.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

package graft

import graft.odata.ODataFilters
import graft.sources.FileOps
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.sources._

/** User predicate strings (ODataTable.scala:151-216) and wildcard path
  * resolution (file_source.py:87-121). */
class PredicateWildcardSpec extends SparkSpec {

  test("predicate strings parse via CatalystSqlParser into OData filters") {
    assert(ODataFilters.parsePredicate("Id = 5").expression === "Id eq 5")
    assert(ODataFilters.parsePredicate("Id >= 10").expression === "Id ge 10")
    assert(ODataFilters.parsePredicate("Name = 'x'").expression === "Name eq 'x'")
    assert(ODataFilters.parsePredicate("Id != 3").expression === "Id ne 3")
    val p = ODataFilters.parsePredicate("Id < 7")
    assert(p.raw === LessThan("Id", 7))
  }

  test("unsupported predicate shapes throw, matching reference strictness") {
    assertThrows[IllegalArgumentException] {
      ODataFilters.parsePredicate("Id + 1 > 2 OR Name = 'x'")
    }
    assertThrows[IllegalArgumentException] {
      ODataFilters.parsePredicate("NOT a garbage ===")
    }
  }

  test("semicolon-separated predicates option combines") {
    val ps = ODataFilters.parsePredicates("Id >= 1; Name = 'a'")
    assert(ps.map(_.expression) === Seq("Id ge 1", "Name eq 'a'"))
  }

  test("wildcard resolution expands * and ? per segment") {
    val root = tmpDir("wild")
    Files.createDirectories(Paths.get(s"$root/d1/sub"))
    Files.createDirectories(Paths.get(s"$root/d2/sub"))
    Files.writeString(Paths.get(s"$root/d1/sub/a.csv"), "x")
    Files.writeString(Paths.get(s"$root/d1/sub/b.csv"), "x")
    Files.writeString(Paths.get(s"$root/d1/sub/c.txt"), "x")
    Files.writeString(Paths.get(s"$root/d2/sub/d.csv"), "x")
    val conf = spark.sparkContext.hadoopConfiguration
    val all = FileOps.wildcardResolution(conf, s"$root/d*/sub/*.csv")
    assert(all.map(_.split("/").last).sorted === Seq("a.csv", "b.csv", "d.csv"))
    val q = FileOps.wildcardResolution(conf, s"$root/d1/sub/?.csv")
    assert(q.size === 2)
    // non-wildcard paths pass through; comma-separated lists mix
    val mixed = FileOps.wildcardResolution(conf, s"$root/d1/sub/a.csv,$root/d2/sub/*.csv")
    assert(mixed.map(_.split("/").last).sorted === Seq("a.csv", "d.csv"))
  }
}

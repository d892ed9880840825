package graft

import graft.config.Config._
import graft.table.ManagedTable
import graft.task.SparkTask
import java.sql.DriverManager

/** JDBC source path (reference: core/sources/jdbc_source.py:6-85) against
  * an embedded Derby database — partitioned reads included. */
class JdbcSpec extends SparkSpec {

  private lazy val url: String = {
    val u = "jdbc:derby:memory:graftdb;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE people (id INT NOT NULL, name VARCHAR(32), score INT)")
    (1 to 100).foreach(i =>
      st.execute(s"INSERT INTO people VALUES ($i, 'p$i', ${i * 10})"))
    st.close(); conn.close()
    u
  }

  test("jdbc source reads through the generic options path") {
    val df = graft.sources.SourceRead.readBatch(spark,
      InputConf("j", "ignored", "jdbc", sourceType = "file",
        options = Map("url" -> url, "dbtable" -> "people")))
    assert(df.count() === 100)
    assert(df.columns.map(_.toLowerCase).toSeq === Seq("id", "name", "score"))
  }

  test("partitionColumn options produce parallel partitioned reads (jdbc_source.py:39-54)") {
    val df = spark.read.format("jdbc")
      .options(Map(
        "url" -> url, "dbtable" -> "people",
        "partitionColumn" -> "id", "lowerBound" -> "1",
        "upperBound" -> "101", "numPartitions" -> "4"))
      .load()
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
  }

  test("jdbc 'query' option variant") {
    val df = graft.sources.SourceRead.readBatch(spark,
      InputConf("j", "ignored", "jdbc",
        options = Map("url" -> url,
          "query" -> "SELECT id, score FROM people WHERE id <= 10")))
    assert(df.count() === 10)
  }

  test("jdbc input drives a full task to a managed sink") {
    val sink = tmpDir("jdbc_sink")
    val t = TaskConf("jdbc_e2e",
      inputs = Seq(InputConf("people_in", "ignored", "jdbc",
        options = Map("url" -> url, "dbtable" -> "people"),
        features = InputFeatures(filterExpression = Some("score >= 500")))),
      executionSql = Some("SELECT id, name FROM people_in"),
      outputs = Seq(OutputConf("out", sink, writeType = "overwrite",
        options = Map("now" -> "2026-01-01 00:00:00"))))
    SparkTask.run(spark, t)
    assert(ManagedTable(spark, sink).read.count() === 51) // scores 500..1000
  }
}

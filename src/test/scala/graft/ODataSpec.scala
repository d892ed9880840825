package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.odata._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/**
 * OData DSv2 connector against a stub HTTP server — mirrors the reference
 * suite (unit_testing/ODataSparkTestSuite.scala:23-123: option validation,
 * filter parse, offset round-trip, partition planning) plus an end-to-end
 * `spark.read.format("odata")` read.
 */
class ODataSpec extends SparkSpec {

  // ------------------------------------------------------- stub server

  private val Metadata =
    """<?xml version="1.0"?>
      |<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
      | <edmx:DataServices><Schema xmlns="http://docs.oasis-open.org/odata/ns/edm">
      |  <EntityType Name="Account">
      |   <Property Name="Id" Type="Edm.Int32"/>
      |   <Property Name="Name" Type="Edm.String"/>
      |   <Property Name="Balance" Type="Edm.Decimal"/>
      |   <Property Name="Active" Type="Edm.Boolean"/>
      |   <Property Name="ModifiedOn" Type="Edm.DateTimeOffset"/>
      |   <Property Name="Photo" Type="Edm.Stream"/>
      |  </EntityType>
      | </Schema></edmx:DataServices></edmx:Edmx>""".stripMargin

  private val NRows = 23

  private def rowJson(i: Int): String =
    s"""{"Id":$i,"Name":"acct_$i","Balance":${i * 1.5},"Active":${i % 2 == 0},
       |"ModifiedOn":"2026-01-${"%02d".format(i % 27 + 1)}T00:00:00Z"}""".stripMargin.replace("\n", "")

  @volatile private var requests: List[String] = Nil

  private def startServer(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val uri = ex.getRequestURI
        requests = requests :+ uri.toString
        val params = Option(uri.getRawQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { p =>
            val Array(k, v) = p.split("=", 2)
            java.net.URLDecoder.decode(k, StandardCharsets.UTF_8) ->
              java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
          }.toMap
        val body: String =
          if (uri.getPath.contains("$metadata")) Metadata
          else {
            // honor Id-range and ModifiedOn-window $filters so pushdown
            // and streaming window advance are observable
            val filter = params.getOrElse("$filter", "")
            val ids = (0 until NRows).filter { i =>
              val idOk =
                if (filter.contains("Id ge "))
                  i >= filter.split("Id ge ")(1).split(" ")(0).toInt
                else true
              val ts = s"2026-01-${"%02d".format(i % 27 + 1)}T00:00:00Z"
              val geOk =
                if (filter.contains("ModifiedOn ge "))
                  ts >= filter.split("ModifiedOn ge ")(1).split(" ")(0)
                else true
              val ltOk =
                if (filter.contains("ModifiedOn lt "))
                  ts < filter.split("ModifiedOn lt ")(1).split(" ")(0)
                else true
              idOk && geOk && ltOk
            }
            if (params.get("$count").contains("true") && params.get("$top").contains("0"))
              s"""{"@odata.count":${ids.size},"value":[]}"""
            else {
              val top = params.get("$top").map(_.toInt).getOrElse(ids.size)
              val skip = params.get("$skip").map(_.toInt).getOrElse(0)
              val page = ids.slice(skip, skip + top)
              s"""{"value":[${page.map(rowJson).mkString(",")}]}"""
            }
          }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    server
  }

  private def withServer(f: String => Unit): Unit = {
    val server = startServer()
    try f(s"http://localhost:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  // ------------------------------------------------------------- tests

  test("options: missing instanceUrl rejected, defaults applied") {
    assertThrows[IllegalArgumentException] {
      ODataOptions.fromMap(Map.empty[String, String].asJava, "Account")
    }
    val o = ODataOptions.fromMap(Map("instanceUrl" -> "http://x/").asJava, "Account")
    assert(o.instanceUrl === "http://x") // trailing slash stripped
    assert(o.rowsPerPage === 1000 && o.maxPagesPerBatch === 4)
  }

  test("schema inference from $metadata maps Edm types, skips Edm.Stream") {
    withServer { url =>
      val cols = new ODataClient(ODataOptions(url, "Account")).inferSchema()
      assert(cols.map(c => c.name -> c.sparkType) === Seq(
        "Id" -> IntegerType, "Name" -> StringType, "Balance" -> DoubleType,
        "Active" -> BooleanType, "ModifiedOn" -> TimestampType))
    }
  }

  test("filter translation: operators render as OData, contains is NOT endswith") {
    val schema = StructType(Seq(StructField("Name", StringType),
      StructField("Id", IntegerType), StructField("arr", ArrayType(StringType))))
    val (pushed, rest) = ODataFilters.split(Array[Filter](
      EqualTo("Name", "x"), Not(EqualTo("Id", 3)), GreaterThanOrEqual("Id", 5),
      StringContains("Name", "bc"), EqualTo("arr", Seq("a")), IsNotNull("Name")),
      schema)
    val exprs = pushed.map(_.expression)
    assert(exprs.contains("Name eq 'x'"))
    assert(exprs.contains("Id ne 3"))
    assert(exprs.contains("Id ge 5"))
    assert(exprs.contains("contains(Name,'bc')")) // reference bug not ported
    assert(rest.size === 2) // array-typed equality + IsNotNull stay with Spark
  }

  test("timestamp filter values render ISO-8601 Z (ODataHelper.scala:71-101)") {
    val v = ODataFilters.renderValue(java.sql.Timestamp.valueOf("2026-01-02 03:04:05"))
    assert(v === "2026-01-02T03:04:05.000000Z")
  }

  test("offset json round-trips; v2 back-compat defaults records_count=-1") {
    val off = ODataOffset(1700000000000L, 1600000000000L, 7, 3, 500, 3210, 4, 0)
    assert(ODataOffset.fromJson(off.json()) === off)
    val v2 = """{"version":2,"field":"ModifiedOn","offset":5,"total_pages":2,
               |"current_page":1,"rows_per_page":100,"start_value":1,"limit":0}"""
      .stripMargin.replace("\n", "")
    val parsed = ODataOffset.fromJson(v2)
    assert(parsed.recordsCount === -1 && parsed.pagesLimit === 0)
  }

  test("batch read end-to-end: count-based partition planning + paging") {
    withServer { url =>
      requests = Nil
      val df = spark.read.format("odata")
        .option("instanceUrl", url).option("rowsPerPage", "10")
        .load("Account")
      assert(df.schema.fieldNames.toSeq ===
        Seq("Id", "Name", "Balance", "Active", "ModifiedOn"))
      val rows = df.collect()
      assert(rows.length === NRows)
      assert(df.filter(col("Active")).count() === (0 until NRows).count(_ % 2 == 0))
      // 23 rows / 10 per page -> a $count probe + 3 page requests
      assert(requests.exists(_.contains("%24count=true")))
      assert(requests.count(_.contains("%24skip=")) >= 3)
    }
  }

  test("filter + column pushdown reach the HTTP request") {
    withServer { url =>
      requests = Nil
      val df = spark.read.format("odata")
        .option("instanceUrl", url).option("rowsPerPage", "10")
        .load("Account")
        .filter(col("Id") >= 20)
        .select("Id", "Name")
      val rows = df.collect()
      assert(rows.length === 3) // server honors the Id ge filter
      val pageReqs = requests.filter(_.contains("%24skip="))
      assert(pageReqs.nonEmpty)
      assert(pageReqs.forall(r => r.contains("Id+ge+20") || r.contains("Id%20ge%2020")))
      assert(pageReqs.forall(_.contains("%24select=Id%2CName")))
    }
  }

  test("limit pushdown caps partition planning (no $count probe)") {
    withServer { url =>
      requests = Nil
      val df = spark.read.format("odata")
        .option("instanceUrl", url).option("rowsPerPage", "10")
        .load("Account").limit(5)
      assert(df.count() === 5)
      assert(!requests.exists(_.contains("%24count=true")))
    }
  }

  test("micro-batch stream: availableNow drains in page-limited batches") {
    withServer { url =>
      val out = tmpDir("odata_stream_out")
      val checkpoint = tmpDir("odata_stream_ckpt")
      val df = spark.readStream.format("odata")
        .option("instanceUrl", url).option("rowsPerPage", "5")
        .option("maxPagesPerBatch", "2")
        .load("Account")
      val q = df.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val got = spark.read.parquet(out)
      assert(got.count() === NRows)
      assert(got.select("Id").distinct().count() === NRows)
    }
  }
}

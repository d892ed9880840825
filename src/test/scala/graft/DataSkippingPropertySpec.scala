package graft

import graft.table.DataSkipping
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Conservativeness property for [[DataSkipping.mayMatch]] — the invariant
 * the whole feature stands on: pruning may only drop a dir when NO row in
 * it can satisfy the predicate. A false prune silently loses rows from
 * `readWhere`, the worst failure mode a skipping layer can have, so the
 * pruner is pitted against real Spark filter evaluation on random row
 * sets × random predicate trees rather than a handful of examples.
 *
 * Stats come from the REAL capture path ([[DataSkipping.statAggs]] over a
 * DataFrame aggregate — the same expressions the write job's Observation
 * runs), and ground truth is `df.filter(pred).count()` — Spark's own
 * semantics, including its null handling and type coercions.
 */
class DataSkippingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val schema: StructType =
    StructType.fromDDL("id INT, s STRING, f DOUBLE")

  private def statsOf(df: DataFrame): Map[String, DataSkipping.ColMinMax] = {
    val aggs = DataSkipping.statAggs(schema)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    DataSkipping.statsOf(schema, row.getValuesMap[Any](row.schema.fieldNames))
  }

  private def predExpr(predicate: Column) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .filter(predicate).queryExecution.logical
      .collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.get

  // rows from a narrow domain so predicates overlap the data often
  private val rowGen: Gen[(Option[Int], Option[String], Option[Double])] = for {
    id <- Gen.option(Gen.chooseNum(-20, 20))
    s <- Gen.option(Gen.oneOf("apple", "banana", "cherry", "aardvark", "zebra", ""))
    f <- Gen.option(Gen.oneOf(-1.5, 0.0, 2.25, 10.0, 1e9))
  } yield (id, s, f)

  private val leafGen: Gen[Column] = {
    val ops: Seq[(Column, Column) => Column] =
      Seq(_ === _, _ < _, _ <= _, _ > _, _ >= _)
    val idLeaf = for {
      op <- Gen.oneOf(ops); v <- Gen.chooseNum(-25, 25)
    } yield op(col("id"), lit(v))
    val fLeaf = for {
      op <- Gen.oneOf(ops); v <- Gen.oneOf(-2.0, 0.0, 2.25, 9.5, 2e9)
    } yield op(col("f"), lit(v))
    val sLeaf = for {
      op <- Gen.oneOf(ops)
      v <- Gen.oneOf("apple", "banana", "coconut", "a", "zz")
    } yield op(col("s"), lit(v))
    val inLeaf = Gen.someOf(Seq(-20, 0, 7, 20, 99)).map(vs =>
      col("id").isin(vs.toSeq: _*))
    val swLeaf = Gen.oneOf("a", "ban", "che", "x").map(p => col("s").startsWith(p))
    val flipped = for { v <- Gen.chooseNum(-25, 25) } yield lit(v) <= col("id")
    val nullLeaf = Gen.oneOf(
      col("id").isNull, col("id").isNotNull, col("s").isNull,
      col("s").isNotNull, col("f").isNull, col("f") <=> lit(null))
    Gen.oneOf(idLeaf, fLeaf, sLeaf, inLeaf, swLeaf, flipped, nullLeaf)
  }

  private val predGen: Gen[Column] = for {
    a <- leafGen; b <- leafGen; c <- leafGen
    shape <- Gen.chooseNum(0, 3)
  } yield shape match {
    case 0 => a
    case 1 => a && b
    case 2 => a || b
    case 3 => (a && b) || c
  }

  test("mayMatch never prunes a dir containing a matching row") {
    var pruned = 0
    var total = 0
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen).map(_.take(10)), predGen) {
      (rows, pred) =>
        val df = rows.toDF("id", "s", "f")
        val stats = statsOf(df)
        val anyMatch = df.filter(pred).limit(1).count() > 0
        val keep = DataSkipping.mayMatch(stats, schema, predExpr(pred))
        total += 1
        if (!keep) pruned += 1
        // conservative: a matching row forces keep; the converse (no match
        // → prune) is NOT required — that's what makes it skipping, not
        // evaluation
        !anyMatch || keep
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(r.passed, s"conservativeness violated: ${r.status}")
    // non-vacuous: the pruner must actually prune sometimes on this domain
    assert(pruned > 0, s"pruner never pruned in $total cases — feature inert")
  }

  test("all-NULL columns prune comparisons but never IsNull-style shapes") {
    val df = Seq((Option.empty[Int], Some("x")), (None, Some("y")))
      .toDF("id", "s")
    val sc = StructType.fromDDL("id INT, s STRING")
    val aggs = DataSkipping.statAggs(sc)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val stats = DataSkipping.statsOf(sc, row.getValuesMap[Any](row.schema.fieldNames))
    def e(p: Column) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
        .filter(p).queryExecution.logical.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }.get
    assert(!DataSkipping.mayMatch(stats, sc, e(col("id") === 5)))
    assert(!DataSkipping.mayMatch(stats, sc, e(col("id") < 100)))
    assert(DataSkipping.mayMatch(stats, sc, e(col("id").isNull)),
      "all-NULL dir MATCHES IS NULL — must keep")
    // an all-NULL dir provably has no non-null row
    assert(!DataSkipping.mayMatch(stats, sc, e(col("id").isNotNull)))
    // `col <=> NULL` matches the all-NULL rows — the "=" mapping must
    // not fire the all-NULL prune
    assert(DataSkipping.mayMatch(stats, sc, e(col("id") <=> lit(null))))
  }

  test("null counts prune IS NULL on null-free dirs and keep mixed dirs") {
    val sc = StructType.fromDDL("id INT, s STRING")
    def e(p: Column) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
        .filter(p).queryExecution.logical.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }.get
    def st(df: DataFrame): Map[String, DataSkipping.ColMinMax] = {
      val aggs = DataSkipping.statAggs(sc)
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      DataSkipping.statsOf(sc, row.getValuesMap[Any](row.schema.fieldNames))
    }
    val noNulls = st(Seq((Some(1), Some("a")), (Some(2), Some("b")))
      .toDF("id", "s"))
    assert(noNulls("id").nulls === Some(0L))
    assert(!DataSkipping.mayMatch(noNulls, sc, e(col("id").isNull)),
      "zero recorded nulls must prune IS NULL")
    assert(DataSkipping.mayMatch(noNulls, sc, e(col("id").isNotNull)))
    val mixed = st(Seq((Some(1), Some("a")), (None, Some("b")))
      .toDF("id", "s"))
    assert(DataSkipping.mayMatch(mixed, sc, e(col("id").isNull)))
    assert(DataSkipping.mayMatch(mixed, sc, e(col("id").isNotNull)))
    // legacy stats (no null count) never prune null predicates
    val legacy = noNulls.view.mapValues(_.copy(nulls = None)).toMap
    assert(DataSkipping.mayMatch(legacy, sc, e(col("id").isNull)))
  }
}

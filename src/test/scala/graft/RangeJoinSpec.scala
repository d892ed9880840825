package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(p: DataFrame, iv: DataFrame, keys: Seq[String]): DataFrame = {
    val cond = keys.map(k => p(k) === iv(k))
      .reduceOption(_ && _).map(_ && p("p") >= iv("s") && p("p") < iv("e"))
      .getOrElse(p("p") >= iv("s") && p("p") < iv("e"))
    p.join(iv.drop(keys: _*), cond)
  }

  test("half-open semantics: start inclusive, end exclusive, one row per pair") {
    val p = Seq((1L, 0L), (2L, 5L), (3L, 9L), (4L, 10L), (5L, -3L))
      .toDF("p_id", "p")
    val iv = Seq((100L, 0L, 10L), (101L, -5L, 0L), (102L, 7L, 7L)) // last: empty
      .toDF("iv_id", "s", "e")
    val got = RangeJoin.pointInInterval(p, "p", iv, "s", "e", bucketWidth = 4L)
    val pairs = got.select("p_id", "iv_id").as[(Long, Long)].collect().sorted
    assert(pairs === Array((1L, 100L), (2L, 100L), (3L, 100L), (5L, 101L)))
  }

  test("interval spanning many buckets joins each contained point exactly once") {
    val p = (0L until 100L).map(i => (i, i * 7L)).toDF("p_id", "p")
    val iv = Seq((1L, 50L, 600L)).toDF("iv_id", "s", "e") // spans 55+ buckets at w=10
    val got = RangeJoin.pointInInterval(p, "p", iv, "s", "e", bucketWidth = 10L)
    assertSameRows(got, naive(p, iv, Nil))
    assert(got.count() === got.select("p_id", "iv_id").distinct().count())
  }

  test("timestamp columns bucket at microsecond resolution near bucket edges") {
    // a pair that overlaps in micros but whose second-truncated bucket
    // ids would never meet: point at 00:00:00.900 in [00:00:00.800,
    // 00:00:01.100) with 1-second buckets. Seconds truncation puts the
    // interval's last bucket at floor((1.1s->1s us... truncated)) and
    // can drop the match entirely; micros must find it.
    val p = Seq((1L, "2024-01-01 00:00:00.900")).toDF("p_id", "p0")
      .select(col("p_id"), col("p0").cast("timestamp").as("p"))
    val iv = Seq((100L, "2024-01-01 00:00:00.800", "2024-01-01 00:00:01.100"))
      .toDF("iv_id", "s0", "e0")
      .select(col("iv_id"), col("s0").cast("timestamp").as("s"),
        col("e0").cast("timestamp").as("e"))
    val got = RangeJoin.pointInInterval(p, "p", iv, "s", "e",
      bucketWidth = 1000000L) // 1 s in micros
    assert(got.select("p_id", "iv_id").as[(Long, Long)].collect().toSeq
      === Seq((1L, 100L)))
    // boundary semantics survive the conversion: end is exclusive
    val atEnd = Seq((2L, "2024-01-01 00:00:01.100")).toDF("p_id", "p0")
      .select(col("p_id"), col("p0").cast("timestamp").as("p"))
    assert(RangeJoin.pointInInterval(atEnd, "p", iv, "s", "e", 1000000L)
      .count() === 0)
  }

  test("property: bucketed result equals the naive inequality join (incl. negatives)") {
    val genVals = for {
      pts <- Gen.listOfN(30, Gen.choose(-50L, 50L))
      ivs <- Gen.listOfN(10, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 30L)))
      w <- Gen.oneOf(1L, 3L, 7L, 16L)
    } yield (pts, ivs, w)
    val prop = Prop.forAll(genVals) { case (pts, ivs, w) =>
      val p = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("p_id", "p")
      val iv = ivs.zipWithIndex.map { case ((s, span), i) => (i.toLong, s, s + span) }
        .toDF("iv_id", "s", "e")
      val got = RangeJoin.pointInInterval(p, "p", iv, "s", "e", bucketWidth = w)
      val want = naive(p, iv, Nil)
      def canon(df: DataFrame): Seq[String] =
        df.select(df.columns.sorted.map(col).toIndexedSeq: _*).collect().toSeq
          .map(_.toSeq.mkString("|")).sorted
      canon(got) == canon(want)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(r.passed, s"bucketed != naive: ${r.status}")
  }

  test("with equality keys the plan is a pure equi-join — no nested loop, no range condition in the join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val p = ev.select(col("user_id"), graft.Queries.eventMicros(ev).as("p"))
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("iv_id"), col("user_id"),
        (graft.Queries.eventMicros(ev) - 3600000000L).as("s"),
        graft.Queries.eventMicros(ev).as("e"))
    val got = RangeJoin.pointInInterval(p, "p", iv, "s", "e",
      bucketWidth = 3600000000L, keys = Seq("user_id"))
    val physical = got.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"), s"nested loop in:\n$physical")
    assert(!physical.contains("CartesianProduct"), s"cartesian in:\n$physical")
    // reference join: rename the key on one side — both frames descend from
    // the same parquet scan, and a bare p("user_id") === iv("user_id")
    // would resolve both sides to the SAME attribute (trivially true).
    val iv2 = iv.withColumnRenamed("user_id", "u2")
    val want = p.join(iv2,
      col("user_id") === col("u2") && col("p") >= col("s") && col("p") < col("e"))
    assertSameRows(
      got.groupBy("iv_id").agg(count(lit(1)).as("n")),
      want.groupBy("iv_id").agg(count(lit(1)).as("n")))
  }
}

package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left: DataFrame = Seq(
    (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 300L),
    (4L, "b", 50L), (5L, "b", 500L),
    (6L, "c", 10L) // key with no right rows at all
  ).toDF("l_id", "k", "lt")

  private def right: DataFrame = Seq(
    (10L, "a", 100L), (11L, "a", 200L), (12L, "a", 200L), (13L, "a", 290L),
    (20L, "b", 400L)
  ).toDF("r_id", "k", "rt")

  /** Quadratic reference implementation: inequality join + rank-1 under
    * the operator's documented tie policy. */
  private def naive(l: DataFrame, r: DataFrame, direction: String,
                    tolerance: Option[Long]): DataFrame = {
    val cond0 =
      if (direction == "backward") col("rt") <= col("lt") else col("rt") >= col("lt")
    val cond = tolerance.fold(cond0)(t => cond0 && abs(col("lt") - col("rt")) <= t)
    val w = Window.partitionBy("l_id").orderBy(
      (if (direction == "backward") col("rt").desc else col("rt").asc),
      col("r_id").desc)
    l.join(r.withColumnRenamed("k", "rk"),
        col("k") === col("rk") && cond, "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("k", "l_id", "lt", "r_id", "rt")
  }

  test("backward as-of matches the quadratic reference (incl. unmatched keys)") {
    val got = AsOfJoin.join(left, right, "lt", "rt", Seq("k"),
      rightTieBreak = Some("r_id"))
    assertSameRows(got, naive(left, right, "backward", None))
    // spot semantics: inclusive at equal ts; equal-ts tie -> max r_id
    val m = got.collect().map(r => r.getAs[Long]("l_id") ->
      Option(r.getAs[java.lang.Long]("r_id")).map(_.toLong)).toMap
    assert(m(1L) === Some(10L)) // rt == lt inclusive
    assert(m(2L) === Some(12L)) // tie at rt=200 -> greatest r_id
    assert(m(4L) === None)      // nothing at-or-before 50
    assert(m(6L) === None)      // key absent on right
  }

  test("forward as-of matches the quadratic reference") {
    val got = AsOfJoin.join(left, right, "lt", "rt", Seq("k"),
      direction = "forward", rightTieBreak = Some("r_id"))
    assertSameRows(got, naive(left, right, "forward", None))
    val m = got.collect().map(r => r.getAs[Long]("l_id") ->
      Option(r.getAs[java.lang.Long]("r_id")).map(_.toLong)).toMap
    assert(m(4L) === Some(20L)) // earliest rt >= 50
    assert(m(5L) === None)      // nothing at-or-after 500
  }

  test("tolerance nulls out stale matches but keeps the left row") {
    val got = AsOfJoin.join(left, right, "lt", "rt", Seq("k"),
      tolerance = Some(20L), rightTieBreak = Some("r_id"))
    assertSameRows(got, naive(left, right, "backward", Some(20L)))
    assert(got.count() === left.count()) // left-outer: every left row survives
    val m = got.collect().map(r => r.getAs[Long]("l_id") ->
      Option(r.getAs[java.lang.Long]("r_id")).map(_.toLong)).toMap
    assert(m(2L) === Some(12L)) // 205-200=5 within tolerance
    assert(m(3L) === Some(13L)) // 300-290=10 within
    assert(m(5L) === None)      // 500-400=100 beyond
  }

  test("plan contains no join node — single shuffle union+window shape") {
    val got = AsOfJoin.join(left, right, "lt", "rt", Seq("k"),
      rightTieBreak = Some("r_id"))
    val plan = got.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"expected no join in:\n$plan")
    val physical = got.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).size
    assert(exchanges === 1, s"expected exactly one shuffle in:\n$physical")
  }

  test("temporalLookup returns the version valid AT the fact time, never a future one") {
    // key "a": v1 [100, 200), v2 [200, inf); key "b": first version at 300
    val dim = Seq(
      ("a", "v1", 100L, 200L), ("a", "v2", 200L, Long.MaxValue),
      ("b", "v1", 300L, Long.MaxValue)
    ).toDF("k", "ver", "valid_from", "valid_to")
    val facts = Seq(
      (1L, "a", 150L),  // inside v1
      (2L, "a", 200L),  // boundary: v1 closed, v2 open -> v2
      (3L, "a", 99L),   // before first version -> NULL
      (4L, "b", 250L),  // key exists but not yet -> NULL
      (5L, "c", 500L)   // key never exists -> NULL
    ).toDF("f_id", "k", "ft")
    val got = AsOfJoin.temporalLookup(facts, dim, "ft", "valid_from", "valid_to",
      by = Seq("k"))
    val m = got.collect().map(r => r.getAs[Long]("f_id") ->
      Option(r.getAs[String]("ver"))).toMap
    assert(m === Map(1L -> Some("v1"), 2L -> Some("v2"),
      3L -> None, 4L -> None, 5L -> None))
    assert(got.count() === facts.count())
  }

  test("timestamp columns resolve at microsecond resolution, not seconds") {
    // fact at 12:00:00.400 vs versions starting 12:00:00.000 / 12:00:00.700:
    // second-resolution truncation would tie all three at 12:00:00 and hand
    // the fact the FUTURE .700 version; micros must pick the .000 one.
    val dim = Seq(
      ("a", "v0", "2024-01-01 12:00:00.000", "2024-01-01 12:00:00.700"),
      ("a", "v1", "2024-01-01 12:00:00.700", "2100-01-01 00:00:00.000")
    ).toDF("k", "ver", "vf", "vt")
      .select(col("k"), col("ver"),
        col("vf").cast("timestamp").as("valid_from"),
        col("vt").cast("timestamp").as("valid_to"))
    val facts = Seq(
      (1L, "a", "2024-01-01 12:00:00.400"),  // inside v0 only at sub-second res
      (2L, "a", "2024-01-01 12:00:00.700"),  // boundary -> v1
      (3L, "a", "2024-01-01 11:59:59.900")   // before v0 -> NULL
    ).toDF("f_id", "k", "ft0")
      .select(col("f_id"), col("k"), col("ft0").cast("timestamp").as("ft"))
    val got = AsOfJoin.temporalLookup(facts, dim, "ft", "valid_from", "valid_to",
      by = Seq("k"))
    val m = got.collect().map(r => r.getAs[Long]("f_id") ->
      Option(r.getAs[String]("ver"))).toMap
    assert(m === Map(1L -> Some("v0"), 2L -> Some("v1"), 3L -> None))
  }

  test("timestamp as-of join honors sub-second ordering and micros tolerance") {
    val l = Seq((1L, "a", "2024-01-01 00:00:01.500")).toDF("l_id", "k", "lt0")
      .select(col("l_id"), col("k"), col("lt0").cast("timestamp").as("lt"))
    val r = Seq(
      (10L, "a", "2024-01-01 00:00:01.400"),
      (11L, "a", "2024-01-01 00:00:01.600")
    ).toDF("r_id", "k", "rt0")
      .select(col("r_id"), col("k"), col("rt0").cast("timestamp").as("rt"))
    val back = AsOfJoin.join(l, r, "lt", "rt", Seq("k"),
      rightTieBreak = Some("r_id")).collect().head
    assert(back.getAs[Long]("r_id") === 10L) // .400 is at-or-before, .600 is not
    // tolerance is epoch-micros for timestamp inputs: 50 ms < the 100 ms gap
    val tight = AsOfJoin.join(l, r, "lt", "rt", Seq("k"),
      tolerance = Some(50000L), rightTieBreak = Some("r_id")).collect().head
    assert(tight.getAs[Any]("r_id") === null)
    val loose = AsOfJoin.join(l, r, "lt", "rt", Seq("k"),
      tolerance = Some(150000L), rightTieBreak = Some("r_id")).collect().head
    assert(loose.getAs[Long]("r_id") === 10L)
  }

  test("NULL-time left rows survive unmatched; NULL-time right rows never match") {
    val l = Seq(
      (1L, "a", Some(100L)),
      (2L, "a", None) // NULL left time -> kept with NULL right payload
    ).toDF("l_id", "k", "lt")
    val r = Seq(
      (10L, "a", Some(50L)),
      (11L, "a", None) // NULL right time -> never matchable
    ).toDF("r_id", "k", "rt")
    val got = AsOfJoin.join(l, r, "lt", "rt", Seq("k"),
      rightTieBreak = Some("r_id"))
    val m = got.collect().map(row => row.getAs[Long]("l_id") ->
      Option(row.getAs[java.lang.Long]("r_id")).map(_.toLong)).toMap
    assert(m === Map(1L -> Some(10L), 2L -> None),
      "every left row survives; NULL left time and NULL right time both unmatched")
    // forward mode orders T descending — nulls must still sort FIRST so
    // neither the NULL-time right row nor any real right row is handed
    // to the NULL-time left row
    val fwd = AsOfJoin.join(l, r, "lt", "rt", Seq("k"),
      direction = "forward", rightTieBreak = Some("r_id"))
    val fm = fwd.collect().map(row => row.getAs[Long]("l_id") ->
      Option(row.getAs[java.lang.Long]("r_id")).map(_.toLong)).toMap
    assert(fm === Map(1L -> None, 2L -> None),
      "nothing at-or-after 100, and the NULL-time left row stays unmatched")
  }

  test("property: union-window result equals the quadratic reference on tie-heavy data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny time/key domains force equal-timestamp ties and empty keys
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 12L))
    val gen = for {
      ls <- Gen.listOfN(12, rowGen)
      rs <- Gen.listOfN(12, rowGen)
      dir <- Gen.oneOf("backward", "forward")
      tol <- Gen.option(Gen.choose(0L, 5L))
    } yield (ls, rs, dir, tol)
    val prop = Prop.forAll(gen) { case (ls, rs, dir, tol) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("l_id", "k", "lt")
      val r = rs.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) }
        .toDF("r_id", "k", "rt")
      val got = AsOfJoin.join(l, r, "lt", "rt", Seq("k"),
        direction = dir, tolerance = tol, rightTieBreak = Some("r_id"))
      val want = naive(l, r, dir, tol)
      def canon(df: DataFrame): Seq[String] =
        df.select(df.columns.sorted.map(col).toIndexedSeq: _*).collect().toSeq
          .map(_.toSeq.map(v => if (v == null) "" else v.toString).mkString("|"))
          .sorted
      canon(got) == canon(want)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, s"as-of mismatch vs reference: ${res.status}")
  }

  test("matches the reference result on real data (purchases vs views, sf0.001)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("l_id"), col("user_id").as("k"),
        graft.Queries.eventMicros(ev).as("lt"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("r_id"), col("user_id").as("k"),
        graft.Queries.eventMicros(ev).as("rt"))
    val got = AsOfJoin.join(p, v, "lt", "rt", Seq("k"),
      tolerance = Some(3600000000L), rightTieBreak = Some("r_id"))
    assertSameRows(got, naive(p, v, "backward", Some(3600000000L)))
  }
}

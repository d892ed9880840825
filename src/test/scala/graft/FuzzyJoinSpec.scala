package graft

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion variants: counts and membership") {
    val v1 = FuzzyJoin.deletionVariants("abc", 1)
    assert(v1.toSet === Set("abc", "bc", "ac", "ab"))
    val v2 = FuzzyJoin.deletionVariants("abc", 2).toSet
    assert(v2 === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(FuzzyJoin.deletionVariants("", 1) === Seq(""))
  }

  test("self-join at k=1 equals the brute-force levenshtein join (exact recall + precision)") {
    val names = Seq("small gear", "small gears", "smal gear", "big bolt",
      "big colt", "pig bolt", "tiny gizmo", "tiny gizmo", "mini gizmo",
      "anchor", "anchors", "rancor")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    val got = FuzzyJoin.fuzzySelfJoin(df, "id", "name", maxDist = 1)
      .select("left_key", "right_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      i <- names.indices; j <- names.indices
      if i < j && lev(names(i), names(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got === want, s"got $got want $want")
    assert(want.nonEmpty, "test data must contain close pairs")
  }

  test("two-table join at k=2 equals brute force; NULLs never match") {
    val a = Seq((1L, "warehouse"), (2L, "pipeline"), (3L, null))
      .toDF("id", "name")
    val b = Seq((10L, "warehoose"), (11L, "warehouses"), (12L, "pipe"),
      (13L, "pipelines"), (14L, null)).toDF("id", "name")
    val got = FuzzyJoin.fuzzyJoin(a, b, "id", "name", "id", "name", maxDist = 2)
      .select("left_key", "right_key", "edit_distance").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got === Map((1L, 10L) -> 1, (1L, 11L) -> 1, (2L, 13L) -> 1))
  }

  test("fuzzyDedup keeps first occurrences under the pairwise rule, including chains") {
    // chain: "abcd" ~ "abce" ~ "abee" but lev(abcd, abee) = 2 > 1.
    // 1 survives; 2 drops (close to 1); 3 drops because row 2 is within
    // distance even though 2 itself dropped — the documented pairwise rule
    val df = Seq((1L, "abcd"), (2L, "abce"), (3L, "abee"),
      (4L, "zzzz"), (5L, "zzzz")).toDF("id", "name")
    val kept = FuzzyJoin.fuzzyDedup(df, "id", "name", 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L))
  }

  test("candidate generation is an equi-join on the variant — no cartesian") {
    val df = (0 until 200).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val plan = FuzzyJoin.fuzzySelfJoin(df, "id", "name", 1)
      .queryExecution.optimizedPlan
    val cartesian = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.isEmpty => j
    }
    assert(cartesian.isEmpty, "fuzzy join must never plan a cartesian product")
  }
}

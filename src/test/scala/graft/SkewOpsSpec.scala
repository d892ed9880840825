package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

/** Salting parity: skew mitigation must never change results. */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // hot key 1 carries 500 rows; keys 2..20 one row each
  private def skewedLeft = ((1 to 500).map(i => (1, s"l$i")) ++
    (2 to 20).map(k => (k, s"l$k"))).toDF("k", "lv")
  private def right = (1 to 20).flatMap(k => Seq((k, s"r${k}a"), (k, s"r${k}b")))
    .toDF("k", "rv")

  test("saltedJoin equals the plain join (inner and left)") {
    val plainInner = skewedLeft.join(right, Seq("k"))
      .select("k", "lv", "rv").as[(Int, String, String)].collect().toSet
    val saltedInner = SkewOps.saltedJoin(skewedLeft, right, Seq("k"), 8)
      .select("k", "lv", "rv").as[(Int, String, String)].collect().toSet
    assert(saltedInner === plainInner)

    val withMiss = skewedLeft.union(Seq((99, "nomatch")).toDF("k", "lv"))
    val plainLeft = withMiss.join(right, Seq("k"), "left")
      .select($"k", $"lv", coalesce($"rv", lit("-")))
      .as[(Int, String, String)].collect().toSet
    val saltedLeft = SkewOps.saltedJoin(withMiss, right, Seq("k"), 8, "left")
      .select($"k", $"lv", coalesce($"rv", lit("-")))
      .as[(Int, String, String)].collect().toSet
    assert(saltedLeft === plainLeft)
  }

  test("saltedJoin spreads the hot key over multiple salts") {
    val l = skewedLeft.withColumn("s",
      pmod(xxhash64($"k", $"lv"), lit(8)).cast("int"))
    val saltsUsed = l.filter($"k" === 1).select("s").distinct().count()
    assert(saltsUsed >= 4, s"hot key landed on only $saltsUsed of 8 salts")
  }

  test("saltedDistinctCount is exact on skewed value sets") {
    // hot key: 300 distinct values + duplicates; cold keys small
    val df = ((1 to 300).map(v => (1, v)) ++ (1 to 300).map(v => (1, v)) ++
      (2 to 5).flatMap(k => (1 to 3).map(v => (k, v)))).toDF("k", "v")
    val got = SkewOps.saltedDistinctCount(df, Seq("k"), "v", saltFactor = 8)
      .as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 300L, 2 -> 3L, 3 -> 3L, 4 -> 3L, 5 -> 3L))
  }
}

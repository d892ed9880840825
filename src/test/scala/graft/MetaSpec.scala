package graft

import graft.meta.Meta
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Hash recipe semantics (reference: write.py:103-134). */
class MetaSpec extends SparkSpec {
  import spark.implicits._

  test("hashOf = md5(concat_ws('|', coalesce(cast(c as string), '')))") {
    val df = Seq(
      (Some(1), Some("a")),
      (Some(2), None),
      (None: Option[Int], Some("x|y"))).toDF("k", "v")
    val got = df.select(Meta.hashOf(Seq("k", "v")).as("h")).as[String].collect().toSeq
    val want = df.select(
      md5(concat_ws("|",
        coalesce($"k".cast("string"), lit("")),
        coalesce($"v".cast("string"), lit("")))).as("h")).as[String].collect().toSeq
    assert(got === want)
  }

  test("null and empty string hash identically (reference coalesce-to-'' semantics)") {
    val df = Seq((Option.empty[String], Some(""))).toDF("a", "b")
    val Array(r) = df.select(
      Meta.hashOf(Seq("a")).as("ha"), Meta.hashOf(Seq("b")).as("hb")).collect()
    assert(r.getString(0) === r.getString(1))
  }

  test("rename map falls back to canonical names") {
    val n = Meta.Names(Map(Meta.KeyHash -> "kh"))
    assert(n.keyHash === "kh")
    assert(n.dataHash === Meta.DataHash)
  }

  test("hash equality tracks normalized value equality (ScalaCheck)") {
    // local semantics-equivalent of the column expression, cross-checked
    // against one Spark evaluation below
    def localHash(vs: List[Option[String]]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bytes = md.digest(vs.map(_.getOrElse("")).mkString("|").getBytes("UTF-8"))
      bytes.map("%02x".format(_)).mkString
    }
    val gen = Gen.listOfN(3, Gen.option(Gen.alphaNumStr.map(_.take(8))))
    val prop = Prop.forAll(gen, gen) { (a, b) =>
      val same = a.map(_.getOrElse("")) == b.map(_.getOrElse(""))
      (localHash(a) == localHash(b)) == same
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop).passed)

    // anchor: Spark's hashOf agrees with localHash
    val df = Seq((Some("a"), None: Option[String], Some("c"))).toDF("x", "y", "z")
    val Array(h) = df.select(Meta.hashOf(Seq("x", "y", "z"))).as[String].collect()
    assert(h === localHash(List(Some("a"), None, Some("c"))))
  }
}

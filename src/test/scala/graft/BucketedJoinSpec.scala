package graft

import graft.operators.Bucketed
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {

  private def withBroadcastOff[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("matched bucket layouts join with zero exchanges and exact results") {
    withBroadcastOff {
      val base = tmpDir("bkt")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
      spark.sql("DROP TABLE IF EXISTS bkt_li")
      spark.sql("DROP TABLE IF EXISTS bkt_ord")
      Bucketed.writeBucketed(li, "bkt_li", "l_orderkey", 8, s"$base/li")
      Bucketed.writeBucketed(ord, "bkt_ord", "o_orderkey", 8, s"$base/ord")

      val j = Bucketed.coLocatedJoin(spark, "bkt_li", "bkt_ord",
        "l_orderkey", "o_orderkey")
      assert(Bucketed.isCoLocated(j),
        s"expected no Exchange in:\n${j.queryExecution.executedPlan}")
      // and the result is exactly the plain join's
      val want = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      assert(j.count() === want.count())
      assertSameRows(
        j.groupBy("o_orderpriority").agg(count(lit(1)).as("n")),
        want.groupBy("o_orderpriority").agg(count(lit(1)).as("n")))
    }
  }

  test("mismatched bucket counts fall back to a shuffled join (negative control)") {
    withBroadcastOff {
      val base = tmpDir("bktneg")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
      spark.sql("DROP TABLE IF EXISTS bktn_li")
      spark.sql("DROP TABLE IF EXISTS bktn_ord")
      Bucketed.writeBucketed(li, "bktn_li", "l_orderkey", 8, s"$base/li")
      Bucketed.writeBucketed(ord, "bktn_ord", "o_orderkey", 5, s"$base/ord")
      val j = Bucketed.coLocatedJoin(spark, "bktn_li", "bktn_ord",
        "l_orderkey", "o_orderkey")
      // correctness unaffected; co-location just didn't engage
      assert(!Bucketed.isCoLocated(j))
      assert(j.count() ===
        li.join(ord, li("l_orderkey") === ord("o_orderkey")).count())
    }
  }
}

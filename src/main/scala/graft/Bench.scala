package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failed queries report `"ok":false` and are
  * excluded from the total (so a broken query can't contribute bogus
  * wall-time). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM JIT, codegen compiler, parquet footer reads)
    // so the alphabetically-first query doesn't absorb ~4-5 s of one-time
    // startup cost and skew its per-query number.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => }
    val results: Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    val qs = results
      .map { case (k, v, ok) => s""""$k":{"sec":$v,"ok":$ok}""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    val nOk = results.count(_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_ok":$nOk,"n_fail":${results.size - nOk},"sf":"$sfDir"}""")
    spark.stop()
  }
}

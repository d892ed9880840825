package graft

import java.nio.file.{Files, Paths}


/** Dev tool: dump `.explain("formatted")` for named SparkEntry queries to
  * files (`<outDir>/<name><suffix>.txt`) — the before/after plan evidence
  * the optimization rounds commit under `plans/`. Builds the query's final
  * DataFrame (running any lifecycle its body performs) and prints the
  * formatted physical plan WITHOUT executing the final action, so the
  * captured plan is the declared result's, as the driver would see it.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
      sys.exit(2)
    }
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Harness.sessionBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), plan)
        println(s"[plandump] wrote $name$suffix")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

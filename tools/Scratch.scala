package graft

import org.apache.spark.sql.SparkSession

/** Throwaway micro-benchmark harness for optimization experiments (not
  * part of the driver surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .collect { case Array(k, v) => builder.config(k.trim, v.trim) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_scratch").toString

    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val df = spark.range(100).select($"id", ($"id" * 2).as("v"))
      .localCheckpoint()
    // warm
    df.write.mode("overwrite").parquet(s"$base/warm")

    // sample ALL thread stacks during the writes; aggregate top frames
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (st.nonEmpty && !t.getName.contains("sampler")) {
              val busy = !Set("park", "wait0", "wait", "epollWait", "accept",
                "poll", "read0", "socketAccept").contains(st.head.getMethodName)
              if (busy) {
                val key = st.take(6).map { e =>
                  val cls = e.getClassName.split('.').takeRight(2).mkString(".")
                  s"$cls.${e.getMethodName}"
                }.mkString(" <- ")
                samples.merge(s"[${t.getName.take(4)}] $key", 1, (a, b) => a + b)
              }
            }
          }
        }
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true); sampler.start()

    time("20 tiny writes (100 rows, 1 task)") {
      (1 to 20).foreach(i => df.write.mode("overwrite").parquet(s"$base/w$i"))
    }
    import scala.jdk.CollectionConverters._
    val obs = (1 to 20).map(i => org.apache.spark.sql.Observation(s"o$i"))
    time("20 tiny writes with observe") {
      (1 to 20).foreach { i =>
        import org.apache.spark.sql.functions._
        df.observe(obs(i - 1), count(lit(1)).as("rows"), min("id"), max("id"),
          min("v"), max("v"))
          .write.mode("overwrite").parquet(s"$base/wo$i")
        obs(i - 1).get
      }
    }
    time("20 tiny counts") {
      (1 to 20).foreach(_ => df.count())
    }

    time("20 tiny localCheckpoints") {
      (1 to 20).foreach(_ => df.select($"id" + 1).localCheckpoint())
    }
    val shuffled = spark.range(100000).select(($"id" % 97).as("k"), $"id")
    time("20 tiny groupBy counts (AQE shuffle)") {
      (1 to 20).foreach(_ => shuffled.groupBy("k").count().count())
    }
    spark.stop()
  }
}

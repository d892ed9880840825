package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction for the driver-facing mains (Bench, Verify,
  * Profile, PlanDump): one place for the harness Spark config so measured
  * behavior (Bench) and verified/dumped behavior (Verify/PlanDump) cannot
  * drift apart.
  *
  * Config notes:
  *  - `spark.sql.shuffle.partitions` = core count: a LOCAL default only —
  *    AQE coalescing is on, and production deployments size this from
  *    input bytes (guide §2.2); the driver contract needs the same value
  *    at every SPARK_GRAFT_CPUS so the c8-vs-c32 scaling comparison is
  *    apples-to-apples per core.
  *  - `spark.shuffle.sort.bypassMergeThreshold=1`: sort-path shuffle
  *    writes at every partition count. The bypass writer opens one file
  *    per reduce partition per map task (P files + concat per task),
  *    which at small partition counts is pure FS-op overhead — measured
  *    2.4x on a tiny two-stage aggregation (guide §2.2: block count, not
  *    bytes, is the small-shuffle cost). Scale-neutral: past ~200
  *    partitions the bypass writer is never chosen anyway.
  */
object Harness {
  def sessionBuilder(cpus: String): SparkSession.Builder = {
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.table.GraftCatalog")
      .config("spark.ui.enabled", "false")
    // experiment knob: SPARK_GRAFT_CONF="k=v;k=v" overlays session conf
    // (the driver never sets it; recorded rounds run the fixed config)
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .collect { case Array(k, v) => builder.config(k.trim, v.trim) }
    builder
  }
}

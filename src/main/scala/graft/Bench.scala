package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failed queries report `"ok":false` and are
  * excluded from the total (so a broken query can't contribute bogus
  * wall-time).
  *
  * Each query is timed over TWO full passes and reports the per-query
  * MINIMUM (both raw timings stay in `"runs"`): single-shot timings on a
  * shared machine recorded phantom 3-5x regressions on untouched queries
  * in past rounds (transient CPU contention), and the minimum of two
  * spaced runs is the standard way to report capability rather than
  * interference. Pass 2 runs after every query's pass 1, so back-to-back
  * cache effects don't mask a genuinely slow query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.table.GraftCatalog")
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

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 name: String): (Double, Boolean, Double) = {
      Staging.reset()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      ((System.nanoTime() - t0) / 1e9, ok, Staging.elapsedSec)
    }

    // dev knob: SPARK_GRAFT_ONLY=q1,q2 times a subset in isolation
    // (the driver never sets it, so recorded rounds always run everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val pass1 = ordered.map { case (name, fn) => timeOnce(fn, name) }
    val pass2 = ordered.map { case (name, fn) => timeOnce(fn, name) }
    val results = ordered.zip(pass1.zip(pass2)).map {
      case ((name, _), ((s1, ok1, g1), (s2, ok2, g2))) =>
        val good = Seq((s1, ok1, g1), (s2, ok2, g2))
          .collect { case (s, true, g) => (s, g) }
        // report the min run's timing AND that same run's staging share,
        // so sec − staging_sec is the operator cost of one coherent run
        val (sec, staging) =
          if (good.nonEmpty) good.minBy(_._1)
          else if (s1 <= s2) (s1, g1) else (s2, g2)
        (name, sec, ok1 || ok2, s1, s2, staging)
    }
    val qs = results
      .map { case (k, sec, ok, s1, s2, staging) =>
        s""""$k":{"sec":$sec,"ok":$ok,"staging_sec":$staging,"runs":[$s1,$s2]}"""
      }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true, _, _, _) => v }.sum
    val totalStaging = results.collect { case (_, _, true, _, _, g) => g }.sum
    val nOk = results.count(_._3)

    // ---- scale probe: the 5 most expensive queries re-run at a SECOND
    // scale factor, so super-linear operator cost shows up as a slope
    // across scales instead of hiding inside a single-sf number. For each
    // query the staging-free cost is normalized by sf on both sides;
    // `sec_per_sf_ratio` ≈ 1 (or below: fixed overhead dominates the
    // smaller scale) means linear scaling, while a ratio approaching the
    // sf ratio itself means the operator is super-linear in input size.
    // Probes prefer the largest sf ABOVE the main run (sf1 when the
    // harness grows one), else the largest below (one decade down today).
    def sfOf(p: String): Option[Double] = {
      val n = new java.io.File(p).getName
      if (n.startsWith("sf")) scala.util.Try(n.drop(2).toDouble).toOption else None
    }
    val probeDir: Option[String] = sys.env.get("SPARK_GRAFT_PROBE_DIR").orElse {
      for {
        mainSf <- sfOf(sfDir)
        sibs = Option(new java.io.File(sfDir).getParentFile)
          .flatMap(p => Option(p.listFiles())).getOrElse(Array.empty).toSeq
          .filter(_.isDirectory)
          .flatMap(f => sfOf(f.getPath).map(f.getPath -> _))
        pick <- sibs.filter(_._2 > mainSf).sortBy(_._2).lastOption
          .orElse(sibs.filter(_._2 < mainSf).sortBy(_._2).lastOption)
      } yield pick._1
    }
    val probeJson = probeDir.filter(_ != sfDir) match {
      case Some(pd) =>
        val sfMain = sfOf(sfDir).getOrElse(1.0)
        val sfProbe = sfOf(pd).getOrElse(1.0)
        // top-5 by cost, plus the two distributed query-scale join plans
        // pinned by name so their per-sf ratios are tracked round-over-
        // round even when they are not among the most expensive queries
        val pinnedProbes = Set("ann_ivfpq", "phrase_search",
          "bm25_view_bulk_delete", "view_maintenance",
          // group-cardinality agg-view fold: its write path is
          // O(touched groups) only if the DV+APPEND tiering holds —
          // slope-track it so a regression to full-state replaces
          // shows as a super-linear per-sf ratio
          "incremental_join_view")
        val top = (results.filter(_._3).sortBy(-_._2).take(5) ++
          results.filter(r => pinnedProbes.contains(r._1) && r._3))
          .distinctBy(_._1)
        val probed = top.map { case (name, secMain, _, _, _, stagingMain) =>
          // best-of-2 like the main passes: secMain is a warm min, and a
          // single cold probe run would fold JIT/warm-up into the slope
          def onceP(): (Double, Boolean, Double) = {
            Staging.reset()
            val t0 = System.nanoTime()
            val ok =
              try { SparkEntry.queries(name)(spark, pd).count(); true }
              catch { case e: Throwable =>
                System.err.println(s"[bench] scale probe $name failed: ${e.getMessage}")
                false
              }
            ((System.nanoTime() - t0) / 1e9, ok, Staging.elapsedSec)
          }
          val (p1, p2) = (onceP(), onceP())
          val okP = p1._2 || p2._2
          val good = Seq(p1, p2).collect { case (s, true, g) => (s, g) }
          val (secProbe, stagingProbe) =
            if (good.nonEmpty) good.minBy(_._1)
            else if (p1._1 <= p2._1) (p1._1, p1._3) else (p2._1, p2._3)
          val netMain = math.max(secMain - stagingMain, 1e-3)
          val netProbe = math.max(secProbe - stagingProbe, 1e-3)
          // direction-independent: normalized cost at the LARGER scale
          // over the smaller — ≈1 or below is linear-or-better, a value
          // approaching sf_ratio is super-linear, whichever side probed
          val ((netLo, sfLo), (netHi, sfHi)) =
            if (sfMain <= sfProbe) ((netMain, sfMain), (netProbe, sfProbe))
            else ((netProbe, sfProbe), (netMain, sfMain))
          val ratio = (netHi / sfHi) / (netLo / sfLo)
          s""""$name":{"sec_main":$secMain,"sec_probe":$secProbe,""" +
            s""""net_main":$netMain,"net_probe":$netProbe,""" +
            s""""sec_per_sf_ratio":$ratio,"ok":$okP}"""
        }
        s""","scale_probe":{"probe_sf":"$pd","sf_ratio":${math.max(sfMain, sfProbe) / math.min(sfMain, sfProbe)},""" +
          s""""queries":${probed.mkString("{", ",", "}")}}"""
      case None => ""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","staging_sec":$totalStaging,"queries":$qs,"n_ok":$nOk,"n_fail":${results.size - nOk},"sf":"$sfDir"$probeJson}""")
    spark.stop()
  }
}

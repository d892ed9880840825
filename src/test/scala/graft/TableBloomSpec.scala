package graft

import graft.table.ManagedTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Parquet-native bloom filters as a table property
  * ([[ManagedTable.setProperties]], `bloom.columns`): every data-writing
  * path must emit filters for the named columns, and an equality probe
  * for an absent high-cardinality key must skip whole row groups that
  * dir-level min/max cannot (random keys span the domain in every dir).
  */
class TableBloomSpec extends SparkSpec {

  /** Per column chunk of `col` under `dir`: (bloom offset, encodings).
    * Offset -1 = no filter; parquet-mr DELIBERATELY omits the bloom
    * when a chunk is fully dictionary-encoded (the dictionary is
    * already an exact membership structure the reader uses for
    * row-group skipping), so "equality-skippable" below means bloom OR
    * dictionary encoding. */
  private def chunkInfo(dir: String, colName: String): Seq[(Long, Set[String])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val it = fs.listFiles(new Path(dir), true)
    val out = Seq.newBuilder[(Long, Set[String])]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try r.getFooter.getBlocks.forEach { b =>
          b.getColumns.forEach { c =>
            if (c.getPath.toDotString == colName) {
              val encs = Set.newBuilder[String]
              c.getEncodings.forEach(e => encs += e.name())
              out += ((c.getBloomFilterOffset, encs.result()))
            }
          }
        } finally r.close()
      }
    }
    out.result()
  }

  private def bloomOffsets(dir: String, colName: String): Seq[Long] =
    chunkInfo(dir, colName).map(_._1)

  /** Bloom filter present, or chunk fully dict-encoded (equally exact). */
  private def equalitySkippable(info: (Long, Set[String])): Boolean =
    info._1 >= 0 || info._2.exists(_.contains("DICTIONARY"))

  /** Deterministic high-cardinality keys: hex of a hash — lexically
    * spread so every row group's [min,max] spans nearly the whole
    * domain and min/max pruning is useless by construction. */
  private def keyed(n: Int) = {
    import spark.implicits._
    spark.range(n.toLong)
      .select(md5(col("id").cast("string")).as("k"), col("id").as("v"))
  }

  test("bloom.columns property makes appends write per-column bloom filters") {
    val path = tmpDir("bloomset")
    val t = ManagedTable(spark, path)
    t.write(keyed(1000), "APPEND", "append")
    t.setProperties(Map(
      ManagedTable.BloomColumnsProp -> "k",
      ManagedTable.BloomNdvProp + ".k" -> "100000"))
    t.write(keyed(1000), "APPEND", "append")
    val c = t.lastCommit.get
    assert(c.properties(ManagedTable.BloomColumnsProp) == "k")
    // dir written BEFORE the property: no filters; dir after: filters
    val before = bloomOffsets(c.dirs.head, "k")
    val after = bloomOffsets(c.dirs.last, "k")
    assert(before.nonEmpty && before.forall(_ < 0), s"pre-property dir grew filters: $before")
    assert(after.nonEmpty && after.forall(_ >= 0), s"post-property dir lacks filters: $after")
  }

  test("properties survive the delta-encoded log and carry across commit paths") {
    val path = tmpDir("bloomcarry")
    val t = ManagedTable(spark, path)
    t.write(keyed(500), "APPEND", "append")
    t.setProperties(Map(ManagedTable.BloomColumnsProp -> "k", "owner" -> "pipeline-a"))
    // a dozen appends cross the delta-log snapshot interval (10)
    (1 to 12).foreach(_ => t.write(keyed(50), "APPEND", "append"))
    t.delete(col("v") === lit(-1L)) // no-op DML commit
    assert(t.lastCommit.get.properties ==
      Map(ManagedTable.BloomColumnsProp -> "k", "owner" -> "pipeline-a"))
    // DML rewrite dirs stay equality-skippable too (bloom or dict)
    t.delete(col("v") === lit(3L))
    val rewritten = t.lastCommit.get.dirs.filterNot(t.commitAt(13).dirs.contains)
    rewritten.foreach { d =>
      val info = chunkInfo(d, "k")
      assert(info.nonEmpty && info.forall(equalitySkippable),
        s"DML rewrite of $d is not equality-skippable: $info")
    }
    t.unsetProperties(Seq("owner"))
    assert(t.lastCommit.get.properties == Map(ManagedTable.BloomColumnsProp -> "k"))
  }

  test("bloom filters follow column mapping renames (physical names)") {
    val path = tmpDir("bloommap")
    val t = ManagedTable(spark, path)
    t.write(keyed(500), "APPEND", "append")
    t.renameColumn("k", "key")
    t.setProperties(Map(ManagedTable.BloomColumnsProp -> "key"))
    t.write(keyed(500).withColumnRenamed("k", "key"), "APPEND", "append")
    val c = t.lastCommit.get
    // the parquet files carry the PHYSICAL name (the original "k")
    val info = chunkInfo(c.dirs.last, c.physicalOf("key"))
    assert(info.nonEmpty && info.forall(equalitySkippable),
      s"no bloom/dict under the physical column name: $info")
    // both appends carry the key (same 500-row frame written twice)
    assert(t.read.filter(col("key") === md5(lit("7"))).count() == 2)
  }

  test("cluster.columns property sorts writes so scans prune row groups") {
    import spark.implicits._
    val mk = (path: String, clustered: Boolean) => {
      val t = ManagedTable(spark, path)
      t.createIfNotExists(
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT,v STRING"))
      if (clustered)
        t.setProperties(Map(ManagedTable.ClusterColumnsProp -> "k"))
      // shuffled key order: without clustering every file spans the domain
      val data = spark.range(200000L)
        .select((col("id") * 48271L % 200003L).as("k"),
          md5(col("id").cast("string")).as("v"))
      t.write(data, "APPEND", "append")
      t
    }
    def scanned(t: ManagedTable): Long = {
      val df = t.read.filter(col("k") === 77777L)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    val plainOut = scanned(mk(tmpDir("clw_plain"), false))
    val clusteredT = mk(tmpDir("clw_clustered"), true)
    val clusteredOut = scanned(clusteredT)
    assert(clusteredOut < plainOut,
      s"clustered write should let row-group stats prune the scan: " +
        s"clustered=$clusteredOut plain=$plainOut")
    // correctness unchanged: same rows either way
    assert(clusteredT.read.count() == 200000L)
  }

  test("absent-key probe: scan outputs zero rows from bloomed row groups") {
    val path = tmpDir("bloomzero")
    val t = ManagedTable(spark, path)
    t.write(keyed(10), "APPEND", "append")
    t.setProperties(Map(
      ManagedTable.BloomColumnsProp -> "k",
      ManagedTable.BloomNdvProp -> "300000"))
    val big = keyed(300000)
    t.write(big, "APPEND", "append")
    // absent key lexically inside every row group's [min,max] (md5 keys
    // span the hex domain), so neither row-group nor page min/max can
    // exclude it, and 300k distinct 32-char values overflow parquet's
    // dictionary page — only the bloom filter can skip
    val probe = "8888888888888888deadbeef88888888"
    val df = t.read.filter(col("k") === probe)
    assert(df.count() == 0)
    val scans = df.queryExecution.executedPlan.collectLeaves()
    val scanned = scans.map(_.metrics("numOutputRows").value).sum
    assert(scanned == 0,
      s"bloom row-group skip failed: scan produced $scanned rows for an absent key")
    // present key still found (no false negatives)
    val present = big.filter(col("v") === 123456L).head().getString(0)
    assert(t.read.filter(col("k") === present).count() == 1)
  }
}

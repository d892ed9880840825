package graft

import graft.state.StateStore

/** Versioned KV semantics (reference: core/state/spark/state.py:37-180). */
class StateStoreSpec extends SparkSpec {

  private def store(p: String) =
    new StateStore(spark.sparkContext.hadoopConfiguration, p)

  test("set/get round-trips with version envelope") {
    val s = store(tmpDir("state"))
    assert(s.get("sources", "k") === None)
    assert(s.get("sources", "k", Some("d")) === Some("d"))
    s.set("sources", "k", """{"a":1}""")
    assert(s.get("sources", "k") === Some("""{"a":1}"""))
  }

  test("set versions: previous values preserved as _vN files") {
    val s = store(tmpDir("state_v"))
    s.set("sources", "k", "v0")
    s.set("sources", "k", "v1")
    s.set("sources", "k", "v2")
    assert(s.get("sources", "k") === Some("v2"))
    assert(s.versions("sources", "k").map(_._2) === Seq("v0", "v1", "v2"))
  }

  test("append splits source at first underscore (state.py:131-155)") {
    val root = tmpDir("state_a")
    val s = store(root)
    s.append("sources_myinput", "schema.json", """{"cols":[]}""")
    val p = new org.apache.hadoop.fs.Path(s"$root/sources/myinput/schema.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(p))
  }

  test("sources/sink/state dirs pre-created") {
    val root = tmpDir("state_d")
    store(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("sources", "sink", "state").foreach { d =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/$d")), d)
    }
  }
}

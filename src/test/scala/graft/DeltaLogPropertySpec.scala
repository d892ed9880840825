package graft

import graft.table.{DataSkipping, ManagedTable}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Round-trip property for the delta-encoded commit log: for ANY sequence
 * of commit compositions — random adds/removes/reorders/replaces of
 * dirs with random stats, fabricated through the REAL `writeCommit`
 * encoder — every resolved read (`commitAt`, `history`) must equal the
 * commit the writer handed in, field for field, and vacuum at a random
 * point must keep every retained version resolvable. The encoder's
 * byte-exact self-check is what the property pits against adversarial
 * compositions (duplicates, reordered carries, stat drops) that the
 * normal write paths never produce.
 */
class DeltaLogPropertySpec extends SparkSpec {

  private val dirPool: Vector[String] = (0 until 40).map(i => s"/d/dir-$i").toVector

  private def statsGen(dirs: Seq[String]): Gen[Map[String, Map[String, DataSkipping.ColMinMax]]] =
    Gen.sequence[Seq[(String, Map[String, DataSkipping.ColMinMax])], (String, Map[String, DataSkipping.ColMinMax])](
      dirs.map { d =>
        for {
          lo <- Gen.choose(0, 500)
          hi <- Gen.choose(500, 1000)
          hasStats <- Gen.frequency(4 -> true, 1 -> false)
        } yield d -> (if (hasStats)
          Map("id" -> DataSkipping.ColMinMax(Some(lo.toString), Some(hi.toString)))
        else Map.empty[String, DataSkipping.ColMinMax])
      }).map(_.filter(_._2.nonEmpty).toMap)

  /** One step: transform the previous composition into the next. */
  private def stepGen(prev: Seq[String]): Gen[Seq[String]] = {
    val avail = dirPool.filterNot(prev.contains)
    val append: Gen[Seq[String]] =
      if (avail.isEmpty) Gen.const(prev)
      else Gen.choose(1, math.min(3, avail.size))
        .flatMap(n => Gen.pick(n, avail).map(add => prev ++ add))
    val mergeIsh: Gen[Seq[String]] =
      if (avail.isEmpty) Gen.const(prev)
      else for {
        keepMask <- Gen.listOfN(prev.size, Gen.frequency(3 -> true, 1 -> false))
        add <- Gen.oneOf(avail)
      } yield prev.zip(keepMask).collect { case (d, true) => d } :+ add
    Gen.frequency(
      5 -> append,                         // append: new dirs at the end
      4 -> mergeIsh,                       // merge-ish: drop carried, add one
      1 -> Gen.choose(1, 3).flatMap(n =>   // replace: fresh small composition
        Gen.pick(n, dirPool).map(_.toSeq)),
      // adversarial reorder (defeats delta encoding; must fall back to full)
      1 -> Gen.const(prev.reverse),
      // no-op composition (metadata-only commit; stats still change)
      1 -> Gen.const(prev))
  }

  private def historyGen: Gen[List[(Seq[String], Map[String, Map[String, DataSkipping.ColMinMax]], String)]] =
    for {
      n <- Gen.choose(5, 28)
      first <- Gen.choose(1, 3).flatMap(k => Gen.pick(k, dirPool).map(_.toSeq))
      steps <- (1 until n).foldLeft(Gen.const(List(first))) { (acc, _) =>
        acc.flatMap(h => stepGen(h.head).map(_ :: h))
      }
      withStats <- Gen.sequence[List[(Seq[String], Map[String, Map[String, DataSkipping.ColMinMax]])], (Seq[String], Map[String, Map[String, DataSkipping.ColMinMax]])](
        steps.reverse.map(dirs => statsGen(dirs).map(dirs -> _)))
      ops <- Gen.listOfN(withStats.size,
        Gen.oneOf("APPEND", "MERGE(scd1)", "OVERWRITE", "OPTIMIZE"))
    } yield withStats.zip(ops).map { case ((d, s), o) => (d, s, o) }

  test("random commit sequences round-trip resolution and survive vacuum") {
    val prop = Prop.forAll(historyGen, Gen.choose(1, 10)) { (hist, keepLast) =>
      val path = tmpDir("dlp")
      val t = ManagedTable(spark, path)
      val commits = hist.zipWithIndex.map { case ((dirs, stats, op), v) =>
        val c = ManagedTable.Commit(v.toLong, op, 1000L + v, dirs,
          Map("numOutputRows" -> v.toString), None, "`id` INT", v - 1L,
          dirStats = stats, txn = Map("app" -> v.toLong))
        t.writeCommit(c)
        // writeCommit records per-dir byte sizes; these fabricated dirs
        // don't exist on disk, so every recorded size is 0 — the
        // round-trip target is the commit AS ENRICHED by the writer
        c.copy(dirBytes = dirs.map(_ -> 0L).toMap)
      }
      // every version resolves to exactly what the writer handed in
      val exact = commits.forall { c =>
        val r = t.commitAt(c.version)
        r == c
      }
      // batched history agrees with per-version resolution
      val h = t.history
      val histOk = h.size == commits.size &&
        h.reverse.zip(commits).forall { case (a, b) => a == b }
      // vacuum keeps a resolvable contiguous suffix incl. the chain base
      val stats = t.vacuum(keepLast)
      val earliest = t.earliestVersion.get
      val latest = t.latestVersion.get
      val retainedOk = (earliest to latest).forall { v =>
        t.commitAt(v) == commits(v.toInt)
      }
      val boundOk = (latest - earliest + 1) >= math.min(keepLast, commits.size) &&
        stats.prunedVersions == earliest
      exact && histOk && retainedOk && boundOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}

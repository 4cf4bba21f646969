package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LakeIO

/** Round-19 commit protocol (VERDICT r18 #1 + ADVICE r18): the
  * versioned lake's single-writer assumption is ENFORCED by a commit
  * reservation (exclusive-create before any data write), and a commit
  * with write-time CDF publishes snapshot + capture ATOMICALLY (seal
  * last) — no failure mode leaves a committed-but-uncaptured hole.
  */
class CommitProtocolSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def snap(xs: (Long, Double)*) = xs.toDF("k", "x")

  test("reservation: the second writer of the same version number " +
      "fails LOUD at reserve time, before any data write") {
    val root = Files.createTempDirectory("graft_reserve").toString
    LakeIO.reserveCommit(spark, root, 0)
    val e = intercept[IllegalStateException] {
      LakeIO.reserveCommit(spark, root, 0)
    }
    assert(e.getMessage.contains("already reserved")
      && e.getMessage.contains("CONCURRENT WRITER"), e.getMessage)
    // the burned number is skipped, never aliased: the next commit
    // sees the in-flight marker and numbers past it
    assert(LakeIO.saveVersion(snap((1L, 1.0)), root) === 1)
    assert(LakeIO.listVersions(spark, root) === Seq(1))
  }

  test("racing writers never alias a version: N concurrent saveVersion " +
      "calls yield distinct versions or loud failures; log ≡ snapshots") {
    val root = Files.createTempDirectory("graft_race").toString
    LakeIO.saveVersion(snap((1L, 0.0)), root) // v0 seeds the chain
    val n = 4
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[
      Either[String, Int]]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        try outcomes.add(Right(
          LakeIO.saveVersion(snap((i.toLong, i.toDouble)), root)))
        catch { case e: Throwable =>
          outcomes.add(Left(e.getMessage))
        }
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val (failures, successes) = outcomes.asScala.toSeq.partitionMap(identity)
    // every success is a DISTINCT version (no aliasing — the corruption
    // the reservation exists to prevent), and every failure is the loud
    // reservation refusal, not a parquet-dir collision
    assert(successes.distinct.size === successes.size,
      s"version aliasing: $successes")
    failures.foreach(m => assert(m.contains("already reserved"), m))
    // the commit log is exactly the published snapshots — no orphan
    // entries, no unlogged snapshot dirs (crash-free run ⇒ clean aborts)
    val published = LakeIO.listVersions(spark, root)
    assert(published.toSet === (successes :+ 0).toSet)
    assert(LakeIO.listCommits(spark, root) === published)
    assert(LakeIO.listInflight(spark, root).isEmpty)
    // every published version reads back whole
    published.foreach { v =>
      assert(LakeIO.loadVersion(spark, root, Some(v)).count() >= 1)
    }
  }

  test("crash recovery: a reserved-but-unsealed commit is invisible — " +
      "not latest, not a commit, number burned not reused") {
    val root = Files.createTempDirectory("graft_crash").toString
    val keys = Seq("k")
    LakeIO.saveVersionCdf(snap((1L, 10.0)), root, keys) // v0
    // simulate a writer that crashed between data write and seal:
    // reservation marker present, data dir present, no sealed entry
    LakeIO.reserveCommit(spark, root, 1)
    snap((1L, 99.0)).write.parquet(s"$root/v=1")
    // readers never resolve the unsealed snapshot as latest
    assert(LakeIO.listVersions(spark, root) === Seq(0))
    assert(LakeIO.loadVersion(spark, root).collect().head.getDouble(1)
      === 10.0)
    // the capture guard does not count it as a commit: the feed over
    // (−1, 1] is just v0's capture — no refusal on the unpublished dir
    val feed = LakeIO.capturedChanges(spark, root, -1, 1)
    assert(feed.collect().map(_.getAs[String]("_change_type")).toSet
      === Set("insert"))
    // the burned number is never reused: the next commit takes v=2
    assert(LakeIO.saveVersionCdf(snap((1L, 11.0)), root, keys) === 2)
    assert(LakeIO.capturedChanges(spark, root, 0, 2).count() === 2)
  }

  test("a failed commit ABORTS clean: data write failure reclaims the " +
      "number, leaves no partial dir, no inflight marker") {
    val root = Files.createTempDirectory("graft_abort").toString
    LakeIO.saveVersion(snap((1L, 1.0)), root) // v0
    val poison = spark.range(1)
      .withColumn("boom",
        when(col("id") >= 0, raise_error(lit("forced write failure")))
          .otherwise(lit(1)))
    intercept[Exception] { LakeIO.saveVersion(poison.toDF(), root) }
    assert(LakeIO.listVersions(spark, root) === Seq(0))
    assert(LakeIO.listInflight(spark, root).isEmpty)
    assert(!new java.io.File(s"$root/v=1").exists())
    // clean abort reclaimed the number — nothing ever referenced it
    assert(LakeIO.saveVersion(snap((2L, 2.0)), root) === 1)
  }

  test("saveVersionCdf validates schema BEFORE any write (ADVICE r18 " +
      "medium): a drifted commit refuses with head untouched, no hole") {
    val root = Files.createTempDirectory("graft_prevalidate").toString
    val keys = Seq("k")
    LakeIO.saveVersionCdf(snap((1L, 10.0), (2L, 20.0)), root, keys) // v0
    // added column: refused pre-commit
    val drifted = Seq((1L, 10.0, "a")).toDF("k", "x", "tag")
    val e1 = intercept[IllegalArgumentException] {
      LakeIO.saveVersionCdf(drifted, root, keys)
    }
    assert(e1.getMessage.contains("schemas differ"), e1.getMessage)
    // changed TYPE, same names (ADVICE r18 low): also refused, naming
    // the drifted signature — previously passed the name-set guard and
    // failed downstream with an opaque struct-compare error
    val typeDrift = Seq((1L, 10)).toDF("k", "x") // x: int, head: double
    val e2 = intercept[IllegalArgumentException] {
      LakeIO.saveVersionCdf(typeDrift, root, keys)
    }
    assert(e2.getMessage.contains("x:int")
      && e2.getMessage.contains("x:double"), e2.getMessage)
    // head untouched, numbering untouched, feed commit-complete: the
    // failures left NO committed-but-uncaptured version behind
    assert(LakeIO.listVersions(spark, root) === Seq(0))
    assert(LakeIO.listCommits(spark, root) === Seq(0))
    assert(LakeIO.saveVersionCdf(snap((1L, 11.0), (2L, 20.0)), root,
      keys) === 1)
    assert(LakeIO.capturedChanges(spark, root, 0, 1).count() === 2)
  }

  test("threeWayMergeOutcome refuses TYPE drift with the same message " +
      "as column drift (ADVICE r18 low)") {
    val base = snap((1L, 10.0))
    val typed = Seq((1L, 10)).toDF("k", "x")
    val e = intercept[IllegalArgumentException] {
      LakeIO.threeWayMergeOutcome(base, typed, base, Seq("k"))
    }
    assert(e.getMessage.contains("schema differs from")
      && e.getMessage.contains("x:int"), e.getMessage)
  }

  test("capturedChanges (head, head]: the caught-up consumer's poll is " +
      "an EMPTY feed in the capture schema, not an exception (ADVICE r18)") {
    val root = Files.createTempDirectory("graft_caughtup").toString
    val keys = Seq("k")
    LakeIO.saveVersionCdf(snap((1L, 10.0)), root, keys) // v0
    LakeIO.saveVersionCdf(snap((1L, 12.0)), root, keys) // v1
    val empty = LakeIO.capturedChanges(spark, root, 1, 1)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq
      === Seq("k", "x", "_change_type", "_commit_version"))
    // the steady-state loop shape: poll, see nothing, poll again after
    // a commit, see exactly the new churn
    LakeIO.saveVersionCdf(snap((1L, 13.0)), root, keys) // v2
    assert(LakeIO.capturedChanges(spark, root, 1, 2).count() === 2)
  }

  test("stream fence repair (ADVICE r18): a replayed commit whose " +
      "capture is missing is REPAIRED from retained snapshots, not " +
      "skipped into a permanent hole") {
    val root = Files.createTempDirectory("graft_fencerepair").toString
    val keys = Seq("k")
    val tbl = s"$root/t"
    LakeIO.saveVersionCdf(snap((1L, 10.0), (2L, 20.0)), tbl, keys) // v0
    LakeIO.saveVersionCdf(snap((1L, 10.0), (2L, 22.0)), tbl, keys) // v1
    LakeIO.saveVersionCdf(snap((3L, 30.0), (2L, 22.0)), tbl, keys) // v2
    // simulate a legacy hole: v=1's capture vanished (pre-r19 writer
    // crash — impossible through the sealed protocol, but repairable)
    val cdf1 = new java.io.File(s"$tbl/_cdf/v=1")
    assert(cdf1.exists())
    org.apache.commons.io.FileUtils.deleteDirectory(cdf1)
    intercept[IllegalArgumentException] {
      LakeIO.capturedChanges(spark, tbl, 0, 2)
    }
    // an at-least-once replay of commit 1's batch hits the fence
    // (1 <= head 2) and REPAIRS the hole by re-diffing v0 vs v1
    val batch = LakeIO.changes(spark, tbl, 0, 1, keys)
    graft.streaming.Streams.applyCommitsIdempotent(batch, tbl, keys)
    assert(new java.io.File(s"$tbl/_cdf/v=1").exists())
    val feed = LakeIO.capturedChanges(spark, tbl, 0, 2)
    // replay invariant restored across the repaired range
    val rebuilt = LakeIO.replayChanges(
      LakeIO.loadVersion(spark, tbl, Some(0)), feed, keys)
    val head = LakeIO.loadVersion(spark, tbl, Some(2))
    assert(rebuilt.exceptAll(head).count() === 0
      && head.exceptAll(rebuilt).count() === 0)
    // and the repaired replay stayed idempotent: re-running the same
    // batch changes nothing (no double-apply, no double-repair error)
    graft.streaming.Streams.applyCommitsIdempotent(batch, tbl, keys)
    assert(LakeIO.listVersions(spark, tbl) === Seq(0, 1, 2))
  }

  test("compaction rewrite commit is atomic with its empty capture: " +
      "the captured feed spans it without refusing") {
    val root = Files.createTempDirectory("graft_rewrite").toString
    val lake = Lake(spark, root)
    val keys = Seq("k")
    lake.saveVersionedCdf(snap((1L, 10.0), (2L, 20.0))
      .repartition(8), "t", keys)                        // v0, 8 files
    lake.saveVersionedCdf(snap((1L, 10.0), (2L, 22.0))
      .repartition(8), "t", keys)                        // v1
    val (before, after) = lake.compact("t", 128L * 1024 * 1024) // v2
    assert(before > after)
    val feed = lake.capturedChanges("t", 0, 2) // spans the rewrite
    assert(feed.filter(col("_commit_version") === 2).count() === 0)
    val rebuilt = LakeIO.replayChanges(
      lake.loadVersioned("t", Some(0)), feed, keys)
    val head = lake.loadVersioned("t")
    assert(rebuilt.exceptAll(head).count() === 0
      && head.exceptAll(rebuilt).count() === 0)
  }

  test("saveVersionCdfKnownDiff: the known-diff capture is row-identical " +
      "to the capture the generic snapshot re-diff would have written") {
    val root = Files.createTempDirectory("graft_knowndiff").toString + "/t"
    val keys = Seq("k")
    val v0 = snap((1L, 1.0), (2L, 2.0), (3L, 3.0))
    val v1 = snap((1L, 1.0), (2L, 2.5), (4L, 4.0)) // update 2, drop 3, insert 4
    LakeIO.saveVersionCdf(v0, root, keys)
    // the exact change set, as a producer folding known churn holds it
    val diff = LakeIO.snapshotDiff(v0, v1, keys, stampVersion = 99) // stale stamp on purpose
    LakeIO.saveVersionCdfKnownDiff(v1, root, keys, diff)
    val written = LakeIO.capturedChanges(spark, root, 0, 1)
    // stale stamp must have been overwritten with the committed version
    assert(written.select("_commit_version").distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(1))
    // and the rows must equal what the generic path would recompute
    val recomputed = LakeIO.changes(spark, root, 0, 1, keys)
    val a = written.select("k", "x", "_change_type")
    val b = recomputed.select("k", "x", "_change_type")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    // and the replay law holds over the known-diff capture
    val replayed = LakeIO.replayChanges(
      LakeIO.loadVersion(spark, root, Some(0)), written, keys)
    val head = LakeIO.loadVersion(spark, root, Some(1))
    assert(replayed.exceptAll(head).count() === 0
      && head.exceptAll(replayed).count() === 0)
  }
}

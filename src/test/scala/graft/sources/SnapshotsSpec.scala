package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Snapshot versioning: append-only commits, version isolation,
  * latest default, plugin faces, error surface. */
class SnapshotsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("versions are immutable under later appends; latest sees all") {
    val dir = Files.createTempDirectory("snaps").toString
    assert(Snapshots.versions(spark, dir).isEmpty)
    val v1 = Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    val v2 = Snapshots.write(Seq((3L, "c")).toDF("id", "s"), dir)
    assert((v1, v2) == ((1, 2)))
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
    // v1 still returns EXACTLY its rows after the append
    assert(Snapshots.read(spark, dir, 1).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    assert(Snapshots.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("concurrent commits: one winner per version, loser gets a " +
      "typed retryable ConcurrentCommitException") {
    val dir = Files.createTempDirectory("snaps_race").toString
    Snapshots.write(Seq((1L, "base")).toDF("id", "s"), dir)

    // Deterministic collision point 1: another writer holds the claim
    // for the next version (mid-commit, or a crashed torn commit).
    val claim = new java.io.File(dir, ".graft-claim-v00002")
    assert(claim.createNewFile())
    val e1 = intercept[ConcurrentCommitException] {
      Snapshots.write(Seq((2L, "loser")).toDF("id", "s"), dir)
    }
    assert(e1.attemptedVersion == 2 && e1.winningVersion == 1)
    assert(e1.getMessage.contains(".graft-claim-v00002") &&
      e1.getMessage.contains("Re-run")) // actionable, both recoveries named
    assert(claim.delete()) // the documented torn-commit cleanup

    // Deterministic collision point 2: a version DIRECTORY left by a
    // pre-claim torn commit. The loser must release its own claim on
    // the way out or v2 would stay wedged forever.
    val vDir = new java.io.File(dir, "v00002")
    assert(vDir.mkdir())
    val e2 = intercept[ConcurrentCommitException] {
      Snapshots.write(Seq((2L, "loser")).toDF("id", "s"), dir)
    }
    assert(e2.attemptedVersion == 2 && e2.winningVersion == 1)
    assert(!claim.exists(), "loser must release its claim on failure")
    assert(vDir.delete()) // clear the simulated torn commit
    // with both leftovers cleared, the documented recovery (re-run
    // the append) succeeds
    assert(Snapshots.write(Seq((2L, "recovered")).toDF("id", "s"), dir) == 2)

    // Real two-thread race, barrier-aligned so both writers compute
    // the same next version. Outcomes per round: both serialize (two
    // commits) or one loses with the typed error (one commit) — never
    // a raw Hadoop/Spark failure, never a half-visible version.
    import java.util.concurrent.CyclicBarrier
    var losses = 0
    (0 until 5).foreach { round =>
      val before = Snapshots.versions(spark, dir).size
      val barrier = new CyclicBarrier(2)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[
        Either[Throwable, Int]]()
      val threads = (0 until 2).map { i =>
        new Thread(() => {
          val df = Seq((100L * round + i, s"w$i")).toDF("id", "s")
          // build the DataFrame BEFORE the barrier; the race under
          // test is the commit protocol, not plan construction
          barrier.await()
          try results.add(Right(Snapshots.write(df, dir)))
          catch { case t: Throwable => results.add(Left(t)) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val (failed, committed) = results.asScala.toList.partitionMap(identity)
      failed.foreach { t =>
        assert(t.isInstanceOf[ConcurrentCommitException],
          s"loser must fail typed, got ${t.getClass}: ${t.getMessage}")
        losses += 1
      }
      // every successful commit got its OWN version number
      assert(committed.distinct.size == committed.size)
      val vs = Snapshots.versions(spark, dir)
      assert(vs.size == before + committed.size)
      // the store stays fully readable after every round: each
      // manifest resolves, latest sees one row per successful commit
      assert(Snapshots.read(spark, dir).count() == vs.size.toLong)
      // a loser's retry succeeds (the documented recovery) — clean up
      // its torn data dir first if it lost at collision point 1
      failed.foreach { t =>
        val cce = t.asInstanceOf[ConcurrentCommitException]
        val torn = new java.io.File(dir, f"v${cce.attemptedVersion}%05d")
        if (torn.exists() &&
            !new java.io.File(dir,
              f"manifest-v${cce.attemptedVersion}%05d.json").exists()) {
          torn.listFiles().foreach(_.delete()); torn.delete()
        }
        Snapshots.write(Seq((999L, "retry")).toDF("id", "s"), dir)
      }
    }
    info(s"race rounds: 5, typed losses observed: $losses")
  }

  test("compactUpserts: latest event per key becomes the new full " +
      "version; history versions keep the full event log") {
    val dir = Files.createTempDirectory("snaps_uc").toString
    // two append batches of upsert events for 3 keys
    Snapshots.write(Seq(
      (1L, 10L, "a"), (1L, 11L, "b"), (2L, 10L, "x")).toDF("k", "seq", "v"),
      dir)
    Snapshots.write(Seq(
      (1L, 12L, "c"), (3L, 10L, "m")).toDF("k", "seq", "v"), dir)
    val v = Snapshots.compactUpserts(spark, dir,
      keyCols = Seq("k"), orderCols = Seq("seq"))
    assert(v == 3)
    // compacted latest = exactly one row per key, the max-seq event
    val state = Snapshots.read(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(state == Map(1L -> ((12L, "c")), 2L -> ((10L, "x")),
      3L -> ((10L, "m"))))
    // pre-compaction versions still read as the full event history
    assert(Snapshots.read(spark, dir, 2).count() == 5)
    assert(Snapshots.read(spark, dir, 1).count() == 3)
    // appends on top of the compacted state compose: next compaction
    // starts from state + new events, not the full history
    Snapshots.write(Seq((2L, 11L, "y")).toDF("k", "seq", "v"), dir)
    Snapshots.compactUpserts(spark, dir, Seq("k"), Seq("seq"))
    val state2 = Snapshots.read(spark, dir)
    assert(state2.count() == 3)
    assert(state2.filter($"k" === 2L).select("v").head().getString(0)
      == "y")
    // output files sized from the STATE's bytes, not the input
    // log's: a tiny state must land in ONE file no matter how many
    // log bytes fed it (the 100-TB-log → 1-GB-state shape)
    val stateFiles = state2.select(
      org.apache.spark.sql.functions.col("_metadata.file_path"))
      .distinct().count()
    assert(stateFiles == 1L,
      s"3-row state compacted to $stateFiles files, expected 1")
  }

  test("compact rewrites latest into fewer files; old versions untouched") {
    val dir = Files.createTempDirectory("snaps3").toString
    // many tiny commits -> many tiny files
    (1 to 5).foreach { i =>
      Snapshots.write(spark.range(i * 100L, i * 100L + 50)
        .toDF("id").repartition(4), dir)
    }
    val before = Snapshots.read(spark, dir)
    val beforeIds = before.select("id").as[Long].collect().sorted.toSeq
    val beforeFiles = before.select(
      org.apache.spark.sql.functions.col("_metadata.file_path"))
      .distinct().count()
    val v = Snapshots.compact(spark, dir, targetFileBytes = 512L * 1024)
    assert(v == 6)
    val after = Snapshots.read(spark, dir)
    assert(after.select("id").as[Long].collect().sorted.toSeq == beforeIds)
    val afterFiles = after.select(
      org.apache.spark.sql.functions.col("_metadata.file_path"))
      .distinct().count()
    assert(afterFiles < beforeFiles,
      s"compaction did not reduce files: $beforeFiles -> $afterFiles")
    // the sizing contract EXACTLY: ceil(input manifest bytes /
    // targetFileBytes) output files — compaction must adapt file
    // count to actual data volume, not a tuning constant
    val inputBytes = before.select(
        org.apache.spark.sql.functions.col("_metadata.file_path"),
        org.apache.spark.sql.functions.col("_metadata.file_size"))
      .distinct()
      .agg(org.apache.spark.sql.functions.sum("file_size"))
      .head().getLong(0)
    val expected = math.max(1L, (inputBytes + 512L * 1024 - 1) / (512L * 1024))
    assert(afterFiles == expected,
      s"compacted to $afterFiles files; sizing contract says " +
        s"ceil($inputBytes / 512KiB) = $expected")
    // pre-compaction versions still read their ORIGINAL row sets
    assert(Snapshots.read(spark, dir, 2).count() == 100)
  }

  test("vacuum drops expired manifests but keeps append-carried files") {
    val dir = Files.createTempDirectory("snaps4").toString
    Snapshots.write(Seq((1L, "a")).toDF("id", "s"), dir)   // v1
    Snapshots.write(Seq((2L, "b")).toDF("id", "s"), dir)   // v2 carries v1
    Snapshots.compact(spark, dir)                          // v3 = rewrite
    Snapshots.write(Seq((3L, "c")).toDF("id", "s"), dir)   // v4 carries v3
    val (vDel, fDel) = Snapshots.vacuum(spark, dir, keepVersions = 2)
    assert(vDel == 2) // v1, v2 expired
    assert(fDel > 0)  // v1/v2 original files unreferenced by v3/v4
    assert(Snapshots.versions(spark, dir) == Seq(3, 4))
    // kept versions still read completely (v3's rewritten files and
    // v4's append survive)
    assert(Snapshots.read(spark, dir, 3).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    assert(Snapshots.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // keeping everything is a no-op
    assert(Snapshots.vacuum(spark, dir, keepVersions = 10) == ((0, 0)))
  }

  test("missing version / empty dir error clearly") {
    val dir = Files.createTempDirectory("snaps2").toString
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.read(spark, dir)
    }
    assert(e1.getMessage.contains("no snapshot versions"))
    Snapshots.write(Seq(Tuple1(1L)).toDF("id"), dir)
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.read(spark, dir, 7)
    }
    assert(e2.getMessage.contains("version 7 not found"))
  }

  test("append rejects schema drift before committing anything") {
    val dir = Files.createTempDirectory("snaps8").toString
    Snapshots.write(Seq((1L, "a")).toDF("id", "s"), dir)
    val err = intercept[IllegalArgumentException] {
      Snapshots.write(Seq((2L, 3.0)).toDF("id", "v"), dir)
    }
    assert(err.getMessage.contains("append schema mismatch"))
    assert(Snapshots.versions(spark, dir) == Seq(1)) // nothing committed
    // column ORDER is not drift (parquet resolves columns by name)
    Snapshots.write(Seq(("b", 2L)).toDF("s", "id"), dir)
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
    assert(Snapshots.read(spark, dir)
      .select("id", "s").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("empty commits stay readable and never brick the store") {
    val dir = Files.createTempDirectory("snaps9").toString
    // v1 EMPTY: an empty write emits zero part files; the manifest's
    // recorded schema must keep every downstream path working
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    assert(Snapshots.write(empty, dir) == 1)
    val r1 = Snapshots.read(spark, dir, 1)
    assert(r1.count() == 0 && r1.columns.toSeq == Seq("id", "s"))
    // the next append's drift check consults v1 — must pass...
    assert(Snapshots.write(Seq((1L, "a")).toDF("id", "s"), dir) == 2)
    // ...and still reject actual drift against an empty predecessor
    val emptyOnly = Files.createTempDirectory("snaps9b").toString
    Snapshots.write(empty, emptyOnly)
    val drift = intercept[IllegalArgumentException] {
      Snapshots.write(Seq(Tuple1(2.0)).toDF("x"), emptyOnly)
    }
    assert(drift.getMessage.contains("append schema mismatch"))
    assert(Snapshots.read(spark, dir).count() == 1)
    // empty diff: same-version changesSince returns a schema-only
    // frame (the old spelling threw on v1's empty manifest)
    val diff11 = Snapshots.changesSince(spark, dir, 1, 1)
    assert(diff11.count() == 0 && diff11.columns.toSeq == Seq("id", "s"))
    assert(Snapshots.changesSince(spark, dir, 1, 2).count() == 1)
    // compact / restore over a store whose version 1 is empty
    val emptyDir = Files.createTempDirectory("snaps9c").toString
    Snapshots.write(empty, emptyDir)
    val vc = Snapshots.compact(spark, emptyDir)
    assert(Snapshots.read(spark, emptyDir, vc).count() == 0)
    val vr = Snapshots.restore(spark, emptyDir, 1)
    assert(Snapshots.read(spark, emptyDir, vr).columns.toSeq ==
      Seq("id", "s"))
  }

  test("restore re-publishes a past version as latest, data untouched") {
    val dir = Files.createTempDirectory("snaps7").toString
    Snapshots.write(Seq((1L, "a")).toDF("id", "s"), dir)
    Snapshots.write(Seq((2L, "bad")).toDF("id", "s"), dir)
    val v = Snapshots.restore(spark, dir, 1)
    assert(v == 3)
    // latest reads like v1; the bad v2 stays inspectable
    assert(Snapshots.read(spark, dir).select("id").as[Long]
      .collect().toSeq == Seq(1L))
    assert(Snapshots.read(spark, dir, 2).count() == 2)
    // appends continue from the restored state
    Snapshots.write(Seq((3L, "c")).toDF("id", "s"), dir)
    assert(Snapshots.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    assert(intercept[IllegalArgumentException] {
      Snapshots.restore(spark, dir, 99)
    }.getMessage.contains("not found"))
  }

  test("changesSince reads only the files later manifests added") {
    val dir = Files.createTempDirectory("snaps6").toString
    Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    Snapshots.write(Seq((3L, "c")).toDF("id", "s"), dir)
    Snapshots.write(Seq((4L, "d")).toDF("id", "s"), dir)
    assert(Snapshots.changesSince(spark, dir, 1).select("id").as[Long]
      .collect().sorted.toSeq == Seq(3L, 4L))
    assert(Snapshots.changesSince(spark, dir, 2, 3).select("id").as[Long]
      .collect().toSeq == Seq(4L))
    // self-diff is empty with the right schema
    val empty = Snapshots.changesSince(spark, dir, 3, 3)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "s"))
    assert(intercept[IllegalArgumentException] {
      Snapshots.changesSince(spark, dir, 3, 1)
    }.getMessage.contains("after"))
  }

  test("writeBatch is effectively-once per batch id") {
    val dir = Files.createTempDirectory("snaps5").toString
    val b0 = Seq((1L, "a")).toDF("id", "s")
    assert(Snapshots.writeBatch(b0, dir, batchId = 0L) == Some(1))
    // replay of the SAME batch id: no new version, no new rows
    assert(Snapshots.writeBatch(b0, dir, batchId = 0L).isEmpty)
    assert(Snapshots.writeBatch(Seq((2L, "b")).toDF("id", "s"),
      dir, batchId = 1L) == Some(2))
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
    assert(Snapshots.read(spark, dir).count() == 2)
    // plain writes interleave fine (no batch id recorded)
    Snapshots.write(Seq((3L, "c")).toDF("id", "s"), dir)
    assert(Snapshots.writeBatch(b0, dir, batchId = 0L).isEmpty)
  }

  test("snapshot_scan / snapshot_writer plugins round-trip") {
    val tmp = Files.createTempDirectory("snapplug")
    val w = new graft.plugins.output.SnapshotWriterPlugin(
      Map("output_path" -> "store"), tmp, "default")
    assert(w.execute(Seq((1L, 2.0)).toDF("id", "v")).isRight)
    assert(w.execute(Seq((2L, 3.0)).toDF("id", "v")).isRight)
    val r1 = new graft.plugins.input.SnapshotScanPlugin(
      Map("input_path" -> "store", "version" -> 1), tmp, "default")
    assert(r1.execute()(spark).fold(e => fail(e.getMessage), _.count()) == 1)
    val rLatest = new graft.plugins.input.SnapshotScanPlugin(
      Map("input_path" -> "store"), tmp, "default")
    assert(rLatest.execute()(spark)
      .fold(e => fail(e.getMessage), _.count()) == 2)
    assert(rLatest.dryRun()(spark)
      .fold(e => fail(e.getMessage), _.fieldNames.toSeq) == Seq("id", "v"))
  }
}

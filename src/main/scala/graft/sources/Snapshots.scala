package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot versioning on plain parquet — the
  * reproducibility primitive a training pipeline needs from a
  * lakehouse without adopting one: every write commits an immutable
  * version whose manifest lists EXACTLY the data files visible, so
  * `read(dir, v)` returns the same rows forever, no matter how many
  * appends land afterwards. "Which snapshot trained this model" stays
  * answerable.
  *
  * Layout:
  *   <dir>/v00001/part-*.parquet       (each version's own files)
  *   <dir>/manifest-v00001.json        ({"version":1,"files":[...]})
  *
  * A version's manifest lists its predecessors' files plus its own —
  * append semantics without ever rewriting data. Commit order: data
  * files first, manifest LAST (rename-free single-file write), so a
  * torn job leaves garbage data files but never a manifest pointing
  * at missing data — readers only ever see complete versions. File
  * paths are dir-relative, so a snapshot tree survives relocation.
  *
  * Scale: the manifest holds file PATHS (thousands of entries, KBs),
  * not row data; reads hand Spark the explicit file list, which skips
  * directory listing entirely — on object stores that listing is the
  * scan-planning bottleneck this layout removes.
  */
/** Thrown when an append loses the manifest-last commit race: another
  * writer committed (or is mid-commit on) the version this writer
  * computed. The store is intact — exactly one writer owns each
  * version — and the loser's recovery is to RE-RUN the append, which
  * re-reads the latest version and commits on top of it.
  *
  * `winningVersion` is the latest version visible when the collision
  * was detected: equal to `attemptedVersion` when the winner's
  * manifest has landed; one less while the winner is still mid-commit
  * (claim placed, manifest pending) — in that state a claim from a
  * long-dead torn commit is indistinguishable from a live writer, so
  * if no `manifest-v<attempted>.json` ever appears, delete the
  * orphaned `.graft-claim-v<attempted>` file (and the `v<attempted>`
  * directory, if present) and retry. */
class ConcurrentCommitException(
    val dir: String,
    val attemptedVersion: Int,
    val winningVersion: Int,
    cause: Throwable)
  extends RuntimeException(
    f"concurrent commit on $dir: version v$attemptedVersion%05d was " +
      f"claimed by another writer (latest committed manifest: " +
      f"v$winningVersion%05d). Re-run the append to commit on top of " +
      f"the winner; if no manifest-v$attemptedVersion%05d.json ever " +
      f"appears, the claim is a torn commit — remove " +
      f".graft-claim-v$attemptedVersion%05d and the v$attemptedVersion%05d " +
      "directory (if present) and retry.", cause)

object Snapshots {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Serializes same-JVM version claims — see the claim comment in
    * [[writeInternal]]. */
  private val claimLock = new Object

  private val manifestRe = "^manifest-v(\\d{5})\\.json$".r

  /** Versions present, ascending (empty for a fresh dir). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val d = new HPath(dir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(_.getPath.getName).toSeq
      .flatMap(n => manifestRe.findFirstMatchIn(n).map(_.group(1).toInt))
      .sorted
  }

  /** Append `df` as a NEW version; returns the version number.
    * Eager (runs the write job + manifest commit). */
  def write(df: DataFrame, dir: String): Int =
    writeInternal(df, dir, None)

  private def writeInternal(df: DataFrame, dir: String,
                            batchId: Option[Long]): Int = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val prev = versions(spark, dir)
    // appends must match the store's schema: a silently-mixed store
    // would drop or mistype columns at read time, which is far worse
    // than failing the commit here (names + types, order-insensitive;
    // nullability may widen)
    prev.lastOption.foreach { p =>
      // prefer the schema recorded in the manifest (no footer read;
      // also the only source when the previous commit was empty)
      val existing = manifestSchema(spark, dir, p)
        .getOrElse(read(spark, dir, p).schema)
      val incoming = df.schema
      val e = existing.fields.map(x => x.name -> x.dataType).sortBy(_._1)
      val i = incoming.fields.map(x => x.name -> x.dataType).sortBy(_._1)
      require(e.sameElements(i),
        s"append schema mismatch: store has ${e.map(_._1).mkString(",")} " +
          s"(${e.map(_._2.simpleString).mkString(",")}), batch has " +
          s"${i.map(_._1).mkString(",")} " +
          s"(${i.map(_._2.simpleString).mkString(",")})")
    }
    val v = prev.lastOption.getOrElse(0) + 1
    withVersionClaim(spark, f, dir, v) { lostRace =>
      val newFiles = writeDataDir(f, df, dir, v, lostRace)
      val carried: Seq[String] = prev.lastOption match {
        case Some(p) => readManifest(spark, dir, p)
        case None => Seq.empty
      }
      val all = carried ++ newFiles
      val bidField = batchId.map(b => s""""batch_id":$b,""").getOrElse("")
      // the schema rides in every manifest so a version with ZERO
      // data files (an empty DataFrame write emits no part files)
      // stays readable as a schema-only empty frame instead of
      // bricking the store: read() of it would otherwise throw and
      // the next append's drift check (which consults the previous
      // version) would fail
      val schemaField = s""""schema":${jsonStr(df.schema.toDDL)},"""
      val json = all.map(p => "\"" + p + "\"").mkString(
        s"""{"version":$v,$bidField$schemaField"files":[""", ",", "]}")
      writeManifestExclusive(f, dir, v, json, lostRace)
      v
    }
  }

  // -------------------------------------------- commit protocol core
  // ONE copy of the concurrency-critical claim/data/manifest steps,
  // composed by every committing operation (append, compaction,
  // restore) — a protocol fix in one caller must not silently miss
  // another.

  /** Claim version `v` and run `body` with the typed lost-race
    * thrower. Two racing writers can compute the same v; the claim —
    * an atomic create(overwrite=false) of a zero-byte file — ensures
    * exactly one ever runs a write job against v's directory (without
    * it, two jobs slipping past the ErrorIfExists check simultaneously
    * would mix part files in one directory and the winner's manifest
    * would absorb the loser's rows). The FS create is truly atomic on
    * HDFS but check-then-create on RawLocalFileSystem (and
    * historically S3A), so same-JVM claimants are additionally
    * serialized by the process-wide lock; distinct JVMs are arbitrated
    * by the FS, atomically wherever it can promise it.
    *
    * The claim is RELEASED on any in-process failure (else the
    * version number stays wedged for every future commit) and after a
    * successful commit (a committed version's claim blocks nothing —
    * future writers compute v+1 — so release is opportunistic and a
    * failed delete is harmless). A CRASH between claim and manifest
    * is the one path that leaves the claim behind: the torn-commit
    * state [[ConcurrentCommitException]]'s message documents the
    * cleanup for. */
  private def withVersionClaim(spark: SparkSession, f: FileSystem,
      dir: String, v: Int)(body: (Throwable => Nothing) => Int): Int = {
    def lostRace(cause: Throwable): Nothing =
      throw new ConcurrentCommitException(dir, v,
        versions(spark, dir).lastOption.getOrElse(0), cause)
    val claim = new HPath(f"$dir/.graft-claim-v$v%05d")
    claimLock.synchronized {
      if (f.exists(claim))
        lostRace(new org.apache.hadoop.fs.FileAlreadyExistsException(
          claim.toString))
      try f.create(claim, false).close()
      catch { case e: Throwable if f.exists(claim) => lostRace(e) }
    }
    def release(): Unit =
      try { f.delete(claim, false); () } catch { case _: Throwable => () }
    try {
      val r = body(lostRace)
      release()
      r
    } catch {
      case t: Throwable => release(); throw t
    }
  }

  /** Write `df` as version `v`'s data directory and return the
    * sorted dir-relative file list. A PRE-EXISTING directory (a
    * pre-claim torn commit, or manual tampering) surfaces as the
    * typed lost-race error; our OWN mid-job failure removes our
    * partial output so the released version number is re-claimable
    * (a directory we did not create is never touched). */
  private def writeDataDir(f: FileSystem, df: DataFrame, dir: String,
      v: Int, lostRace: Throwable => Nothing): Seq[String] = {
    val vDir = f"$dir/v$v%05d"
    val dirPreExisted = f.exists(new HPath(vDir))
    try df.write.parquet(vDir)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage != null && e.getMessage.contains("already exists") =>
        lostRace(e)
      case e: Throwable =>
        if (!dirPreExisted)
          try { f.delete(new HPath(vDir), true); () }
          catch { case _: Throwable => () }
        throw e
    }
    f.listStatus(new HPath(vDir))
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted
      .map(n => f"v$v%05d/$n")
      .toSeq
  }

  /** Manifest LAST: single create+write+close, so readers never
    * observe a version whose data is incomplete. Collision point for
    * writers that raced past the claim on a non-atomic FS: the
    * loser's create throws, re-typed iff the winner's manifest is
    * the reason — and only the create itself (once OUR create
    * succeeded, a later write/close failure is an IO fault, not a
    * lost race). */
  private def writeManifestExclusive(f: FileSystem, dir: String, v: Int,
      json: String, lostRace: Throwable => Nothing): Unit = {
    val mPath = new HPath(f"$dir/manifest-v$v%05d.json")
    val out =
      try f.create(mPath, false)
      catch { case e: Throwable if f.exists(mPath) => lostRace(e) }
    out.write(json.getBytes("UTF-8"))
    out.close()
  }

  /** Commit a micro-batch as a version EXACTLY ONCE per `batchId`:
    * replays of an already-committed batch (streaming retry /
    * checkpoint restart) are no-ops, detected from the batch_id
    * field stored in each manifest. Returns Some(version) when a
    * commit happened. This is what makes a foreachBatch snapshot
    * sink effectively-once without a transaction log. */
  def writeBatch(df: DataFrame, dir: String,
                 batchId: Long): Option[Int] = {
    val spark = df.sparkSession
    val committed = versions(spark, dir).flatMap(v =>
      manifestBatchId(spark, dir, v))
    if (committed.contains(batchId)) None
    else Some(writeInternal(df, dir, Some(batchId)))
  }

  private def manifestBatchId(spark: SparkSession, dir: String,
                              v: Int): Option[Long] = {
    val raw = manifestRaw(spark, dir, v)
    "\"batch_id\":(\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toLong)
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** The schema recorded at commit time, if the manifest carries one
    * (manifests written before schemas were recorded don't). */
  private def manifestSchema(spark: SparkSession, dir: String,
                             v: Int): Option[org.apache.spark.sql.types.StructType] =
    "\"schema\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(manifestRaw(spark, dir, v))
      .map(m => org.apache.spark.sql.types.StructType.fromDDL(
        // single-pass unescape (\x -> x); sequential replaces would
        // mis-handle a backslash followed by an escaped quote
        "\\\\(.)".r.replaceAllIn(m.group(1),
          mm => scala.util.matching.Regex.quoteReplacement(mm.group(1)))))

  private def manifestRaw(spark: SparkSession, dir: String,
                          v: Int): String = {
    val f = fs(spark, dir)
    val in = f.open(new HPath(f"$dir/manifest-v$v%05d.json"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def readManifest(spark: SparkSession, dir: String,
                           v: Int): Seq[String] = {
    val raw = manifestRaw(spark, dir, v)
    "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(raw).map(_.group(1)).toSeq
  }

  /** Small-files compaction — the maintenance pass every append-heavy
    * snapshot tree eventually needs: rewrite the LATEST version's
    * rows into ~`targetFileBytes`-sized files committed as a NEW
    * version. Older versions keep reading their original files
    * (manifests pin paths, nothing is deleted); readers of "latest"
    * switch atomically when the new manifest lands. File count is
    * sized from the actual input bytes (manifest file sizes — no
    * extra job), so compaction adapts to growth without tuning.
    * Returns the new version number. */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no snapshot versions under $dir")
    // read() rather than a raw parquet scan: compacting a store whose
    // latest version is an empty commit must not throw — the result
    // is simply another schema-carrying empty version
    writeFullVersion(spark, dir, read(spark, dir, vs.last), vs.last,
      targetFileBytes)
  }

  /** CDC upsert compaction — the snapshot twin of the
    * `stream_upsert_writer` state table: treat the store's rows as
    * UPSERT EVENTS (`keyCols` identifies the entity, `orderCols`
    * its recency) and commit a NEW full version holding only the
    * LATEST event per key. An append-only upsert log thereby gains
    * time travel: past versions still read as the full event history
    * at their commit point, while `read(dir)` after compaction serves
    * the current state table — and the next compaction starts from
    * that compacted state, so repeated compact-append cycles stay
    * O(state), not O(history).
    *
    * `orderCols` must TOTALLY order events within a key (include a
    * sequence column if the natural order can tie — a tie makes the
    * survivor partitioning-dependent, exactly like duplicate keys in
    * [[graft.ops.Sampling.shuffleShard]]). Delete events are not
    * interpreted; a tombstone convention composes on top as a filter
    * over the compacted state. One keyed window over the latest
    * version — the same shuffle any per-key aggregation pays. */
  def compactUpserts(spark: SparkSession, dir: String,
                     keyCols: Seq[String], orderCols: Seq[String],
                     targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no snapshot versions under $dir")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val events = read(spark, dir, vs.last)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    val rk = "__graft_upsert_rk" // collision-proof, as keepBestPerCluster
    val latest = events.withColumn(rk, row_number().over(w))
      .filter(col(rk) === 1).drop(rk)
    // Size output files from the STATE's estimated bytes, not the
    // input log's: inputBytes × (stateRows / inputRows). Sizing from
    // input (what [[compact]] correctly does for its 1:1 rewrite)
    // would here write ceil(logBytes/target) near-empty files — a
    // 100 TB event log compacting to a ~1 GB state table would emit
    // ~800k kilobyte files, re-creating the small-files problem the
    // maintenance pass exists to fix. The two sizing counts are
    // column-pruned scans (keys only), far cheaper than the keyed
    // window itself.
    val inputRows = events.count()
    val stateRows =
      if (inputRows == 0) 0L
      else events.select(keyCols.map(col): _*).distinct().count()
    val estBytes =
      if (inputRows == 0) 0L
      else {
        val f = fs(spark, dir)
        val inputBytes = readManifest(spark, dir, vs.last)
          .map(p => f.getFileStatus(new HPath(s"$dir/$p")).getLen).sum
        (inputBytes.toDouble * stateRows / inputRows).toLong
      }
    writeFullVersion(spark, dir, latest, vs.last, targetFileBytes,
      sizeBytes = Some(estBytes))
  }

  /** Commit `df` as a FULL new version on top of `prevVersion`: data
    * dir first, then a manifest listing ONLY the new files (not
    * carried + new) — shared by [[compact]] and [[compactUpserts]].
    * File count sized from `sizeBytes` when given (a row-reducing
    * rewrite passes its estimated OUTPUT bytes), else from the
    * previous version's bytes (exact for [[compact]]'s 1:1 rewrite).
    * Runs under the same claim protocol as appends, so concurrent
    * maintenance and appends racing the same version number get the
    * typed [[ConcurrentCommitException]], one winner guaranteed. */
  private def writeFullVersion(spark: SparkSession, dir: String,
                               df: DataFrame, prevVersion: Int,
                               targetFileBytes: Long,
                               sizeBytes: Option[Long] = None): Int = {
    val f = fs(spark, dir)
    val files = readManifest(spark, dir, prevVersion).map(p => s"$dir/$p")
    val totalBytes = sizeBytes.getOrElse(
      files.map(p => f.getFileStatus(new HPath(p)).getLen).sum)
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1)
      / targetFileBytes).toInt
    val v = prevVersion + 1
    withVersionClaim(spark, f, dir, v) { lostRace =>
      val newFiles =
        writeDataDir(f, df.repartition(nFiles), dir, v, lostRace)
      val json = newFiles.map(p => "\"" + p + "\"").mkString(
        s"""{"version":$v,"schema":${jsonStr(df.schema.toDDL)},"files":[""",
        ",", "]}")
      writeManifestExclusive(f, dir, v, json, lostRace)
      v
    }
  }

  /** Restore: commit a NEW version whose manifest is an exact copy of
    * `version`'s file list — latest now reads as the past version did,
    * history stays intact (the bad versions remain readable for
    * forensics until vacuumed), and no data moves. The Delta RESTORE
    * semantics as a pure manifest operation. Returns the new
    * version. */
  def restore(spark: SparkSession, dir: String, version: Int): Int = {
    val vs = versions(spark, dir)
    require(vs.contains(version),
      s"version $version not found under $dir (have ${vs.mkString(", ")})")
    val f = fs(spark, dir)
    val files = readManifest(spark, dir, version)
    val v = vs.last + 1
    // carry the restored version's schema (or resolve it from its
    // files for pre-schema manifests) so the new latest stays
    // readable even when the restored version was an empty commit
    val schema = manifestSchema(spark, dir, version)
      .getOrElse(read(spark, dir, version).schema)
    val json = files.map(p => "\"" + p + "\"").mkString(
      s"""{"version":$v,"restored_from":$version,""" +
        s""""schema":${jsonStr(schema.toDDL)},"files":[""", ",", "]}")
    // same claim protocol as every other commit: a restore racing an
    // append (or another restore) for this version number gets the
    // typed retryable error, and can never publish a manifest over a
    // version an appender has claimed and is mid-writing
    withVersionClaim(spark, f, dir, v) { lostRace =>
      writeManifestExclusive(f, dir, v, json, lostRace)
      v
    }
  }

  /** Incremental change feed: the rows ADDED between `fromVersion`
    * (exclusive) and `toVersion` (inclusive, default latest) — read
    * from exactly the files in `to`'s manifest that `from`'s lacks, a
    * pure manifest diff with no data comparison. This is how a
    * downstream consumer (tokenizer, trainer, index append) processes
    * only what landed since its last run. Valid along an APPEND
    * chain; a compaction in between rewrites files, so the diff
    * equals the full compacted set (file-level semantics, documented
    * — consumers should checkpoint before compaction windows). */
  def changesSince(spark: SparkSession, dir: String, fromVersion: Int,
                   toVersion: Int = -1): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no snapshot versions under $dir")
    val to = if (toVersion < 0) vs.last else toVersion
    require(vs.contains(fromVersion) && vs.contains(to),
      s"need versions $fromVersion and $to under $dir (have ${vs.mkString(", ")})")
    require(fromVersion <= to,
      s"fromVersion $fromVersion is after toVersion $to")
    val fromFiles = readManifest(spark, dir, fromVersion).toSet
    val newFiles = readManifest(spark, dir, to)
      .filterNot(fromFiles).map(p => s"$dir/$p")
    // empty diff via read(to): resolves the schema even when `to`
    // itself has zero data files (the old `.head` spelling threw)
    if (newFiles.isEmpty) read(spark, dir, to).limit(0)
    else spark.read.parquet(newFiles: _*)
  }

  /** Expire history: keep the newest `keepVersions` manifests, delete
    * older manifests AND any data file no kept manifest references.
    * Append-carried files survive (a v1 file referenced by v5's
    * manifest is retained even when v1's manifest expires) — the
    * reference set is computed from manifests, never from directory
    * age. Returns (versions deleted, data files deleted). */
  def vacuum(spark: SparkSession, dir: String,
             keepVersions: Int = 2): (Int, Int) = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    if (drop.isEmpty) return (0, 0)
    val referenced = keep.flatMap(v => readManifest(spark, dir, v)).toSet
    var deletedFiles = 0
    drop.foreach { v =>
      readManifest(spark, dir, v).foreach { rel =>
        if (!referenced.contains(rel)) {
          if (f.delete(new HPath(s"$dir/$rel"), false)) deletedFiles += 1
        }
      }
      f.delete(new HPath(f"$dir/manifest-v$v%05d.json"), false)
    }
    // sweep now-empty version directories (cosmetic; readers never list)
    f.listStatus(new HPath(dir)).foreach { st =>
      if (st.isDirectory && f.listStatus(st.getPath).isEmpty)
        f.delete(st.getPath, false)
    }
    (drop.size, deletedFiles)
  }

  /** The EXACT rows of `version` (default: latest), regardless of any
    * later appends. */
  def read(spark: SparkSession, dir: String,
           version: Int = -1): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no snapshot versions under $dir")
    val v = if (version < 0) vs.last else version
    require(vs.contains(v),
      s"version $v not found under $dir (have ${vs.mkString(", ")})")
    val files = readManifest(spark, dir, v).map(p => s"$dir/$p")
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else {
      // an empty commit has no data files; the manifest-recorded
      // schema keeps the version (and the whole store) readable
      val schema = manifestSchema(spark, dir, v).getOrElse(
        throw new IllegalStateException(
          s"version $v under $dir has no data files and no recorded " +
            "schema (pre-schema manifest) — cannot reconstruct an " +
            "empty frame; restore or vacuum past it"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{MergeStats, VersionLog}

/** Snapshot isolation for the maintained table (io/VersionLog): the
  * contracts the in-place merge cannot offer — a reader resolved
  * mid-merge sees exactly its pinned snapshot (never a mix, never a
  * missing path), a crash before the commit is invisible, time travel
  * is "read version N", and vacuum can never hurt a retained reader.
  */
class VersionLogSpec extends AnyFunSuite {
  import TestSpark._

  private def seed(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("vlog").toString
    val v = VersionLog.init(spark,
      dir,
      Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"),
        (4L, "four", "b"), (6L, "six", "c")).toDF("k", "v", "p"),
      partitionBy = Some("p"))
    assert(v === 1L)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select($"k", $"v", $"p")
      .as[(Long, String, String)].collect().toSet
  }

  test("versioned merge: upsert/move/delete semantics, file-granular " +
      "copy-on-write, drained partitions, CDC feed") {
    import spark.implicits._
    val dir = seed()
    val before = VersionLog.snapshot(spark, dir, None)
    // revise k=2, MOVE k=6 c->d, insert k=7, tombstone-delete k=4
    val batch = Seq((2L, "two2", "a", false), (6L, "six2", "d", false),
      (7L, "seven", "b", false), (4L, "gone", "zz", true))
      .toDF("k", "v", "p", "_del")
    val (stats, feed, version) = VersionLog.mergeByKeyCdc(
      spark, dir, batch, "k", "p", deleteWhen = Some($"_del"))
    assert(version === 2L)
    // tombstone's own partCol is ignored; its HOME (b) is touched
    assert(stats.touchedPartitions === Seq("a", "b", "c", "d"))
    assert(stats.removedPartitions === Seq("c"))
    assert(rows(VersionLog.read(spark, dir)) === Set(
      (1L, "one", "a"), (2L, "two2", "a"), (3L, "three", "b"),
      (6L, "six2", "d"), (7L, "seven", "b")))
    // copy-on-write at FILE granularity: untouched partitions keep the
    // exact files of the parent snapshot (no rewrite, no rename)
    val after = VersionLog.snapshot(spark, dir, None)
    val untouchedBefore = before.files.filterNot(_.contains("/p="))
    assert(untouchedBefore.isEmpty) // all files live under p= dirs
    assert(before.files.toSet.subsetOf(
      before.files.toSet ++ after.files.toSet)) // old files still listed or retired, never mutated
    // every parent file still EXISTS on disk (immutability)
    before.files.foreach { f =>
      assert(new java.io.File(s"$dir/$f").exists(), s"$f was deleted")
    }
    // feed classifies every change
    assert(feed.groupBy($"_op").count().as[(String, Long)].collect().toMap
      === Map("update_pre" -> 2L, "update_post" -> 2L,
        "insert" -> 1L, "delete" -> 1L))
    // the no-op merge commits nothing and reports the same version
    val (s2, _, v2) = VersionLog.mergeByKeyCdc(spark, dir,
      batch.filter($"k" < 0), "k", "p", deleteWhen = Some($"_del"))
    assert(s2 === MergeStats(Nil, 0L, Nil))
    assert(v2 === 2L)
  }

  test("snapshot isolation: a reader resolved mid-merge finishes on " +
      "its pinned snapshot; time travel is read-by-version-id") {
    import spark.implicits._
    val dir = seed()
    val pinned = VersionLog.read(spark, dir) // resolves v1's file list
    val expectedV1 = rows(pinned)
    val (_, _, v) = VersionLog.mergeByKeyCdc(spark, dir,
      Seq((2L, "two2", "a", false), (4L, "x", "zz", true))
        .toDF("k", "v", "p", "_del"),
      "k", "p", deleteWhen = Some($"_del"))
    assert(v === 2L)
    // the pinned frame evaluates AFTER the merge committed — and still
    // sees exactly the old snapshot (old files are immutable, the
    // in-place protocol would have deleted p=a under this reader)
    assert(rows(pinned) === expectedV1)
    assert(rows(VersionLog.read(spark, dir, Some(1L))) === expectedV1)
    assert(rows(VersionLog.read(spark, dir)) ===
      (expectedV1 - ((2L, "two", "a")) - ((4L, "four", "b")) +
        ((2L, "two2", "a"))))
    assert(VersionLog.listVersions(spark, dir) === Seq(1L, 2L))
  }

  test("a crash before the commit is invisible: data orphans change " +
      "no reader, and vacuum deletes only unreferenced+aged files") {
    import spark.implicits._
    val dir = seed()
    val expected = rows(VersionLog.read(spark, dir))
    // simulate a merge that died after writing its batch but before
    // the version-file create: an orphan batch directory
    Seq((99L, "junk", "a")).toDF("k", "v", "p")
      .write.partitionBy("p").parquet(s"$dir/data/b-00000002-deadbeef")
    assert(rows(VersionLog.read(spark, dir)) === expected,
      "uncommitted files must be invisible to every reader")
    // fresh orphans are protected by the TTL...
    val young = VersionLog.vacuumVersions(spark, dir, keepLast = 1,
      ttlMs = 3600 * 1000L)
    assert(young.isEmpty)
    // ...aged ones are deleted; referenced files never are
    val aged = VersionLog.vacuumVersions(spark, dir, keepLast = 1,
      ttlMs = 0L)
    assert(aged.exists(_.contains("b-00000002-deadbeef")),
      "the orphan batch must be vacuumed once aged")
    // victims may include unreferenced marker files (_SUCCESS/.crc —
    // versioned readers never consult them) but NEVER a file a
    // retained snapshot lists
    val retained = VersionLog.snapshot(spark, dir, None).files.toSet
    assert(aged.forall(f => !retained.contains(f)))
    assert(rows(VersionLog.read(spark, dir)) === expected)
  }

  test("vacuum retains keepLast versions; a dropped version's files " +
      "go only if no retained snapshot references them") {
    import spark.implicits._
    val dir = seed()
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((2L, "two2", "a")).toDF("k", "v", "p"), "k", "p")
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((2L, "two3", "a")).toDF("k", "v", "p"), "k", "p")
    val expected = rows(VersionLog.read(spark, dir))
    val v2Files = VersionLog.snapshot(spark, dir, Some(2L)).files
    val deleted = VersionLog.vacuumVersions(spark, dir, keepLast = 1,
      ttlMs = 0L)
    assert(deleted.contains("_versions/v-00000001.json"))
    assert(deleted.contains("_versions/v-00000002.json"))
    // v2's p=a file was retired by v3 -> deletable; v2's untouched
    // p=b/p=c files are still referenced by v3 -> retained
    val retained = VersionLog.snapshot(spark, dir, Some(3L)).files.toSet
    deleted.filter(_.startsWith("data/")).foreach { f =>
      assert(!retained.contains(f), s"vacuum deleted a live file: $f")
    }
    v2Files.filter(retained.contains).foreach { f =>
      assert(new java.io.File(s"$dir/$f").exists(),
        s"shared file $f must survive the vacuum")
    }
    assert(rows(VersionLog.read(spark, dir)) === expected)
    intercept[IllegalArgumentException] {
      VersionLog.read(spark, dir, Some(1L)) // vacuumed away, loudly
    }
  }

  test("optimistic concurrency: two commits against the same parent " +
      "— exactly one wins, the loser throws") {
    import spark.implicits._
    val dir = seed()
    val snap = VersionLog.snapshot(spark, dir, None)
    VersionLog.commit(spark, dir, snap.version, "writer-A", snap.files)
    intercept[java.util.ConcurrentModificationException] {
      VersionLog.commit(spark, dir, snap.version, "writer-B", snap.files)
    }
    assert(VersionLog.snapshot(spark, dir, None).action === "writer-A")
  }

  test("versioned compaction: over-fragmented groups repack as a NEW " +
      "version, compact groups carry by reference, old readers undisturbed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vcompact").toString
    // p=a heavily fragmented (8 files), p=b one file
    VersionLog.init(spark,
      dir,
      (0L until 64L).map(i => (i, s"v$i", "a")).toDF("k", "v", "p")
        .repartition(8)
        .unionByName(Seq((1000L, "x", "b")).toDF("k", "v", "p")),
      partitionBy = Some("p"))
    val before = VersionLog.snapshot(spark, dir, None)
    val bFiles = before.files.filter(_.contains("/p=b/"))
    val pinned = VersionLog.read(spark, dir) // resolves v1 pre-compact
    val expected = rows(pinned)
    val (nb, na, v) = VersionLog.compactSnapshot(spark, dir,
      targetBytes = 1L << 30)
    assert(v === 2L)
    assert(nb > na, s"compaction must shrink the file count ($nb -> $na)")
    val after = VersionLog.snapshot(spark, dir, None)
    assert(after.files.count(_.contains("/p=a/")) === 1,
      "fragmented group must repack to its byte-sized target")
    assert(after.files.filter(_.contains("/p=b/")) === bFiles,
      "already-compact group must be carried by REFERENCE")
    assert(rows(VersionLog.read(spark, dir)) === expected)
    assert(rows(pinned) === expected,
      "a reader pinned pre-compaction is never disturbed")
    // idempotent: nothing left to repack, version unchanged
    val (b2, a2, v2) = VersionLog.compactSnapshot(spark, dir,
      targetBytes = 1L << 30)
    assert(b2 === a2 && v2 === 2L)
  }

  test("exactly-once ingest: a re-delivered batch tag is skipped, the " +
      "table records each batch as exactly one version") {
    import spark.implicits._
    val dir = seed()
    val batch = Seq((2L, "two2", "a"), (9L, "nine", "d"))
      .toDF("k", "v", "p")
    val first = VersionLog.mergeBatchOnce(spark, dir, "stream:q:7",
      batch, "k", "p")
    assert(first.isDefined && first.get._3 === 2L)
    val expected = rows(VersionLog.read(spark, dir))
    // the redelivery (crash between merge and offset commit) no-ops
    assert(VersionLog.mergeBatchOnce(spark, dir, "stream:q:7",
      batch, "k", "p").isEmpty)
    assert(VersionLog.listVersions(spark, dir) === Seq(1L, 2L))
    assert(rows(VersionLog.read(spark, dir)) === expected)
    // a NEW epoch applies
    assert(VersionLog.mergeBatchOnce(spark, dir, "stream:q:8",
      Seq((9L, "nine2", "d")).toDF("k", "v", "p"), "k", "p").isDefined)
    assert(rows(VersionLog.read(spark, dir))
      === expected - ((9L, "nine", "d")) + ((9L, "nine2", "d")))
    // reserved action names are refused as tags
    intercept[IllegalArgumentException] {
      VersionLog.mergeBatchOnce(spark, dir, "merge", batch, "k", "p")
    }
  }

  test("schema evolution: a widening append unions with nulls for " +
      "older batches, in both read paths; merges carry the wide schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vevolve").toString
    VersionLog.init(spark, dir,
      Seq((1L, "one", "a"), (2L, "two", "b")).toDF("k", "v", "p"),
      partitionBy = Some("p"))
    VersionLog.append(spark, dir,
      Seq((3L, "three", 30L, "a")).toDF("k", "v", "extra", "p"),
      partitionBy = Some("p"))
    val t = VersionLog.read(spark, dir)
    assert(t.columns.toSet === Set("k", "v", "p", "extra"))
    assert(t.select($"k", $"extra").as[(Long, Option[Long])]
      .collect().toSet ===
      Set((1L, None), (2L, None), (3L, Some(30L))))
    // the graft format reads the same widened view (footer schemas
    // merged across batches; the parquet reader null-fills older files)
    val f = spark.read.format("graft").load(dir)
    assert(f.columns.toSet === Set("k", "v", "p", "extra"))
    assert(f.filter($"extra".isNotNull).select($"k").as[Long]
      .collect().toSeq === Seq(3L))
    // a merge after the widening writes the wide schema for survivors
    // (null-filled) and keeps working
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((2L, "two2", Some(20L), "b")).toDF("k", "v", "extra", "p"),
      "k", "p")
    assert(VersionLog.read(spark, dir)
      .select($"k", $"v", $"extra").as[(Long, String, Option[Long])]
      .collect().toSet === Set((1L, "one", None),
        (2L, "two2", Some(20L)), (3L, "three", Some(30L))))
  }

  test("RACING writers: two concurrent merges against one table — " +
      "exactly one commits per version, no update is lost after retry") {
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, Executors}
    val dir = seed()
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def contend(batch: org.apache.spark.sql.DataFrame) =
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
        override def call(): Either[Throwable, Long] = {
          gate.await()
          try Right(VersionLog.mergeByKeyCdc(spark, dir, batch,
            "k", "p")._3)
          catch { case t: Throwable => Left(t) }
        }
      })
    val fa = contend(Seq((2L, "two2", "a")).toDF("k", "v", "p"))
    val fb = contend(Seq((4L, "four2", "b")).toDF("k", "v", "p"))
    gate.countDown()
    val results = Seq(fa.get(), fb.get())
    pool.shutdown()
    val wins = results.collect { case Right(v) => v }
    val losses = results.collect { case Left(t) => t }
    // both may serialize cleanly (snapshot resolved after the other's
    // commit), but a true race loses exactly one — and the loser's
    // failure is the CAS conflict, not corruption
    assert(wins.nonEmpty)
    losses.foreach(t => assert(
      t.isInstanceOf[java.util.ConcurrentModificationException], t))
    assert(wins.toSet.size === wins.size, "two commits on one version")
    // the losing batch (if any) retries against the new snapshot and
    // lands; afterwards BOTH updates are present — nothing was lost
    if (losses.nonEmpty) {
      val lost =
        if (wins.contains(2L) &&
            rows(VersionLog.read(spark, dir)).contains((2L, "two2", "a")))
          Seq((4L, "four2", "b")).toDF("k", "v", "p")
        else Seq((2L, "two2", "a")).toDF("k", "v", "p")
      VersionLog.mergeByKeyCdc(spark, dir, lost, "k", "p")
    }
    val finalRows = rows(VersionLog.read(spark, dir))
    assert(finalRows.contains((2L, "two2", "a")))
    assert(finalRows.contains((4L, "four2", "b")))
    assert(finalRows.size === 5)
    // the feed is transactional with the commit: exactly one
    // PUBLISHED batch per COMMITTED merge — a CAS loser's staged
    // batch must never surface as a committed-looking phantom
    val committedMerges = wins.size + losses.size // each loss retried once
    val published = new java.io.File(s"$dir._cdc")
      .listFiles.map(_.getName).count(_.startsWith("batch-"))
    assert(published === committedMerges,
      s"$published feed batches for $committedMerges committed merges")
  }

  test("CDC feed is transactional with the commit: a crash between " +
      "the version CAS and the feed publish heals at the next entry") {
    import spark.implicits._
    val dir = seed()
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((2L, "two2", "a")).toDF("k", "v", "p"), "k", "p")
    val cdc = new java.io.File(s"$dir._cdc")
    def published() =
      cdc.listFiles.map(_.getName).filter(_.startsWith("batch-")).toSet
    assert(published() === Set("batch-00000"))
    // simulate the crash window: the commit NAMED the feed batch in
    // its version file but the publish rename never ran — un-publish
    // the batch back to its staging name
    assert(new java.io.File(cdc, "batch-00000").renameTo(
      new java.io.File(cdc, ".staging-batch-00000")))
    assert(published() === Set.empty[String],
      "a staged batch must be invisible to every consumer")
    // the next merge heals at entry (idempotent publish), THEN
    // appends its own batch at the next free index
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((3L, "three3", "b")).toDF("k", "v", "p"), "k", "p")
    assert(published() === Set("batch-00000", "batch-00001"))
    // the healed batch carries the FIRST merge's changes
    assert(spark.read.parquet(s"$dir._cdc/batch-00000")
      .filter($"_op" === "update_post" && $"k" === 2L).count() === 1L)
  }

  test("versioned merge rejects a flat layout loudly: without " +
      "/part=value/ segments every matched key would duplicate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vflat").toString
    VersionLog.init(spark, dir,
      Seq((1L, "one", "a"), (2L, "two", "b")).toDF("k", "v", "p"),
      partitionBy = None)
    val e = intercept[IllegalArgumentException] {
      VersionLog.mergeByKeyCdc(spark, dir,
        Seq((1L, "one2", "a")).toDF("k", "v", "p"), "k", "p")
    }
    assert(e.getMessage.contains("layout"), e.getMessage)
    // nothing committed, nothing changed
    assert(VersionLog.listVersions(spark, dir) === Seq(1L))
    assert(rows(VersionLog.read(spark, dir)) ===
      Set((1L, "one", "a"), (2L, "two", "b")))
  }

  test("schema evolution: a narrow APPEND or a compaction cannot " +
      "narrow the table — both read paths keep the evolved columns") {
    import spark.implicits._
    val dir = seed()
    // widen via append: +extra
    VersionLog.append(spark, dir,
      Seq((30L, "thirty", Some(30L), "b")).toDF("k", "v", "extra", "p"),
      partitionBy = Some("p"))
    // narrow append: the NEWEST batch now lacks the evolved column —
    // a reader trusting one newest footer would silently drop it
    VersionLog.append(spark, dir,
      Seq((8L, "eight", "c")).toDF("k", "v", "p"),
      partitionBy = Some("p"))
    def checkBoth(): Unit = {
      val union = VersionLog.read(spark, dir)
      val format = spark.read.format("graft").load(dir)
      for (df <- Seq(union, format)) {
        assert(df.columns.toSet === Set("k", "v", "extra", "p"))
        assert(df.select($"k", $"extra")
          .as[(Long, Option[Long])].collect().toSet ===
          Set((1L, None), (2L, None), (3L, None), (4L, None),
            (6L, None), (30L, Some(30L)), (8L, None)))
      }
    }
    checkBoth()
    // compaction rewrites fragmented groups ALIGNED to the table's
    // full schema (not their own pre-evolution footers), so the new
    // batch can never be the narrowest view of the table
    val (nBefore, nAfter, v) =
      VersionLog.compactSnapshot(spark, dir, targetBytes = 1L << 30)
    assert(nAfter < nBefore && v > 2L)
    checkBoth()
  }

  test("O(100)-commit history: latest resolves via the _latest hint " +
      "(stale/corrupt/dangling hints self-heal), and reads plan ONE " +
      "scan with partition pruning — plan width flat in history") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vmany").toString
    VersionLog.init(spark, dir,
      Seq((0L, "v0", "a")).toDF("k", "v", "p"),
      partitionBy = Some("p"))
    val parts = Vector("a", "b", "c", "d")
    (1L until 40L).foreach { i =>
      VersionLog.append(spark, dir,
        Seq((i, s"v$i", parts((i % 4).toInt))).toDF("k", "v", "p")
          .coalesce(1),
        partitionBy = Some("p"))
    }
    // the hint is exact after every commit: resolution is one tiny
    // read + one existence probe, never a directory listing
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_versions/_latest"))).trim
    assert(hint === "40")
    assert(VersionLog.snapshot(spark, dir, None).version === 40L)
    // a STALE hint (racing loser's overwrite) walks forward; a
    // CORRUPT or DANGLING one falls back to the listing — the hint
    // can change resolution SPEED, never its result
    def setHint(s: String): Unit = java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_versions/_latest"), s.getBytes)
    for (bad <- Seq("3", "not-a-number", "999")) {
      setHint(bad)
      assert(VersionLog.snapshot(spark, dir, None).version === 40L,
        s"hint '$bad' must not change resolution")
    }
    // 40 commits, 40 batch directories — and STILL one scan node:
    // the FileIndex path replaced the union-per-batch plan shape
    val full = VersionLog.read(spark, dir)
    assert(full.select($"k").as[Long].collect().toSet ===
      (0L until 40L).toSet)
    def scansOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    assert(scansOf(full).size === 1,
      "read must plan one scan regardless of commit count")
    // and the one scan still partition-prunes at plan time
    val pruned = VersionLog.read(spark, dir).filter($"p" === "a")
    val prunedScans = scansOf(pruned)
    assert(prunedScans.size === 1)
    pruned.collect()
    val totalFiles = VersionLog.snapshot(spark, dir, None).files.size
    assert(prunedScans.head.metrics("numFiles").value < totalFiles,
      "partition predicate must prune the pinned file list")
  }

  test("EQUALITY-DELETE commits: a point delete writes NO data file, " +
      "old versions time-travel to pre-delete state, compaction " +
      "carries manifests, applyDeletesCommit folds at file blast " +
      "radius, and the raw format door refuses silent divergence") {
    import spark.implicits._
    val dir = seed() // v1: keys 1,2,3,4,6 across p=a,b,c
    val dataFilesBefore = VersionLog.snapshot(spark, dir, None).files
    // the delete commit: only a KB-sized key list lands
    val v2 = VersionLog.deleteKeysCommit(spark, dir,
      Seq(2L, 6L, 99L).toDF("k"), "k") // 99 absent: no-op key
    assert(v2 === 2L)
    val snap2 = VersionLog.snapshot(spark, dir, None)
    assert(snap2.files === dataFilesBefore,
      "a delete commit must not write, rename, or drop any data file")
    assert(snap2.deletes.nonEmpty)
    // reads apply the manifests; pre-delete versions read whole
    assert(rows(VersionLog.read(spark, dir)) === Set(
      (1L, "one", "a"), (3L, "three", "b"), (4L, "four", "b")))
    assert(rows(VersionLog.read(spark, dir, Some(1L))).size === 5)
    // the raw format door refuses, the acknowledged one sees raw rows
    val e = intercept[IllegalStateException] {
      spark.read.format("graft").load(dir).count()
    }
    assert(e.getMessage.contains("acceptDeletes"), e.getMessage)
    assert(spark.read.format("graft").option("acceptDeletes", "true")
      .load(dir).count() === 5L)
    // the catalog door applies them like VersionLog.read
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    assert(spark.sql(s"SELECT k FROM graft.`$dir`")
      .as[Long].collect().toSet === Set(1L, 3L, 4L))
    // empty delete commits nothing; merge refuses until folded
    assert(VersionLog.deleteKeysCommit(spark, dir,
      Seq.empty[Long].toDF("k"), "k") === 2L)
    val em = intercept[IllegalArgumentException] {
      VersionLog.mergeByKeyCdc(spark, dir,
        Seq((1L, "one2", "a")).toDF("k", "v", "p"), "k", "p")
    }
    assert(em.getMessage.contains("applyDeletesCommit"), em.getMessage)
    // compaction carries manifests (key lists are layout-independent)
    val (_, _, v3) = VersionLog.compactSnapshot(spark, dir,
      targetBytes = 1L << 30)
    if (v3 > v2)
      assert(VersionLog.snapshot(spark, dir, None).deletes.nonEmpty)
    assert(rows(VersionLog.read(spark, dir)) === Set(
      (1L, "one", "a"), (3L, "three", "b"), (4L, "four", "b")))
    // the fold rewrites ONLY files holding deleted keys, clears the
    // manifests, and the raw door opens again
    val before = VersionLog.snapshot(spark, dir, None)
    val (nRewritten, v4) = VersionLog.applyDeletesCommit(spark, dir)
    assert(nRewritten > 0 && v4 > v2)
    val after = VersionLog.snapshot(spark, dir, None)
    assert(after.deletes.isEmpty)
    // untouched files carried by reference (p=b never held 2 or 6
    // post-compact grouping — assert at least one carry exists)
    assert(before.files.toSet.intersect(after.files.toSet).nonEmpty,
      "files without deleted keys must carry by reference")
    assert(rows(VersionLog.read(spark, dir)) === Set(
      (1L, "one", "a"), (3L, "three", "b"), (4L, "four", "b")))
    assert(spark.read.format("graft").load(dir).count() === 3L)
    // pre-fold versions still time-travel: v1 whole, v2 masked
    assert(rows(VersionLog.read(spark, dir, Some(1L))).size === 5)
    assert(rows(VersionLog.read(spark, dir, Some(2L))) === Set(
      (1L, "one", "a"), (3L, "three", "b"), (4L, "four", "b")))
    // a merge works again after the fold
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((1L, "one2", "a")).toDF("k", "v", "p"), "k", "p")
    assert(rows(VersionLog.read(spark, dir)).contains((1L, "one2", "a")))
    // vacuum ages out the manifests once no retained version refers
    val vic = VersionLog.vacuumVersions(spark, dir, keepLast = 1,
      ttlMs = 0L)
    assert(vic.exists(_.startsWith("deletes/")),
      s"unreferenced delete manifests must vacuum, got $vic")
  }

  test("TYPE-WIDENING evolution: int->long and float->double appends " +
      "read back wide in both doors; incompatible changes reject " +
      "loudly with the old data intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vwiden").toString
    VersionLog.init(spark, dir,
      Seq((1, 1.5f, "a")).toDF("n", "x", "p"), partitionBy = Some("p"))
    // widening append: n int->long, x float->double
    VersionLog.append(spark, dir,
      Seq((5000000000L, 2.25d, "b")).toDF("n", "x", "p"),
      partitionBy = Some("p"))
    for (df <- Seq(VersionLog.read(spark, dir),
        spark.read.format("graft").load(dir))) {
      assert(df.schema("n").dataType ===
        org.apache.spark.sql.types.LongType)
      assert(df.schema("x").dataType ===
        org.apache.spark.sql.types.DoubleType)
      assert(df.select($"n", $"x").as[(Long, Double)].collect().toSet
        === Set((1L, 1.5d), (5000000000L, 2.25d)))
    }
    // a merge against the widened table writes the wide schema
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((1L, 9.5d, "a")).toDF("n", "x", "p"), "n", "p")
    assert(VersionLog.read(spark, dir).select($"n", $"x")
      .as[(Long, Double)].collect().toSet ===
      Set((1L, 9.5d), (5000000000L, 2.25d)))
    // an incompatible change (long -> string) is refused loudly
    VersionLog.append(spark, dir,
      Seq(("oops", 1.0d, "c")).toDF("n", "x", "p"),
      partitionBy = Some("p"))
    val e = intercept[IllegalArgumentException] {
      VersionLog.read(spark, dir).collect()
    }
    assert(e.getMessage.contains("incompatible types"), e.getMessage)
    // ...and time travel to the pre-damage version still reads whole
    assert(VersionLog.read(spark, dir, Some(3L)).count() === 2L)
  }

  test("MODEL-CHECKED lifecycle: 40 random merge/append/delete/compact/" +
      "vacuum/delete-where/update-where/RENAME/NESTED-RENAME steps " +
      "match an in-memory model at every version — under column " +
      "mapping, every older version reads with ITS OWN names, " +
      "top-level AND nested") {
    import spark.implicits._
    // The strongest correctness artifact for a mutation protocol: a
    // seeded random walk over the whole operation surface, where after
    // EVERY step the live table equals an independently-maintained
    // in-memory model, and a randomly chosen RETAINED older version
    // still equals the model as it was when that version committed —
    // read under the logical column name THAT version declared (the
    // walk renames the value column mid-history, so every other door
    // is exercised against a mapped table). A lost survivor, leaked
    // tombstone, double-applied batch, stale compaction carry,
    // over-eager vacuum, or a name-scrambling mapping breaks the walk
    // at the step that introduced it.
    val rng = new scala.util.Random(20260815L)
    val dir = Files.createTempDirectory("vmodel").toString
    val parts = Vector("a", "b", "c", "d")
    var vCol = "v" // the value column's CURRENT logical name
    var tagCol = "tag" // the NESTED field's current name (meta.tag)
    // the nested invariant: meta.<tagCol> always MIRRORS the value
    // column — every write door must carry the struct through its
    // mapping, so a scrambled nested rebuild or a lost nested rename
    // breaks the walk at the step that introduced it
    def df(rows: Seq[(Long, String, String)]) =
      rows.toDF("k", vCol, "p")
        .withColumn("meta", struct(col(vCol).as(tagCol)))
    var model = (0L until 12L).map(k =>
      k -> (s"v$k", parts((k % 4).toInt))).toMap
    VersionLog.init(spark, dir,
      df(model.toSeq.map { case (k, (v, p)) => (k, v, p) }),
      partitionBy = Some("p"))
    val history = scala.collection.mutable.Map(
      1L -> ((model, vCol, tagCol))) // version -> (state, names)
    var nextFreshKey = 1000L
    def liveEquals(m: Map[Long, (String, String)], name: String,
        tagName: String, version: Option[Long]): Unit = {
      val rowsGot = VersionLog.read(spark, dir, version)
        .select($"k", col(name), $"p", col(s"meta.$tagName"))
        .as[(Long, String, String, String)].collect()
      val got = rowsGot.map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === m, s"divergence at version $version")
      rowsGot.foreach(r => assert(r._4 === r._2,
        s"nested meta.$tagName diverged from $name at k=${r._1}, " +
          s"version $version"))
    }
    for (step <- 1 to 40) {
      rng.nextInt(10) match {
        case 0 | 1 => // upsert merge: random keys, some moving partition
          val keys = rng.shuffle(model.keys.toVector)
            .take(1 + rng.nextInt(4))
          val batch = keys.map(k =>
            (k, s"s$step-$k", parts(rng.nextInt(4)))) ++
            (if (rng.nextBoolean()) { // plus one insert
              nextFreshKey += 1
              Seq((nextFreshKey, s"s$step-new", parts(rng.nextInt(4))))
            } else Nil)
          val (_, _, v) = VersionLog.mergeByKeyCdc(spark, dir,
            df(batch), "k", "p")
          model = model ++ batch.map(r => r._1 -> (r._2, r._3))
          history(v) = (model, vCol, tagCol)
        case 2 => // tombstone merge: delete a few existing keys
          val doomed = rng.shuffle(model.keys.toVector)
            .take(1 + rng.nextInt(3))
          val batch = doomed.map(k => (k, "x", "zz", true))
            .toDF("k", vCol, "p", "_del")
            .withColumn("meta", struct(col(vCol).as(tagCol)))
          val (_, _, v) = VersionLog.mergeByKeyCdc(spark, dir, batch,
            "k", "p", deleteWhen = Some($"_del"))
          model = model -- doomed
          history(v) = (model, vCol, tagCol)
        case 3 => // append fresh keys
          val fresh = (1 to 1 + rng.nextInt(3)).map { _ =>
            nextFreshKey += 1
            (nextFreshKey, s"a$step", parts(rng.nextInt(4)))
          }
          val v = VersionLog.append(spark, dir, df(fresh),
            partitionBy = Some("p"))
          model = model ++ fresh.map(r => r._1 -> (r._2, r._3))
          history(v) = (model, vCol, tagCol)
        case 4 => // compaction: content must be invariant
          val (_, _, v) = VersionLog.compactSnapshot(spark, dir,
            targetBytes = 1L << 30)
          history(v) = (model, vCol, tagCol) // no-op if v recorded
        case 5 => // vacuum: retained history only shrinks
          val retained = VersionLog.listVersions(spark, dir)
            .takeRight(3).toSet
          VersionLog.vacuumVersions(spark, dir, keepLast = 3, ttlMs = 0L)
          history.keys.toSeq.filterNot(retained).foreach(history.remove)
        case 6 => // SQL DELETE: copy-on-write predicate delete
          val m = 2 + rng.nextInt(4)
          val r = rng.nextInt(m)
          val (n, v) = VersionLog.deleteWhereCommit(spark, dir,
            $"k" % m === r)
          val doomed = model.keys.filter(_ % m == r)
          assert(n === doomed.size.toLong,
            s"delete-where step $step: counted $n, model ${doomed.size}")
          model = model -- doomed
          history(v) = (model, vCol, tagCol)
        case 7 => // SQL UPDATE: old-row assignment over a predicate —
          // the value column AND its nested mirror update together
          // (both assignments see the OLD row, so they stay equal)
          val m = 2 + rng.nextInt(4)
          val r = rng.nextInt(m)
          val (n, v) = VersionLog.updateWhereCommit(spark, dir,
            Seq(vCol -> concat(col(vCol), lit(s"+u$step")),
              "meta" -> struct(concat(col(vCol), lit(s"+u$step"))
                .as(tagCol))),
            $"k" % m === r)
          val hit = model.filter { case (k, _) => k % m == r }
          assert(n === hit.size.toLong,
            s"update-where step $step: counted $n, model ${hit.size}")
          model = model ++ hit.map { case (k, (vv, p)) =>
            k -> (vv + s"+u$step", p) }
          history(v) = (model, vCol, tagCol)
        case 8 => // RENAME the value column: metadata-only commit —
          // every later door must keep working through the mapping
          val next = s"v_r$step"
          val v = VersionLog.alterRenameColumnCommit(spark, dir,
            vCol, next)
          vCol = next
          history(v) = (model, vCol, tagCol)
        case 9 => // NESTED RENAME of meta.<tag>: metadata-only — every
          // later door carries the struct through the dotted mapping
          val next = s"tag_r$step"
          val v = VersionLog.alterRenameColumnCommit(spark, dir,
            s"meta.$tagCol", next)
          tagCol = next
          history(v) = (model, vCol, tagCol)
      }
      liveEquals(model, vCol, tagCol, None)
      // a random RETAINED older version must still read as it was,
      // under the logical names IT declared (top-level AND nested)
      val vs = VersionLog.listVersions(spark, dir)
        .filter(history.contains)
      val probe = vs(rng.nextInt(vs.size))
      val (pm, pName, pTag) = history(probe)
      liveEquals(pm, pName, pTag, Some(probe))
    }
  }

  test("feed-inversion time travel agrees with version-id time travel " +
      "(snapshotBefore over the feed == read of the parent version)") {
    import spark.implicits._
    val dir = seed()
    val (_, feed, _) = VersionLog.mergeByKeyCdc(spark, dir,
      Seq((2L, "two2", "a", false), (8L, "eight", "d", false),
        (4L, "x", "zz", true)).toDF("k", "v", "p", "_del"),
      "k", "p", deleteWhen = Some($"_del"))
    val byFeed = graft.io.MergeInto.snapshotBefore(
      VersionLog.read(spark, dir), feed, "k")
    assert(rows(byFeed) === rows(VersionLog.read(spark, dir, Some(1L))))
  }

  test("overwritePartitions: replaces exactly the named partitions as " +
      "one commit (untouched files carry by reference), drains on an " +
      "empty slice, and refuses out-of-scope rows loudly") {
    import spark.implicits._
    val dir = seed() // a:{1,2} b:{3,4} c:{6}
    val before = VersionLog.snapshot(spark, dir, None)
    val v = VersionLog.overwritePartitions(spark, dir,
      Seq((10L, "ten", "a"), (11L, "eleven", "a")).toDF("k", "v", "p"),
      "p", Seq("a"))
    assert(v === 2L)
    assert(rows(VersionLog.read(spark, dir)) === Set(
      (10L, "ten", "a"), (11L, "eleven", "a"), (3L, "three", "b"),
      (4L, "four", "b"), (6L, "six", "c")))
    val after = VersionLog.snapshot(spark, dir, None)
    assert(after.action === "overwrite_where")
    // b/c files carried by REFERENCE; every a-file is new
    val untouched = before.files.filterNot(_.contains("/p=a/"))
    assert(untouched.toSet.subsetOf(after.files.toSet))
    assert(after.files.filter(_.contains("/p=a/"))
      .forall(f => !before.files.contains(f)))
    // time travel: the parent still reads whole
    assert(rows(VersionLog.read(spark, dir, Some(1L))) === Set(
      (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"),
      (4L, "four", "b"), (6L, "six", "c")))
    // an empty slice legitimately DRAINS the partition
    VersionLog.overwritePartitions(spark, dir,
      Seq.empty[(Long, String, String)].toDF("k", "v", "p"),
      "p", Seq("c"))
    assert(rows(VersionLog.read(spark, dir))
      .forall { case (_, _, p) => p != "c" })
    // rows outside the replaced scope: loud refusal, nothing committed
    val vNow = VersionLog.snapshot(spark, dir, None).version
    val e = intercept[IllegalArgumentException] {
      VersionLog.overwritePartitions(spark, dir,
        Seq((9L, "nine", "zz")).toDF("k", "v", "p"), "p", Seq("a"))
    }
    assert(e.getMessage.contains("outside the replaced partitions"))
    assert(VersionLog.snapshot(spark, dir, None).version === vNow)
  }

  test("CHECK constraints: ADD validates existing rows, every write " +
      "door gates its batch at commit time (NULL = violation), DROP " +
      "lifts, constraints carry across commits and clones") {
    import spark.implicits._
    val dir = seed() // k in {1,2,3,4,6}
    // a constraint the CURRENT state violates is refused outright
    val e0 = intercept[IllegalArgumentException] {
      VersionLog.addConstraintCommit(spark, dir, "k_big", "k > 3")
    }
    assert(e0.getMessage.contains("CHECK constraint k_big"))
    assert(VersionLog.snapshot(spark, dir, None).version === 1L)
    val v = VersionLog.addConstraintCommit(spark, dir, "k_pos",
      "k > 0 AND v IS NOT NULL")
    assert(v === 2L)
    val before = rows(VersionLog.read(spark, dir))
    // violating append: loud, nothing committed
    val e1 = intercept[IllegalArgumentException] {
      VersionLog.append(spark, dir,
        Seq((-1L, "neg", "a")).toDF("k", "v", "p"), Some("p"))
    }
    assert(e1.getMessage.contains("CHECK constraint k_pos"))
    // NULL is a violation (strict CHECK doubles as NOT NULL)
    intercept[IllegalArgumentException] {
      VersionLog.append(spark, dir,
        Seq((7L, null: String, "a")).toDF("k", "v", "p"), Some("p"))
    }
    // the merge door gates its upserts too
    intercept[IllegalArgumentException] {
      VersionLog.mergeByKeyCdc(spark, dir,
        Seq((-5L, "bad", "a")).toDF("k", "v", "p"), "k", "p")
    }
    assert(VersionLog.snapshot(spark, dir, None).version === 2L)
    assert(rows(VersionLog.read(spark, dir)) === before)
    // a valid append passes and CARRIES the constraint forward
    assert(VersionLog.append(spark, dir,
      Seq((8L, "eight", "a")).toDF("k", "v", "p"), Some("p")) === 3L)
    assert(VersionLog.snapshot(spark, dir, None).constraints ===
      Seq("k_pos" -> "k > 0 AND v IS NOT NULL"))
    // a clone inherits the contract
    val cdir = Files.createTempDirectory("vcons").toString + "/t"
    VersionLog.cloneTable(spark, dir, cdir)
    intercept[IllegalArgumentException] {
      VersionLog.append(spark, cdir,
        Seq((-2L, "neg", "a")).toDF("k", "v", "p"), Some("p"))
    }
    // DROP lifts the gate
    VersionLog.dropConstraintCommit(spark, dir, "k_pos")
    assert(VersionLog.append(spark, dir,
      Seq((-1L, "neg", "a")).toDF("k", "v", "p"), Some("p")) === 5L)
  }

  test("shallow clone: zero data copy (hard links), free divergence " +
      "after the clone, and vacuum on either side cannot break the " +
      "other") {
    import spark.implicits._
    val src = seed()
    VersionLog.setTablePropertiesCommit(spark, src,
      Seq("graft.retentionHours" -> "24"))
    val dst = Files.createTempDirectory("vclone").toString + "/t"
    val v = VersionLog.cloneTable(spark, src, dst)
    assert(v === 1L)
    assert(VersionLog.snapshot(spark, dst, None).action === "clone")
    // the clone carries the source's TBLPROPERTIES (policy travels
    // with the table)
    assert(VersionLog.tableProperty(spark, dst,
      "graft.retentionHours") === Some("24"))
    val original = rows(VersionLog.read(spark, src))
    assert(rows(VersionLog.read(spark, dst)) === original)
    // zero-copy: every cloned file is the SAME bytes (a hard link —
    // nlink >= 2 proves no data was copied)
    VersionLog.snapshot(spark, dst, None).files.foreach { f =>
      val n = java.nio.file.Files.getAttribute(
        java.nio.file.Paths.get(s"$dst/$f"), "unix:nlink")
        .asInstanceOf[Number].intValue
      assert(n >= 2, s"$f must be hard-linked (nlink=$n)")
    }
    // divergence: a merge into the CLONE leaves the source
    // byte-identical (same snapshot file list, same rows)
    val srcFiles = VersionLog.snapshot(spark, src, None).files
    VersionLog.mergeByKeyCdc(spark, dst,
      Seq((2L, "two2", "a", false), (9L, "nine", "d", false))
        .toDF("k", "v", "p", "_del"),
      "k", "p", deleteWhen = Some($"_del"))
    assert(rows(VersionLog.read(spark, src)) === original)
    assert(VersionLog.snapshot(spark, src, None).files === srcFiles)
    val cloneRows = rows(VersionLog.read(spark, dst))
    assert(cloneRows === Set((1L, "one", "a"), (2L, "two2", "a"),
      (3L, "three", "b"), (4L, "four", "b"), (6L, "six", "c"),
      (9L, "nine", "d")))
    // the source overwrites and HARD-vacuums: the clone's links keep
    // its bytes alive — no cross-table GC hazard
    VersionLog.overwrite(spark, src,
      Seq((100L, "hundred", "z")).toDF("k", "v", "p"), Some("p"))
    VersionLog.vacuumVersions(spark, src, keepLast = 1, ttlMs = 0L)
    assert(rows(VersionLog.read(spark, dst)) === cloneRows)
  }

  test("rebase vetting reads per-commit DIFFS, not snapshots: " +
      "interleaved() equals the consecutive-snapshot file diffs " +
      "across a mixed delta/full-form history (append, merge, " +
      "overwrite, compact)") {
    import spark.implicits._
    val dir = seed() // v1 (full-form init)
    VersionLog.append(spark, dir,
      Seq((10L, "ten", "a")).toDF("k", "v", "p"), Some("p")) // v2 delta
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((10L, "ten2", "a", false)).toDF("k", "v", "p", "_del"),
      "k", "p", deleteWhen = Some($"_del")) // v3 delta
    VersionLog.overwrite(spark, dir,
      Seq((99L, "ninetynine", "z")).toDF("k", "v", "p"),
      Some("p")) // v4 FULL-FORM (diff >= list)
    VersionLog.append(spark, dir,
      Seq((100L, "hundred", "z")).toDF("k", "v", "p"), Some("p")) // v5
    val v1 = VersionLog.snapshot(spark, dir, Some(1L))
    val latest = VersionLog.snapshot(spark, dir, None)
    val got = VersionLog.interleaved(spark, dir, v1, latest)
    assert(got.map(_.version) === Seq(2L, 3L, 4L, 5L))
    assert(got.map(_.action) ===
      Seq("append", "merge", "overwrite", "append"))
    // every diff equals the consecutive snapshots' set difference
    for ((ic, v) <- got.zip(2L to 5L)) {
      val prev = VersionLog.snapshot(spark, dir, Some(v - 1)).files.toSet
      val cur = VersionLog.snapshot(spark, dir, Some(v)).files.toSet
      assert(ic.added.toSet === cur -- prev, s"added of v$v")
      assert(ic.removed.toSet === prev -- cur, s"removed of v$v")
      assert(ic.version === v)
    }
    // the result is a dedicated diff type, NOT a TableSnapshot: a vet
    // can never mistake an intermediate commit's empty placeholder
    // fields for resolved state (vets read resolved constraints/
    // deletes/colMap from the `latest` snapshot they are handed)
    assert(got.forall(
      _.isInstanceOf[VersionLog.InterleavedCommit]))
  }

  test("in-commit timestamps: TIMESTAMP AS OF survives an " +
      "mtime-destroying copy (the stored instant wins over the " +
      "version file's mtime); pre-r15 files without the field fall " +
      "back to mtime under the monotonic clamp") {
    import spark.implicits._
    val before = System.currentTimeMillis()
    val dir = seed() // v1
    VersionLog.append(spark, dir,
      Seq((10L, "ten", "a")).toDF("k", "v", "p"), Some("p")) // v2
    VersionLog.append(spark, dir,
      Seq((11L, "eleven", "b")).toDF("k", "v", "p"), Some("p")) // v3
    val after = System.currentTimeMillis()
    val stored = VersionLog.commitTimestamps(spark, dir)
    assert(stored.map(_._1) === Seq(1L, 2L, 3L))
    assert(stored.forall { case (_, t) => t >= before && t <= after },
      s"stored instants $stored outside [$before, $after]")
    assert(stored.map(_._2) === stored.map(_._2).sorted)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def vfile(v: Int) =
      new org.apache.hadoop.fs.Path(dir, f"_versions/v-$v%08d.json")
    def pin(v: Int, ms: Long): Unit = fs.setTimes(vfile(v), ms, -1)
    // a copy/backup tool that does not preserve mtimes: every answer
    // below must be UNCHANGED (the r14 mtime convention shifted them)
    pin(1, 1000000L); pin(2, 999000L); pin(3, 2000000L)
    assert(VersionLog.commitTimestamps(spark, dir) === stored,
      "TIMESTAMP AS OF resolution must not depend on file mtimes")
    assert(VersionLog.versionAtTimestamp(spark, dir,
      stored(1)._2) === 2L)
    assert(VersionLog.versionAtTimestamp(spark, dir,
      stored(2)._2 + 1000L) === 3L)
    val e = intercept[IllegalArgumentException] {
      VersionLog.versionAtTimestamp(spark, dir, stored.head._2 - 1L)
    }
    assert(e.getMessage.contains("predates the first retained commit"))
    // DESCRIBE HISTORY surfaces the stored instants
    assert(VersionLog.history(spark, dir)
      .select(col("commit_ts")).collect()
      .map(_.getTimestamp(0).getTime).toSeq === stored.map(_._2))
    // pre-r15 files carry no "ts" — simulate by stripping the field;
    // resolution falls back to mtime, clamped monotonic (v2's wall
    // clock skewed behind v1's: a racing writer's host ran behind)
    for (v <- 1 to 3) {
      val in = fs.open(vfile(v))
      val json = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val stripped = json.replaceFirst("\"ts\":\\d+,", "")
      assert(stripped != json, s"v$v carried no ts field")
      fs.delete(vfile(v), false)
      val out = fs.create(vfile(v), false)
      try out.write(stripped.getBytes(
        java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    }
    pin(1, 1000000L); pin(2, 999000L); pin(3, 2000000L)
    assert(VersionLog.commitTimestamps(spark, dir) ===
      Seq((1L, 1000000L), (2L, 1000001L), (3L, 2000000L)))
    assert(VersionLog.versionAtTimestamp(spark, dir, 1000001L) === 2L)
  }

  /** Run `a` and `b` on two threads whose data batches are GATED on a
    * shared barrier inside a UDF: both writers resolve their parent
    * snapshot and write their batch before EITHER can commit, so the
    * commit CAS race is deterministic — one of them must lose and
    * rebase (or abort). Returns (resultA, resultB) as Try.
    */
  private def race[A, B](a: => A, b: => B):
      (scala.util.Try[A], scala.util.Try[B]) = {
    val ta = new java.util.concurrent.FutureTask(() => a)
    val tb = new java.util.concurrent.FutureTask(() => b)
    new Thread(ta).start(); new Thread(tb).start()
    def get[T](t: java.util.concurrent.FutureTask[T]) =
      scala.util.Try(t.get(120, java.util.concurrent.TimeUnit.SECONDS))
        .recoverWith { case e: java.util.concurrent.ExecutionException =>
          scala.util.Failure(e.getCause)
        }
    (get(ta), get(tb))
  }

  /** A column that blocks until `parties` evaluations across the JVM
    * reached the gate, then stays open (re-evaluation safe) — pure
    * synchronization, value passes through.
    */
  private def gate(name: String, parties: Int)
      : org.apache.spark.sql.Column = {
    VersionLogSpec.gates.putIfAbsent(name,
      new java.util.concurrent.CountDownLatch(parties))
    udf((k: Long) => {
      val g = VersionLogSpec.gates.get(name)
      g.countDown()
      require(g.await(60, java.util.concurrent.TimeUnit.SECONDS),
        s"gate $name timed out")
      k
    }).apply(col("k"))
  }

  test("vacuum consumer-lag floor: retainFromVersion keeps everything " +
      "a lagging stream still needs; pruneCdcBatches never deletes a " +
      "batch a retained version references; a dropped version fails " +
      "LOUDLY, never silently") {
    import spark.implicits._
    val dir = seed() // v1
    VersionLog.mergeByKeyCdc(spark, dir, // v2: explicit feed batch
      Seq((1L, "one2", "a")).toDF("k", "v", "p"), "k", "p")
    for (i <- 10L to 12L) // v3..v5
      VersionLog.append(spark, dir, Seq((i, "x", "a")).toDF("k", "v", "p"),
        partitionBy = Some("p"))
    // keepLast 1 but a consumer checkpointed at offset 2: versions
    // >= 2 must survive (its next batch needs v2 as the diff parent)
    VersionLog.vacuumVersions(spark, dir, keepLast = 1, ttlMs = 0L,
      retainFromVersion = Some(2L))
    assert(VersionLog.listVersions(spark, dir) === Seq(2L, 3L, 4L, 5L))
    // the consumer resumes and reads every change it was owed
    val changes = graft.sources.GraftCdcSource.changesBetween(spark,
      dir, 2L, 5L, graft.sources.GraftCdcSource
        .changesForVersion(spark, dir, 3L)
        .withColumn("_feed_batch", lit(0L)).schema)
    assert(changes.select(col("k")).as[Long].collect().toSet ===
      Set(10L, 11L, 12L))
    // v2's merge images are REFERENCED by a retained version file:
    // pruneCdcBatches(keepLast = 0) must leave them alone
    assert(graft.io.Vacuum.pruneCdcBatches(spark, dir, keepLast = 0)
      === Nil)
    assert(graft.sources.GraftCdcSource
      .changesForVersion(spark, dir, 2L).count() === 2L) // pre+post
    // a consumer lagging BELOW retention fails loudly at resolution
    val e = intercept[Exception] {
      graft.sources.GraftCdcSource.changesForVersion(spark, dir, 1L)
    }
    assert(e.getMessage.contains("version 1 not in"), e.getMessage)
  }

  test("ALTER ADD COLUMN commit: metadata-only, reads NULL-fill, " +
      "writes populate, pre-alter versions keep their schema in the " +
      "format door too") {
    import spark.implicits._
    val dir = seed()
    val v = VersionLog.alterAddColumnCommit(spark, dir, "score",
      org.apache.spark.sql.types.DoubleType)
    assert(v === 2L)
    assert(VersionLog.snapshot(spark, dir, Some(2L)).files ===
      VersionLog.snapshot(spark, dir, Some(1L)).files)
    val t = VersionLog.read(spark, dir)
    assert(t.schema.fieldNames.toSeq === Seq("k", "v", "score", "p"))
    assert(t.filter($"score".isNotNull).count() === 0L)
    // a later append populates it; both schemas union
    VersionLog.append(spark, dir,
      Seq((9L, "nine", 0.5, "a")).toDF("k", "v", "score", "p"),
      partitionBy = Some("p"))
    assert(VersionLog.read(spark, dir).filter($"score".isNotNull)
      .select($"k").as[Long].collect().toSeq === Seq(9L))
    // time travel: version 1 has no score column, in the format door
    assert(spark.read.format("graft").option("versionAsOf", "1")
      .load(dir).schema.fieldNames.toSeq === Seq("k", "v", "p"))
    // the schema commit carries across a merge
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((1L, "one*", null.asInstanceOf[java.lang.Double], "a"))
        .toDF("k", "v", "score", "p"), "k", "p")
    assert(VersionLog.read(spark, dir).schema.fieldNames.toSeq ===
      Seq("k", "v", "score", "p"))
    intercept[IllegalArgumentException] {
      VersionLog.alterAddColumnCommit(spark, dir, "score",
        org.apache.spark.sql.types.StringType)
    }
  }

  test("racing appenders: both resolve the same parent, the CAS loser " +
      "REBASES — both land, each batch written exactly once") {
    import spark.implicits._
    val dir = seed()
    // both writers must evaluate their one-row batch (hitting the
    // barrier) before either commits — guaranteed same parent
    val dfA = Seq((100L, "A", "a")).toDF("k", "v", "p")
      .withColumn("k", gate("app", 2))
    val dfB = Seq((200L, "B", "b")).toDF("k", "v", "p")
      .withColumn("k", gate("app", 2))
    val (ra, rb) = race(
      VersionLog.append(spark, dir, dfA, Some("p")),
      VersionLog.append(spark, dir, dfB, Some("p")))
    assert(ra.isSuccess && rb.isSuccess, s"$ra / $rb")
    assert(Set(ra.get, rb.get) === Set(2L, 3L))
    val t = VersionLog.read(spark, dir)
    assert(t.filter($"k" >= 100L).select($"k").as[Long]
      .collect().toSet === Set(100L, 200L))
    assert(t.count() === 7L, "no row lost, none duplicated")
    // each writer committed exactly ONE batch write: the rebased
    // commit re-listed the already-written files (no second copy)
    val batchDirs = VersionLog.snapshot(spark, dir, None).files
      .map(_.split("/")(1)).distinct
    assert(batchDirs.length === 3, s"got $batchDirs") // seed + A + B
  }

  test("racing merge x append: disjoint partitions rebase (both land); " +
      "an overlapping-partition append makes the merge abort loudly") {
    import spark.implicits._
    // disjoint: merge touches partition a, append lands in new c2
    val dir = seed()
    val mergeBatch = Seq((1L, "one*", "a")).toDF("k", "v", "p")
      .withColumn("k", gate("mx1", 2))
    val appendBatch = Seq((300L, "C", "c2")).toDF("k", "v", "p")
      .withColumn("k", gate("mx1", 2))
    val (rm, rap) = race(
      VersionLog.mergeByKeyCdc(spark, dir, mergeBatch, "k", "p"),
      VersionLog.append(spark, dir, appendBatch, Some("p")))
    assert(rm.isSuccess && rap.isSuccess, s"$rm / $rap")
    val t = rows(VersionLog.read(spark, dir))
    assert(t.contains((1L, "one*", "a")), "merge update must land")
    assert(t.contains((300L, "C", "c2")), "append must land")
    assert(t.size === 6)
    // overlapping: the appended row lands in the merge's touched
    // partition — the loser (whichever it is) must surface a loud
    // conflict, never silently drop the other writer's row
    val dir2 = seed()
    val mergeBatch2 = Seq((1L, "one!", "a")).toDF("k", "v", "p")
      .withColumn("k", gate("mx2", 2))
    val appendBatch2 = Seq((400L, "D", "a")).toDF("k", "v", "p")
      .withColumn("k", gate("mx2", 2))
    val (rm2, rap2) = race(
      VersionLog.mergeByKeyCdc(spark, dir2, mergeBatch2, "k", "p"),
      VersionLog.append(spark, dir2, appendBatch2, Some("p")))
    // the append always lands (blind, rebases across anything); the
    // merge either won the CAS outright or aborted loudly
    if (rm2.isSuccess && rap2.isSuccess) {
      // merge won the race; append rebased on top — both visible
      val t2 = rows(VersionLog.read(spark, dir2))
      assert(t2.contains((1L, "one!", "a")) &&
        t2.contains((400L, "D", "a")))
    } else {
      assert(rap2.isSuccess, s"append must never abort: $rap2")
      val e = rm2.failed.get
      assert(e.isInstanceOf[java.util.ConcurrentModificationException] &&
        e.getMessage.contains("touched partitions"), e.toString)
      val t2 = rows(VersionLog.read(spark, dir2))
      assert(t2.contains((400L, "D", "a")))
      assert(!t2.contains((1L, "one!", "a")))
    }
  }

  test("DELTA-ENCODED commits: append version files are O(batch) not " +
      "O(table), every 16th commit checkpoints, overwrite stays " +
      "full-form, and resolution survives a lost checkpoint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vdelta").toString
    def vjson(v: Long): String = new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(
        dir, "_versions", f"v-$v%08d.json")))
    VersionLog.init(spark, dir,
      (0L until 64L).map(i => (i, s"v$i", "a")).toDF("k", "v", "p")
        .repartition(8),
      partitionBy = Some("p"))
    (1L until 20L).foreach { i =>
      VersionLog.append(spark, dir,
        Seq((1000L + i, s"n$i", "b")).toDF("k", "v", "p").coalesce(1),
        partitionBy = Some("p"))
    }
    // on-disk form: init full, appends delta — and the delta files
    // stay batch-sized while the table's file count grows
    assert(vjson(1).contains("\"files\"") && !vjson(1).contains("\"adds\""))
    (2L to 20L).foreach { v =>
      assert(vjson(v).contains("\"adds\"") && !vjson(v).contains("\"files\""),
        s"append v$v must be delta-form")
    }
    val early = vjson(2).length
    val late = vjson(20).length
    assert(math.abs(late - early) < 120,
      s"delta commit size must not grow with the table ($early -> $late)")
    // every CheckpointEvery-th commit published a full checkpoint
    val cp16 = java.nio.file.Paths.get(dir, "_versions", "c-00000016.json")
    assert(java.nio.file.Files.exists(cp16))
    // resolution agrees with ground truth at every version...
    val snap20 = VersionLog.snapshot(spark, dir, None)
    assert(snap20.version === 20L)
    assert(VersionLog.read(spark, dir).count() === 64L + 19L)
    assert(VersionLog.read(spark, dir, Some(10L)).count() === 64L + 9L)
    // ...including when the checkpoint is lost (walks to v1's full form)
    java.nio.file.Files.delete(cp16)
    assert(VersionLog.snapshot(spark, dir, Some(20L)).files ===
      snap20.files)
    // an overwrite's diff exceeds its list: full-form by construction
    VersionLog.overwrite(spark, dir,
      Seq((1L, "only", "a")).toDF("k", "v", "p").coalesce(1),
      partitionBy = Some("p"))
    assert(vjson(21).contains("\"files\"") && !vjson(21).contains("\"adds\""))
    assert(rows(VersionLog.read(spark, dir)) === Set((1L, "only", "a")))
    // the checkpoint interval is a writer-side conf: at 4, commits 24
    // and 28 checkpoint (multiples of 4 past 21); readers resolve
    // mixed-interval histories unchanged
    spark.conf.set("spark.graft.checkpointEvery", "4")
    try {
      (1L to 7L).foreach { i =>
        VersionLog.append(spark, dir,
          Seq((2000L + i, s"c$i", "b")).toDF("k", "v", "p").coalesce(1),
          partitionBy = Some("p"))
      }
      for (cv <- Seq(24L, 28L)) {
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
          dir, "_versions", f"c-$cv%08d.json")), s"missing c-$cv")
      }
      assert(VersionLog.read(spark, dir).count() === 8L)
      assert(VersionLog.read(spark, dir, Some(25L)).count() === 5L)
    } finally spark.conf.unset("spark.graft.checkpointEvery")
  }

  test("VACUUM on a delta-log history: publishes a covering checkpoint " +
      "at the oldest retained version, prunes old version+checkpoint " +
      "files, and every retained version still resolves") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vdeltavac").toString
    VersionLog.init(spark, dir,
      Seq((0L, "v0", "a")).toDF("k", "v", "p"),
      partitionBy = Some("p"))
    (1L until 20L).foreach { i =>
      VersionLog.append(spark, dir,
        Seq((i, s"v$i", "a")).toDF("k", "v", "p").coalesce(1),
        partitionBy = Some("p"))
    }
    val expect18 = VersionLog.snapshot(spark, dir, Some(18L)).files
    val victims = VersionLog.vacuumVersions(spark, dir, keepLast = 3,
      ttlMs = 0L)
    // oldest retained (18) was delta-form: a covering checkpoint must
    // exist so its resolution never walks into the pruned range
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      dir, "_versions", "c-00000018.json")))
    // the periodic checkpoint at 16 fell with its version file
    assert(victims.contains("_versions/c-00000016.json") &&
      victims.contains("_versions/v-00000016.json"))
    assert(VersionLog.snapshot(spark, dir, Some(18L)).files === expect18)
    (18L to 20L).foreach { v =>
      assert(VersionLog.read(spark, dir, Some(v)).count() === v)
    }
    // pruned versions fail loudly, exactly as before
    val e = intercept[IllegalArgumentException] {
      VersionLog.snapshot(spark, dir, Some(5L))
    }
    assert(e.getMessage.contains("version 5 not in"))
    // CDC synthesis of the oldest retained version fails LOUDLY: its
    // diff parent (17) is gone — a degraded diff would be silent
    // mirror drift (the file-level graft-versions tail, which emits
    // no row images, degrades to all-files-added instead)
    val ecdc = intercept[IllegalStateException] {
      graft.sources.GraftCdcSource.changesForVersion(spark, dir, 18L)
    }
    assert(ecdc.getMessage.contains("vacuumed"), ecdc.getMessage)
  }

  test("CYCLIC rename swap (k->tmpc, v->k, tmpc->v): the mapping " +
      "applies as ONE simultaneous projection — reads unscrambled, " +
      "writes land under the right physical names, time travel " +
      "pre-swap intact") {
    import spark.implicits._
    val dir = seed()
    VersionLog.alterRenameColumnCommit(spark, dir, "k", "tmpc") // v2
    VersionLog.alterRenameColumnCommit(spark, dir, "v", "k")    // v3
    VersionLog.alterRenameColumnCommit(spark, dir, "tmpc", "v") // v4
    // logical k now holds the old v (strings), logical v the old k
    val t = VersionLog.read(spark, dir)
    assert(t.schema("k").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(t.schema("v").dataType ===
      org.apache.spark.sql.types.LongType)
    val swapped = t.select($"v", $"k", $"p")
      .as[(Long, String, String)].collect().toSet
    assert(swapped === Set((1L, "one", "a"), (2L, "two", "a"),
      (3L, "three", "b"), (4L, "four", "b"), (6L, "six", "c")))
    // a write through the swapped mapping round-trips
    VersionLog.append(spark, dir,
      Seq(("seven", 7L, "c")).toDF("k", "v", "p"), Some("p"))
    assert(VersionLog.read(spark, dir).filter($"v" === 7L)
      .select($"k").as[String].collect().toSeq === Seq("seven"))
    // time travel reads the pre-swap names and values
    assert(rows(VersionLog.read(spark, dir, Some(1L))) ===
      Set((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"),
        (4L, "four", "b"), (6L, "six", "c")))
  }

  test("equality-delete manifests bind LOGICAL names: deleting on a " +
      "RENAMED column suppresses and folds the right rows; after a " +
      "fresh re-add of the retired name, a delete on it can never " +
      "touch the renamed column's data") {
    import spark.implicits._
    val dir = seed()
    VersionLog.alterRenameColumnCommit(spark, dir, "v", "label") // v2
    // delete keyed on the NEW logical name: read() must suppress k=2
    VersionLog.deleteKeysCommit(spark, dir,
      Seq("two").toDF("label"), "label") // v3
    assert(VersionLog.read(spark, dir).select($"k").as[Long]
      .collect().toSet === Set(1L, 3L, 4L, 6L))
    // fold: the rewrite drops exactly the manifest-deleted row
    val (nRewritten, v4) = VersionLog.applyDeletesCommit(spark, dir)
    assert(nRewritten >= 1 && v4 === 4L)
    assert(VersionLog.snapshot(spark, dir, None).deletes.isEmpty)
    assert(VersionLog.read(spark, dir)
      .select($"k", $"label").as[(Long, String)].collect().toSet ===
      Set((1L, "one"), (3L, "three"), (4L, "four"), (6L, "six")))
    // re-add the retired name 'v' (fresh physical), populate it, then
    // delete on it: only the NEW column's rows may match — the old
    // bytes (now logical `label`) must never be consulted
    VersionLog.alterAddColumnCommit(spark, dir, "v",
      org.apache.spark.sql.types.StringType) // v5
    VersionLog.append(spark, dir,
      Seq((7L, "seven", "x", "c"), (8L, "eight", "one", "c"))
        .toDF("k", "label", "v", "p"), Some("p")) // v6
    // keyed "one": matches ONLY the fresh v column's row k=8 — never
    // k=1, whose LABEL (old physical v) holds "one"
    VersionLog.deleteKeysCommit(spark, dir,
      Seq("one").toDF("v"), "v") // v7
    assert(VersionLog.read(spark, dir).select($"k").as[Long]
      .collect().toSet === Set(1L, 3L, 4L, 6L, 7L))
    // ...and the fold rewrites only the fresh row's file
    val (_, v8) = VersionLog.applyDeletesCommit(spark, dir)
    assert(v8 === 8L)
    assert(VersionLog.read(spark, dir).filter($"label" === "one")
      .select($"k").as[Long].collect().toSeq === Seq(1L))
  }

  test("case-insensitive ALTER: RENAME/DROP/RETYPE resolve the " +
      "user's spelling to the DECLARED field's exact case — the " +
      "mapping binds the real physical name, never a phantom") {
    import spark.implicits._
    val dir = seed()
    // rename spelled upper-case against a lower-case declared field
    VersionLog.alterRenameColumnCommit(spark, dir, "V", "label")
    val t = VersionLog.read(spark, dir)
    assert(t.columns.toSeq === Seq("k", "label", "p"))
    // the data flows (a wrong-cased colMap entry would null-fill)
    assert(t.select($"k", $"label").as[(Long, String)].collect().toSet
      === Set((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"),
        (6L, "six")))
    // drop spelled upper-case: the column actually disappears
    VersionLog.alterDropColumnCommit(spark, dir, "LABEL")
    assert(VersionLog.read(spark, dir).columns.toSeq === Seq("k", "p"))
  }

  test("RENAME COLUMN rewrites referencing CHECK constraints through " +
      "the mapping: the gate keeps enforcing under the new name; " +
      "non-referencing constraints keep their text byte-for-byte") {
    import spark.implicits._
    val dir = seed()
    VersionLog.addConstraintCommit(spark, dir, "kpos", "k > 0")
    VersionLog.addConstraintCommit(spark, dir, "vlen",
      "length(v) >= 3")
    VersionLog.alterRenameColumnCommit(spark, dir, "k", "id")
    val cs = VersionLog.snapshot(spark, dir, None).constraints.toMap
    assert(cs("vlen") === "length(v) >= 3",
      "non-referencing constraint must keep its original text")
    assert(!cs("kpos").contains("k >") && cs("kpos").contains("id"),
      s"kpos must rewrite to the new name, got: ${cs("kpos")}")
    // the rewritten constraint still GATES writes
    val e = intercept[IllegalArgumentException] {
      VersionLog.append(spark, dir,
        Seq((-5L, "minus", "a")).toDF("id", "v", "p"), Some("p"))
    }
    assert(e.getMessage.contains("kpos"), e.getMessage)
    VersionLog.append(spark, dir,
      Seq((9L, "nine", "a")).toDF("id", "v", "p"), Some("p"))
    assert(VersionLog.read(spark, dir).filter($"id" === 9L).count()
      === 1L)
  }

  test("constraint-SQL rewrite round-trips representative CHECK " +
      "shapes: the regenerated text parses, references the new name " +
      "only, and gates identically") {
    import spark.implicits._
    val shapes = Seq(
      "k > 0 AND length(v) < 100",
      "k IN (1, 2, 3, 6)",
      "k BETWEEN 1 AND 9",
      "coalesce(k, 0) > 0",
      "k % 2 = 0 OR v = 'one'",
      "NOT (k < 0)",
      "CASE WHEN v = 'one' THEN k > 0 ELSE k >= 0 END")
    val frame = Seq((1L, "one"), (2L, "two"), (6L, "six"))
      .toDF("id", "v")
    for (sql <- shapes) {
      val rewritten =
        VersionLog.rewriteConstraintSql(spark, sql, "k", "id")
      // parses and references only the new name
      val refs = spark.sessionState.sqlParser
        .parseExpression(rewritten).collect {
          case a: org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute => a.nameParts.head
        }
      assert(!refs.contains("k"), s"$sql -> $rewritten")
      // gates identically: evaluate original over (k, v) and the
      // rewrite over (id, v) — same verdict per row
      val orig = frame.withColumnRenamed("id", "k")
        .select(expr(sql).cast("boolean")).as[Option[Boolean]]
        .collect().toSeq
      val re = frame.select(expr(rewritten).cast("boolean"))
        .as[Option[Boolean]].collect().toSeq
      assert(orig === re, s"$sql -> $rewritten gates differently")
    }
    // a non-referencing constraint keeps its text verbatim
    assert(VersionLog.rewriteConstraintSql(spark,
      "length(v) < 100", "k", "id") === "length(v) < 100")
  }

  test("ALTER COLUMN TYPE widening: int->long is a METADATA-ONLY " +
      "commit — old int files decode into the wide schema, new long " +
      "appends land, time travel reads the narrow type, and " +
      "narrowing/cross-family retypes refuse loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vretype").toString
    VersionLog.init(spark, dir,
      Seq((1, 10, "a"), (2, 20, "b")).toDF("k", "n", "p"),
      partitionBy = Some("p"))
    val preFiles = VersionLog.snapshot(spark, dir, None).files
    val v2 = VersionLog.alterColumnTypeCommit(spark, dir, "n",
      org.apache.spark.sql.types.LongType)
    assert(v2 === 2L)
    // metadata-only: the file list is untouched
    assert(VersionLog.snapshot(spark, dir, None).files === preFiles)
    for (df <- Seq(VersionLog.read(spark, dir),
        spark.read.format("graft").load(dir))) {
      assert(df.schema("n").dataType ===
        org.apache.spark.sql.types.LongType)
    }
    // a long append beyond int range reads back whole
    VersionLog.append(spark, dir,
      Seq((3, 5000000000L, "c")).toDF("k", "n", "p"), Some("p"))
    assert(VersionLog.read(spark, dir).select($"k", $"n")
      .as[(Int, Long)].collect().toSet ===
      Set((1, 10L), (2, 20L), (3, 5000000000L)))
    // time travel to the pre-widen version reads int
    assert(VersionLog.read(spark, dir, Some(1L)).schema("n").dataType
      === org.apache.spark.sql.types.IntegerType)
    // narrowing and cross-family refuse
    for (bad <- Seq(org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.StringType))
      assert(intercept[IllegalArgumentException] {
        VersionLog.alterColumnTypeCommit(spark, dir, "n", bad)
      }.getMessage.contains("not a widening"))
    // the partition column refuses (its type comes from directory
    // inference, not files) — table partitioned by an int column
    val dir2 = Files.createTempDirectory("vretypep").toString
    VersionLog.init(spark, dir2,
      Seq((1, "x"), (2, "y")).toDF("part", "v"),
      partitionBy = Some("part"))
    assert(intercept[IllegalArgumentException] {
      VersionLog.alterColumnTypeCommit(spark, dir2, "part",
        org.apache.spark.sql.types.LongType)
    }.getMessage.contains("partition column"))
  }

  test("racing DML x append: DELETE auto-rebases across a blind " +
      "append (both land; the appended match SURVIVES — serial " +
      "DELETE-then-append); a concurrent rewrite of a victim file " +
      "aborts the loser loudly") {
    import spark.implicits._
    // a gated predicate: the first evaluation counts down the shared
    // latch, then blocks until `parties` queries arrived — so both
    // writers provably pin the SAME parent before either commits. The
    // tables are SINGLE-FILE flat layouts so each discovery scan is
    // exactly ONE task (a blocked task stops evaluating its further
    // rows, so parties must count tasks, not rows).
    def gatedPred(name: String, parties: Int, matchV: String) = {
      VersionLogSpec.gates.putIfAbsent(name,
        new java.util.concurrent.CountDownLatch(parties))
      udf((v: String) => {
        val g = VersionLogSpec.gates.get(name)
        g.countDown()
        require(g.await(60, java.util.concurrent.TimeUnit.SECONDS),
          s"gate $name timed out")
        v == matchV
      })
    }
    def flatSeed(): String = {
      val d = Files.createTempDirectory("vdml").toString
      VersionLog.init(spark, d,
        Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
          .toDF("k", "v", "p").coalesce(1))
      d
    }
    // scenario 1: DELETE races an append whose row MATCHES the
    // predicate — one blocking task each, parties 2
    val dir = flatSeed()
    val delCond = gatedPred("dml1", 2, "two")
    val appendBatch = Seq((500L, "two", "c2")).toDF("k", "v", "p")
      .coalesce(1).withColumn("k", gate("dml1", 2))
    val (rd, rap) = race(
      VersionLog.deleteWhereCommit(spark, dir, delCond($"v")),
      VersionLog.append(spark, dir, appendBatch))
    assert(rap.isSuccess, s"append must never abort: $rap")
    assert(rd.isSuccess, s"DELETE must rebase across the append: $rd")
    assert(rd.get._1 === 1L, "exactly the pinned k=2 row deleted")
    val t = rows(VersionLog.read(spark, dir))
    assert(!t.contains((2L, "two", "a")), "pinned match deleted")
    assert(t.contains((500L, "two", "c2")),
      "the concurrently-appended match survives (serial order: " +
        "DELETE, then append)")
    // scenario 2: UPDATE and DELETE both victimize the one seed file;
    // both pin v1, so the CAS loser must see its victim REWRITTEN by
    // the winner and abort loudly — never silently resurrect the
    // winner's change
    val dir2 = flatSeed()
    val updCond = gatedPred("dml2", 2, "one")
    val delCond2 = gatedPred("dml2", 2, "two")
    val (ru, rd2) = race(
      VersionLog.updateWhereCommit(spark, dir2,
        Seq("v" -> lit("ONE")), updCond($"v")),
      VersionLog.deleteWhereCommit(spark, dir2, delCond2($"v")))
    val failures = Seq(ru.failed.toOption, rd2.failed.toOption).flatten
    assert(failures.size === 1,
      s"exactly one of the two conflicting DMLs must abort: $ru / $rd2")
    assert(failures.head
      .isInstanceOf[java.util.ConcurrentModificationException],
      failures.head.toString)
    assert(failures.head.getMessage.contains("victimized"),
      failures.head.getMessage)
    val t2 = rows(VersionLog.read(spark, dir2))
    if (ru.isSuccess) // UPDATE won: k=1 stamped, k=2 intact
      assert(t2.contains((1L, "ONE", "a")) &&
        t2.contains((2L, "two", "a")))
    else // DELETE won: k=2 gone, k=1 untouched
      assert(!t2.exists(_._1 == 2L) && t2.contains((1L, "one", "a")))
  }

  test("compaction SHEDS retired physical columns: after DROP COLUMN " +
      "a repack writes files WITHOUT the dropped bytes; pre-drop " +
      "versions still time-travel to them") {
    import spark.implicits._
    val dir = seed() // v1: (k, v, p)
    VersionLog.append(spark, dir,
      Seq((7L, "seven", "a")).toDF("k", "v", "p"), Some("p")) // v2
    VersionLog.append(spark, dir,
      Seq((8L, "eight", "a")).toDF("k", "v", "p"), Some("p")) // v3
    VersionLog.alterDropColumnCommit(spark, dir, "v") // v4
    val (before, after, v5) =
      VersionLog.compactSnapshot(spark, dir, targetBytes = 1L << 30)
    assert(after < before && v5 === 5L)
    val base = dir.stripSuffix("/")
    val newFiles = VersionLog.snapshot(spark, dir, None).files
      .filter(_.startsWith(f"data/b-$v5%08d"))
    assert(newFiles.nonEmpty, "compaction must have repacked")
    newFiles.foreach { f =>
      val cols = spark.read.parquet(s"$base/$f").columns.toSet
      assert(!cols.contains("v"),
        s"repacked file $f still carries the dropped physical: $cols")
    }
    assert(VersionLog.read(spark, dir).columns.toSeq === Seq("k", "p"))
    // pre-drop versions still read the column from the OLD files
    assert(VersionLog.read(spark, dir, Some(3L))
      .filter($"v" === "seven").count() === 1L)
  }

  test("ALTER COLUMN TYPE extended matrix: int->double and decimal " +
      "growth are metadata-only; int->decimal needs enough integer " +
      "digits; long->double and date retypes refuse") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("vretype2").toString
    VersionLog.init(spark, dir,
      Seq((1, 10), (2, 20)).toDF("n", "m")
        .selectExpr("n", "m", "CAST(m AS DECIMAL(5,2)) AS dec"))
    // int -> double: old int files decode into the double schema
    VersionLog.alterColumnTypeCommit(spark, dir, "n", DoubleType)
    // decimal growth: (5,2) -> (20,4)
    VersionLog.alterColumnTypeCommit(spark, dir, "dec",
      DecimalType(20, 4))
    // int -> decimal with enough integer digits
    VersionLog.alterColumnTypeCommit(spark, dir, "m",
      DecimalType(12, 2))
    VersionLog.append(spark, dir,
      Seq((3.5d, BigDecimal("30.25"), BigDecimal("123456789.50")))
        .toDF("n", "m", "dec")
        .select($"n", $"m".cast(DecimalType(12, 2)),
          $"dec".cast(DecimalType(20, 4))))
    val t = VersionLog.read(spark, dir)
    assert(t.schema("n").dataType === DoubleType)
    assert(t.schema("m").dataType === DecimalType(12, 2))
    assert(t.schema("dec").dataType === DecimalType(20, 4))
    assert(t.agg(sum($"n")).as[Double].head() === 6.5d)
    assert(t.agg(sum($"m")).head().getDecimal(0).doubleValue ===
      60.25d)
    // refusals: lossy and unit-hazard retypes
    for ((c, bad) <- Seq(
        ("m", DecimalType(10, 4)), // integer digits shrink below int's
        ("dec", DecimalType(10, 2)), // precision narrows
        ("n", FloatType))) // narrowing
      assert(intercept[IllegalArgumentException] {
        VersionLog.alterColumnTypeCommit(spark, dir, c, bad)
      }.getMessage.contains("not a widening"), s"$c -> $bad")
    // long -> double is LOSSY and the parquet reader refuses the
    // decode — the door must refuse it up front
    val dir2 = Files.createTempDirectory("vretype3").toString
    VersionLog.init(spark, dir2, Seq((5000000000L, "x")).toDF("l", "v"))
    assert(intercept[IllegalArgumentException] {
      VersionLog.alterColumnTypeCommit(spark, dir2, "l", DoubleType)
    }.getMessage.contains("not a widening"))
  }

  test("PRECISION rebase vet for the mirror merge: a concurrent " +
      "blind append whose rows cannot satisfy the by-source clause " +
      "lands alongside the merge; one that satisfies it aborts the " +
      "merge loudly") {
    import spark.implicits._
    // by-source condition restricted to p='a': an append into a NEW
    // partition c2 with rows NOT satisfying it is provably disjoint
    val dir = seed()
    val mergeBatch = Seq((1L, "one*", "a")).toDF("k", "v", "p")
      .withColumn("k", gate("pv1", 2))
    val appendBatch = Seq((300L, "C", "c2")).toDF("k", "v", "p")
      .withColumn("k", gate("pv1", 2))
    val (rm, rap) = race(
      VersionLog.mergeByKeyCdc(spark, dir, mergeBatch, "k", "p",
        bySourceDelete = Some(col("p") === "a")),
      VersionLog.append(spark, dir, appendBatch, Some("p")))
    assert(rap.isSuccess, s"append must never abort: $rap")
    assert(rm.isSuccess,
      s"disjoint append must not abort the by-source merge: $rm")
    val t = rows(VersionLog.read(spark, dir))
    assert(t.contains((1L, "one*", "a")), "merge update must land")
    assert(t.contains((300L, "C", "c2")), "append must land")
    assert(!t.contains((2L, "two", "a")),
      "the by-source clause must delete the unmatched p=a row")
    // an append whose row SATISFIES the clause (p='a', key not in the
    // batch) must abort the merge: a serial append-then-merge would
    // have deleted it — silence either way is wrong
    val dir2 = seed()
    val mergeBatch2 = Seq((1L, "one!", "a")).toDF("k", "v", "p")
      .withColumn("k", gate("pv2", 2))
    val appendBatch2 = Seq((400L, "D", "a")).toDF("k", "v", "p")
      .withColumn("k", gate("pv2", 2))
    val (rm2, rap2) = race(
      VersionLog.mergeByKeyCdc(spark, dir2, mergeBatch2, "k", "p",
        bySourceDelete = Some(col("p") === "a")),
      VersionLog.append(spark, dir2, appendBatch2, Some("p")))
    assert(rap2.isSuccess, s"append must never abort: $rap2")
    if (rm2.isFailure) {
      val e = rm2.failed.get
      assert(e.isInstanceOf[java.util.ConcurrentModificationException],
        e.toString)
      assert(rows(VersionLog.read(spark, dir2))
        .contains((400L, "D", "a")))
    } else {
      // merge won the CAS outright; append rebased on top — both land
      val t2 = rows(VersionLog.read(spark, dir2))
      assert(t2.contains((1L, "one!", "a")) &&
        t2.contains((400L, "D", "a")))
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION rides the widen machinery for " +
      "SAME-NAME wider source columns: byte target x int source and " +
      "decimal growth land with NO declared-schema change; the read " +
      "schema widens via the footer merge; a lossy width refuses") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("vmw").toString
    val init = Seq((1L, 1, "a", "1.25"), (2L, 2, "a", "2.50"))
      .toDF("k", "score", "p", "price")
      .select($"k", $"score".cast("tinyint").as("score"), $"p",
        $"price".cast("decimal(10,2)").as("price"))
    VersionLog.init(spark, dir, init, partitionBy = Some("p"))
    val declBefore = VersionLog.snapshot(spark, dir, None).schemaJson
    // the source arrives WIDER on both axes: int where the target
    // wrote tinyint, decimal(14,4) where it wrote decimal(10,2) —
    // values past the narrow ranges prove real decoding, not luck
    val batch = Seq((2L, 70000, "a", "9999999999.1234"),
      (3L, 1000, "a", "3.0001"))
      .toDF("k", "score", "p", "price")
      .select($"k", $"score".cast("int").as("score"), $"p",
        $"price".cast("decimal(14,4)").as("price"))
    VersionLog.mergeByKeyCdc(spark, dir, batch, "k", "p",
      schemaEvolution = true)
    // metadata-only on the schema side: the union coercion wrote the
    // batch wide, the footer merge widens the READ schema — the same
    // machinery ALTER COLUMN TYPE leans on
    assert(VersionLog.snapshot(spark, dir, None).schemaJson ===
      declBefore, "a same-name wider column must not rewrite the " +
        "declared schema")
    val t = VersionLog.read(spark, dir)
    assert(t.schema("score").dataType === IntegerType)
    assert(t.schema("price").dataType === DecimalType(14, 4))
    val got = t.select($"k", $"score", $"price".cast("string"))
      .as[(Long, Int, String)].collect().toSet
    assert(got === Set((1L, 1, "1.2500"), (2L, 70000, "9999999999.1234"),
      (3L, 1000, "3.0001")))
    // untouched-partition files keep their narrow footers: add a 'b'
    // row, merge a wider batch into 'a' only, then read both
    VersionLog.append(spark, dir,
      Seq((10L, 5, "b", "5.00")).toDF("k", "score", "p", "price")
        .select($"k", $"score".cast("tinyint").as("score"), $"p",
          $"price".cast("decimal(10,2)").as("price")),
      partitionBy = Some("p"))
    assert(VersionLog.read(spark, dir).where($"p" === "b")
      .select($"score").as[Int].head() === 5)
    // LOSSY pairs refuse BEFORE any file is written: a DOUBLE source
    // where files hold LONG would coerce the touched partition and
    // leave mixed footers unreadable — the guard names the column
    val dir2 = Files.createTempDirectory("vmw2").toString
    VersionLog.init(spark, dir2,
      Seq((1L, 1L, "a")).toDF("k", "big", "p"),
      partitionBy = Some("p"))
    val before2 = VersionLog.snapshot(spark, dir2, None).version
    val e = intercept[IllegalArgumentException] {
      VersionLog.mergeByKeyCdc(spark, dir2,
        Seq((2L, 1.5, "a")).toDF("k", "big", "p"), "k", "p",
        schemaEvolution = true)
    }
    assert(e.getMessage.contains("lossless") &&
      e.getMessage.contains("big"), e.getMessage)
    assert(VersionLog.snapshot(spark, dir2, None).version === before2)
    assert(VersionLog.read(spark, dir2).count() === 1L,
      "the refused merge must leave the table readable and intact")
  }

  test("rebase vet sees MANIFEST-ONLY interleaves: a DELETE WHERE " +
      "that folded pinned equality-delete manifests into its victim " +
      "rewrite aborts when a concurrent RESTORE removes those " +
      "manifests (un-deleting keys with NO file diff to see)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vmrestore").toString
    VersionLog.init(spark, dir,
      Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
        .toDF("k", "v", "p").coalesce(1)) // v1
    VersionLog.deleteKeysCommit(spark, dir,
      Seq(1L).toDF("k"), "k") // v2: manifest suppresses k=1
    // the DELETE pins v2 (manifest outstanding) and BLOCKS inside its
    // victim-discovery scan; the main thread then RESTOREs to v1 — a
    // manifest-ONLY removal (file set identical, k=1 un-deleted). The
    // DELETE's rewrite already folded the manifest in (k=1 dropped
    // from the replacement file), so a successful rebase would lose
    // the restored row permanently in the victim while it resurrects
    // everywhere else. The vet must read the interleave's MANIFEST
    // diff and abort.
    VersionLogSpec.gates.putIfAbsent("mrestore",
      new java.util.concurrent.CountDownLatch(2))
    val pred = udf((v: String) => {
      val g = VersionLogSpec.gates.get("mrestore")
      g.countDown()
      require(g.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "gate mrestore timed out")
      v == "two"
    })
    val task = new java.util.concurrent.FutureTask(() =>
      VersionLog.deleteWhereCommit(spark, dir, pred($"v")))
    new Thread(task).start()
    val g = VersionLogSpec.gates.get("mrestore")
    val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
    while (g.getCount > 1 && System.nanoTime < deadline)
      Thread.sleep(10)
    assert(g.getCount === 1L, "DELETE never reached its discovery scan")
    VersionLog.restoreCommit(spark, dir, 1L) // v3: manifest removed
    g.countDown() // release the DELETE
    val r = scala.util.Try(
        task.get(120, java.util.concurrent.TimeUnit.SECONDS))
      .recoverWith { case e: java.util.concurrent.ExecutionException =>
        scala.util.Failure(e.getCause)
      }
    assert(r.isFailure, s"DELETE must abort on the manifest removal: $r")
    assert(r.failed.get
      .isInstanceOf[java.util.ConcurrentModificationException],
      r.failed.get.toString)
    assert(r.failed.get.getMessage.contains("folded"),
      r.failed.get.getMessage)
    // the restored table is intact: k=1 resurrected, nothing lost
    assert(rows(VersionLog.read(spark, dir)) === Set(
      (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b")))
  }

  test("timestampAsOf literals parse in the SESSION time zone and " +
      "accept date-only strings; bare digits are epoch millis") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "UTC")
      val utcMidnight = VersionLog
        .timestampLiteralMillis(spark, "2026-08-16")
      assert(utcMidnight ===
        java.time.Instant.parse("2026-08-16T00:00:00Z").toEpochMilli)
      assert(VersionLog
        .timestampLiteralMillis(spark, "2026-08-16 01:02:03") ===
        java.time.Instant.parse("2026-08-16T01:02:03Z").toEpochMilli)
      // the SESSION zone governs, not the JVM default: Tokyo midnight
      // is 9 hours before UTC midnight of the same date
      spark.conf.set(tzKey, "Asia/Tokyo")
      assert(VersionLog.timestampLiteralMillis(spark, "2026-08-16") ===
        utcMidnight - 9L * 3600 * 1000)
      // epoch millis pass through verbatim regardless of zone
      assert(VersionLog.timestampLiteralMillis(spark, "123456") ===
        123456L)
      intercept[IllegalArgumentException] {
        VersionLog.timestampLiteralMillis(spark, "not a time")
      }
    } finally spark.conf.set(tzKey, saved)
  }

  test("MERGE WITH SCHEMA EVOLUTION: a tombstone predicate that does " +
      "not analyze fails LOUDLY instead of silently auto-adding the " +
      "helper column to the table's schema") {
    import spark.implicits._
    val dir = seed()
    val decl = VersionLog.read(spark, dir).schema.fieldNames.toSeq
    val batch = Seq((2L, "two2", "a", true))
      .toDF("k", "v", "p", "_del")
    // predicate references a column the SOURCE does not carry —
    // analysis fails; pre-fix the Try(...).getOrElse(Nil) classified
    // `_del` as a table column and committed it via auto-ADD
    val e = intercept[IllegalArgumentException] {
      VersionLog.mergeByKeyCdc(spark, dir, batch, "k", "p",
        deleteWhen = Some(col("no_such_column")),
        schemaEvolution = true)
    }
    assert(e.getMessage.contains("tombstone predicate"), e.getMessage)
    assert(VersionLog.read(spark, dir).schema.fieldNames.toSeq === decl,
      "no helper/garbage column may have been auto-added")
  }

  test("RESTORE reverts TBLPROPERTIES to the restored version's map: " +
      "a policy key set after the restore point does not survive " +
      "the rollback") {
    val dir = seed()
    VersionLog.setTablePropertiesCommit(spark, dir,
      Seq("graft.retentionHours" -> "1")) // v2
    VersionLog.setTablePropertiesCommit(spark, dir,
      Seq("graft.acceptPhysicalNames" -> "true")) // v3
    VersionLog.restoreCommit(spark, dir, 2L) // v4 = v2's state
    val props = VersionLog.snapshot(spark, dir, None).properties.toMap
    assert(props === Map("graft.retentionHours" -> "1"),
      s"RESTORE must carry the TARGET version's properties, got $props")
    // and ordinary commits after the restore inherit the reverted map
    import spark.implicits._
    VersionLog.append(spark, dir,
      Seq((9L, "nine", "a")).toDF("k", "v", "p"),
      partitionBy = Some("p"))
    assert(VersionLog.snapshot(spark, dir, None).properties.toMap ===
      Map("graft.retentionHours" -> "1"))
  }

  test("property values with control characters publish VALID JSON: " +
      "the committed head stays readable and the value round-trips") {
    val dir = seed()
    val nasty = "line1\nline2\ttabbed\r\"quoted\" back\\slash "
    VersionLog.setTablePropertiesCommit(spark, dir,
      Seq("graft.comment" -> nasty, "plain" -> "ok"))
    // pre-fix this parseRaw threw (invalid JSON already CAS-published)
    // and the table head was unreadable until hand-edited
    val snap = VersionLog.snapshot(spark, dir, None)
    assert(snap.properties.toMap.apply("graft.comment") === nasty)
    assert(snap.properties.toMap.apply("plain") === "ok")
    // the next commit inherits and re-renders it — still readable
    import spark.implicits._
    VersionLog.append(spark, dir,
      Seq((9L, "nine", "a")).toDF("k", "v", "p"),
      partitionBy = Some("p"))
    assert(VersionLog.snapshot(spark, dir, None)
      .properties.toMap.apply("graft.comment") === nasty)
  }

  test("MERGE WITH SCHEMA EVOLUTION same-name guard recurses into " +
      "NESTED leaves: a lossy double x bigint mismatch inside a " +
      "struct refuses before any file is written") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vlog").toString
    VersionLog.init(spark, dir,
      Seq((1L, 10L, "m1", "a"), (2L, 20L, "m2", "b"))
        .toDF("k", "x", "w", "p")
        .select($"k", struct($"x", $"w").as("s"), $"p"),
      partitionBy = Some("p"))
    val filesBefore = VersionLog.snapshot(spark, dir, None).files
    val bad = Seq((1L, 1.5, "m1b", "a")).toDF("k", "x", "w", "p")
      .select($"k", struct($"x", $"w").as("s"), $"p")
    val e = intercept[IllegalArgumentException] {
      VersionLog.mergeByKeyCdc(spark, dir, bad, "k", "p",
        schemaEvolution = true)
    }
    assert(e.getMessage.contains("s.x"), e.getMessage)
    assert(VersionLog.snapshot(spark, dir, None).files === filesBefore,
      "the refused merge must not have committed or written files")
    // the NESTED widening direction still passes: long source into a
    // declared long is identity; int source into long upcasts
    VersionLog.mergeByKeyCdc(spark, dir,
      Seq((1L, 11, "m1b", "a")).toDF("k", "x", "w", "p")
        .select($"k", struct($"x".cast("int").as("x"), $"w").as("s"),
          $"p"),
      "k", "p", schemaEvolution = true)
    assert(VersionLog.read(spark, dir).filter($"k" === 1L)
      .select($"s.x").as[Long].head() === 11L)
  }
}

object VersionLogSpec {
  val gates = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CountDownLatch]()
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{MergeInto, MergeSql, VersionLog}

/** The graft V2 TableCatalog (catalog/GraftCatalog): the versioned
  * table as plain SQL — CREATE/CTAS/INSERT/INSERT OVERWRITE/MERGE
  * INTO/VERSION AS OF/DESCRIBE HISTORY — with reads rewritten to the
  * SAME planner-pruning V1 relation as format("graft"), and writes
  * landing as version-log commits (time travel across every one).
  */
class GraftCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", w)
    w
  }

  test("CREATE TABLE + INSERT INTO bootstraps the version log; " +
      "INSERT is an append commit; INSERT OVERWRITE replaces; " +
      "VERSION AS OF time-travels across all of it") {
    import spark.implicits._
    warehouse
    spark.sql(
      "CREATE TABLE graft.t1 (k BIGINT, v STRING, p STRING) " +
        "PARTITIONED BY (p)")
    // declared but empty: readable as an empty relation
    assert(spark.sql("SELECT * FROM graft.t1").count() === 0L)
    spark.sql("INSERT INTO graft.t1 VALUES (1, 'one', 'a'), (2, 'two', 'b')")
    assert(VersionLog.listVersions(spark, s"$warehouse/t1") === Seq(1L))
    spark.sql("INSERT INTO graft.t1 VALUES (3, 'three', 'a')")
    assert(VersionLog.listVersions(spark, s"$warehouse/t1") ===
      Seq(1L, 2L))
    assert(spark.sql("SELECT k FROM graft.t1").as[Long].collect().toSet
      === Set(1L, 2L, 3L))
    assert(spark.sql("SELECT k FROM graft.t1 VERSION AS OF 1")
      .as[Long].collect().toSet === Set(1L, 2L))
    spark.sql("INSERT OVERWRITE graft.t1 VALUES (9, 'nine', 'c')")
    assert(spark.sql("SELECT k FROM graft.t1").as[Long]
      .collect().toSet === Set(9L))
    // every prior version still reads whole (nothing was deleted)
    assert(spark.sql("SELECT k FROM graft.t1 VERSION AS OF 2")
      .as[Long].collect().toSet === Set(1L, 2L, 3L))
    // DESCRIBE HISTORY = the commit log with exact row counts
    val hist = spark.sql("DESCRIBE HISTORY graft.t1")
      .select($"version", $"action", $"n_rows")
      .as[(Long, String, Long)].collect().toSeq
    assert(hist === Seq((1L, "init", 2L), (2L, "append", 3L),
      (3L, "overwrite", 1L)))
  }

  test("CTAS initializes version 1; DROP TABLE removes the table and " +
      "its sidecars; SHOW TABLES lists it while live") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.ct AS SELECT id AS k, id % 3 AS m " +
      "FROM range(30)")
    assert(VersionLog.listVersions(spark, s"$warehouse/ct") === Seq(1L))
    assert(spark.sql("SELECT sum(k) AS s FROM graft.ct")
      .as[Long].head() === (0L until 30L).sum)
    assert(spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("ct"))
    // a sidecar sibling (as a merge would leave) goes with the table
    new java.io.File(s"$warehouse/ct._cdc/batch-00000").mkdirs()
    spark.sql("DROP TABLE graft.ct")
    assert(!new java.io.File(s"$warehouse/ct").exists())
    assert(!new java.io.File(s"$warehouse/ct._cdc").exists())
  }

  test("MERGE INTO through the catalog runs the versioned CDC merge: " +
      "stats, feed, and table state identical to the API path") {
    import spark.implicits._
    warehouse
    def seedRows = Seq((1L, "one", "a"), (2L, "two", "a"),
      (3L, "three", "b"), (4L, "four", "b"), (6L, "six", "c"))
    // API twin
    val apiDir = Files.createTempDirectory("vapi").toString
    VersionLog.init(spark, apiDir, seedRows.toDF("k", "v", "p"),
      partitionBy = Some("p"))
    val batch = Seq((2L, "two2", "a", false), (7L, "seven", "b", false),
      (4L, "gone", "zz", true)).toDF("k", "v", "p", "_del")
    val (apiStats, apiFeed, apiV) = VersionLog.mergeByKeyCdc(
      spark, apiDir, batch, "k", "p", deleteWhen = Some($"_del"))
    // catalog twin, via SQL text on a path identifier
    val sqlDir = Files.createTempDirectory("vsql").toString
    VersionLog.init(spark, sqlDir, seedRows.toDF("k", "v", "p"),
      partitionBy = Some("p"))
    batch.createOrReplaceTempView("cat_updates")
    val res = spark.sql(
      s"""MERGE INTO graft.`$sqlDir` AS t USING cat_updates AS s
          ON t.k = s.k
          WHEN MATCHED AND s._del THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
      .as[(Long, Long, Int, Int)].head()
    assert(res === ((apiV, apiStats.outputRows,
      apiStats.touchedPartitions.size, apiStats.removedPartitions.size)))
    // identical table state
    def state(d: String) = VersionLog.read(spark, d)
      .select($"k", $"v", $"p").as[(Long, String, String)]
      .collect().toSet
    assert(state(sqlDir) === state(apiDir))
    // identical feed classification (op counts and per-op key sets)
    val sqlFeed = spark.read.parquet(s"$sqlDir._cdc/batch-00000")
    def feedSig(df: org.apache.spark.sql.DataFrame) =
      df.select($"_op", $"k").as[(String, Long)].collect().toSet
    assert(feedSig(sqlFeed) === feedSig(apiFeed))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE through the catalog: the " +
      "full-sync mirror commits as ONE version, prior versions " +
      "time-travel whole, the CDC feed carries delete images for the " +
      "by-source victims, and a conditional clause leaves " +
      "out-of-scope partitions carried by reference") {
    import spark.implicits._
    warehouse
    val dir = Files.createTempDirectory("vmirror").toString
    VersionLog.init(spark,
      dir, Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"),
        (4L, "four", "b"), (6L, "six", "c"), (8L, "eight", "d"))
        .toDF("k", "v", "p"), partitionBy = Some("p"))
    val v1Files = VersionLog.snapshot(spark, dir, None).files
    Seq((2L, "two2", "a", false), (7L, "seven", "b", false),
        (6L, "gone", "zz", true)).toDF("k", "v", "p", "_del")
      .createOrReplaceTempView("mirror_cat_v")
    spark.sql(
      s"""MERGE INTO graft.`$dir` AS t USING mirror_cat_v AS s
          ON t.k = s.k
          WHEN MATCHED AND s._del THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND t.p = 'b' THEN DELETE""")
    assert(VersionLog.read(spark, dir).select($"k", $"v", $"p")
      .as[(Long, String, String)].collect().toSet ===
      Set((1L, "one", "a"), (2L, "two2", "a"), (7L, "seven", "b"),
        (8L, "eight", "d")))
    // one commit; the pre-mirror version reads whole
    assert(VersionLog.listVersions(spark, dir) === Seq(1L, 2L))
    assert(VersionLog.read(spark, dir, Some(1L)).count() === 6L)
    // p=d (no upsert, no victim): carried by reference in the new list
    val v2 = VersionLog.snapshot(spark, dir, None)
    assert(v1Files.filter(_.contains("p=d")).toSet.subsetOf(
      v2.files.toSet), "out-of-scope partition must carry by reference")
    // feed images: by-source victims are `delete` rows with before
    // images, same shape as tombstone deletes (graft-cdc door)
    val feed = spark.read.format("graft-cdc").load(dir)
      .filter($"_feed_batch" === 2L)
    assert(feed.select($"_op", $"k").as[(String, Long)].collect()
      .toSet === Set(("update_pre", 2L), ("update_post", 2L),
      ("insert", 7L), ("delete", 6L), ("delete", 3L), ("delete", 4L)))
    assert(feed.filter($"_op" === "delete" && $"k" === 4L)
      .select($"v", $"p").as[(String, String)].head() ===
      (("four", "b")))
    // UNCONDITIONAL mirror: the table becomes exactly the source's
    // upserts (every uncovered key deleted, wherever it lives)
    val dir2 = Files.createTempDirectory("vmirror2").toString
    VersionLog.init(spark, dir2,
      Seq((1L, "one", "a"), (2L, "two", "a"), (9L, "nine", "z"))
        .toDF("k", "v", "p"), partitionBy = Some("p"))
    spark.sql(
      s"""MERGE INTO graft.`$dir2` AS t USING mirror_cat_v AS s
          ON t.k = s.k
          WHEN MATCHED AND s._del THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(VersionLog.read(spark, dir2).select($"k", $"v", $"p")
      .as[(Long, String, String)].collect().toSet ===
      Set((2L, "two2", "a"), (7L, "seven", "b")))
    // UPDATE form: flag stale rows instead of deleting them — the
    // Delta "mark rows the source no longer covers" pattern
    val dir3 = Files.createTempDirectory("vmirror3").toString
    VersionLog.init(spark, dir3,
      Seq((1L, "one", "a"), (2L, "two", "a"), (9L, "nine", "z"))
        .toDF("k", "v", "p"), partitionBy = Some("p"))
    spark.sql(
      s"""MERGE INTO graft.`$dir3` AS t USING mirror_cat_v AS s
          ON t.k = s.k
          WHEN MATCHED AND s._del THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND t.p = 'z'
            THEN UPDATE SET v = 'stale'""")
    assert(VersionLog.read(spark, dir3).select($"k", $"v", $"p")
      .as[(Long, String, String)].collect().toSet ===
      Set((1L, "one", "a"), (2L, "two2", "a"), (7L, "seven", "b"),
        (9L, "stale", "z")))
    // feed carries update images for the flagged stale row
    val feed3 = spark.read.format("graft-cdc").load(dir3)
      .filter($"_feed_batch" === 2L && $"k" === 9L)
    assert(feed3.select($"_op", $"v").as[(String, String)].collect()
      .toSet === Set(("update_pre", "nine"), ("update_post", "stale")))
  }

  test("catalog reads plan through the SHARED pruning FileIndex: a " +
      "partition predicate reduces the scan's file count") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.pp (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.pp VALUES " +
      "(1, 'a'), (2, 'a'), (3, 'b'), (4, 'c')")
    val pruned = spark.sql("SELECT k FROM graft.pp WHERE p = 'a'")
    // execute pruned ITSELF (.as[] re-plans from the logical plan and
    // would leave these metrics at a trivially-passing zero)
    assert(pruned.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "catalog read must plan a V1 file scan " +
      "(the shared GraftFileIndex), got:\n" +
      pruned.queryExecution.executedPlan)
    val total = VersionLog.snapshot(spark, s"$warehouse/pp", None)
      .files.size
    val opened = scans.map(_.metrics("numFiles").value).sum
    assert(opened > 0 && opened < total,
      s"partition pruning must open 0 < n < $total files, opened $opened")
  }

  test("WRITE-TIME stats prune through the SQL door too: a point " +
      "predicate on a FLAT catalog table opens one file out of many, " +
      "with no manifest ever built") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.skipsql (k BIGINT, v STRING)")
    // four range-disjoint append commits = four boxed files
    for (lo <- Seq(0L, 100L, 200L, 300L)) {
      spark.createDataset((lo until lo + 100L).map(i => (i, s"v$i")))
        .toDF("k", "v").coalesce(1)
        .createOrReplaceTempView("skip_batch")
      spark.sql("INSERT INTO graft.skipsql SELECT * FROM skip_batch")
    }
    val dir = s"$warehouse/skipsql"
    assert(VersionLog.snapshot(spark, dir, None).files.size === 4)
    val hit = spark.sql("SELECT v FROM graft.skipsql WHERE k = 250")
    // execute hit ITSELF: .as[String] re-plans from the logical plan,
    // leaving hit's own metrics untouched
    assert(hit.collect().map(_.getString(0)).toSeq === Seq("v250"))
    val scans = hit.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.nonEmpty)
    assert(scans.map(_.metrics("numFiles").value).sum === 1L,
      "the k box must prune to one file through the catalog door")
  }

  test("maintenance as SQL statements: ALTER TABLE ADD/DROP " +
      "CONSTRAINT gates every insert door; OPTIMIZE compacts as one " +
      "commit; VACUUM RETAIN n VERSIONS sweeps unreferenced files") {
    import spark.implicits._
    warehouse
    // constraints through SQL text
    spark.sql("CREATE TABLE graft.cons (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.cons VALUES (1, 'a')")
    spark.sql(
      "ALTER TABLE graft.cons ADD CONSTRAINT k_pos CHECK (k > 0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.cons VALUES (-1, 'b')")
    }
    assert(e.getMessage.contains("CHECK constraint k_pos"),
      e.getMessage)
    spark.sql("ALTER TABLE graft.cons DROP CONSTRAINT k_pos")
    spark.sql("INSERT INTO graft.cons VALUES (-1, 'b')")
    assert(spark.sql("SELECT count(*) AS c FROM graft.cons")
      .as[Long].head() === 2L)
    // OPTIMIZE: three tiny appended batches bin-pack to one file
    spark.sql("CREATE TABLE graft.frag AS SELECT id AS k FROM range(100)")
    spark.sql("INSERT INTO graft.frag SELECT id + 100 FROM range(100)")
    spark.sql("INSERT INTO graft.frag SELECT id + 200 FROM range(100)")
    val fragDir = s"$warehouse/frag"
    val filesBefore = VersionLog.snapshot(spark, fragDir, None).files.size
    val (ov, ob, oa) = spark.sql("OPTIMIZE graft.frag")
      .as[(Long, Long, Long)].head()
    assert(ob === filesBefore.toLong && oa === 1L && ov === 4L)
    assert(spark.sql("SELECT count(*) AS c, sum(k) AS s FROM graft.frag")
      .as[(Long, Long)].head() === ((300L, (0L until 300L).sum)))
    // VACUUM DRY RUN: the exact preview, nothing touched
    val (preview, wasDry) = spark
      .sql("VACUUM graft.frag RETAIN 1 VERSIONS DRY RUN")
      .as[(Long, Boolean)].head()
    assert(preview > 0L && wasDry)
    assert(VersionLog.listVersions(spark, fragDir) ===
      Seq(1L, 2L, 3L, 4L), "DRY RUN must delete nothing")
    // VACUUM: only the latest version retained; retired files swept
    val removed = spark.sql("VACUUM graft.frag RETAIN 1 VERSIONS")
      .select($"removed_files").as[Long].head()
    assert(removed === preview,
      "the dry run must preview exactly the real sweep")
    assert(VersionLog.listVersions(spark, fragDir) === Seq(4L))
    assert(spark.sql("SELECT count(*) AS c FROM graft.frag")
      .as[Long].head() === 300L)
    // VACUUM RETAIN n HOURS (Delta's default unit): every commit is
    // seconds old, so a 1-hour window retains ALL versions — nothing
    // sweeps; a fresh history proves the time-based floor holds
    spark.sql("CREATE TABLE graft.vh AS SELECT id AS k FROM range(10)")
    spark.sql("INSERT INTO graft.vh SELECT id + 10 FROM range(10)")
    spark.sql("INSERT OVERWRITE graft.vh SELECT id FROM range(5)")
    val vhDir = s"$warehouse/vh"
    spark.sql("VACUUM graft.vh RETAIN 1 HOURS").collect()
    assert(VersionLog.listVersions(spark, vhDir) === Seq(1L, 2L, 3L),
      "a 1-hour retention window must keep every seconds-old version")
    // every retained version still reads (only orphan markers swept)
    assert(spark.sql("SELECT count(*) AS c FROM graft.vh VERSION AS " +
      "OF 2").as[Long].head() === 20L)
    // RETAIN 0 HOURS: only the newest version's window — the
    // overwritten files sweep
    val removed0 = spark.sql("VACUUM graft.vh RETAIN 0 HOURS")
      .select($"removed_files").as[Long].head()
    assert(removed0 > 0L)
    assert(spark.sql("SELECT count(*) AS c FROM graft.vh")
      .as[Long].head() === 5L)
  }

  test("OPTIMIZE ... ZORDER BY rewrites the layout and rebuilds the " +
      "manifest: a tight box prunes files at plan time") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.zt AS SELECT id, id % 64 AS x, " +
      "CAST(id / 64 AS BIGINT) AS y FROM range(4096)")
    spark.conf.set("spark.graft.optimize.targetBytes", "4096")
    val (v, _, after) =
      try spark.sql("OPTIMIZE graft.zt ZORDER BY (x, y)")
        .as[(Long, Long, Long)].head()
      finally spark.conf.unset("spark.graft.optimize.targetBytes")
    assert(v === 2L && after > 1L)
    val boxed = spark.sql(
      "SELECT count(*) AS c FROM graft.zt " +
        "WHERE x BETWEEN 0 AND 7 AND y BETWEEN 0 AND 7")
    assert(boxed.as[Long].head() === 64L)
    // the rebuilt manifest prunes the scan to the box's files
    boxed.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val opened = scans(boxed.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(opened > 0 && opened < after,
      s"box scan must open < $after files, opened $opened")
  }

  test("RESTORE TABLE ... TO VERSION AS OF rolls back as a " +
      "metadata-only commit (undone versions still travel); " +
      "DESCRIBE DETAIL reports the latest snapshot") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.rst (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.rst VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("INSERT OVERWRITE graft.rst VALUES (9, 'z')") // v2
    val res = spark.sql("RESTORE TABLE graft.rst TO VERSION AS OF 1")
      .as[(Long, Long)].head()
    assert(res === ((3L, 1L)))
    assert(spark.sql("SELECT k FROM graft.rst").as[Long]
      .collect().toSet === Set(1L, 2L))
    val dir = s"$warehouse/rst"
    // metadata-only: v3 re-lists v1's EXACT files
    assert(VersionLog.snapshot(spark, dir, Some(3L)).files.toSet ===
      VersionLog.snapshot(spark, dir, Some(1L)).files.toSet)
    // the undone version still time-travels
    assert(spark.sql("SELECT k FROM graft.rst VERSION AS OF 2")
      .as[Long].collect().toSet === Set(9L))
    val det = spark.sql("DESCRIBE DETAIL graft.rst").collect().head
    assert(det.getAs[String]("location").endsWith("/rst"))
    assert(det.getAs[Long]("version") === 3L)
    assert(det.getAs[Long]("n_files") ===
      VersionLog.snapshot(spark, dir, Some(1L)).files.size.toLong)
    assert(det.getAs[Long]("size_bytes") > 0L)
    assert(det.getAs[String]("partition_col") === "p")
    assert(det.getAs[Long]("n_delete_manifests") === 0L)
    assert(det.getAs[Long]("n_constraints") === 0L)
    // stats-on-write coverage: every live batch carries its sidecar
    assert(det.getAs[Long]("n_batch_roots") > 0L)
    assert(det.getAs[Long]("n_stats_sidecars") ===
      det.getAs[Long]("n_batch_roots"))
    // column-mapping observability: no mapping yet, then a RENAME
    // surfaces as one mapped column
    assert(det.getAs[Long]("n_mapped_columns") === 0L)
    assert(det.getAs[Long]("n_dropped_columns") === 0L)
    spark.sql("ALTER TABLE graft.rst RENAME COLUMN k TO id")
    val detM = spark.sql("DESCRIBE DETAIL graft.rst").collect().head
    assert(detM.getAs[Long]("n_mapped_columns") === 1L)
    spark.sql("ALTER TABLE graft.rst RENAME COLUMN id TO k")
    // a harvest gap is VISIBLE: delete one sidecar, the pair diverges,
    // reads stay correct (files kept conservatively)
    val root = VersionLog.snapshot(spark, dir, None).files
      .map(graft.io.BatchStats.batchRootOf).distinct.head
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/$root", graft.io.BatchStats.FileName), false)
    val det2 = spark.sql("DESCRIBE DETAIL graft.rst").collect().head
    assert(det2.getAs[Long]("n_stats_sidecars") ===
      det2.getAs[Long]("n_batch_roots") - 1L)
    assert(spark.sql("SELECT k FROM graft.rst").as[Long]
      .collect().toSet === Set(1L, 2L))
    // a garbled data file fails the harvest LOUDLY-IN-LOGS but never
    // throws, and leaves no torn sidecar
    val bad = Files.createTempDirectory("badbatch").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bad/junk.parquet"),
      "not a parquet file".getBytes)
    graft.io.BatchStats.harvest(spark, bad, Seq("junk.parquet"))
    assert(!new java.io.File(s"$bad/${graft.io.BatchStats.FileName}")
      .exists())
  }

  test("CBO sizing: a small graft catalog table reports its pinned " +
      "snapshot's bytes, so a join against a big frame broadcasts the " +
      "graft side (no sort-merge shuffle of the big side)") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.dim AS SELECT id AS k, " +
      "CAST(id AS STRING) AS nm FROM range(100)")
    val big = spark.range(200000L).selectExpr("id % 100 AS k", "id AS v")
    val j = big.join(spark.table("graft.dim"), "k")
      .groupBy($"nm").count()
    j.collect()
    def ops(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => ops(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => ops(q.plan)
      case other => other +: other.children.flatMap(ops)
    }
    val plan = ops(j.queryExecution.executedPlan)
    assert(plan.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"expected a broadcast join, got:\n${j.queryExecution.executedPlan}")
    assert(!plan.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "the dim side must broadcast, not shuffle the big side")
  }

  test("CREATE TABLE ... CLONE ... VERSION AS OF as SQL: a zero-copy " +
      "pinned-snapshot clone through the catalog; mutations diverge") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.csrc AS SELECT id AS k, " +
      "CAST(id % 3 AS STRING) AS p FROM range(30)") // v1
    spark.sql("INSERT INTO graft.csrc SELECT id + 100, '9' " +
      "FROM range(5)") // v2
    val res = spark.sql(
      "CREATE TABLE graft.cdst CLONE graft.csrc VERSION AS OF 1")
      .as[(Long, Long)].head()
    assert(res._1 === 1L && res._2 > 0L)
    // the clone is the PINNED v1 state, not the source's latest
    assert(spark.sql("SELECT count(*) AS c FROM graft.cdst")
      .as[Long].head() === 30L)
    assert(spark.sql("SELECT count(*) AS c FROM graft.csrc")
      .as[Long].head() === 35L)
    // mutating the clone leaves the source untouched
    spark.sql("INSERT OVERWRITE graft.cdst VALUES (1, 'x')")
    assert(spark.sql("SELECT count(*) AS c FROM graft.cdst")
      .as[Long].head() === 1L)
    assert(spark.sql("SELECT count(*) AS c FROM graft.csrc")
      .as[Long].head() === 35L)
  }

  test("INSERT OVERWRITE PARTITION (p=...) is a partition-scoped " +
      "overwrite commit: named partition replaced, others carried by " +
      "reference, full history time-travelable") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.rw (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.rw VALUES " +
      "(1, 'a'), (2, 'a'), (3, 'b'), (4, 'c')")
    val dir = s"$warehouse/rw"
    val before = VersionLog.snapshot(spark, dir, None)
    spark.sql("INSERT OVERWRITE graft.rw PARTITION (p = 'a') " +
      "VALUES (10), (11)")
    assert(spark.sql("SELECT k, p FROM graft.rw")
      .as[(Long, String)].collect().toSet ===
      Set((10L, "a"), (11L, "a"), (3L, "b"), (4L, "c")))
    val after = VersionLog.snapshot(spark, dir, None)
    assert(after.action === "overwrite_where")
    assert(before.files.filterNot(_.contains("/p=a/")).toSet
      .subsetOf(after.files.toSet))
    assert(spark.sql("SELECT k FROM graft.rw VERSION AS OF 1")
      .as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
  }

  test("TIMESTAMP AS OF resolves against the commit timestamps that " +
      "DESCRIBE HISTORY surfaces; a timestamp predating the first " +
      "commit and multi-column partitioning are refused loudly") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.tt (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.tt VALUES (1, 'a')") // v1
    spark.sql("INSERT INTO graft.tt VALUES (2, 'b')") // v2
    // pin the commit instants by rewriting each version file's STORED
    // in-commit timestamp (r15+: the "ts" field is the commit time;
    // mtimes are irrelevant — VersionLogSpec pins the fallback)
    val dir = s"$warehouse/tt"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t1 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00").getTime
    val t2 = java.sql.Timestamp.valueOf("2026-01-04 00:00:00").getTime
    def pinTs(v: Int, ms: Long): Unit = {
      val p = new org.apache.hadoop.fs.Path(
        dir, f"_versions/v-$v%08d.json")
      val in = fs.open(p)
      val json = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val pinned = json.replaceFirst("\"ts\":\\d+", s""""ts":$ms""")
      assert(pinned != json, s"v$v carried no stored ts")
      fs.delete(p, false)
      val out = fs.create(p, false)
      try out.write(pinned.getBytes(
        java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    }
    pinTs(1, t1); pinTs(2, t2)
    def at(ts: String) = spark.sql(
      s"SELECT k FROM graft.tt TIMESTAMP AS OF '$ts'")
      .as[Long].collect().toSet
    assert(at("2026-01-03") === Set(1L)) // between the commits -> v1
    assert(at("2026-01-04 00:00:00") === Set(1L, 2L)) // at v2 -> v2
    assert(at("2026-01-05") === Set(1L, 2L)) // after both -> latest
    // DESCRIBE HISTORY surfaces the same instants
    val hist = spark.sql("DESCRIBE HISTORY graft.tt")
      .select($"version", $"commit_ts")
      .as[(Long, java.sql.Timestamp)].collect().toSeq
    assert(hist.map { case (v, ts) => (v, ts.getTime) } ===
      Seq((1L, t1), (2L, t2)))
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft.tt TIMESTAMP AS OF '2026-01-01'")
        .collect()
    }
    assert(e1.getMessage.contains("predates the first retained commit"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.two (a BIGINT, b STRING, c STRING) " +
        "PARTITIONED BY (b, c)")
    }
    assert(e2.getMessage.contains("one identity"), e2.getMessage)
  }

  test("ALTER TABLE ADD COLUMN is a metadata-only schema-evolution " +
      "commit: existing rows read NULL, later inserts populate it, " +
      "time travel reads the pre-alter schema; retype refuses") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.evo (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.evo VALUES (1, 'a')")
    val filesBefore =
      VersionLog.snapshot(spark, s"$warehouse/evo", None).files
    spark.sql("ALTER TABLE graft.evo ADD COLUMN note STRING")
    // metadata-only: the commit touched no data file
    assert(VersionLog.snapshot(spark, s"$warehouse/evo", None).files
      === filesBefore)
    assert(spark.table("graft.evo").schema.fieldNames.toSeq ===
      Seq("k", "p", "note"))
    assert(spark.sql("SELECT k, note FROM graft.evo")
      .as[(Long, Option[String])].collect().toSeq === Seq((1L, None)))
    // later inserts bind the full declared order and populate it
    spark.sql("INSERT INTO graft.evo VALUES (2, 'b', 'hello')")
    assert(spark.sql("SELECT k, note FROM graft.evo ORDER BY k")
      .as[(Long, Option[String])].collect().toSeq ===
      Seq((1L, None), (2L, Some("hello"))))
    // time travel to the pre-alter version reads the pre-alter schema
    assert(spark.sql("SELECT * FROM graft.evo VERSION AS OF 1")
      .schema.fieldNames.toSeq === Seq("k", "p"))
    // the feed records no row change for the alter commit itself
    assert(graft.sources.GraftCdcSource
      .changesForVersion(spark, s"$warehouse/evo", 2L).count() === 0L)
    // retype / duplicate add refuse loudly (rename/drop ride column
    // mapping since r15 — pinned in the COLUMN MAPPING test)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.evo ALTER COLUMN note TYPE BIGINT")
    }
    assert(e1.getMessage.contains("not supported"), e1.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.evo ADD COLUMN note STRING")
    }
    assert(e3.getMessage.contains("already"), e3.getMessage)
    // declared-but-empty table: the declaration widens, first insert
    // binds the post-alter order
    spark.sql("CREATE TABLE graft.evo2 (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("ALTER TABLE graft.evo2 ADD COLUMN v STRING")
    spark.sql("INSERT INTO graft.evo2 VALUES (1, 'a', 'one')")
    assert(spark.sql("SELECT k, v FROM graft.evo2")
      .as[(Long, String)].collect().toSeq === Seq((1L, "one")))
  }

  test("declared column order is STABLE across the empty->live " +
      "transition: positional INSERT INTO binds (k, p, v) the same " +
      "way on every insert, and SELECT * reads it back in that order") {
    import spark.implicits._
    warehouse
    // partition column in the MIDDLE of the declaration, flanked by
    // two same-typed strings — the exact silent-swap shape: the V1
    // relation surfaces (k, v, p), so an unordered schema would bind
    // the second positional INSERT's values to the wrong columns
    spark.sql("CREATE TABLE graft.ord (k BIGINT, p STRING, v STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.ord VALUES (1, 'a', 'one')")
    // table is LIVE now; the second insert must bind identically
    spark.sql("INSERT INTO graft.ord VALUES (2, 'b', 'two')")
    assert(spark.table("graft.ord").schema.fieldNames.toSeq ===
      Seq("k", "p", "v"))
    assert(spark.sql("SELECT * FROM graft.ord ORDER BY k")
      .as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "a", "one"), (2L, "b", "two")))
    // the rows landed in the right PARTITIONS, not just columns
    assert(spark.sql("SELECT k FROM graft.ord WHERE p = 'b'")
      .as[Long].collect().toSeq === Seq(2L))
  }

  test("table sidecar directories (t._cdc, t._dv) are not namespaces; " +
      "graft-only statements on non-graft identifiers fall through " +
      "to Spark's own parser") {
    warehouse
    spark.sql("CREATE TABLE graft.side AS SELECT id FROM range(5)")
    new java.io.File(s"$warehouse/side._cdc/batch-00000").mkdirs()
    new java.io.File(s"$warehouse/side._dv").mkdirs()
    val ns = spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSet
    assert(!ns.exists(_.contains("._")),
      s"sidecars must not surface as namespaces, got $ns")
    // a non-graft identifier must reach Spark's parser (its own parse
    // error), never a graft error — the intercept is ident-gated
    for (stmt <- Seq("VACUUM not_a_graft_table",
        "OPTIMIZE not_a_graft_table",
        "RESTORE TABLE not_a_graft_table TO VERSION AS OF 1")) {
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        spark.sql(stmt)
      }
    }
    // DESCRIBE HISTORY/DETAIL on a non-graft ident parse under
    // Spark's own DESCRIBE grammar (table HISTORY/DETAIL, column
    // operand) and fail as Spark's missing-table error — never a
    // graft error
    for (stmt <- Seq("DESCRIBE HISTORY not_a_table",
        "DESCRIBE DETAIL not_a_table")) {
      val e = intercept[Exception] { spark.sql(stmt).collect() }
      assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
        e.getMessage)
    }
  }

  test("DELETE FROM: copy-on-write commit with file-granular blast " +
      "radius — untouched files carry by reference, prior versions " +
      "time-travel whole, NULL predicates keep rows, no-match " +
      "commits nothing, non-graft DELETE is untouched") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.del1 (k BIGINT, v STRING, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.del1 VALUES (1, 'one', 'a'), " +
      "(2, 'two', 'a'), (3, NULL, 'b'), (4, 'four', 'b'), (5, 'five', 'c')")
    val dir = s"$warehouse/del1"
    val before = VersionLog.snapshot(spark, dir, None)
    // v = 'two' deletes k=2; v IS NULL (k=3) is a NULL predicate -> kept
    val res = spark.sql("DELETE FROM graft.del1 WHERE v = 'two'")
      .as[(Long, Long)].head()
    assert(res === ((2L, 1L)), s"(version, deleted_rows) was $res")
    assert(spark.sql("SELECT k FROM graft.del1").as[Long].collect()
      .toSet === Set(1L, 3L, 4L, 5L))
    // blast radius: only partition a's file rewrote; b and c carried
    val after = VersionLog.snapshot(spark, dir, None)
    val carried = before.files.toSet intersect after.files.toSet
    assert(before.files.filter(_.contains("p=b")).forall(carried) &&
      before.files.filter(_.contains("p=c")).forall(carried),
      "untouched partitions must carry by reference")
    // the pre-delete version still reads whole
    assert(spark.sql("SELECT k FROM graft.del1 VERSION AS OF 1")
      .as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
    // no-match DELETE commits nothing
    val res2 = spark.sql("DELETE FROM graft.del1 WHERE k = 999")
      .as[(Long, Long)].head()
    assert(res2 === ((2L, 0L)))
    assert(VersionLog.listVersions(spark, dir) === Seq(1L, 2L))
    // point-in-time: re-inserting a deleted row LIVES (unlike the
    // equality-delete manifest door)
    spark.sql("INSERT INTO graft.del1 VALUES (2, 'two', 'a')")
    assert(spark.sql("SELECT k FROM graft.del1").as[Long].collect()
      .toSet === Set(1L, 2L, 3L, 4L, 5L))
    // a DELETE on a non-graft target is not intercepted
    val e = intercept[Exception] {
      spark.sql("DELETE FROM no_such_graft_tbl WHERE x = 1").collect()
    }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
      e.getMessage)
  }

  test("UPDATE: assignments evaluate against the OLD row (a swap is " +
      "a swap), values cast to the column type, constraints re-gate, " +
      "partition-column assignment refuses, prior versions intact") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.up1 (a BIGINT, b BIGINT, v STRING, " +
      "p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.up1 VALUES (1, 10, 'x', 'a'), " +
      "(2, 20, 'y', 'a'), (3, 30, 'z', 'b')")
    val dir = s"$warehouse/up1"
    // swap a and b where p='a': both read the pre-update row
    val res = spark.sql(
      "UPDATE graft.up1 SET a = b, b = a WHERE p = 'a'")
      .as[(Long, Long)].head()
    assert(res === ((2L, 2L)), s"(version, updated_rows) was $res")
    assert(spark.sql("SELECT a, b FROM graft.up1 ORDER BY v")
      .as[(Long, Long)].collect().toSeq ===
      Seq((10L, 1L), (20L, 2L), (3L, 30L)))
    // blast radius: p=b carried by reference
    assert(VersionLog.snapshot(spark, dir, Some(1L)).files
      .filter(_.contains("p=b")).toSet.subsetOf(
        VersionLog.snapshot(spark, dir, None).files.toSet))
    // the pre-update version is intact
    assert(spark.sql(
      "SELECT a, b FROM graft.up1 VERSION AS OF 1 ORDER BY a")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // value casts to the column's type (int literal into BIGINT)
    spark.sql("UPDATE graft.up1 SET a = 99 WHERE v = 'z'")
    assert(spark.sql("SELECT a FROM graft.up1 WHERE v = 'z'")
      .as[Long].head() === 99L)
    // partition-column assignment is a row move: refused
    val em = intercept[Exception] {
      spark.sql("UPDATE graft.up1 SET p = 'c' WHERE a = 99")
    }
    assert(em.getMessage.contains("partition column"), em.getMessage)
    // CHECK constraints re-gate the rewritten rows
    spark.sql(
      "ALTER TABLE graft.up1 ADD CONSTRAINT pos CHECK (a > 0)")
    val ec = intercept[Exception] {
      spark.sql("UPDATE graft.up1 SET a = -1 WHERE v = 'z'")
    }
    assert(ec.getMessage.contains("CHECK constraint pos"),
      ec.getMessage)
    assert(spark.sql("SELECT a FROM graft.up1 WHERE v = 'z'")
      .as[Long].head() === 99L, "refused UPDATE must change nothing")
  }

  test("UPDATE/DELETE on a merge-on-read table fold the outstanding " +
      "equality-delete manifests into the victim rewrite: DML sees " +
      "only live rows, rewritten files physically drop dead rows, " +
      "manifests carry for non-victims, key-column SET refuses") {
    import spark.implicits._
    warehouse
    val dir = Files.createTempDirectory("dmlmor").toString
    VersionLog.init(spark, dir,
      Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"),
        (4L, "four", "b"), (5L, "five", "c"))
        .toDF("k", "v", "p").coalesce(1), partitionBy = Some("p"))
    // manifest-delete k=2 (partition a) and k=4 (partition b)
    VersionLog.deleteKeysCommit(spark, dir,
      Seq(2L, 4L).toDF("k"), "k")
    // UPDATE hits partition a's live row only (k=1); k=2 is dead and
    // must be neither updated nor resurrected
    val (nUpd, _) = (spark.sql(
      s"UPDATE graft.`$dir` SET v = concat(v, '!') WHERE p = 'a'")
      .as[(Long, Long)].head() match { case (v, n) => (n, v) })
    assert(nUpd === 1L, "only the live row updates")
    assert(VersionLog.read(spark, dir).select($"k", $"v")
      .as[(Long, String)].collect().toSet ===
      Set((1L, "one!"), (3L, "three"), (5L, "five")))
    // the REWRITTEN victim files physically lack the dead key; the
    // untouched partition b still holds k=4 raw (suppressed by the
    // carried manifest)
    val snap = VersionLog.snapshot(spark, dir, None)
    assert(snap.deletes.nonEmpty, "manifests must carry forward")
    val base = dir.stripSuffix("/")
    val aRaw = spark.read.parquet(
      snap.files.filter(_.contains("p=a")).map(f => s"$base/$f"): _*)
    assert(aRaw.select($"k").as[Long].collect().toSet === Set(1L))
    val bRaw = spark.read.parquet(
      snap.files.filter(_.contains("p=b")).map(f => s"$base/$f"): _*)
    assert(bRaw.select($"k").as[Long].collect().toSet === Set(3L, 4L))
    // DELETE likewise folds: removes live k=3, drops dead k=4 from
    // the rewritten file, keeps the manifests
    spark.sql(s"DELETE FROM graft.`$dir` WHERE p = 'b'")
    val snap2 = VersionLog.snapshot(spark, dir, None)
    assert(VersionLog.read(spark, dir).select($"k").as[Long]
      .collect().toSet === Set(1L, 5L))
    val b2 = snap2.files.filter(_.contains("p=b"))
    assert(b2.isEmpty || spark.read.parquet(
      b2.map(f => s"$base/$f"): _*).count() === 0L)
    // assignment to the manifest key column: refused loudly
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$dir` SET k = 99 WHERE p = 'a'")
    }
    assert(e.getMessage.contains("equality-delete manifests key"),
      e.getMessage)
  }

  test("COLUMN MAPPING: RENAME/DROP COLUMN are metadata-only commits " +
      "(files untouched, data carried by physical identity, time " +
      "travel reads each version's own names), a re-added dropped " +
      "name gets a fresh physical so old bytes never resurface, and " +
      "writes/DML keep working through the mapping") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.cm (k BIGINT, v STRING, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.cm VALUES (1, 'one', 'a'), " +
      "(2, 'two', 'b')") // v1
    val dir = s"$warehouse/cm"
    val v1Files = VersionLog.snapshot(spark, dir, None).files
    // RENAME: metadata-only, data carried
    spark.sql("ALTER TABLE graft.cm RENAME COLUMN v TO label") // v2
    assert(VersionLog.snapshot(spark, dir, None).files === v1Files,
      "rename must touch no data file")
    assert(spark.sql("SELECT k, label FROM graft.cm ORDER BY k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "one"), (2L, "two")))
    intercept[Exception] {
      spark.sql("SELECT v FROM graft.cm").collect()
    }
    // time travel reads the PRE-RENAME name
    assert(spark.sql("SELECT v FROM graft.cm VERSION AS OF 1")
      .as[String].collect().toSet === Set("one", "two"))
    // writes keep working: logical 'label' lands under physical 'v'
    spark.sql("INSERT INTO graft.cm VALUES (3, 'three', 'a')") // v3
    assert(spark.sql("SELECT label FROM graft.cm WHERE k = 3")
      .as[String].head() === "three")
    // filter pushdown through the mapping stays correct
    assert(spark.sql("SELECT k FROM graft.cm WHERE label = 'two'")
      .as[Long].collect().toSeq === Seq(2L))
    // DML through the mapping: assignments bind the logical name
    spark.sql("UPDATE graft.cm SET label = 'ONE' WHERE k = 1")
    assert(spark.sql("SELECT label FROM graft.cm WHERE k = 1")
      .as[String].head() === "ONE")
    // DROP: metadata-only; pre-drop versions still read it
    val preDrop = VersionLog.snapshot(spark, dir, None)
    spark.sql("ALTER TABLE graft.cm DROP COLUMN label")
    assert(VersionLog.snapshot(spark, dir, None).files ===
      preDrop.files, "drop must touch no data file")
    assert(spark.sql("SELECT * FROM graft.cm").columns.toSeq
      .sorted === Seq("k", "p"))
    assert(spark.sql(
      s"SELECT label FROM graft.cm VERSION AS OF ${preDrop.version}")
      .as[String].collect().toSet === Set("ONE", "two", "three"))
    // RE-ADD the ORIGINAL name: fresh physical identity — the old
    // 'v' bytes (still in every pre-drop file) must NOT leak in
    spark.sql("ALTER TABLE graft.cm ADD COLUMN v STRING")
    assert(spark.sql("SELECT v FROM graft.cm").as[String]
      .collect().forall(_ == null),
      "re-added column must read NULL, never the retired bytes")
    // populate it: positional order is the declared order (k, p, v)
    spark.sql("INSERT INTO graft.cm VALUES (4, 'b', 'fresh')")
    assert(spark.sql("SELECT k, v FROM graft.cm ORDER BY k")
      .as[(Long, Option[String])].collect().toSeq ===
      Seq((1L, None), (2L, None), (3L, None), (4L, Some("fresh"))))
    // guards: partition column refuses; constraint-referenced refuses
    val ep = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cm RENAME COLUMN p TO q")
    }
    assert(ep.getMessage.contains("partition column"), ep.getMessage)
    spark.sql("ALTER TABLE graft.cm ADD CONSTRAINT kc CHECK (k > 0)")
    val ec = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cm DROP COLUMN k")
    }
    assert(ec.getMessage.contains("CHECK constraint kc"), ec.getMessage)
    // the DIRECT format("graft") door surfaces PHYSICAL names — on a
    // mapped table it must refuse unless the caller acknowledges,
    // exactly like the acceptDeletes rule (no silently-diverging door)
    val ed = intercept[Exception] {
      spark.read.format("graft").load(dir).collect()
    }
    assert(ed.getMessage.contains("acceptPhysicalNames"), ed.getMessage)
    assert(spark.read.format("graft")
      .option("acceptPhysicalNames", "true").load(dir)
      .columns.contains("v#v6") ||
      spark.read.format("graft")
        .option("acceptPhysicalNames", "true").load(dir)
        .columns.exists(_.startsWith("v#")),
      "acknowledged raw read surfaces the physical name")
  }

  test("DML door job-count parity: DELETE and UPDATE each cost two " +
      "Spark jobs (victim discovery + rewrite) — the row count and " +
      "the constraint gate ride the rewrite as observed metrics") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.jc (k BIGINT, v STRING, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.jc VALUES (1, 'one', 'a'), " +
      "(2, 'two', 'a'), (3, 'three', 'b')")
    spark.sql("ALTER TABLE graft.jc ADD CONSTRAINT nz CHECK (k > 0)")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = jobs.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = jobs.incrementAndGet()
    }
    // listener events are async: wait for the count to go stable
    // (no change for 500 ms) before and after the statement
    def settle(): Long = {
      var last = jobs.get()
      var since = System.nanoTime()
      val deadline = System.nanoTime() + 15000000000L
      while (System.nanoTime() - since < 500000000L &&
          System.nanoTime() < deadline) {
        Thread.sleep(30)
        val cur = jobs.get()
        if (cur != last) { last = cur; since = System.nanoTime() }
      }
      last
    }
    def jobsOf(stmt: => Unit): Long = {
      spark.listenerManager.register(listener)
      try {
        val base = settle()
        stmt
        settle() - base
      } finally spark.listenerManager.unregister(listener)
    }
    // graft commands execute EAGERLY inside spark.sql(); reading the
    // result row afterwards is its own (uncounted) local execution
    var res: org.apache.spark.sql.DataFrame = null
    val delJobs = jobsOf {
      res = spark.sql("DELETE FROM graft.jc WHERE v = 'two'")
    }
    assert(res.as[(Long, Long)].head()._2 === 1L)
    // the statement's own command execution is one of them; the DOOR
    // itself must run exactly 2 (discover + rewrite) — the pre-r15
    // path ran 3 (a separate count pass)
    assert(delJobs <= 3, s"DELETE ran $delJobs query executions, " +
      "expected <= 3 (command + discover + rewrite)")
    val updJobs = jobsOf {
      res = spark.sql(
        "UPDATE graft.jc SET v = concat(v, '!') WHERE p = 'a'")
    }
    assert(res.as[(Long, Long)].head()._2 === 1L)
    assert(updJobs <= 3, s"UPDATE ran $updJobs query executions, " +
      "expected <= 3 (command + discover + rewrite); the count and " +
      "constraint gate must ride the rewrite — the pre-r15 path ran 5")
    // the observed constraint gate still REFUSES violations loudly —
    // and the ABORT path stays within the same execution budget: the
    // first offending row rides the rewrite as an observation
    // (pre-r16 the error path re-probed every victim file to build
    // the message, one extra whole-victim job)
    var err: Exception = null
    val vioJobs = jobsOf {
      err = intercept[Exception] {
        spark.sql("UPDATE graft.jc SET k = 0 - k WHERE p = 'b'")
      }
    }
    assert(err.getMessage.contains("CHECK constraint nz"),
      err.getMessage)
    assert(err.getMessage.contains("offending row"), err.getMessage)
    assert(err.getMessage.contains("\"k\":-3"),
      s"the abort message must carry the observed offending row: " +
        err.getMessage)
    assert(vioJobs <= 3, s"violating UPDATE ran $vioJobs query " +
      "executions, expected <= 3 — the offending-row message must " +
      "not re-probe the victims")
    assert(spark.sql("SELECT k FROM graft.jc").as[Long].collect()
      .toSet === Set(1L, 3L), "refused UPDATE must change nothing")
  }

  test("RESTORE TABLE ... TO TIMESTAMP AS OF resolves against " +
      "in-commit instants and rolls back metadata-only") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.rts (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.rts VALUES (1, 'a')") // v1
    spark.sql("INSERT INTO graft.rts VALUES (2, 'b')") // v2
    spark.sql("INSERT INTO graft.rts VALUES (3, 'c')") // v3
    val dir = s"$warehouse/rts"
    val ts = VersionLog.commitTimestamps(spark, dir).toMap
    val res = spark.sql(
      s"RESTORE TABLE graft.rts TO TIMESTAMP AS OF '${ts(2L)}'")
      .as[(Long, Long)].head()
    assert(res === ((4L, 2L)))
    assert(spark.sql("SELECT k FROM graft.rts").as[Long]
      .collect().toSet === Set(1L, 2L))
    // a pre-history timestamp refuses loudly
    val e = intercept[Exception] {
      spark.sql("RESTORE TABLE graft.rts TO TIMESTAMP AS OF '10'")
    }
    assert(e.getMessage.contains("predates"), e.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns auto-ADD as " +
      "metadata-only commits (existing rows NULL, batch populates); " +
      "tombstone helper columns never become table columns; without " +
      "the keyword extra source columns are ignored") {
    import spark.implicits._
    warehouse
    val dir = Files.createTempDirectory("vevo").toString
    VersionLog.init(spark,
      dir, Seq((1L, "one", "a"), (2L, "two", "b")).toDF("k", "v", "p"),
      partitionBy = Some("p"))
    // source carries a NEW column `score` and a tombstone helper
    Seq((2L, "two2", "b", 0.5d, false), (3L, "three", "a", 0.7d, false))
      .toDF("k", "v", "p", "score", "_del")
      .createOrReplaceTempView("evo_src")
    // WITHOUT the keyword: extra columns silently not written
    spark.sql(s"""MERGE INTO graft.`$dir` AS t USING evo_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s._del THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    assert(VersionLog.read(spark, dir).columns.toSeq ===
      Seq("k", "v", "p"))
    // WITH SCHEMA EVOLUTION: `score` auto-adds (one metadata commit),
    // `_del` (referenced only by the tombstone clause) does NOT
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` AS t
          USING evo_src AS s ON t.k = s.k
          WHEN MATCHED AND s._del THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    val t = VersionLog.read(spark, dir)
    assert(t.columns.toSeq === Seq("k", "v", "score", "p"),
      t.columns.mkString(","))
    assert(t.select($"k", $"score").as[(Long, Option[Double])]
      .collect().toSet ===
      Set((1L, None), (2L, Some(0.5d)), (3L, Some(0.7d))),
      "existing rows NULL-fill, merged rows populate the new column")
    // the tombstone path still works with evolution on
    Seq((3L, "x", "a", 0.0d, true)).toDF("k", "v", "p", "score", "_del")
      .createOrReplaceTempView("evo_src2")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` AS t
          USING evo_src2 AS s ON t.k = s.k
          WHEN MATCHED AND s._del THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    assert(VersionLog.read(spark, dir).select($"k").as[Long]
      .collect().toSet === Set(1L, 2L))
    // the in-place front door refuses the keyword loudly
    val e = intercept[IllegalArgumentException] {
      graft.io.MergeSql.mergeSql(spark,
        """MERGE WITH SCHEMA EVOLUTION INTO t USING s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        Map("t" -> dir))
    }
    assert(e.getMessage.contains("versioned graft tables only"),
      e.getMessage)
  }

  test("DML qualifier handling: struct-field predicates survive (only " +
      "the table alias is stripped, a struct leaf never rebinds to a " +
      "same-named top-level column), struct-field SET updates the " +
      "LEAF in place") {
    import spark.implicits._
    warehouse
    // top-level `ts` deliberately DISAGREES with the struct leaf
    // `meta.ts` — the r14 stripQualifiers bug would have deleted by
    // the wrong column
    spark.sql("CREATE TABLE graft.sq1 (k BIGINT, ts BIGINT, " +
      "meta STRUCT<ts: BIGINT, tag: STRING>)")
    spark.sql("INSERT INTO graft.sq1 VALUES " +
      "(1, 100, named_struct('ts', 5L, 'tag', 'old')), " +
      "(2, 1, named_struct('ts', 500L, 'tag', 'new')), " +
      "(3, 100, named_struct('ts', 500L, 'tag', 'new'))")
    // deletes k=1 (meta.ts=5 < 10) — NOT k=2 (whose top-level ts=1)
    spark.sql("DELETE FROM graft.sq1 WHERE meta.ts < 10")
    assert(spark.sql("SELECT k FROM graft.sq1").as[Long].collect()
      .toSet === Set(2L, 3L))
    // alias-qualified struct reference: t.meta.ts -> meta.ts
    spark.sql("UPDATE graft.sq1 t SET ts = 7 WHERE t.meta.ts = 500 " +
      "AND t.k = 2")
    assert(spark.sql("SELECT ts FROM graft.sq1 WHERE k = 2")
      .as[Long].head() === 7L)
    assert(spark.sql("SELECT ts FROM graft.sq1 WHERE k = 3")
      .as[Long].head() === 100L)
    // struct-field assignment target (r17): updates the LEAF in
    // place — sibling fields carry, the TOP-LEVEL same-named column
    // is untouched (the leaf never rebinds)
    spark.sql("UPDATE graft.sq1 SET meta.ts = 9 WHERE k = 2")
    assert(spark.sql(
        "SELECT ts, meta.ts, meta.tag FROM graft.sq1 WHERE k = 2")
      .as[(Long, Long, String)].head() === ((7L, 9L, "new")),
      "leaf updated, sibling and same-named top-level column intact")
  }

  test("SET/UNSET TBLPROPERTIES persist as metadata-only commits: " +
      "properties survive a fresh snapshot resolution, ride ordinary " +
      "commits, surface in SHOW TBLPROPERTIES and DESCRIBE DETAIL, " +
      "and time travel reads each version's own") {
    import spark.implicits._
    warehouse
    val dir = Files.createTempDirectory("gprops").toString
    VersionLog.init(spark, dir,
      Seq((1L, "one", "a")).toDF("k", "v", "p"),
      partitionBy = Some("p")) // v1
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES (" +
      "'team'='nlp', 'graft.retentionHours'='1000000')") // v2
    // persisted on DISK (a fresh snapshot resolution = a new session)
    assert(VersionLog.snapshot(spark, dir, None).properties.toMap ===
      Map("team" -> "nlp", "graft.retentionHours" -> "1000000"))
    // ordinary commits INHERIT
    VersionLog.append(spark, dir,
      Seq((2L, "two", "b")).toDF("k", "v", "p"), Some("p")) // v3
    assert(VersionLog.tableProperty(spark, dir, "team") ===
      Some("nlp"))
    // SQL surfaces
    val shown = spark.sql(s"SHOW TBLPROPERTIES graft.`$dir`")
      .as[(String, String)].collect().toMap
    assert(shown.get("team") === Some("nlp"))
    val detail = spark.sql(s"DESCRIBE DETAIL graft.`$dir`")
      .select("properties").as[String].head()
    assert(detail.contains("team=nlp"), detail)
    // time travel: v1 had none
    assert(VersionLog.snapshot(spark, dir, Some(1L)).properties
      === Nil)
    // UNSET removes one, keeps the other, later commits inherit that
    spark.sql(s"ALTER TABLE graft.`$dir` UNSET TBLPROPERTIES " +
      "('team')")
    VersionLog.append(spark, dir,
      Seq((3L, "three", "c")).toDF("k", "v", "p"), Some("p"))
    assert(VersionLog.snapshot(spark, dir, None).properties.toMap ===
      Map("graft.retentionHours" -> "1000000"))
  }

  test("CREATE TABLE ... TBLPROPERTIES persists the declared " +
      "properties: visible before the first commit, SEEDED into the " +
      "version log by the first INSERT, inherited by later commits") {
    import spark.implicits._
    warehouse
    spark.sql("CREATE TABLE graft.tprops (k BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES (" +
      "'graft.retentionHours'='48', 'team'='nlp')")
    // declared-but-empty: the properties already surface
    val declared = spark.sql("SHOW TBLPROPERTIES graft.tprops")
      .as[(String, String)].collect().toMap
    assert(declared.get("team") === Some("nlp"))
    assert(declared.get("graft.retentionHours") === Some("48"))
    // first INSERT bootstraps the log WITH the declared properties
    spark.sql("INSERT INTO graft.tprops VALUES (1, 'a')")
    val dir = s"$warehouse/tprops"
    assert(VersionLog.snapshot(spark, dir, None).properties.toMap ===
      Map("graft.retentionHours" -> "48", "team" -> "nlp"))
    // and later commits inherit
    spark.sql("INSERT INTO graft.tprops VALUES (2, 'b')")
    assert(VersionLog.tableProperty(spark, dir, "team") ===
      Some("nlp"))
  }

  test("VACUUM honors the TABLE's own retention property when no " +
      "RETAIN clause is given; an explicit clause overrides it") {
    import spark.implicits._
    warehouse
    val dir = Files.createTempDirectory("gpropvac").toString
    def row(k: Long) = {
      import spark.implicits._
      Seq((k, s"r$k", "a")).toDF("k", "v", "p")
    }
    VersionLog.init(spark, dir, row(1L), partitionBy = Some("p"))
    (2L to 5L).foreach(k =>
      VersionLog.overwrite(spark, dir, row(k), Some("p")))
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES (" +
      "'graft.retentionHours'='1000000')")
    // the table's retention window covers every commit: a bare VACUUM
    // retains all versions (only unreferenced markers sweep) and v1
    // stays readable
    val before = VersionLog.listVersions(spark, dir)
    spark.sql(s"VACUUM graft.`$dir`").collect()
    assert(VersionLog.listVersions(spark, dir) === before,
      "the table's retention window must keep every version")
    assert(VersionLog.read(spark, dir, Some(1L)).count() === 1L)
    // an explicit clause overrides the property (the operator asked)
    spark.sql(s"VACUUM graft.`$dir` RETAIN 2 VERSIONS").collect()
    assert(VersionLog.listVersions(spark, dir).size === 2,
      "explicit RETAIN must override the property")
  }

  test("graft.checkpointEvery TBLPROPERTY paces checkpoints from the " +
      "snapshot itself; graft.acceptPhysicalNames lifts the raw-read " +
      "refusal for mapped tables") {
    import spark.implicits._
    warehouse
    val dir = Files.createTempDirectory("gpropck").toString
    VersionLog.init(spark, dir,
      Seq((1L, "one")).toDF("k", "v").coalesce(1)) // v1
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES (" +
      "'graft.checkpointEvery'='1')") // v2
    VersionLog.append(spark, dir,
      Seq((2L, "two")).toDF("k", "v").coalesce(1)) // v3
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir,
      "_versions/c-00000003.json")),
      "every commit must checkpoint under graft.checkpointEvery=1")
    // mapped-read acknowledgment as a TABLE policy
    VersionLog.alterRenameColumnCommit(spark, dir, "v", "label")
    intercept[IllegalStateException] {
      spark.read.format("graft").load(dir).collect()
    }
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES (" +
      "'graft.acceptPhysicalNames'='true')")
    val raw = spark.read.format("graft").load(dir)
    assert(raw.columns.toSet === Set("k", "v"),
      "the acknowledged raw read surfaces PHYSICAL names")
  }

  test("nested DDL on a DECLARED-but-never-written table validates " +
      "the dotted path: bad paths refuse loudly instead of silently " +
      "no-oping or throwing a raw ClassCastException") {
    warehouse
    spark.sql("CREATE TABLE graft.declnest (k BIGINT, " +
      "s STRUCT<x: BIGINT, w: STRING>, t STRING)")
    // valid nested rename applies to the declared schema
    spark.sql("ALTER TABLE graft.declnest RENAME COLUMN s.x TO y")
    val sType = spark.table("graft.declnest").schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(sType.fieldNames.toSet === Set("w", "y"))
    // unknown nested segment: loud refusal, not a silent no-op
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.declnest RENAME COLUMN s.nope TO z")
    }
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    // path THROUGH a non-struct: loud refusal, not ClassCastException
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.declnest RENAME COLUMN t.x TO z")
    }
    assert(!e2.isInstanceOf[ClassCastException], e2.toString)
    assert(e2.getMessage.contains("not a struct") ||
      e2.getMessage.contains("t.x"), e2.getMessage)
    // schema unchanged by the two refusals
    assert(spark.table("graft.declnest").schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSet === Set("w", "y"))
    spark.sql("DROP TABLE graft.declnest")
  }
}

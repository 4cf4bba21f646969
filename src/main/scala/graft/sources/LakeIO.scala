package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake utilities (SURVEY.md §2.A) — the Spark-native equivalents of the
  * reference's own code surface: novlake `Lake.save_dataset` /
  * `save_dataset(partition_cols=...)` / awswrangler write modes
  * (`overwrite`, `overwrite_partitions`, `append`) and the catalog
  * helpers `Lake.meta` / `Lake.list_tables` / `Lake.preview`
  * [upstream, unverified — SURVEY.md §0; novlake/lake.py].
  *
  * No Delta/Iceberg jar ships in this environment (BASELINE.md), so
  * "Delta ops" are emulated parquet-native: dynamic partition overwrite
  * replaces only the partitions present in the incoming frame — the
  * exact semantics of awswrangler's `overwrite_partitions`.
  *
  * Scale notes: writers inherit the frame's partitioning; no coalesce(1)
  * here — small-file compaction is the caller's choice via
  * `repartition(n)`. Partitioned writes use Hive-style key=value dirs so
  * reads get partition pruning for free.
  */
object LakeIO {

  /** `sink_parquet` — overwrite-save a dataset (novlake save_dataset). */
  def saveDataset(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** `sink_append` — append rows to an existing dataset. */
  def appendDataset(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** `sink_partitioned` — Hive-style partitioned save. Repartition by the
    * partition columns first: without it every upstream task writes a
    * file into every partition dir (tasks × partitions small files); with
    * it each partition value is owned by one task → one file per dir.
    */
  def savePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.repartition(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** `sink_replace_partition` — replace ONLY the partitions present in
    * `df`, leaving sibling partitions intact (awswrangler
    * `mode="overwrite_partitions"`; Delta `replaceWhere` equivalent,
    * parquet-native via dynamic partition overwrite).
    */
  def replacePartitions(df: DataFrame, path: String, cols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Register a saved dataset in the session catalog (novlake registers
    * in Glue; here: a named view over the parquet path).
    */
  def registerTable(spark: SparkSession, name: String, path: String): Unit =
    spark.read.parquet(path).createOrReplaceTempView(name)

  /** Durable-catalog registration (novlake's Glue parity — VERDICT r2
    * #4): an EXTERNAL parquet table entry over the saved path. Metadata
    * only — no data rewrite — but unlike a temp view (visible only to
    * the registering session, gone at session end) the entry lives in
    * the shared external catalog: every session on this SparkContext
    * resolves it, and when the catalog is backed by a persistent
    * metastore (Hive/Glue) it survives process restarts outright. For a
    * plain in-memory catalog, `Lake.attachWarehouse` rebuilds the
    * registrations from the warehouse directory itself.
    */
  def registerDurable(spark: SparkSession, name: String, path: String): Unit = {
    // an older temp view would silently shadow the catalog entry
    spark.catalog.dropTempView(name)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.catalog.createTable(name, path, "parquet")
    // a Hive-style partitioned layout registers with an EMPTY catalog
    // partition list until recovered (MSCK) — without this, partition
    // predicates through the table name silently match nothing
    if (spark.catalog.listColumns(name).collect().exists(_.isPartition))
      spark.catalog.recoverPartitions(name)
    // drop any cached file listing from a previous registration of the
    // same name in THIS session; sibling sessions follow the standard
    // Spark contract (REFRESH TABLE after underlying files change)
    spark.catalog.refreshTable(name)
  }

  /** `source_csv` — CSV ingest with header + schema inference. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** `source_json` — JSON-lines ingest. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** `table_meta` — table metadata as rows (novlake Lake.meta/DESCRIBE). */
  def tableMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("col_name", "data_type", "nullable")
  }

  /** `list_tables` — catalog listing (novlake Lake.list_tables). */
  def listTables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables()
      .collect().toSeq.map(t => (t.name, t.tableType))
      .toDF("table_name", "table_type")
      .orderBy(col("table_name").asc)
  }

  /** Bucketed save (`CLUSTERED BY ... INTO n BUCKETS`): rows are hash-
    * partitioned into a fixed bucket count on disk, so joins and
    * aggregations on the bucket key need NO shuffle at read time — the
    * co-location technique for repeated large-fact joins at 100 TB
    * (SURVEY.md §2 "bucketing for co-located joins"; asserted
    * Exchange-free in SinkSpec). Bucketed tables must be saved through
    * the session catalog (`saveAsTable`), not a bare path.
    */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** MERGE/upsert emulation (Delta `MERGE WHEN MATCHED UPDATE / NOT
    * MATCHED INSERT`, parquet-native): source rows win on key collision,
    * unmatched target rows survive. Materializes to a scratch dir first —
    * overwriting a parquet path while lazily reading it would corrupt the
    * read — then rewrites the target.
    *
    * Scale: one left-anti shuffle on the key + a union; no driver-side
    * data movement. (A format with transaction support does this without
    * the full rewrite; that is exactly the part Delta/Iceberg add.)
    */
  /** In-plan source-key uniqueness guard (Delta MERGE parity: "a
    * source row matched multiple target rows" is an ERROR there, and
    * the mirror hazard here is a source batch carrying the same key
    * twice — both rows would land and the "source wins" contract
    * silently becomes "source duplicates"). The check is a keyed
    * window count + a raise_error filter — fully distributed, no
    * driver action, delta-sized (the window shuffles the SOURCE batch
    * on the keys the merge shuffles it on anyway).
    */
  private def requireUniqueSourceKeys(df: DataFrame, keys: Seq[String],
      op: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
    val msg = concat(lit(s"$op: multiple source rows carry key ("),
      concat_ws(",", keys.map(c => col(c).cast("string")): _*),
      lit(") — like Delta MERGE, a multi-match source is rejected " +
        "(which row wins is ambiguous); aggregate the batch to one " +
        "row per key first"))
    df.withColumn("__kcnt", count(lit(1)).over(w))
      .filter(when(col("__kcnt") > 1,
        raise_error(msg).cast("boolean")).otherwise(lit(true)))
      .drop("__kcnt")
  }

  def upsert(df: DataFrame, path: String, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val target = spark.read.parquet(path)
    val src = requireUniqueSourceKeys(df, keys, "upsert")
    val survivors = target.join(src.select(keys.map(col): _*), keys, "left_anti")
    val merged = survivors.unionByName(src)
    val tmp = path.stripSuffix("/") + "__upsert_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(spark, tmp, path)
  }

  /** Replace `path` with the dataset at `tmp` via filesystem rename —
    * one write instead of two, the shortest possible unavailability
    * window without a transactional format (the window is the gap
    * between delete and rename; a crash there leaves the data intact at
    * `tmp`), and no stale scratch copy left behind.
    */
  private def swapInto(spark: SparkSession, tmp: String, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val fs = dst.getFileSystem(conf)
    fs.delete(dst, true)
    if (!fs.rename(src, dst)) {
      throw new java.io.IOException(
        s"rename $tmp -> $path failed; data preserved at $tmp")
    }
  }

  /** Versioned snapshot write ("time travel by directory version" —
    * SURVEY.md §7.4): each save lands in `path/v=<n>/` and `latest`
    * resolution is max(n). Readers pin a version for reproducible
    * training runs; writers never mutate a published snapshot.
    *
    * Publishes through the RESERVE → WRITE → SEAL protocol
    * ([[commitVersion]]) — a racing second writer fails loudly at the
    * reservation, before any data write (VERDICT r18 #1: the
    * single-writer assumption is now enforced, not assumed).
    */
  def saveVersion(df: DataFrame, path: String): Int =
    commitVersion(df, path, captureKeys = None)

  /** Next version number from the live directory listing, the
    * append-only commit log AND in-flight reservations: the log
    * survives vacuum, so a retention pass can never cause a version
    * number to be reused (a reused number would silently alias two
    * different commits in any pinned reader, clone manifest, or CDF
    * artifact that recorded the old one), and a crashed commit's
    * reservation keeps its number burned for the same reason.
    */
  private def nextVersion(spark: SparkSession, path: String): Int =
    (listVersions(spark, path) ++ listCommits(spark, path) ++
      listInflight(spark, path)).foldLeft(-1)(math.max) + 1

  // ---- commit protocol (VERDICT r18 #1 + ADVICE r18 atomic CDF) ----
  //
  // Every version publishes in three steps against the PERSISTENT
  // commit log at `path/_commits/`:
  //
  //   1. RESERVE — exclusive-create `_commits/_inflight_v=<n>`. Two
  //      writers racing the same head both compute the same n; exactly
  //      one create succeeds and the loser fails LOUDLY here, before
  //      any data write (no parquet-dir collision, no version
  //      aliasing). The reservation also burns the number: nextVersion
  //      reads in-flight markers, so even a crashed commit's n is
  //      never reused.
  //   2. WRITE — the snapshot dir `v=<n>`, then (captured commits) the
  //      write-time CDF `_cdf/v=<n>`. While the in-flight marker
  //      exists the version is INVISIBLE: [[listVersions]] subtracts
  //      in-flight numbers, so no reader resolves a half-written
  //      snapshot as latest and no capture guard counts it as a
  //      commit. ADVICE r18 (medium): the capture now lands BEFORE the
  //      commit becomes visible — a failed capture can no longer leave
  //      a committed-but-uncaptured version that every spanning
  //      [[capturedChanges]] range refuses on forever.
  //   3. SEAL — rename `_inflight_v=<n>` → `v=<n>` in `_commits/`: one
  //      atomic metadata op that publishes snapshot and capture
  //      together. Sealed markers are the commit log ([[listCommits]])
  //      and are NEVER deleted (vacuum reclaims snapshots, not
  //      history — VERDICT r17 #1).
  //
  // RECOVERY RULE for a reserved-but-unsealed marker (writer crashed;
  // a clean failure aborts and cleans up after itself): the version
  // was never published — readers never saw it, feeds never counted
  // it. If `v=<n>` data exists the write finished but the seal didn't:
  // either seal by hand (rename the marker) after verifying the dir,
  // or delete dir + `_cdf/v=<n>` + marker. If no `v=<n>` dir exists
  // just delete the marker. Either way nothing downstream referenced
  // n. All driver-side, one tiny file per commit.

  private def commitsDir(path: String) =
    new org.apache.hadoop.fs.Path(path, "_commits")

  private def inflightName(v: Int) = s"_inflight_v=$v"

  /** Step 1: exclusive-create the reservation. Loud failure = a
    * concurrent writer holds (or a crashed writer left) this number.
    */
  private[graft] def reserveCommit(spark: SparkSession, path: String,
      version: Int): Unit = {
    val dir = commitsDir(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val marker = fs.makeQualified(
      new org.apache.hadoop.fs.Path(dir, inflightName(version)))
    // The reservation needs a TRULY atomic create-if-absent. Hadoop's
    // FileSystem.createNewFile default is check-then-create — a TOCTOU
    // window two racing threads BOTH won in testing on the local FS —
    // so file:// goes through O_EXCL (java.nio createFile, the POSIX
    // exclusive-create syscall). HDFS keeps createNewFile: its create
    // is exclusive server-side. (Object stores without atomic create,
    // e.g. raw S3, need an external lock service for multi-writer —
    // the same caveat Delta documents for S3 single-cluster mode.)
    val created =
      if (marker.toUri.getScheme == "file")
        try {
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(marker.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      else fs.createNewFile(marker)
    if (!created)
      throw new IllegalStateException(
        s"commit v=$version at $path is already reserved — a CONCURRENT " +
          "WRITER is committing (this lake is single-writer per table, " +
          "now enforced at reservation), or a crashed writer left the " +
          s"reservation behind. Recovery: if $path/v=$version exists " +
          "and is complete, seal it (rename _commits/_inflight_v=" +
          s"$version to _commits/v=$version); otherwise delete the " +
          "marker (and any partial v-dir) — the version was never " +
          "published, so nothing references it")
  }

  /** Step 3: atomically publish — the in-flight marker becomes the
    * permanent commit-log entry.
    */
  private def sealCommit(spark: SparkSession, path: String,
      version: Int): Unit = {
    val dir = commitsDir(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.rename(new org.apache.hadoop.fs.Path(dir, inflightName(version)),
        new org.apache.hadoop.fs.Path(dir, s"v=$version")))
      throw new java.io.IOException(
        s"seal of commit v=$version at $path failed — the reservation " +
          "marker could not be renamed; the version remains unpublished " +
          "(see the recovery rule in the commit-protocol notes)")
  }

  /** Clean-failure abort: delete whatever step 2 wrote plus the
    * reservation, so the number is reclaimed and no partial state
    * remains. Best-effort — a failure here leaves the crash-recovery
    * state the rule above documents.
    */
  private def abortCommit(spark: SparkSession, path: String,
      version: Int): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/v=$version"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_cdf/v=$version"), true)
      fs.delete(new org.apache.hadoop.fs.Path(commitsDir(path),
        inflightName(version)), false)
      ()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** In-flight (reserved, unsealed) version numbers. */
  private[graft] def listInflight(spark: SparkSession,
      path: String): Seq[Int] = {
    val dir = commitsDir(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("_inflight_v="))
      .map(_.stripPrefix("_inflight_v=").toInt)
      .sorted
  }

  /** The shared publish path behind [[saveVersion]] /
    * [[saveVersionCdf]] / the compaction rewrite — reserve, write
    * data (+ capture), seal; clean failures abort and rethrow.
    *
    * @param captureKeys Some(keys) = write-time CDF capture (diff vs
    *        the previous head, every-row-insert for the first commit)
    * @param captureEmpty record a ZERO-ROW capture when the table has
    *        `_cdf` (the content-identical maintenance commit —
    *        compaction rewrites files, not rows; without it the
    *        rewrite is a hole every spanning captured range refuses on)
    */
  private def commitVersion(df: DataFrame, path: String,
      captureKeys: Option[Seq[String]],
      captureEmpty: Boolean = false,
      knownDiff: Option[DataFrame] = None): Int = {
    val spark = df.sparkSession
    val prev = listVersions(spark, path).lastOption
    // captured commits validate schema compatibility BEFORE any write
    // (ADVICE r18: the drift guard used to fire inside the capture
    // diff, AFTER the snapshot published — the failure then left a
    // committed-but-uncaptured hole with no backfill op)
    for (_ <- captureKeys; p <- prev)
      requireAligned(loadVersion(spark, path, Some(p)), "previous head",
        df, "incoming commit", "saveVersionCdf")
    val next = nextVersion(spark, path)
    reserveCommit(spark, path, next)
    try {
      df.write.mode(SaveMode.ErrorIfExists).parquet(s"$path/v=$next")
      val capture: Option[DataFrame] = captureKeys match {
        // known-diff fast path (saveVersionCdfKnownDiff): the caller's
        // exact change set IS the capture — no snapshot re-diff join
        case Some(_) if knownDiff.isDefined && prev.isDefined =>
          knownDiff.map(_.withColumn("_commit_version", lit(next)))
        case Some(keys) => Some(prev match {
          case None =>
            // first commit: every row is an insert
            loadVersion(spark, path, Some(next))
              .withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(next))
          case Some(p) => changes(spark, path, p, next, keys)
        })
        case None if captureEmpty && cdfEnabled(spark, path) =>
          Some(df.limit(0)
            .withColumn("_change_type", lit("none"))
            .withColumn("_commit_version", lit(next)))
        case None => None
      }
      capture.foreach(_.write.mode(SaveMode.ErrorIfExists)
        .parquet(s"$path/_cdf/v=$next"))
      sealCommit(spark, path, next)
      next
    } catch {
      case e: Throwable =>
        abortCommit(spark, path, next)
        throw e
    }
  }

  private def cdfEnabled(spark: SparkSession, path: String): Boolean = {
    val cdfRoot = new org.apache.hadoop.fs.Path(s"$path/_cdf")
    cdfRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(cdfRoot)
  }

  /** All versions EVER committed at `path` per the persistent commit
    * log, unioned with the live directory listing (tables written
    * before the log existed, or populated by hand, have no `_commits`
    * entries — the listing keeps them covered; for such pre-log tables
    * a vacuumed commit is still invisible, the pre-r18 behavior).
    */
  private[graft] def listCommits(spark: SparkSession,
      path: String): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(path, "_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logged =
      if (!fs.exists(dir)) Seq.empty[Int]
      else fs.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toInt)
    (logged ++ listVersions(spark, path)).distinct.sorted
  }

  /** PUBLISHED (sealed) versions with live snapshot dirs. A version
    * whose commit is still in-flight (reserved, unsealed — see the
    * commit-protocol notes) is subtracted: its data dir may be
    * half-written, so no reader may resolve it as latest and no guard
    * may count it as a commit until the seal publishes it.
    */
  def listVersions(spark: SparkSession, path: String): Seq[Int] = {
    // Hadoop FS, not java.io.File — the warehouse may be s3a://, hdfs://
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val inflight = listInflight(spark, path).toSet
      fs.listStatus(p).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toInt)
        .filterNot(inflight.contains)
        .sorted
    }
  }

  def loadVersion(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(listVersions(spark, path).lastOption)
      .getOrElse(throw new IllegalArgumentException(s"no versions at $path"))
    readVersionDir(spark, s"$path/v=$v")
  }

  /** Read a pinned version ALIGNED TO THE HEAD SCHEMA (the lakehouse
    * schema-evolution read: each version dir is self-describing
    * parquet, so history legitimately spans schemas — Delta calls this
    * column mapping / schema evolution): columns the pinned version
    * predates fill with typed NULLs, columns the head dropped are
    * projected away, and shared columns cast to the head's type. This
    * is the alignment [[snapshotDiff]]/[[threeWayMergeOutcome]] demand
    * before diffing or merging across an evolved history (both refuse
    * drifted inputs rather than silently dropping the non-shared
    * columns). Row-local projection only — no data movement.
    */
  def loadVersionEvolved(spark: SparkSession, path: String,
      version: Int): DataFrame = {
    val head = loadVersion(spark, path)
    val old = loadVersion(spark, path, Some(version))
    val oldCols = old.columns.toSet
    old.select(head.schema.fields.toSeq.map { f =>
      if (oldCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Change-data-feed between two pinned versions (Delta
    * `table_changes` / CDF's directory-versioned analogue, computed as
    * a SNAPSHOT DIFF — the CDF-backfill form every lakehouse supports
    * for tables that didn't record changes at write time): row-level
    * insert / delete / update_preimage / update_postimage rows keyed
    * by `keys`, stamped with the range-end version (a snapshot diff
    * cannot attribute intermediate commits in a multi-version range —
    * that per-commit fidelity is exactly what write-time CDF buys).
    *
    * Plan: ONE keyed full-outer join of the two pinned snapshot reads
    * — presence comes from non-nullable marker columns (key columns
    * may legitimately be all that survives an anti-diff), update
    * detection is a null-safe struct compare over the non-key columns,
    * and the up-to-two change rows per key emit from a single
    * `explode(array_compact(...))` pass with no re-join. At 100 TB the
    * join shuffles each snapshot once on the table key — with
    * key-bucketed snapshot layouts it is co-located and shuffle-free;
    * nothing ever pairs beyond the key match.
    */
  def changes(spark: SparkSession, path: String, fromV: Int, toV: Int,
      keys: Seq[String]): DataFrame = {
    require(fromV < toV, s"fromV ($fromV) must precede toV ($toV)")
    snapshotDiff(
      loadVersion(spark, path, Some(fromV)),
      loadVersion(spark, path, Some(toV)), keys, toV)
  }

  /** The [[changes]] diff over EXPLICIT snapshot frames (the streaming
    * CDF producer feeds planted snapshots that never touch a versioned
    * path) — same plan, same output schema, `stampVersion` lands in
    * `_commit_version`.
    */
  /** Name+TYPE schema signature (ADVICE r18: the old name-set guards
    * passed a history whose evolution changed a column's TYPE — the
    * null-safe struct compare downstream then failed with an opaque
    * analysis error, or silently coerced). Nullability is excluded:
    * it varies benignly across writes of identical data.
    */
  private def schemaSig(df: DataFrame): Set[(String, String)] =
    df.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSet

  private def sigStr(df: DataFrame): String =
    df.schema.fields.sortBy(_.name)
      .map(f => s"${f.name}:${f.dataType.catalogString}").mkString(",")

  /** Shared drift refusal for diff/merge/captured-commit surfaces —
    * refuses BOTH added/dropped columns and changed column types,
    * pointing at [[loadVersionEvolved]] as the alignment path.
    */
  private def requireAligned(a: DataFrame, aName: String, b: DataFrame,
      bName: String, op: String): Unit =
    require(schemaSig(a) == schemaSig(b),
      s"$op: snapshot schemas differ ($bName schema differs from " +
        s"$aName) — $aName: ${sigStr(a)} vs $bName: ${sigStr(b)}; " +
        "proceeding would silently drop non-shared columns or coerce " +
        "drifted types. Align the snapshots first (loadVersionEvolved " +
        "reads a pinned version under the head schema, with typed " +
        "null fill and head-type casts), then retry")

  private[graft] def snapshotDiff(a: DataFrame, b: DataFrame,
      keys: Seq[String], stampVersion: Int): DataFrame = {
    // SCHEMA-DRIFT guard: valCols come from `a`, so a column added in
    // `b` would be SILENTLY dropped — the diff would miss changes in
    // it and every update postimage would lose it, handing
    // applyChanges/replayChanges a wrong head with no error; a TYPE
    // change would break the null-safe struct compare. Refuse loudly;
    // [[loadVersionEvolved]] is the supported way to read across an
    // evolved history (align first, then diff).
    requireAligned(a, "a", b, "b", "snapshotDiff")
    val valCols = a.columns.filterNot(keys.contains).toSeq
    val aSide = a.select(keys.map(col) ++
      valCols.map(c => col(c).as(s"__a_$c")) :+
      lit(true).as("__a_present"): _*)
    val bSide = b.select(keys.map(col) ++
      valCols.map(c => col(c).as(s"__b_$c")) :+
      lit(true).as("__b_present"): _*)
    val j = aSide.join(bSide, keys, "full_outer")
    val aP = col("__a_present") <=> lit(true)
    val bP = col("__b_present") <=> lit(true)
    def vals(side: String) =
      struct(valCols.map(c => col(s"__${side}_$c").as(c)): _*)
    val updated = aP && bP && !(vals("a") <=> vals("b"))
    def ev(tag: String, side: String) =
      struct(lit(tag).as("t"), vals(side).as("v"))
    j.select(keys.map(col) :+
        explode(array_compact(array(
          when(!aP, ev("insert", "b")),
          when(!bP, ev("delete", "a")),
          when(updated, ev("update_preimage", "a")),
          when(updated, ev("update_postimage", "b"))))).as("ch"): _*)
      .select(keys.map(col) ++
        valCols.map(c => col(s"ch.v.$c").as(c)) ++ Seq(
        col("ch.t").as("_change_type"),
        lit(stampVersion).as("_commit_version")): _*)
  }

  /** Zero-copy SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE`'s
    * directory-versioned analogue): publish a new version at `dstPath`
    * whose content is `srcPath`'s pinned `srcVersion` WITHOUT copying
    * a single data file — the version dir holds only a `_manifest`
    * (one absolute data-file path per line, written driver-side; a
    * bounded metadata op, file-count-sized). Readers resolve the
    * manifest transparently through [[loadVersion]]. The classic uses:
    * a dev/test fork of a 100 TB table in milliseconds, or a
    * reproducible-experiment pin that survives the source's forward
    * writes (source versions are immutable here, so the clone stays
    * valid — and VACUUMING the source past the cloned version, exactly
    * Delta's documented shallow-clone hazard, is GUARDED here: every
    * clone registers its pin under the file owner's `_clones/` dir,
    * and [[vacuumVersions]] refuses to delete a pinned version,
    * naming the pinning clone; deep-copy via
    * `saveVersion(loadVersion(src), dst)` to release the pin).
    */
  def shallowClone(spark: SparkSession, srcPath: String,
      srcVersion: Int, dstPath: String): Int = {
    // resolve through loadVersion's file set so cloning a CLONE works
    // (the manifest chain flattens — each clone lists real data files)
    val srcDir = s"$srcPath/v=$srcVersion"
    val p = new org.apache.hadoop.fs.Path(srcDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no version $srcVersion at $srcPath")
    val files: Seq[String] = {
      val mf = new org.apache.hadoop.fs.Path(srcDir, "_manifest")
      if (fs.exists(mf)) readManifest(fs, mf)
      else dataFiles(spark, srcDir).map(_.getPath.toString)
    }
    // Fail FAST on an empty source version (ADVICE r16): the manifest
    // carries no schema, so a zero-file clone would publish a version
    // dir every later loadVersion rejects ("empty clone manifest") —
    // an empty-but-valid source becoming unreadable THROUGH the clone
    // while staying readable directly. Refusing at clone time puts the
    // error where the cause is.
    require(files.nonEmpty,
      s"version $srcVersion at $srcPath has no data files — a shallow " +
        "clone of an empty version would be unreadable (the manifest " +
        "carries no schema); deep-copy via saveVersion(loadVersion(src)" +
        ", dst) if an empty pinned fork is really wanted")
    val next = nextVersion(spark, dstPath)
    // a clone is a commit on the DESTINATION chain: it publishes
    // through the same reserve → write → seal protocol as saveVersion
    // (racing writers fail loud pre-write; the number is never reused
    // after a destination vacuum; the captured-CDF guard sees it and
    // correctly refuses spanning ranges, since a clone records no
    // changes). A clean failure below aborts the reservation and
    // removes the clone dir — its pin registrations then read as
    // stale (clone dir gone) and vacuum's GC reaps them.
    reserveCommit(spark, dstPath, next)
    val dstDir = new org.apache.hadoop.fs.Path(s"$dstPath/v=$next")
    try {
    // Resolve the version dir OWNING each data file by walking UP to
    // the nearest `v=<n>` ancestor (not just the direct parent — a
    // version written with a nested/partitioned layout puts files
    // under `v=<n>/k=val/...`). ADVICE r17: the old parent-only filter
    // silently registered NO pin for such layouts, so vacuumVersions
    // would delete a still-referenced version without refusing —
    // exactly the silent corruption the guard exists to stop. A file
    // with NO v=* ancestor cannot be pin-protected at all: FAIL the
    // clone (the empty-version fail-fast precedent) rather than
    // publish an unguarded manifest.
    def versionAncestor(f: String): org.apache.hadoop.fs.Path = {
      var d = new org.apache.hadoop.fs.Path(f).getParent
      while (d != null && !d.getName.startsWith("v=")) d = d.getParent
      require(d != null,
        s"clone source file $f is not under any v=<n> version dir — " +
          "its version cannot be pinned against vacuum, so a shallow " +
          "clone of it would be silently corruptible; deep-copy via " +
          "saveVersion(loadVersion(src), dst) instead")
      d
    }
    val pinnedDirs = files.map(versionAncestor).distinct
    // the destination may live on a DIFFERENT filesystem than the
    // source (clone s3a://prod into file:/dev-scratch) — resolve its
    // own FS; the manifest's absolute paths keep pointing at the source
    val dfs = dstDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dfs.mkdirs(dstDir)
    // Register the pins where the DATA FILES live (VERDICT r16 #1) —
    // which for a clone-of-clone is the ORIGINAL source (the manifest
    // chain flattens), so the guard protects the right table: one
    // `_clones/_pin_*` marker per pinned version dir, recording the
    // clone version dir that depends on it. `_`-prefixed throughout,
    // so plain readers and dataFiles listings never see the registry.
    // ORDER (ADVICE r17 TOCTOU): the clone dir is created FIRST (so a
    // concurrent vacuum's stale-pin GC sees it alive), the pins are
    // registered SECOND, and the manifest publishes LAST — a vacuum
    // racing this clone sees the pin before any reader can resolve
    // the manifest. (A crash between pin and manifest leaves a
    // blocking pin on an empty clone dir — conservative; delete the
    // clone dir to release it. Single writer per table assumed, as
    // everywhere in this directory-versioned lake.)
    // Driver-side metadata, file-count-bounded.
    pinnedDirs.foreach { pinnedDir =>
      val reg = new org.apache.hadoop.fs.Path(
        pinnedDir.getParent, "_clones")
      val rfs = reg.getFileSystem(spark.sparkContext.hadoopConfiguration)
      rfs.mkdirs(reg)
      val token = java.util.UUID.nameUUIDFromBytes(
        dstDir.toString.getBytes("UTF-8")).toString
      val ro = rfs.create(
        new org.apache.hadoop.fs.Path(reg, s"_pin_$token"), true)
      try ro.write(s"${pinnedDir.getName}\n$dstDir"
        .getBytes("UTF-8"))
      finally ro.close()
    }
    val out = dfs.create(
      new org.apache.hadoop.fs.Path(dstDir, "_manifest"), false)
    try out.write(files.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    sealCommit(spark, dstPath, next)
    next
    } catch {
      case e: Throwable =>
        abortCommit(spark, dstPath, next)
        throw e
    }
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      mf: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(mf)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Manifest-aware pinned read: a version dir carrying a `_manifest`
    * resolves to its listed files (shallow clone); a plain dir reads
    * its parquet. One driver-side existence check per load.
    */
  private def readVersionDir(spark: SparkSession,
      dir: String): DataFrame = {
    val mf = new org.apache.hadoop.fs.Path(dir, "_manifest")
    val fs = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(mf)) {
      val files = readManifest(fs, mf)
      require(files.nonEmpty, s"empty clone manifest at $dir")
      spark.read.parquet(files: _*)
    } else spark.read.parquet(dir)
  }

  /** Write-time CDF capture (Delta's `delta.enableChangeDataFeed`
    * analogue; VERDICT r15 noted snapshot-diff [[changes]] "cannot
    * attribute intermediate commits — write-time CDF capture is the
    * remaining step"): publish `df` as the next version AND record its
    * row-level changes vs the previous version under
    * `path/_cdf/v=<n>` AT COMMIT TIME, each row stamped with ITS OWN
    * commit version. The `_`-prefixed dir follows Delta's
    * `_change_data` convention — Hadoop input listing skips `_`
    * children, so a plain reader of the table root never sees CDF
    * files. Cost at 100 TB: the diff is ONE keyed full-outer join of
    * the new snapshot against the previous one (co-located and
    * shuffle-free under key-bucketed layouts) and the CDF artifact is
    * churn-sized, not table-sized.
    *
    * ATOMIC with its capture (ADVICE r18, medium): schema
    * compatibility is validated BEFORE any write, the capture lands
    * BEFORE the commit seals, and the seal publishes snapshot +
    * capture in one rename — no failure mode leaves a
    * committed-but-uncaptured version (the hole that made every
    * spanning [[capturedChanges]] range refuse permanently, with no
    * backfill op).
    */
  def saveVersionCdf(df: DataFrame, path: String,
      keys: Seq[String]): Int =
    commitVersion(df, path, captureKeys = Some(keys))

  /** [[saveVersionCdf]] for a caller that ALREADY HOLDS the commit's
    * exact change set (r19 optimization round): the capture is the
    * provided diff (re-stamped with the committed version) instead of
    * a recomputed [[changes]] snapshot diff. The generic capture path
    * re-reads BOTH snapshots and full-outer-joins them — O(|table|)
    * per commit; a producer folding a known churn batch into the head
    * (the streaming CDF commit loop) pays that join twice per commit
    * for nothing, and at 100 TB it is the difference between
    * O(|churn|) and O(|table|) write-time capture. This is how
    * write-time CDF actually works in Delta: the commit RECORDS the
    * changes it applied; it never re-diffs.
    *
    * Contract: `diff` must be the EXACT change set in the capture
    * schema (keys + value columns + `_change_type`
    * insert/delete/update_preimage/update_postimage rows, the
    * [[snapshotDiff]] output) such that
    * `applyChanges(head, diff) == df`. The streaming producer's feed
    * batches are snapshotDiff outputs verbatim, so this holds by
    * construction there; the produce→consume oracle (lake_write_cdf's,
    * hash-compared) and StreamingSpec's round-trip law gate it
    * end-to-end. `_commit_version` is overwritten with the committed
    * version (metadata-only), so a stale stamp cannot mislabel the
    * capture.
    */
  private[graft] def saveVersionCdfKnownDiff(df: DataFrame, path: String,
      keys: Seq[String], diff: DataFrame): Int = {
    val cap = Set("_change_type", "_commit_version")
    require(cap.subsetOf(diff.columns.toSet),
      s"known-diff capture must carry ${cap.mkString(", ")} — got " +
        diff.columns.mkString(", "))
    commitVersion(df, path, captureKeys = Some(keys),
      knownDiff = Some(diff))
  }

  /** Versioned save of a CONTENT-IDENTICAL maintenance rewrite
    * (compaction rewrites files, not rows): on a capture-enabled
    * table the commit records an EMPTY change set — the honest
    * capture of a no-change commit ([[replayChanges]] over it is the
    * identity; no keys needed, nothing to key) — so the captured feed
    * stays commit-complete instead of refusing on a needless hole.
    * Same reserve/write/seal atomicity as [[saveVersionCdf]].
    */
  private[graft] def saveVersionRewrite(df: DataFrame,
      path: String): Int =
    commitVersion(df, path, captureKeys = None, captureEmpty = true)

  /** Read the write-time-captured CDF for commits in (fromV, toV] —
    * COMMIT-GRANULAR attribution (each row carries the commit that
    * produced it), the fidelity [[changes]]' snapshot diff cannot
    * provide over a multi-version range. Reads the `_cdf` layout with
    * partition discovery, so the version range is a DIRECTORY prune —
    * an incremental consumer pays only the commits it hasn't seen.
    *
    * MIXED-WRITE guard (ADVICE r16): a commit written WITHOUT capture
    * (plain [[saveVersion]], or [[restoreVersion]], which uses it)
    * leaves no `_cdf/v=n` entry — a range read that silently omitted
    * it would hand [[replayChanges]] an incomplete feed and the
    * documented `replayChanges(v_a, capturedChanges(a,b)) == v_b`
    * invariant would break with NO error. So the range read first
    * compares the `_cdf` version dirs against the PERSISTENT commit
    * log ([[listCommits]]; VERDICT r17 #1 — the old [[listVersions]]
    * check was vacuum-mutable: an uncaptured commit that retention
    * later dropped vanished from the listing and the guard passed,
    * resurrecting the exact silent-wrong-head hazard it was built
    * against) restricted to (fromV, toV] and FAILS, naming the
    * uncaptured commits ([[restoreVersionCdf]] / [[saveVersionCdf]]
    * are the fixes; [[changes]]' snapshot diff is the backfill — and
    * for a VACUUMED commit, whose `_cdf` retention also reaped, the
    * snapshots are gone too: the range is simply no longer
    * reconstructible and refusing is the only honest answer).
    * Driver-side directory listings only — commit-count-sized, never
    * data.
    */
  def capturedChanges(spark: SparkSession, path: String,
      fromV: Int, toV: Int): DataFrame = {
    // fromV == toV is LEGAL (ADVICE r18): a caught-up incremental
    // consumer polling (head, head] — the steady state of the feed
    // loop this API exists for, and legal in Delta's table_changes —
    // gets an EMPTY feed in the capture schema, not an exception
    require(fromV <= toV, s"fromV ($fromV) must not exceed toV ($toV)")
    val cdfRoot = new org.apache.hadoop.fs.Path(s"$path/_cdf")
    val fs = cdfRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(cdfRoot),
      s"no write-time CDF captured at $path — versions written with " +
        "saveVersion record no changes; use saveVersionCdf at commit " +
        "time, or the changes() snapshot diff as the backfill")
    val inRange = listCommits(spark, path)
      .filter(v => v > fromV && v <= toV)
    val captured = fs.listStatus(cdfRoot).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt).toSet
    val missing = inRange.filterNot(captured.contains)
    require(missing.isEmpty,
      s"commits ${missing.map(v => s"v=$v").mkString(", ")} in " +
        s"($fromV, $toV] at $path have no write-time CDF (written with " +
        "plain saveVersion/restoreVersion, or their capture was " +
        "vacuumed) — a captured range read would silently skip them " +
        "and replayChanges would reconstruct a wrong head; re-commit " +
        "via saveVersionCdf/restoreVersionCdf, or use the changes() " +
        "snapshot diff for this range if the snapshots are retained")
    if (inRange.isEmpty) {
      // legitimately empty range: zero-row frame in the capture schema
      // (from the newest retained capture — its schema IS the feed's;
      // falls back to head-snapshot + change columns if retention
      // reaped every capture artifact)
      val like =
        if (captured.nonEmpty)
          spark.read.parquet(s"$path/_cdf/v=${captured.max}")
        else loadVersion(spark, path)
          .withColumn("_change_type", lit("none"))
          .withColumn("_commit_version", lit(0))
      like.limit(0)
    } else
    // read the in-range capture dirs DIRECTLY (the directory prune),
    // never the `_cdf` root with partition discovery: the rows already
    // carry `_commit_version` as a data column, and root discovery
    // would infer the `v=` dir as a partition column — colliding with
    // any table whose OWN schema has a column named `v` (a real user
    // table name; found by the LakeSpec merge-on-CDF test)
    spark.read.parquet(inRange.map(v => s"$path/_cdf/v=$v"): _*)
  }

  /** Replay a MULTI-COMMIT captured CDF onto a snapshot, one commit at
    * a time in version order. A single [[applyChanges]] pass is only
    * sound within one commit — across commits a key updated in commit
    * n and deleted in commit n+1 would have its n-postimage re-added
    * after the delete removed it. `replayChanges(v_a,
    * capturedChanges(a, b)) ≡ v_b` (LakeSpec). The fold length is the
    * commit count (bounded metadata), never data-sized.
    */
  def replayChanges(target: DataFrame, cdf: DataFrame,
      keys: Seq[String]): DataFrame = {
    val commits = cdf.select(col("_commit_version")).distinct()
      .orderBy(col("_commit_version").asc)
      .collect().map(_.getInt(0)).toSeq // bounded: one row per commit
    commits.foldLeft(target) { (acc, v) =>
      applyChanges(acc, cdf.filter(col("_commit_version") === v), keys)
    }
  }

  /** Apply a change-data-feed to a snapshot — the CONSUME side of
    * [[changes]] (Delta's APPLY CHANGES / streaming-CDF-merge analogue):
    * rows keyed by a delete or update_preimage entry leave, insert and
    * update_postimage rows enter. `applyChanges(v_n, changes(n, m)) ≡
    * v_m` by construction (LakeSpec + the declared
    * `lake_apply_changes` gate) — the property that lets any downstream
    * replica advance by shipping ONLY the delta. One keyed anti-join +
    * a union; at 100 TB with key-bucketed layouts both are co-located.
    */
  def applyChanges(target: DataFrame, cdf: DataFrame,
      keys: Seq[String]): DataFrame = {
    val removed = cdf
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select(keys.map(col): _*).distinct()
    val added = cdf
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type", "_commit_version")
    target.join(removed, keys, "left_anti").unionByName(added)
  }

  /** Keyed THREE-WAY MERGE outcome (Git-style branch reconciliation
    * over snapshots; VERDICT r17 #2: `lake_branch` ships divergence but
    * nothing merges a dev branch back): classify every key across
    * `base` (the snapshot both chains diverged from), `ours` (the
    * merge-destination head) and `theirs` (the branch head), and
    * resolve per key with the standard rules —
    *   - changed on ONE side only → that side wins (incl. deletes);
    *   - unchanged on both → the base row survives;
    *   - changed IDENTICALLY on both → that shared change (no
    *     conflict: both chains made the same edit);
    *   - changed DIFFERENTLY on both → CONFLICT, resolved
    *     destination-wins (`ours`), and the row is FLAGGED so callers
    *     can report instead of silently shipping the policy.
    * "Changed" is a null-safe compare of the side's value struct
    * against base's, where an absent key is a NULL struct — so
    * insert/insert, update/delete and delete/update all classify
    * through the ONE rule (LakeSpec pins the full conflict matrix).
    *
    * Returns one row per key in base ∪ ours ∪ theirs: the key columns,
    * the MERGED value columns (null when the merged outcome is
    * "deleted"), `_merge_present` (false = deleted), and
    * `_merge_conflict`. Plan at 100 TB: two keyed full-outer joins on
    * the table key (co-located and shuffle-free under key-bucketed
    * snapshot layouts) + row-local struct compares — nothing ever
    * pairs beyond the key match, exactly the [[changes]] shape run
    * twice.
    */
  def threeWayMergeOutcome(base: DataFrame, ours: DataFrame,
      theirs: DataFrame, keys: Seq[String]): DataFrame = {
    // same schema-drift guard as snapshotDiff (name AND type — ADVICE
    // r18): valCols come from base, so a column added on either head
    // would silently vanish from the merge and a drifted type would
    // break the struct compares — refuse; align via loadVersionEvolved
    for ((side, df) <- Seq("ours" -> ours, "theirs" -> theirs))
      requireAligned(base, "base", df, side, "threeWayMergeOutcome")
    val valCols = base.columns.filterNot(keys.contains).toSeq
    // presence marker INSIDE the struct: a present row with all-null
    // values must not compare equal to an absent (NULL-struct) row,
    // and a keys-only table still gets a non-empty struct
    def side(df: DataFrame, tag: String) =
      df.select(keys.map(col) :+
        struct(lit(true).as("__present") +: valCols.map(col): _*)
          .as(s"__$tag"): _*)
    val j = side(base, "b")
      .join(side(ours, "o"), keys, "full_outer")
      .join(side(theirs, "t"), keys, "full_outer")
    val oCh = !(col("__o") <=> col("__b"))
    val tCh = !(col("__t") <=> col("__b"))
    // one-side change → that side; both changed → ours (which is also
    // the agreeing value when the changes are identical)
    val merged = when(!oCh, col("__t")).otherwise(col("__o"))
    val conflict = oCh && tCh && !(col("__o") <=> col("__t"))
    j.select(keys.map(col) ++ Seq(merged.as("__m"),
      conflict.as("_merge_conflict")): _*)
      .select(keys.map(col) ++
        valCols.map(c => col(s"__m.$c").as(c)) ++ Seq(
        col("__m").isNotNull.as("_merge_present"),
        col("_merge_conflict")): _*)
  }

  /** Merge a diverged [[shallowClone]] branch back into its source
    * chain: base = the source version the branch was cloned from,
    * ours = the source's current head, theirs = the branch's current
    * head; the merged snapshot publishes as the source's next version
    * (history stays append-only — both heads remain pinned-readable,
    * exactly like [[restoreVersion]]). On a table whose commits carry
    * write-time CDF, pass `capture = true` so the merge commit
    * publishes through [[saveVersionCdf]] — a plain publish would
    * leave the merge uncaptured and [[capturedChanges]] would then
    * refuse every range spanning it (the restoreVersionCdf
    * precedent). Returns (newVersion, outcome): the outcome frame
    * ([[threeWayMergeOutcome]]) carries the per-key conflict flags
    * for reporting.
    */
  def mergeBranch(spark: SparkSession, srcPath: String,
      branchPath: String, baseSrcVersion: Int,
      keys: Seq[String], capture: Boolean = false): (Int, DataFrame) = {
    val outcome = threeWayMergeOutcome(
      loadVersion(spark, srcPath, Some(baseSrcVersion)),
      loadVersion(spark, srcPath),
      loadVersion(spark, branchPath), keys)
    val merged = outcome.filter(col("_merge_present"))
      .drop("_merge_present", "_merge_conflict")
    val v = if (capture) saveVersionCdf(merged, srcPath, keys)
      else saveVersion(merged, srcPath)
    (v, outcome)
  }

  /** Rollback (Delta `RESTORE TABLE ... TO VERSION` analogue): publish
    * the content of pinned `version` as a NEW latest version. History
    * is append-only — the bad intermediate versions stay readable by
    * pin (audit trail), the latest pointer moves forward, and readers
    * never see a mutated snapshot. Returns the new version number.
    * One distributed copy of the pinned snapshot's files; no other
    * version is touched.
    */
  def restoreVersion(spark: SparkSession, path: String,
      version: Int): Int =
    saveVersion(loadVersion(spark, path, Some(version)), path)

  /** [[restoreVersion]] for a table whose commits carry write-time CDF
    * (ADVICE r16: a plain restore on such a table leaves its commit
    * uncaptured, and [[capturedChanges]] then refuses any range
    * spanning it): the rollback publishes through [[saveVersionCdf]],
    * so the restore commit records its own row-level changes vs the
    * previous head and the captured feed stays commit-complete.
    */
  def restoreVersionCdf(spark: SparkSession, path: String,
      version: Int, keys: Seq[String]): Int =
    saveVersionCdf(loadVersion(spark, path, Some(version)), path, keys)

  /** Snapshot retention (Delta VACUUM's directory-versioned analogue):
    * delete all but the newest `keep` versions under `path`. Readers
    * pinned to a retained version are unaffected; the latest pointer
    * (max v) never changes. Refuses keep < 1 — vacuuming everything
    * would delete the live snapshot.
    *
    * CLONE-AWARE (VERDICT r16 #1 — the one place a supported op could
    * silently corrupt another's output): a version pinned by a live
    * [[shallowClone]] manifest must not be deleted — the clone's reads
    * would start failing (or worse, silently shrink) with no error at
    * the clone. Every clone registers its pin under `path/_clones/`
    * (written by shallowClone at the FILE OWNER's root, so
    * clone-of-clone pins the original); vacuum REFUSES to drop a
    * pinned version, naming the pinning clone — deep-copy the clone
    * (saveVersion(loadVersion(clone), …)) or delete it to release the
    * pin. A registration whose clone dir no longer exists is stale:
    * it is garbage-collected here and does not block. Driver-side
    * directory listings only; clone-count-bounded.
    */
  def vacuumVersions(spark: SparkSession, path: String, keep: Int): Seq[Int] = {
    require(keep >= 1, s"keep must be >= 1, got $keep (would delete the live snapshot)")
    val versions = listVersions(spark, path)
    val drop = versions.dropRight(keep)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reg = new org.apache.hadoop.fs.Path(path, "_clones")
    if (fs.exists(reg)) {
      // full sweep FIRST (stale pins GC even when a later pin blocks),
      // one aggregated refusal AFTER — a partial sweep would leave GC
      // dependent on listing order
      val blocking = fs.listStatus(reg).toSeq
        .filter(r => r.isFile && r.getPath.getName.startsWith("_pin_"))
        .flatMap { r =>
          val lines = readManifest(fs, r.getPath)
          val pinnedV = lines.headOption
            .filter(_.startsWith("v="))
            .map(_.stripPrefix("v=").toInt)
          val cloneDir = lines.drop(1).headOption
          val cloneAlive = cloneDir.exists { d =>
            val cp = new org.apache.hadoop.fs.Path(d)
            cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .exists(cp)
          }
          if (!cloneAlive) { // stale pin: GC it, it blocks nothing
            fs.delete(r.getPath, false)
            None
          } else pinnedV.filter(drop.contains)
            .map(v => (v, cloneDir.get))
        }
      if (blocking.nonEmpty) {
        val what = blocking.sortBy(_._1)
          .map { case (v, c) => s"v=$v (pinned by $c)" }.mkString(", ")
        throw new IllegalStateException(
          s"vacuum of $path would delete $what — each shallow clone's " +
            "manifest references that version's data files and every " +
            "read through the clone would break. Deep-copy the clone " +
            "(saveVersion(loadVersion(clone), …)) or delete it, then " +
            "vacuum.")
      }
    }
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/v=$v"), true)
      // CDF retention rides snapshot retention (VERDICT r17 #1's
      // second half): the write-time capture of a dropped commit is
      // reaped with it — otherwise `_cdf` churn accretes forever.
      // Same pin rules by construction (pinned versions never reach
      // `drop`), and the commit-log entry STAYS (append-only), so
      // capturedChanges over a range touching this commit now refuses
      // instead of silently skipping it.
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_cdf/v=$v"), true)
      ()
    }
    drop
  }

  /** Snapshot history as rows (Delta DESCRIBE HISTORY analogue): one row
    * per retained version with file count, byte size, and latest flag.
    * Metadata listing only — nothing reads the data files.
    */
  def versionHistory(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = listVersions(spark, path)
    val latest = versions.lastOption.getOrElse(-1)
    versions.map { v =>
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/v=$v"))
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      (v, files.length, files.map(_.getLen).sum, v == latest)
    }.toDF("version", "n_files", "bytes", "is_latest")
  }

  /** Dataset maintenance: compact a parquet dataset to
    * `targetFileCount` files — the fixed-count flavor (callers who know
    * their file budget). `compactToSize` below is the bin-packing flavor.
    */
  def compact(spark: SparkSession, path: String, targetFileCount: Int): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    df.repartition(targetFileCount).write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(spark, tmp, path)
  }

  /** Recursive data-file listing (skips `_SUCCESS`/`.crc` bookkeeping
    * AND anything under a `_`/`.`-prefixed directory — the `_commits`
    * log markers are named `v=<n>` with no underscore of their own, so
    * the file-name filter alone would count them as data).
    */
  def dataFiles(spark: SparkSession, path: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(p)
    def hiddenAncestor(q: org.apache.hadoop.fs.Path): Boolean = {
      var d = q.getParent
      while (d != null && d != root) {
        val n = d.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        d = d.getParent
      }
      false
    }
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[
        org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".") &&
            !hiddenAncestor(f.getPath)) buf += f
      }
      buf.toSeq
    }
  }

  /** Bin-packed file count for a byte-size target: ceil(bytes/target),
    * never 0. Driver-side metadata arithmetic only.
    */
  def packedFileCount(spark: SparkSession, path: String,
      targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0")
    val total = dataFiles(spark, path).map(_.getLen).sum
    math.max(1L, (total + targetFileBytes - 1) / targetFileBytes).toInt
  }

  /** Bin-packing small-file compaction (Delta OPTIMIZE's parquet-native
    * analogue; closes the "compaction is the caller's choice" punt in
    * the header note): size the rewrite from the dataset's ACTUAL bytes
    * so output files land near `targetFileBytes` regardless of how
    * fragmented the input is. A Hive-partitioned layout is compacted
    * per-partition-directory — bin-packing across partitions would
    * destroy the key=value layout (and with it partition pruning);
    * per-dir rewrites preserve it and parallelize the small-file
    * problem where it actually lives. Returns (filesBefore, filesAfter).
    *
    * Scale: listing is metadata-only; each rewrite is one distributed
    * read→repartition→write with no driver-side data movement. The
    * scratch-dir + rename swap keeps the unavailability window to the
    * delete→rename gap (swapInto notes).
    */
  def compactToSize(spark: SparkSession, path: String,
      targetFileBytes: Long): (Int, Int) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(spark, path).length
    val partDirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.startsWith("_")) // _commits/_cdf/_clones
    if (partDirs.nonEmpty) {
      // per-partition rewrite; tmp lives OUTSIDE the dataset root — a
      // sibling `k=v__tmp` dir inside it would parse as a partition
      // value and corrupt concurrent partition discovery
      val tmpRoot = path.stripSuffix("/") + "__compact_tmp"
      partDirs.foreach { d =>
        val dir = d.getPath.toString
        val n = packedFileCount(spark, dir, targetFileBytes)
        val tmp = s"$tmpRoot/${d.getPath.getName}"
        spark.read.parquet(dir).repartition(n)
          .write.mode(SaveMode.Overwrite).parquet(tmp)
        swapInto(spark, tmp, dir)
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmpRoot), true)
    } else {
      val n = packedFileCount(spark, path, targetFileBytes)
      val tmp = path.stripSuffix("/") + "__compact_tmp"
      spark.read.parquet(path).repartition(n)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      swapInto(spark, tmp, path)
    }
    (before, dataFiles(spark, path).length)
  }

  /** Cluster-and-sort save for scan pruning (Delta OPTIMIZE ZORDER's
    * single-column cousin, parquet-native): range-partition on the sort
    * keys so each output file owns a disjoint key range, then sort
    * within partitions so every parquet row group carries tight min/max
    * stats on those keys. Point/range filters on the sort keys then skip
    * whole files (via partition-level stats) and whole row groups (via
    * predicate pushdown) instead of scanning — at 100 TB this is the
    * difference between touching one file and touching all of them.
    */
  def saveSorted(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Option[Int] = None): Unit = {
    val keys = sortCols.map(col)
    val ranged = numFiles match {
      case Some(n) => df.repartitionByRange(n, keys: _*)
      case None => df.repartitionByRange(keys: _*) // AQE sizes partitions
    }
    ranged.sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-order save (Delta OPTIMIZE ZORDER BY (a, b), parquet-native):
    * bucket both cluster columns, interleave the bucket bits into a
    * Morton key, then range-partition + sort files on that key — rows
    * close in EITHER dimension cluster on disk, so min/max stats stay
    * tight on both columns and a predicate on either one skips row
    * groups/files (`saveSorted` gives this for the leading key only).
    *
    * Buckets here are equal-width from a 1-row broadcast min/max (no
    * driver action); a production z-order samples quantile boundaries
    * instead so heavy skew can't crowd one bucket — the write shape
    * (row-local key computation + one range shuffle) is identical.
    */
  def saveZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    import graft.functions.ZOrder
    val bounds = df.agg(
      min(col(colA)).as("__alo"), max(col(colA)).as("__ahi"),
      min(col(colB)).as("__blo"), max(col(colB)).as("__bhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__zkey", ZOrder.morton2(
        ZOrder.bucket(col(colA), col("__alo"), col("__ahi"), 256),
        ZOrder.bucket(col(colB), col("__blo"), col("__bhi"), 256)))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey", "__alo", "__ahi", "__blo", "__bhi")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** SCD type-2 apply (`merge_scd2`): fold an update batch into a
    * versioned dimension whose rows carry (valid_from, valid_to,
    * is_current). Change detection is explicit attribute comparison —
    * an update row whose attributes equal the current version is a
    * NO-OP (no spurious version), changed keys close the current row
    * at `newVersion` and open a new one, never-seen keys insert.
    *
    * Scale: two keyed semi/anti joins on the dimension key + unions —
    * no window, no full-dimension rewrite logic beyond what MERGE
    * itself costs (LakeIO.upsert notes); history rows pass through
    * untouched.
    */
  def scd2Apply(dim: DataFrame, updates0: DataFrame, keys: Seq[String],
      attrs: Seq[String], newVersion: Int): DataFrame = {
    // duplicate update keys would open TWO current rows per key — the
    // corrupt-dimension outcome; same in-plan guard as upsert
    val updates = requireUniqueSourceKeys(updates0, keys, "scd2Apply")
    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))
    val keyCols = keys.map(col)
    def attrStruct(prefix: String) =
      struct(attrs.map(a => col(s"$prefix$a")): _*)
    val changed = cur.as("c")
      .join(updates.as("u"), keys)
      .filter(attrStruct("c.") =!= attrStruct("u."))
      .select(keys.map(k => col(s"c.$k")): _*)
    val closed = cur.join(changed, keys, "left_semi")
      .withColumn("valid_to", lit(newVersion))
      .withColumn("is_current", lit(false))
    val stillCurrent = cur.join(changed, keys, "left_anti")
    val opened = updates.join(changed, keys, "left_semi")
    val inserted = updates.join(cur.select(keyCols: _*), keys, "left_anti")
    val fresh = opened.unionByName(inserted)
      .withColumn("valid_from", lit(newVersion))
      .withColumn("valid_to", lit(null).cast("int"))
      .withColumn("is_current", lit(true))
    hist.unionByName(closed).unionByName(stillCurrent)
      .unionByName(fresh.select(dim.columns.map(col): _*))
  }
}

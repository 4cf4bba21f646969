package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink / ingest operators expressed as driver-contract queries
  * (SURVEY.md §2.A): each writes through LakeIO to a scratch dir, reads
  * the result back, and returns it totally ordered — so the DuckDB
  * oracle checks the full write→read round-trip, not just the write call
  * succeeding. This mirrors how novlake's save_dataset is validated in
  * practice: the saved table must be immediately queryable with the same
  * content [upstream, unverified — SURVEY.md §0; novlake/lake.py].
  *
  * Scale notes: writers inherit upstream partitioning (no coalesce);
  * partitioned writes produce Hive-style dirs so reads prune partitions.
  */
object SinkQueries {

  // Per-process unique scratch root (ADVICE r1): a fixed path keyed only
  // by sfDir let two concurrent processes on the same sfDir (Bench and
  // Verify) race on the same sink dirs, and Int hashCode collisions
  // could alias different sfDirs. pid+startTime is unique per JVM;
  // stable within one, so each query's save→read-back round-trip still
  // reuses its own dir across calls in a session.
  private val processTag: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    s"${rt.getName.takeWhile(_ != '@')}_${rt.getStartTime.toHexString}"
  }

  private[graft] def tmpBase(sfDir: String): String = {
    val h = Integer.toHexString(sfDir.hashCode)
    s"${graft.Scratch.fastTmpDir()}/graft_sinks_${processTag}_$h"
  }

  /** Per-invocation scratch directory (ADVICE r15: the versioned-lake
    * queries wrote to a FIXED path with rmDir at entry, so two
    * overlapping invocations could interleave rmDir/saveVersion and
    * read a half-written version chain — the same race ADVICE r14
    * flagged for the persisted index). Each call gets a UUID-suffixed
    * subdir; accumulation is bounded by an entry-time sweep of sibling
    * dirs idle >30 min (live concurrent runs finish well inside that).
    * Values are unaffected — the path never feeds the oracle hash.
    */
  private[graft] def uniqueRunDir(sfDir: String, name: String): String = {
    val parent = new java.io.File(tmpBase(sfDir) + s"/${name}_runs")
    parent.mkdirs()
    val cutoff = System.currentTimeMillis() - 30L * 60 * 1000
    Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.lastModified() < cutoff)
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        try rm(d) catch { case _: Exception => () }
      }
    new java.io.File(parent,
      java.util.UUID.randomUUID().toString).toString
  }

  // Fixed writer task count for the scratch-sink queries (VERDICT r2
  // #6): letting the write inherit the scan's split count made file
  // counts — and so bench IO time — vary with AQE coalescing and file
  // layout from round to round. A caller sizing real datasets picks
  // their own repartition (LakeIO notes); the DECLARED sink queries pin
  // it so bench numbers are comparable across runs.
  private val writerTasks = 8

  /** `sink_parquet` — overwrite-save + read-back (novlake save_dataset). */
  def sinkParquet(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/sink_parquet"
    val df = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000.0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    LakeIO.saveDataset(df.repartition(writerTasks, col("o_orderkey")), out)
    spark.read.parquet(out)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_orderkey").asc)
  }

  /** `sink_partitioned` — Hive-style partitioned save + read-back
    * (partition values round-trip, including '#' URL-escaping).
    */
  def sinkPartitioned(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/sink_partitioned"
    val df = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_size")
    LakeIO.savePartitioned(df, out, Seq("p_brand"))
    spark.read.parquet(out)
      .select("p_partkey", "p_brand", "p_size")
      .orderBy(col("p_partkey").asc)
  }

  /** `scan_partition_prune` — read-side partition pruning, declared:
    * write a Hive-partitioned layout (the `sink_partitioned` path),
    * read it back with a predicate on the PARTITION column, and return
    * the qualifying rows. The predicate must resolve at PLANNING time
    * against directory names (`PartitionFilters` on the scan — zero
    * data files outside `p_brand=Brand%2313` are opened; PlanShapeSpec
    * pins the filter and the files-read count), which is the #1 cost
    * lever at 100 TB: a date/tenant-partitioned lake turns a full scan
    * into a single-directory read before any I/O happens. The value
    * `Brand#13` also exercises the URL-escaping round-trip ('#' →
    * `%23` in the directory name, un-escaped by the reader back into
    * the column).
    */
  def scanPartitionPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/scan_partition_prune"
    LakeIO.savePartitioned(
      Tables.part(spark, sfDir).select("p_partkey", "p_brand", "p_size"),
      out, Seq("p_brand"))
    spark.read.parquet(out)
      .filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .orderBy(col("p_partkey").asc)
  }

  /** `sink_append` — overwrite one slice then append a disjoint one;
    * read-back must contain exactly both.
    */
  def sinkAppend(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/sink_append"
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus")
    LakeIO.saveDataset(ord.filter(col("o_orderstatus") === "F")
      .repartition(writerTasks, col("o_orderkey")), out)
    LakeIO.appendDataset(ord.filter(col("o_orderstatus") === "O")
      .repartition(writerTasks, col("o_orderkey")), out)
    spark.read.parquet(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus").asc)
  }

  /** `sink_schema_evolution` — schema-drift APPEND + mergeSchema
    * read-back (the Delta/Iceberg schema-evolution surface,
    * parquet-native): v1 writes (key, price), a later batch appends
    * with an EXTRA column, and the merged read must surface the union
    * schema with NULLs for pre-evolution rows. This is the lake
    * behavior novlake users hit when a producer adds a field —
    * awswrangler's catalog-evolution path; here parquet footer merge
    * (`mergeSchema=true`) carries it. Oracled against a DuckDB UNION
    * ALL with explicit NULL padding, so a dropped column, a mistyped
    * pad, or rows lost in the merged read all break the hash.
    *
    * Scale: mergeSchema reads every file footer (metadata-sized, not
    * data); the scan itself stays one pass with pushdown intact.
    */
  def sinkSchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/sink_schema_evolution"
    val ord = Tables.orders(spark, sfDir)
    LakeIO.saveDataset(ord.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_totalprice")
      .repartition(writerTasks, col("o_orderkey")), out)
    LakeIO.appendDataset(ord.filter(col("o_orderstatus") === "O")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .repartition(writerTasks, col("o_orderkey")), out)
    spark.read.option("mergeSchema", "true").parquet(out)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy(col("o_orderkey").asc)
  }

  /** `sink_replace_partition` — dynamic partition overwrite: replace ONLY
    * the 'O' partition with a filtered batch; 'F' must survive intact
    * (awswrangler overwrite_partitions / Delta replaceWhere semantics,
    * parquet-native — SURVEY.md §2.A, §7.4).
    */
  def sinkReplacePartition(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/sink_replace_partition"
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    LakeIO.savePartitioned(ord, out, Seq("o_orderstatus"))
    val replacement = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 200000.0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    LakeIO.replacePartitions(replacement, out, Seq("o_orderstatus"))
    spark.read.parquet(out)
      .select("o_orderkey", "o_orderstatus")
      .orderBy(col("o_orderkey").asc)
  }

  /** `sink_zorder` — z-order-clustered save + read-back: content must
    * round-trip exactly (the oracle is a plain SELECT — clustering
    * changes layout, never content). File-level min/max tightening on
    * BOTH cluster columns is asserted in SinkSpec.
    */
  def sinkZorder(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/sink_zorder"
    val df = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    LakeIO.saveZOrdered(df, out, "o_custkey", "o_totalprice", writerTasks)
    spark.read.parquet(out)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_orderkey").asc)
  }

  /** One-time creation of the bucketed join tables, memoized per
    * (session, sfDir): bucketing is a LAYOUT investment — you pay the
    * clustered write once and amortize it over every later co-located
    * join, which is exactly the repeated-large-join pattern at 100 TB.
    * The declared `join_bucketed` query should therefore time the
    * read-side join, not the table build (VERDICT r3 #3 — the build was
    * 3.6 s of a 3.6 s query). Table names carry the sfDir hash so two
    * scale factors in one process never alias; computeIfAbsent blocks
    * concurrent first callers until the tables exist.
    */
  private val bucketedReady =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (String, String)]()

  /** Collision-resistant table-name suffix (ADVICE r4): hashCode over two
    * sfDirs can collide in one process, and SaveMode.Overwrite would then
    * silently clobber the other dir's tables while its memo entry still
    * points at them. 16 hex chars of SHA-256 make that impossible in
    * practice (2⁻³² per pair at billions of dirs).
    */
  private def dirDigest(sfDir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(sfDir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** ASSUMES an immutable corpus at sfDir (ADVICE r4): the memo has no
    * data fingerprint, so rewriting the fixture in-process would serve
    * stale bucketed tables. That is the fixture contract here (driver
    * test data never changes mid-process); a live lake would key this on
    * a table snapshot/version id instead. [[clearBucketedMemo]] is the
    * explicit reset for long-lived sessions.
    */
  private def bucketedTables(spark: SparkSession,
      sfDir: String): (String, String) =
    bucketedReady.computeIfAbsent((spark, sfDir), _ => {
      val h = dirDigest(sfDir)
      val (ot, ct) = (s"bj_orders_$h", s"bj_customer_$h")
      LakeIO.saveBucketed(
        Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        ot, "o_custkey", 8)
      LakeIO.saveBucketed(
        Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment"),
        ct, "c_custkey", 8)
      (ot, ct)
    })

  /** Pre-pay the one-time bucketed-table build outside any timed query
    * (ADVICE r4: Bench runs each query once per process, so the first —
    * only — timed `join_bucketed` call otherwise absorbs the build).
    * Bench calls this in its untimed warmup; the bench number then
    * measures the read-side join, which is the steady-state cost the
    * layout investment buys.
    */
  def warmBucketed(spark: SparkSession, sfDir: String): Unit = {
    bucketedTables(spark, sfDir); ()
  }

  /** Drop the bucketed-table memo (entries only — the tables are disk
    * catalog state, rebuilt with identical names on next use). Part of
    * [[graft.Lake.clearCaches]]; returns the number of entries cleared.
    */
  private[graft] def clearBucketedMemo(): Int = {
    val n = bucketedReady.size()
    bucketedReady.clear()
    n
  }

  /** `join_bucketed` — the co-located join as a declared query: both
    * sides are saved CLUSTERED BY the join key into the same bucket
    * count (once per process — see bucketedTables), so the join itself
    * needs NO shuffle at read time (the repeated-large-join layout at
    * 100 TB; asserted Exchange-free under forced SMJ in SinkSpec — here
    * AQE may still choose broadcast, which is fine: bucketing removes
    * the shuffle it would otherwise need). Result oracle: the plain
    * equi-join + aggregate.
    */
  def joinBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val (ordersTbl, custTbl) = bucketedTables(spark, sfDir)
    spark.table(ordersTbl)
      .join(spark.table(custTbl),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
          .as("total"))
      .orderBy(col("c_mktsegment").asc)
  }

  /** `source_csv` — CSV ingest round-trip (header + schema inference). */
  def sourceCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/source_csv"
    Tables.nation(spark, sfDir)
      .repartition(1) // 25 rows — one file, always
      .write.mode("overwrite").option("header", "true").csv(out)
    LakeIO.readCsv(spark, out)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy(col("n_nationkey").asc)
  }

  /** `source_orc` — ORC ingest round-trip (the other columnar lake
    * format Spark ships natively; `source_avro` is not possible here —
    * only Avro core libs are present, not the spark-avro connector).
    */
  def sourceOrc(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/source_orc"
    Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .repartition(writerTasks, col("s_suppkey"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .orderBy(col("s_suppkey").asc)
  }

  /** `source_xml` — XML ingest round-trip on Spark 4's BUILT-IN xml
    * source (the spark-xml package was merged into spark-sql in 4.0 —
    * verified present in this runtime's spark-sql jar, unlike the
    * spark-avro connector which is absent). Nation rows are written
    * `<nation>` element-per-row and read back with an explicit schema
    * (inference would widen n_regionkey to LONG and break the
    * hash-compare; the explicit schema is also the 100 TB practice —
    * schema-on-read inference costs a full extra pass).
    */
  def sourceXml(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/source_xml"
    val src = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name", "n_regionkey")
    src
      .repartition(1) // 25 rows — one file, always
      .write.mode("overwrite")
      .option("rowTag", "nation").option("declaration", "")
      .format("xml").save(out)
    spark.read.schema(src.schema)
      .option("rowTag", "nation")
      .format("xml").load(out)
      .orderBy(col("n_nationkey").asc)
  }

  /** `source_text` — line-oriented text ingest round-trip: write each
    * doc as one normalized line, read back with `spark.read.text` (the
    * raw-corpus ingest path — at 100 TB this is how unstructured text
    * enters the lake before parsing). Newlines are stripped on write so
    * one doc ↔ one line exactly.
    */
  def sourceText(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/source_text"
    Tables.documents(spark, sfDir)
      .select(regexp_replace(col("text"), "[\\r\\n]+", " ").as("value"))
      .repartition(writerTasks)
      .write.mode("overwrite").text(out)
    spark.read.text(out)
      .groupBy()
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("value"))).as("total_chars"))
  }

  /** `source_binary` — whole-file binary ingest (`binaryFile` source):
    * each file becomes (path, length, blob) — the multimodal asset
    * ingest path (images/audio enter as opaque blobs + metadata). Reads
    * back the parquet fixture files themselves; emits per-file sizes
    * only (blob stays out of the declared output). Spec-checked; no
    * oracle (file sizes aren't visible to the SQL oracle).
    */
  def sourceBinary(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(sfDir)
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length"))
      .orderBy(col("file_name").asc)

  /** `source_json` — JSON-lines ingest round-trip. */
  def sourceJson(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/source_json"
    Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type")
      .repartition(writerTasks, col("event_id"))
      .write.mode("overwrite").json(out)
    LakeIO.readJson(spark, out)
      .select("event_id", "user_id", "event_type")
      .orderBy(col("event_id").asc)
  }

  /** `table_meta` — schema-as-rows (novlake Lake.meta). Rows-only check:
    * DuckDB's DESCRIBE text differs.
    */
  def tableMeta(spark: SparkSession, sfDir: String): DataFrame =
    LakeIO.tableMeta(Tables.orders(spark, sfDir))
      .orderBy(col("col_name").asc)

  /** Shadow oracle for `table_meta` (same technique as
    * `udaf_typed_shape`): the schema TEXT is engine-specific, but the
    * schema STRUCTURE is not — both engines project their native type
    * names onto one canonical vocabulary (int64/utf8/f64/ts), so the
    * driver hash-gates that Spark's parquet read derives the same
    * (column, type) set DuckDB's does. Catalog drift — a renamed
    * column, a widened int, a timestamp read as string — breaks it.
    */
  def tableMetaTypes(spark: SparkSession, sfDir: String): DataFrame =
    tableMeta(spark, sfDir)
      .select(col("col_name"),
        when(col("data_type") === "bigint", "int64")
          .when(col("data_type") === "string", "utf8")
          .when(col("data_type") === "double", "f64")
          .when(col("data_type").startsWith("timestamp"), "ts")
          .otherwise(col("data_type")).as("ctype"))
      .orderBy(col("col_name").asc)

  /** `list_tables` — catalog listing (novlake Lake.list_tables). */
  def listTables(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    LakeIO.listTables(spark)
  }

  /** `source_json_corrupt` — PERMISSIVE-mode JSON ingest over a file
    * with malformed lines: good rows parse (missing fields → NULL), bad
    * lines survive as raw text in the corrupt-record column instead of
    * failing the read (or silently vanishing, DROPMALFORMED's trap).
    * The everyday Athena/lake ingestion reality — producers emit broken
    * JSON and the pipeline must quarantine, not die. The fixture is a
    * deterministic inline file, so the oracle is the static expected
    * frame: which rows parse, which fields NULL, where raw lines land.
    */
  def sourceJsonCorrupt(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/source_json_corrupt"
    val lines = Seq(
      """{"id": 1, "name": "alpha", "v": 10.5}""",
      """{"id": 2, "name": "beta", "v": 20.0}""",
      """{"id": 3, "name": "gamma"}""",
      """not json at all""",
      """{"id": 4, "name": "delta", "v": 40.25}""",
      """{"id": 5, "name": [broken""",
      """{"id": 6, "name": "zeta", "v": -1.5}""")
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("data.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    spark.read
      .schema("id BIGINT, name STRING, v DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$out/data.jsonl")
      .select(col("id"), col("name"), col("v"),
        col("_corrupt_record").as("corrupt_raw"))
      .orderBy(col("id").asc_nulls_first, col("corrupt_raw").asc_nulls_first)
  }

  /** `list_tables_fixture` — oracle shadow of `list_tables` (VERDICT r6
    * #6): the catalog listing restricted to the fixture view names, so
    * the row set is independent of which saveAsTable queries ran first
    * in the process (the full `list_tables` also shows bucketed tables
    * — engine catalog state with no DuckDB equivalent). Verifies that
    * registration surfaces every fixture table through the REAL catalog
    * API with the expected type, hash-matched against a static VALUES
    * oracle.
    */
  def listTablesFixture(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    LakeIO.listTables(spark)
      .filter(col("table_name").isInCollection(Tables.allTables))
      .select(col("table_name"), col("table_type"))
      .orderBy(col("table_name").asc)
  }

  /** `lake_report` — the generic `Lake.report` facade (the dataset-card
    * rollup over ANY lake table) exercised as a declared query in its
    * SUMS form: dims (lang, source) + Σn_chars over the registered
    * documents fixture. One GROUPING SETS pass (the corpus_report
    * shape), catalog-resolved table, backtick-escaped identifiers.
    */
  def lakeReport(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    new graft.Lake(spark, tmpBase(sfDir) + "/report_wh")
      .report("documents", Seq("lang", "source"), Seq("n_chars"))
  }

  /** `lake_report_counts` — `Lake.report`'s COUNTS-ONLY form (no sum
    * columns; the trailing-comma-free SQL branch) as a declared query.
    */
  def lakeReportCounts(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    new graft.Lake(spark, tmpBase(sfDir) + "/report_wh")
      .report("documents", Seq("lang"))
  }

  /** `merge_upsert` — Delta MERGE (WHEN MATCHED UPDATE / NOT MATCHED
    * INSERT) through the `Lake.upsert` facade, the last Level-1 "Delta
    * ops" surface to get a declared oracle: seed the warehouse with the
    * 'F' orders, then upsert a batch holding BOTH planted matched keys
    * ('F' orders above the price cut — their totalprice must change)
    * and unmatched keys ('O'/'P' orders above the cut — must appear as
    * inserts). The read-back is checked against a DuckDB NOT
    * EXISTS anti-join + UNION ALL over the same two frames, so the
    * oracle verifies source-wins-on-collision AND survivor retention,
    * not just that the write succeeded. Seeding is a direct LakeIO
    * write (not saveDataset) so this query never registers catalog
    * entries — `list_tables` output stays independent of whether this
    * query ran first.
    *
    * Scale: one left-anti shuffle on the key + unionByName; the rewrite
    * cost is the price of MERGE without a transactional format
    * (LakeIO.upsert notes). The +100000.0 delta is exact in binary, so
    * the double arithmetic agrees bit-for-bit across engines.
    */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = tmpBase(sfDir) + "/merge_wh"
    val lake = new graft.Lake(spark, wh)
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val target = ord.filter(col("o_orderstatus") === "F")
      .drop("o_orderstatus")
    // re-seed every call → the query is idempotent under re-runs
    LakeIO.saveDataset(
      target.repartition(writerTasks, col("o_orderkey")), s"$wh/merge_orders")
    val batch = ord.filter(col("o_totalprice") > 400000.0)
      .drop("o_orderstatus")
      .withColumn("o_totalprice", col("o_totalprice") + lit(100000.0))
    lake.upsert(batch, "merge_orders", Seq("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_orderkey").asc)
  }

  /** `merge_scd2` — slowly-changing-dimension type-2 merge
    * (LakeIO.scd2Apply): customer is the v1 dimension; the update
    * batch flips market segments (key % 7), bumps balances by an
    * exactly-representable +256.0 (key % 11), replays UNCHANGED rows
    * (key % 13 — must be a no-op, no spurious version), and inserts
    * brand-new keys (key % 97, shifted +1e6). Changed keys close their
    * v1 row at version 2 and open a v2 row; history semantics land in
    * (valid_from, valid_to, is_current).
    */
  def mergeScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val k = col("c_custkey")
    val dim = cust
      .withColumn("valid_from", lit(1))
      .withColumn("valid_to", lit(null).cast("int"))
      .withColumn("is_current", lit(true))
    val upd = cust
      .filter(k % 7 === 0 || k % 11 === 0 || k % 13 === 0)
      .withColumn("c_acctbal",
        when(k % 11 === 0, col("c_acctbal") + 256.0)
          .otherwise(col("c_acctbal")))
      .withColumn("c_mktsegment",
        when(k % 7 === 0, concat(col("c_mktsegment"), lit("-R")))
          .otherwise(col("c_mktsegment")))
      .unionByName(cust.filter(k % 97 === 0)
        .withColumn("c_custkey", k + 1000000L))
    LakeIO.scd2Apply(dim, upd, Seq("c_custkey"),
        Seq("c_acctbal", "c_mktsegment"), newVersion = 2)
      .orderBy(col("c_custkey").asc, col("valid_from").asc)
  }

  /** `sink_compact` — bin-packing small-file compaction (`Lake.compact`
    * → LakeIO.compactToSize): seed a deliberately fragmented dataset
    * (64 writer tasks over a small slice → 64 tiny files), compact to a
    * byte-size target, read back. The oracle is a plain content SELECT —
    * compaction changes file LAYOUT, never content — and SinkSpec
    * asserts the file count actually drops plus the versioned flavor's
    * history row.
    */
  def sinkCompact(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = tmpBase(sfDir) + "/compact_wh"
    val lake = new graft.Lake(spark, wh)
    val df = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 300000.0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    LakeIO.saveDataset(df.repartition(64), s"$wh/compact_orders")
    lake.compact("compact_orders", targetFileBytes = 64L * 1024 * 1024)
    lake.load("compact_orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_orderkey").asc)
  }

  private def rmDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** History rows joined with each retained version's read-back row
    * count: (version, n_files, is_latest, n_rows). The canonical
    * projection the `lake_history`/`lake_vacuum` oracles can state —
    * byte sizes are writer-encoding-specific and excluded (the
    * `table_meta_types` technique: emit what both engines can agree
    * on, spec-check the rest).
    */
  private def historyWithCounts(spark: SparkSession, out: String): DataFrame = {
    val hist = LakeIO.versionHistory(spark, out)
      .select(col("version"), col("n_files"), col("is_latest"))
    val counts = LakeIO.listVersions(spark, out).map { v =>
      LakeIO.loadVersion(spark, out, Some(v))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("version", lit(v))
    }.reduce(_ unionByName _)
    hist.join(counts, "version")
      .select(col("version"), col("n_files"), col("is_latest"), col("n_rows"))
      .orderBy(col("version").asc)
  }

  /** `lake_history` — the versioned-snapshot write path (`Lake.history`
    * / LakeIO.saveVersion) declared as a query (VERDICT r7 #5): three
    * snapshots of shrinking filters land in v=0/1/2, and the history
    * read-back must report exactly those versions, the pinned per-write
    * file count, the latest flag on v2 only, and each snapshot's exact
    * row count. Scratch is deleted first so the query is idempotent
    * within a process (saveVersion otherwise appends v3, v4, ... on
    * re-invocation).
    */
  def lakeHistory(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/lake_history"
    rmDir(spark, out)
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    Seq(400000.0, 300000.0, 200000.0).foreach { t =>
      // round-robin repartition: >= writerTasks rows at every fixture SF
      // (298 at sf0.001), so all writer tasks are non-empty and n_files
      // is exactly writerTasks, deterministically
      LakeIO.saveVersion(
        ord.filter(col("o_totalprice") > t).repartition(writerTasks), out)
      ()
    }
    historyWithCounts(spark, out)
  }

  /** `lake_time_travel` — pinned-version READS (the consumer side of
    * [[lakeHistory]]'s versioned writes): three snapshots of shrinking
    * premium slices, then every version is read back BY PIN while newer
    * versions exist — the reproducible-training-run property (a reader
    * pinned to v0 is unaffected by later writes, which is the point of
    * version pinning at 100 TB: data lineage without copying). Emits
    * per-version row counts and exact decimal revenue recomputed from
    * the pinned read.
    */
  def lakeTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/lake_tt"
    rmDir(spark, out)
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    Seq(200000.0, 300000.0, 400000.0).foreach { t =>
      LakeIO.saveVersion(
        ord.filter(col("o_totalprice") > t).repartition(writerTasks), out)
      ()
    }
    val perVersion = (0 to 2).map { v =>
      LakeIO.loadVersion(spark, out, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(graft.operators.Relational.dec(col("o_totalprice")))
            .cast("double").as("revenue"))
        .select(lit(v).as("version"), col("n_rows"), col("revenue"))
    }
    perVersion.reduce(_ unionByName _).orderBy(col("version").asc)
  }

  /** `lake_changes` — row-level change-data-feed between two pinned
    * versions ([[LakeIO.changes]]; VERDICT r14 #2 — the consumer side
    * of `lake_history`/`lake_time_travel` and the one Delta surface
    * with no analogue here until now; every incremental downstream,
    * including this engine's own `*_incremental` family, wants the
    * delta AS DATA rather than a hand-cut filter). Two snapshots of
    * orders land in v=0/v=1 with planted churn — v1 drops every
    * key % 19 = 0 row (deletes), admits the key % 3 = 0 rows v0
    * excluded (inserts), and reprices every key % 7 = 0 survivor
    * (updates) — then the CDF between the pins must emit exactly the
    * planted insert/delete/update_preimage/update_postimage rows. The
    * oracle recomputes both snapshot definitions directly from orders
    * and diffs them in SQL: a CDF that misses a churn class, emits
    * phantom updates (e.g. non-null-safe compares), or mis-stamps
    * sides hash-mismatches.
    */
  def lakeChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_changes")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    LakeIO.saveVersion(
      base.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
        .repartition(writerTasks), out)
    LakeIO.saveVersion(
      base.filter(pmod(col("o_orderkey"), lit(19)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(7)) === 0,
            col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")))
        .repartition(writerTasks), out)
    LakeIO.changes(spark, out, 0, 1, Seq("o_orderkey"))
      .orderBy(col("o_orderkey").asc, col("_change_type").asc)
  }

  /** `dedup_incremental_cdf` — the change-data-feed CONSUMED by a
    * declared incremental operator (VERDICT r14 #2's second half: "feed
    * it to a declared incremental consumer to prove the surface"):
    * yesterday's corpus snapshot lands in v=0, today's full corpus in
    * v=1, and the daily dedup job derives its delta FROM THE CDF
    * (`_change_type = 'insert'` between the pins) instead of a
    * hand-cut filter — the production wiring, where the lake tells the
    * pipeline what changed. Survivors = CDF inserts whose normalized
    * content hash is not in the v0 snapshot (dedup_incremental's exact
    * seen-store contract, same output schema). The oracle is
    * `dedup_incremental`'s SQL VERBATIM (the shared-oracle precedent):
    * v0 ⊂ v1 with identical row values, so the CDF between the pins is
    * exactly the planted insert set — an engine whose CDF drops
    * inserts, emits phantom updates (non-null-safe compares), or reads
    * the wrong pins hash-mismatches.
    *
    * Scale: the CDF join is doc_id-keyed (LakeIO.changes); the store
    * side reduces to a distinct 32-byte hash set before the anti-join
    * — no text re-shuffles (the dedup_incremental shape).
    */
  def dedupIncrementalCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "dedup_incr_cdf")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    LakeIO.saveVersion(docs.filter(col("doc_id") % 10 < 8)
      .repartition(writerTasks), out)
    LakeIO.saveVersion(docs.repartition(writerTasks), out)
    val delta = LakeIO.changes(spark, out, 0, 1, Seq("doc_id"))
      .filter(col("_change_type") === "insert")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val existing = LakeIO.loadVersion(spark, out, Some(0))
      .select(sha2(graft.operators.TextOps.normText(col("text")), 256)
        .as("h")).distinct()
    delta
      .withColumn("h",
        sha2(graft.operators.TextOps.normText(col("text")), 256))
      .join(existing, Seq("h"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id").asc)
  }

  /** `lake_apply_changes` — the CONSUME side of the CDF as a declared
    * row ([[LakeIO.applyChanges]]): the same planted churn as
    * `lake_changes` lands in v=0/v=1, the CDF between the pins
    * computes, and applying it BACK to the v0 snapshot must
    * reconstruct v1 exactly — the replication contract (a downstream
    * replica advances by shipping only the delta). The oracle is the
    * v1 snapshot definition recomputed directly from orders: an apply
    * that drops preimage keys wrongly, misses inserts, or double-adds
    * postimages hash-mismatches.
    */
  def lakeApplyChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_apply_changes")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    LakeIO.saveVersion(
      base.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
        .repartition(writerTasks), out)
    LakeIO.saveVersion(
      base.filter(pmod(col("o_orderkey"), lit(19)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(7)) === 0,
            col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")))
        .repartition(writerTasks), out)
    LakeIO.applyChanges(
      LakeIO.loadVersion(spark, out, Some(0)),
      LakeIO.changes(spark, out, 0, 1, Seq("o_orderkey")),
      Seq("o_orderkey"))
      .orderBy(col("o_orderkey").asc)
  }

  /** `lake_clone` — zero-copy shallow clone
    * ([[LakeIO.shallowClone]]): the premium-orders slice lands as the
    * SOURCE's v=0, a shallow clone of that pin publishes at the clone
    * path (a manifest-only version dir — no data file copies), the
    * source then moves FORWARD with a v=1 backfill that halves the
    * slice — and the clone read must still return exactly the v0
    * content (the reproducible-experiment pin: a clone is immune to
    * the source's later writes because source versions are immutable).
    * The oracle recomputes the v0 slice definition from orders; a
    * clone that reads the wrong pin, loses rows through the manifest,
    * or resolves the source's LATEST instead of the pinned version
    * hash-mismatches. LakeSpec additionally proves the zero-copy
    * property physically (the clone dir holds ONE `_manifest` and no
    * parquet) and clone-of-clone flattening.
    */
  def lakeClone(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_clone")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    LakeIO.saveVersion(
      ord.filter(col("o_totalprice") > 200000.0).repartition(writerTasks),
      s"$out/src")
    LakeIO.shallowClone(spark, s"$out/src", 0, s"$out/clone")
    // the source moves forward; the clone must not
    LakeIO.saveVersion(
      ord.filter(col("o_totalprice") > 400000.0).repartition(writerTasks),
      s"$out/src")
    LakeIO.loadVersion(spark, s"$out/clone", Some(0))
      .orderBy(col("o_orderkey").asc)
  }

  /** `lake_write_cdf` — WRITE-TIME change-data-feed capture
    * ([[LakeIO.saveVersionCdf]]; VERDICT r15's one documented lake
    * caveat: `lake_changes`' snapshot diff stamps every row with the
    * range-end version and cannot attribute intermediate commits —
    * this is the capture that can). Three commits land with planted
    * churn: v0 = the base slice (keys % 3 ≠ 0), v1 = the lake_changes
    * churn (drop % 19, reprice % 7 by +1000), v2 = a second churn ON
    * TOP of v1 (drop % 23, reprice % 11 by +2000). The captured feed
    * over (0, 2] must then contain commit-1 rows stamped 1 AND
    * commit-2 rows stamped 2 — per-commit fidelity the oracle
    * recomputes as two independent snapshot diffs; a capture that
    * stamps wrong versions, misses a commit, or lets the range prune
    * drop rows hash-mismatches. (v0's insert-only feed is written too
    * but excluded by the range — the prune is part of the contract.)
    */
  def lakeWriteCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_write_cdf")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val keys = Seq("o_orderkey")
    val v0 = base.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
    LakeIO.saveVersionCdf(v0.repartition(writerTasks), out, keys)
    val v1 = base.filter(pmod(col("o_orderkey"), lit(19)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(7)) === 0,
          col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
    LakeIO.saveVersionCdf(v1.repartition(writerTasks), out, keys)
    val v2 = v1.filter(pmod(col("o_orderkey"), lit(23)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(11)) === 0,
          col("o_totalprice") + 2000.0)
          .otherwise(col("o_totalprice")))
    LakeIO.saveVersionCdf(v2.repartition(writerTasks), out, keys)
    LakeIO.capturedChanges(spark, out, 0, 2)
      .orderBy(col("o_orderkey").asc, col("_commit_version").asc,
        col("_change_type").asc)
  }

  /** `lake_branch` — the DEV-BRANCH composition (Delta/Iceberg branch
    * semantics via directory versions + the clone manifest; extends
    * `lake_clone`, which proves READ pinning only, with WRITE-AFTER-
    * CLONE divergence): the source's v0 clones zero-copy into a
    * branch, the branch takes its OWN forward write (branch/v=1), and
    * the source moves forward independently (src/v=1) — four
    * snapshots, each readable by pin, with the branch's write
    * invisible to the source and vice versa. Output: one aggregate
    * row per (table, version); the oracle recomputes all four slice
    * definitions from orders — a branch write that leaks into the
    * source chain, a clone that loses its pin under the branch's own
    * writes, or a version resolution crossing the two chains
    * hash-mismatches.
    */
  def lakeBranch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Relational.dec
    val out = uniqueRunDir(sfDir, "lake_branch")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    def slice(t: Double) = ord.filter(col("o_totalprice") > t)
    LakeIO.saveVersion(slice(200000.0).repartition(writerTasks),
      s"$out/src")
    LakeIO.shallowClone(spark, s"$out/src", 0, s"$out/branch")
    // the branch diverges with its own write...
    LakeIO.saveVersion(slice(400000.0).repartition(writerTasks),
      s"$out/branch")
    // ...and the source moves forward independently
    LakeIO.saveVersion(slice(300000.0).repartition(writerTasks),
      s"$out/src")
    val snaps = Seq(
      ("src", 0), ("src", 1), ("branch", 0), ("branch", 1))
    snaps.map { case (tbl, v) =>
      LakeIO.loadVersion(spark, s"$out/$tbl", Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .select(lit(tbl).as("chain"), lit(v).as("version"),
          col("n_rows"), col("revenue"))
    }.reduce(_ unionByName _)
      .orderBy(col("chain").asc, col("version").asc)
  }

  /** `lake_merge_branch` — the dev-branch workflow's missing half
    * (VERDICT r17 #2: `lake_branch` ships divergence, nothing
    * reconciles it): the source's v0 clones into a branch, BOTH chains
    * then take real churn — the branch (theirs) deletes every
    * key % 19 = 0 base row, reprices % 7 = 0 by +1000 and inserts the
    * (180000, 200000] slice; the source (ours) independently deletes
    * % 23 = 0, reprices % 5 = 0 by +500 and inserts
    * (150000, 180000] — and [[LakeIO.mergeBranch]] three-way-merges
    * the branch back (base = the cloned v0), publishing the merged
    * snapshot as src v2 with the declared destination-wins conflict
    * policy. The output reads the PUBLISHED merge back by pin and
    * stamps every row with the conflict count, so the policy's whole
    * truth table is hash-gated: one-side deletes apply, one-side
    * reprices apply, update/update overlaps (% 35 = 0) resolve to
    * ours' +500, update-vs-delete keeps ours' edit, delete-vs-update
    * keeps ours' delete, both-deleted rows leave WITHOUT counting as
    * conflicts, and the disjoint insert slices both arrive. The
    * oracle recomputes the merged snapshot and the conflict
    * cardinality from the churn-rule definitions directly over
    * orders — a merge that misclassifies any cell of the matrix, or
    * a conflict counter that over/under-counts, hash-mismatches.
    * (LakeSpec additionally pins the full conflict matrix, including
    * insert/insert, on a planted frame.)
    *
    * Scale: two keyed full-outer joins (the [[LakeIO.changes]] shape
    * twice) + one broadcast 1-row conflict summary — nothing pairs
    * beyond the key match.
    */
  def lakeMergeBranch(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_merge_branch")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val keys = Seq("o_orderkey")
    val v0 = base.filter(col("o_totalprice") > 200000.0)
    LakeIO.saveVersion(v0.repartition(writerTasks), s"$out/src")
    LakeIO.shallowClone(spark, s"$out/src", 0, s"$out/branch")
    // theirs: the branch's own churn + its insert slice
    val theirs = v0.filter(pmod(col("o_orderkey"), lit(19)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(7)) === 0,
          col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
      .unionByName(base.filter(col("o_totalprice") > 180000.0
        && col("o_totalprice") <= 200000.0))
    LakeIO.saveVersion(theirs.repartition(writerTasks), s"$out/branch")
    // ours: the source moves forward independently
    val ours = v0.filter(pmod(col("o_orderkey"), lit(23)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0,
          col("o_totalprice") + 500.0)
          .otherwise(col("o_totalprice")))
      .unionByName(base.filter(col("o_totalprice") > 150000.0
        && col("o_totalprice") <= 180000.0))
    LakeIO.saveVersion(ours.repartition(writerTasks), s"$out/src")
    val (mergedV, outcome) =
      LakeIO.mergeBranch(spark, s"$out/src", s"$out/branch", 0, keys)
    val conflicts = outcome
      .agg(sum(when(col("_merge_conflict"), 1L).otherwise(0L))
        .as("n_conflicts"))
    LakeIO.loadVersion(spark, s"$out/src", Some(mergedV))
      .crossJoin(broadcast(conflicts))
      .orderBy(col("o_orderkey").asc)
  }

  /** `lake_restore_cdf` — rollback WITH write-time capture
    * ([[LakeIO.restoreVersionCdf]], ADVICE r16: a plain restore on a
    * CDF table leaves its commit uncaptured and [[LakeIO.capturedChanges]]
    * then refuses any range spanning it): the `lake_write_cdf` planted
    * churn lands as three captured commits, the table rolls back to
    * v1 via restoreVersionCdf (publishing v3 WITH its change feed),
    * and the declared output is the captured feed over (2, 3] — the
    * UNDO as churn, which is exactly what a downstream replica
    * consumes to follow the rollback (the stream_cdf_apply_ok
    * consumer shape). The oracle recomputes the v2→v1 diff directly
    * from orders, stamped commit 3: a restore that drops capture,
    * restores the wrong pin, or stamps the wrong commit
    * hash-mismatches.
    */
  def lakeRestoreCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_restore_cdf")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val keys = Seq("o_orderkey")
    val v0 = base.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
    LakeIO.saveVersionCdf(v0.repartition(writerTasks), out, keys)
    val v1 = base.filter(pmod(col("o_orderkey"), lit(19)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(7)) === 0,
          col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
    LakeIO.saveVersionCdf(v1.repartition(writerTasks), out, keys)
    val v2 = v1.filter(pmod(col("o_orderkey"), lit(23)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(11)) === 0,
          col("o_totalprice") + 2000.0)
          .otherwise(col("o_totalprice")))
    LakeIO.saveVersionCdf(v2.repartition(writerTasks), out, keys)
    LakeIO.restoreVersionCdf(spark, out, 1, keys)
    LakeIO.capturedChanges(spark, out, 2, 3)
      .orderBy(col("o_orderkey").asc, col("_change_type").asc)
  }

  /** `lake_restore` — rollback to a pinned version
    * ([[LakeIO.restoreVersion]]; completes the snapshot lifecycle:
    * history → time-travel → changes → vacuum → RESTORE): three
    * snapshots of shrinking premium slices land in v=0/1/2 (v1/v2
    * playing a bad backfill), then v0 restores as v=3 — the Delta
    * `RESTORE TABLE` shape where rollback is a FORWARD publish (the
    * bad versions stay pinned-readable for audit; the latest pointer
    * moves ahead; no snapshot mutates). The output reads every version
    * INCLUDING the restored one by pin: v3's row count and exact
    * decimal revenue must equal v0's, is_latest must sit on v3 only,
    * and the CDF between v2 and v3 must equal the v2→v0 diff — all of
    * which the oracle recomputes from the snapshot definitions.
    */
  def lakeRestore(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_restore")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    Seq(200000.0, 300000.0, 400000.0).foreach { t =>
      LakeIO.saveVersion(
        ord.filter(col("o_totalprice") > t).repartition(writerTasks), out)
      ()
    }
    val restored = LakeIO.restoreVersion(spark, out, 0)
    val latest = LakeIO.listVersions(spark, out).last
    val perVersion = (0 to restored).map { v =>
      LakeIO.loadVersion(spark, out, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(graft.operators.Relational.dec(col("o_totalprice")))
            .cast("double").as("revenue"))
        .select(lit(v).as("version"), col("n_rows"), col("revenue"),
          lit(v == latest).as("is_latest"))
    }
    perVersion.reduce(_ unionByName _).orderBy(col("version").asc)
  }

  /** `lake_vacuum` — snapshot retention (`Lake.vacuum` /
    * LakeIO.vacuumVersions) declared as a query (VERDICT r7 #5): four
    * snapshots, keep the newest two; the post-vacuum history must show
    * ONLY v2/v3 (v0/v1 physically deleted, n_dropped = 2), the latest
    * pointer still on the newest version, and the retained snapshots'
    * contents untouched (exact row counts).
    */
  /** `lake_vacuum_safe` — CLONE-AWARE retention declared as a query
    * (VERDICT r16 #1: `vacuumVersions` deleting a version a shallow-
    * clone manifest pins was the one place a supported op silently
    * corrupted another's output — now it refuses): v0 lands and a
    * shallow clone pins it, the source moves forward twice, and a
    * keep=1 vacuum — which would delete the pinned v0 — must REFUSE
    * atomically (all three versions still present, the clone still
    * readable). Deleting the clone releases the pin and the SAME
    * vacuum then proceeds, dropping exactly v0/v1. Every output field
    * is an assertion: a guard that stops refusing (refused=false), a
    * refusal that half-deletes (n_versions_on_refusal<3), a stale-pin
    * GC that fails to release (n_dropped_after_release<2), or a
    * vacuum that breaks the clone before refusing (clone_rows drops)
    * all hash-mismatch. The oracle recomputes the two slice counts
    * from orders and pins the lifecycle constants.
    */
  def lakeVacuumSafe(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Relational.dec
    val out = uniqueRunDir(sfDir, "lake_vacuum_safe")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    LakeIO.saveVersion(
      ord.filter(col("o_totalprice") > 200000.0).repartition(writerTasks),
      s"$out/src")
    LakeIO.shallowClone(spark, s"$out/src", 0, s"$out/clone")
    LakeIO.saveVersion(
      ord.filter(col("o_totalprice") > 300000.0).repartition(writerTasks),
      s"$out/src")
    LakeIO.saveVersion(
      ord.filter(col("o_totalprice") > 400000.0).repartition(writerTasks),
      s"$out/src")
    val refused =
      try { LakeIO.vacuumVersions(spark, s"$out/src", keep = 1); false }
      catch { case _: IllegalStateException => true }
    val nOnRefusal = LakeIO.listVersions(spark, s"$out/src").size
    // the clone must still read its pinned content AFTER the refusal
    // (eager: the clone dir is deleted next to release the pin)
    val cloneRows = LakeIO.loadVersion(spark, s"$out/clone", Some(0))
      .count()
    rmDir(spark, s"$out/clone")
    val dropped = LakeIO.vacuumVersions(spark, s"$out/src", keep = 1)
    val finalVersions = LakeIO.listVersions(spark, s"$out/src")
    LakeIO.loadVersion(spark, s"$out/src", Some(2))
      .agg(count(lit(1)).as("head_rows"),
        sum(dec(col("o_totalprice"))).cast("double").as("head_revenue"))
      .select(lit(refused).as("refused"),
        lit(nOnRefusal).as("n_versions_on_refusal"),
        lit(cloneRows).as("clone_rows"),
        lit(dropped.length).as("n_dropped_after_release"),
        lit(finalVersions == Seq(2)).as("final_is_head_only"),
        col("head_rows"), col("head_revenue"))
  }

  /** `lake_schema_evolution` — versioned history SPANNING SCHEMAS
    * (each `v=<n>` dir is self-describing parquet, so evolution is
    * free at write time; the read side is where lakehouses earn it):
    * v0 lands with two columns, v1 evolves to three, and the declared
    * output reads BOTH versions through [[LakeIO.loadVersionEvolved]]
    * — the pinned v0 aligned to the head schema (the added
    * o_orderstatus fills with NULLs), v1 as-is — emitting per version
    * the raw column count, the row count, and the null-fill
    * cardinality of the evolved column. The oracle recomputes all
    * three from the slice definitions: an evolved read that drops old
    * rows, fills the wrong column, or leaks the head schema into the
    * raw version meta hash-mismatches. (The diff/merge surfaces REFUSE
    * drifted inputs rather than silently dropping columns —
    * LakeSpec pins both refusals; this row is the supported read.)
    */
  def lakeSchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_schema_evo")
    val ord = Tables.orders(spark, sfDir)
    LakeIO.saveVersion(ord.select(col("o_orderkey"), col("o_totalprice"))
      .filter(col("o_totalprice") > 400000.0).repartition(writerTasks), out)
    LakeIO.saveVersion(ord.select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .filter(col("o_totalprice") > 300000.0).repartition(writerTasks), out)
    val perVersion = Seq(0, 1).map { v =>
      val rawCols = LakeIO.loadVersion(spark, out, Some(v)).columns.length
      LakeIO.loadVersionEvolved(spark, out, v)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L))
            .as("null_status_rows"))
        .select(lit(v).as("version"), lit(rawCols).as("n_cols_raw"),
          col("n_rows"), col("null_status_rows"))
    }
    perVersion.reduce(_ unionByName _).orderBy(col("version").asc)
  }

  /** `lake_vacuum_cdf` — CDF RETENTION COORDINATION declared as a
    * query (VERDICT r17 #1, the round's headline fix, hash-gated
    * end-to-end): five commits land — three captured churns (the
    * lake_write_cdf definitions), then a PLAIN uncaptured delete
    * commit (every key % 29 = 0 leaves), then a captured reprice
    * (% 13 + 500) — and a keep=1 vacuum drops v0–v3. Every output
    * field asserts a retention-coordination contract: the dropped
    * commits' `_cdf` dirs are REAPED with them (n_cdf_left = 1, the
    * head's capture only); a captured range read spanning the
    * vacuumed commits still REFUSES (refused = true — the persistent
    * `_commits` log remembers what retention erased; before the fix
    * the vacuum-mutated directory listing let this range read pass
    * and reconstruct a silently wrong head); the retained tail
    * (3, 4] keeps serving its churn-sized feed (tail_rows =
    * 2 × repriced keys); and the head snapshot itself is intact. The
    * oracle recomputes the head and tail cardinalities from the
    * churn-rule moduli and pins the lifecycle constants.
    */
  def lakeVacuumCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val out = uniqueRunDir(sfDir, "lake_vacuum_cdf")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val keys = Seq("o_orderkey")
    val v0 = base.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
    LakeIO.saveVersionCdf(v0.repartition(writerTasks), out, keys)
    val v1 = base.filter(pmod(col("o_orderkey"), lit(19)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(7)) === 0,
          col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
    LakeIO.saveVersionCdf(v1.repartition(writerTasks), out, keys)
    val v2 = v1.filter(pmod(col("o_orderkey"), lit(23)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(11)) === 0,
          col("o_totalprice") + 2000.0)
          .otherwise(col("o_totalprice")))
    LakeIO.saveVersionCdf(v2.repartition(writerTasks), out, keys)
    // the uncaptured commit the guard must remember PAST its vacuum
    val v3 = v2.filter(pmod(col("o_orderkey"), lit(29)) =!= 0)
    LakeIO.saveVersion(v3.repartition(writerTasks), out)
    val v4 = v3.withColumn("o_totalprice",
      when(pmod(col("o_orderkey"), lit(13)) === 0,
        col("o_totalprice") + 500.0)
        .otherwise(col("o_totalprice")))
    LakeIO.saveVersionCdf(v4.repartition(writerTasks), out, keys)
    val dropped = LakeIO.vacuumVersions(spark, out, keep = 1)
    val refused =
      try { LakeIO.capturedChanges(spark, out, 0, 4); false }
      catch { case _: IllegalArgumentException => true }
    val cdfRoot = new org.apache.hadoop.fs.Path(s"$out/_cdf")
    val fs = cdfRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cdfLeft =
      if (!fs.exists(cdfRoot)) 0
      else fs.listStatus(cdfRoot).count(_.getPath.getName.startsWith("v="))
    val headOnly = LakeIO.listVersions(spark, out) == Seq(4)
    val headRows = LakeIO.loadVersion(spark, out, Some(4)).count()
    LakeIO.capturedChanges(spark, out, 3, 4)
      .agg(count(lit(1)).as("tail_rows"),
        countDistinct(col("o_orderkey")).as("tail_update_keys"))
      .select(lit(refused).as("refused"),
        lit(dropped.length).as("n_dropped"),
        lit(cdfLeft).as("n_cdf_left"),
        lit(headOnly).as("final_is_head_only"),
        lit(headRows).as("head_rows"),
        col("tail_rows"), col("tail_update_keys"))
  }

  def lakeVacuum(spark: SparkSession, sfDir: String): DataFrame = {
    val out = tmpBase(sfDir) + "/lake_vacuum"
    rmDir(spark, out)
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    Seq(400000.0, 300000.0, 200000.0, 100000.0).foreach { t =>
      LakeIO.saveVersion(
        ord.filter(col("o_totalprice") > t).repartition(writerTasks), out)
      ()
    }
    val dropped = LakeIO.vacuumVersions(spark, out, keep = 2)
    historyWithCounts(spark, out)
      .withColumn("n_dropped", lit(dropped.length))
  }
}

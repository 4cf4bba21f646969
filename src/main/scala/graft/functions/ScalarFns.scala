package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.sources.Tables

/** Scalar-function families (SURVEY.md §2.H) — one representative query
  * per family, all built-in `org.apache.spark.sql.functions` (codegen'd;
  * no UDFs in these paths). Semantics are the Presto scalar surface the
  * reference exposes via SQL passthrough [upstream, unverified —
  * SURVEY.md §0].
  */
object ScalarFns {

  /** `fn_string` — concat/substring/case/trim/length/regexp/lpad/replace. */
  def fnString(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        concat(upper(col("c_mktsegment")), lit(":"), col("c_name"))
          .as("tagged"),
        substring(col("c_name"), 1, 8).as("prefix"),
        length(col("c_name")).as("name_len"),
        lower(col("c_mktsegment")).as("seg_lower"),
        trim(lit("  pad  ")).as("trimmed"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("cust_num"),
        regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("devowel"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        replace(col("c_mktsegment"), lit("MACHINERY"), lit("MACHINES"))
          .as("replaced"))
      .orderBy(col("c_custkey").asc)

  /** `fn_string2` — the edit-distance/translate family (levenshtein is
    * the classic fuzzy-dedup primitive): levenshtein, translate,
    * reverse, ascii, repeat.
    */
  def fnString2(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("lev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        reverse(col("c_name")).as("rev_name"),
        ascii(col("c_mktsegment")).as("first_code"),
        repeat(substring(col("c_name"), 1, 2), 2).as("rep2"))
      .orderBy(col("c_custkey").asc)

  /** `fn_array_hof` — the array higher-order-function surface as a
    * declared query: filter / exists / forall / transform+aggregate
    * lambdas over the embedding vectors. These evaluate interpreted
    * (SURVEY.md §7.5) — fine here (declared API surface, short arrays);
    * hot paths use the native kernels instead.
    */
  def fnArrayHof(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > 0f)).as("n_pos"),
        exists(col("embedding"), x => x > 0.9f).as("any_big"),
        forall(col("embedding"), x => x <= 0.9f).as("all_small"),
        round(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 4)
          .as("sum_sq"))
      .orderBy(col("vec_id").asc)

  /** `fn_tz` — timezone conversion (from_utc_timestamp /
    * to_utc_timestamp / local-hour extraction): the Athena/Presto
    * AT TIME ZONE surface every analytics user hits. Zones chosen
    * WITHOUT DST (Asia/Kolkata +05:30, America/Sao_Paulo −03 since
    * 2019) so the conversion is a constant offset on the 2024 fixture
    * and the cross-engine parity is exact; the round-trip column pins
    * from/to inverse-ness.
    */
  def fnTz(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_id") < 2000)
      .select(col("event_id"), col("ts"),
        from_utc_timestamp(col("ts"), "Asia/Kolkata").as("ts_kolkata"),
        from_utc_timestamp(col("ts"), "America/Sao_Paulo")
          .as("ts_sao_paulo"),
        to_utc_timestamp(from_utc_timestamp(col("ts"), "Asia/Kolkata"),
          "Asia/Kolkata").as("ts_roundtrip"),
        hour(from_utc_timestamp(col("ts"), "Asia/Kolkata"))
          .as("hour_kolkata"))
      .orderBy(col("event_id").asc)

  /** `fn_explode_outer` — LATERAL VIEW OUTER / explode_outer semantics:
    * rows whose array is EMPTY survive as a single NULL row instead of
    * vanishing (plain explode drops them — the classic silent-row-loss
    * bug in token pipelines). The filter keeps only >6-char tokens, so
    * the fixture genuinely splits: ~21% of docs have none and exist
    * only through the OUTER retention.
    */
  def fnExplodeOuter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode_outer(filter(split(col("text"), " "),
          t => length(t) > 6)).as("long_token"))
      .orderBy(col("doc_id").asc, col("long_token").asc_nulls_first)

  /** `fn_try` — ANSI-mode error-safe functions: try_cast / try_divide /
    * try_add return NULL where the strict forms would raise (Spark 4
    * runs ANSI on by default — this is the migration surface every
    * Athena-SQL user hits).
    */
  def fnTry(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .select(
        col("s_suppkey"),
        expr("try_cast(substring(s_name, 10, 9) AS INT)").as("name_num"),
        expr("try_cast(s_name AS INT)").as("bad_cast"),
        expr("try_divide(s_acctbal, s_suppkey % 3)").as("guarded_div"),
        expr("try_add(s_suppkey, 9223372036854775807L)").as("overflow_add"))
      .orderBy(col("s_suppkey").asc)

  /** `fn_presto_compat` — the Presto/Athena migration shims exercised
    * end-to-end through SQL (novlake's `Lake.query` passed raw Presto
    * SQL to Athena; GraftExtensions registers the Presto-only names so
    * that SQL keeps working here): `strpos` (argument order SWAPS onto
    * locate), `to_unixtime` (epoch seconds as DOUBLE), and
    * `json_extract_scalar` (get_json_object). The aggregate shims
    * (`arbitrary`, `approx_distinct`, `map_agg`) are partition-order-
    * or engine-dependent and are pinned by ExtensionsSpec instead of
    * the value oracle. All shims resolve to built-in Catalyst trees —
    * no UDFs, fully codegen'd.
    */
  def fnPrestoCompat(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftExtensions.install(spark)
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT event_id,
        |  CAST(strpos(props, 'k') AS BIGINT) AS kpos,
        |  to_unixtime(ts) AS epoch_s,
        |  json_extract_scalar(props, '$.k') AS k_str
        |FROM events WHERE event_id < 50
        |ORDER BY event_id ASC""".stripMargin)
  }

  /** `fn_pad_trim` — fixed-width formatting family: lpad/rpad with fill
    * chars, trim of injected padding, split_part-style extraction.
    */
  def fnPadTrim(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .select(
        col("s_suppkey"),
        lpad(col("s_name"), 22, "*").as("lpadded"),
        rpad(col("s_name"), 22, ".").as("rpadded"),
        trim(lpad(concat(lit("  "), col("s_name"), lit("  ")), 30, " "))
          .as("retrimmed"),
        element_at(split(col("s_name"), "#"), 1).as("name_prefix"),
        element_at(split(col("s_name"), "#"), -1).as("name_suffix"))
      .orderBy(col("s_suppkey").asc)

  /** `fn_date` — extraction/truncation/arithmetic on ms-precision
    * timestamps. dow normalized to ISO (1=Mon..7=Sun) on both engines:
    * Spark dayofweek is 1=Sun, DuckDB dow is 0=Sun (SURVEY.md §5.3.5).
    */
  def fnDate(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        // cast back to timestamp: DuckDB DATE arrives as datetime64 via
        // pandas, so a Spark date32 here would type-mismatch the compare
        date_add(col("o_orderdate").cast("date"), 30).cast("timestamp")
          .as("due_date"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("age_days"),
        ((dayofweek(col("o_orderdate")) + lit(5)) % lit(7) + lit(1))
          .as("iso_dow"),
        quarter(col("o_orderdate")).as("qtr"))
      .orderBy(col("o_orderkey").asc)

  /** `fn_interval` — timestamp ± interval arithmetic and epoch math over
    * the events stream (second-truncated on both engines: events.ts is
    * ns in DuckDB, µs here — SURVEY.md §5.3.4).
    */
  def fnInterval(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        date_trunc("second", col("ts") + expr("INTERVAL 90 MINUTES"))
          .as("plus_90m"),
        date_trunc("second", col("ts") - expr("INTERVAL 1 DAY"))
          .as("minus_1d"),
        (unix_timestamp(col("ts")) / 3600L).cast("long").as("epoch_hours"))
      .orderBy(col("event_id").asc)

  /** `fn_math` — rounding/exponents/logs/sign-stable modulo. */
  def fnMath(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .select(
        col("s_suppkey"),
        round(col("s_acctbal"), 1).as("bal_round"),
        floor(col("s_acctbal")).as("bal_floor"),
        ceil(col("s_acctbal")).as("bal_ceil"),
        abs(col("s_acctbal") - lit(5000.0)).as("bal_dev"),
        round(pow(col("s_suppkey").cast("double"), 2.0), 4).as("key_sq"),
        round(sqrt(abs(col("s_acctbal"))), 4).as("bal_sqrt"),
        round(log(abs(col("s_acctbal")) + lit(1.0)), 4).as("bal_ln"),
        pmod(col("s_suppkey"), lit(7)).as("key_mod"),
        signum(col("s_acctbal")).as("bal_sign"),
        greatest(col("s_acctbal"), lit(0.0)).as("bal_pos"),
        least(col("s_suppkey"), lit(500L)).as("key_cap"))
      .orderBy(col("s_suppkey").asc)

  /** `fn_geo` — deterministic geospatial scalar math (the Presto
    * `ST_Distance`-style surface a lake SQL user reaches for; no ST_
    * family or Sedona jar exists in this runtime, so the two workhorse
    * primitives — great-circle distance and point-in-bbox — are
    * expressed directly with codegen'd trig built-ins). Coordinates are
    * synthesized from the supplier key (deterministic, both engines
    * compute the identical integer arithmetic), the haversine distance
    * to a fixed reference point uses the standard formula with
    * R = 6371.0088 km, and outputs are rounded to 3 decimals (~1 m) so
    * last-ulp libm differences between the JVM and DuckDB cannot flip
    * the hash. Row-local scalar work: trivially partition-parallel.
    */
  def fnGeo(spark: SparkSession, sfDir: String): DataFrame = {
    val lat = (col("s_suppkey") * 7 % 17000).cast("double") / 100.0 - 85.0
    val lon = (col("s_suppkey") * 13 % 35000).cast("double") / 100.0 - 175.0
    val refLat = radians(lit(48.8566))
    val refLon = radians(lit(2.3522))
    val dPhi = (radians(lit(48.8566)) - radians(lat)) / 2.0
    val dLam = (refLon - radians(lon)) / 2.0
    val a = pow(sin(dPhi), 2.0) +
      cos(radians(lat)) * cos(refLat) * pow(sin(dLam), 2.0)
    Tables.supplier(spark, sfDir)
      .select(
        col("s_suppkey"),
        round(lat, 2).as("lat"),
        round(lon, 2).as("lon"),
        round(lit(2.0 * 6371.0088) * asin(sqrt(a)), 3).as("dist_km"),
        (lat.between(40.0, 60.0) && lon.between(-10.0, 30.0))
          .as("in_bbox"))
      .orderBy(col("s_suppkey").asc)
  }

  /** `fn_regex` — the regexp family beyond extract/replace: extract-all
    * (serialized to a CSV string in match order — the driver comparator
    * can't hash array columns, VERDICT r1 #1), match counting, boolean
    * match.
    */
  def fnRegex(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        array_join(regexp_extract_all(col("text"), lit("[a-z]+ing"), lit(0)),
          ",").as("ings"),
        size(regexp_extract_all(col("text"), lit("[a-z]{7,}"), lit(0)))
          .as("n_long_words"),
        when(col("text").rlike("\\bthe\\b"), 1).otherwise(0).as("has_the"))
      .orderBy(col("doc_id").asc)

  /** `fn_bitwise` — AND / OR / XOR / shifts / NOT over integer keys
    * (bit-manipulation family; the simhash/bucket ops build on these).
    */
  def fnBitwise(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .select(
        col("s_suppkey"),
        (col("s_suppkey").bitwiseAND(lit(255L))).as("and_mask"),
        (col("s_suppkey").bitwiseOR(lit(4096L))).as("or_flag"),
        (col("s_suppkey").bitwiseXOR(col("s_nationkey"))).as("xor_nation"),
        shiftleft(col("s_suppkey"), 3).as("shl3"),
        shiftright(col("s_suppkey"), 2).as("shr2"),
        bitwise_not(col("s_suppkey")).as("inv"))
      .orderBy(col("s_suppkey").asc)

  /** `sample_hash` — deterministic cross-engine corpus sampling: keep a
    * row iff the integer value of its key's md5 prefix falls under the
    * rate. Unlike `df.sample` (partition-layout-dependent) this is a
    * pure function of the key — reproducible across engines, runs, and
    * cluster sizes, which is what training-data subsampling needs.
    */
  def sampleHash(spark: SparkSession, sfDir: String, pct: Int = 10): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100).cast("int"))
      .filter(col("bucket") < pct)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy(col("doc_id").asc)

  /** `sample_split` — LEAKAGE-FREE train/val/test assignment (the
    * universal last step before a corpus ships): the split key is the
    * md5 of the NORMALIZED CONTENT, not the doc id, so exact
    * duplicates land in the same split BY CONSTRUCTION — id-keyed
    * splits leak duplicated text from train into test, the classic
    * eval bug the dedup literature (Lee et al. 2022) opens with.
    * 98/1/1 by content-hash bucket (0 = test, 1 = val, rest train);
    * a key-pure row-local function — partition-layout- and
    * cluster-size-independent, the sample_hash discipline.
    *
    * Bucket key width (VERDICT r13 #2): 8 hex chars = 32 bits, so the
    * residual modulo bias is 2³² mod 100 = 96 extra keys spread over
    * buckets 0–95 — a per-bucket skew of 1/42,949,672 ≈ 2.3e-8
    * (the earlier 4-char key's 16 bits carried a visible 0.09%:
    * 65536 mod 100 ≠ 0 made "98/1/1" really 98.0/1.0009/1.0009).
    */
  def sampleSplit(spark: SparkSession, sfDir: String): DataFrame =
    sampleSplitDocs(Tables.documents(spark, sfDir))

  /** Core of [[sampleSplit]] over any (doc_id, lang, source, text)
    * frame (the spec plants duplicate content here).
    */
  def sampleSplitDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("bucket",
        (conv(substring(md5(graft.operators.TextOps.normText(col("text"))),
          1, 8), 16, 10).cast("long") % 100).cast("int"))
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("bucket") === 0, lit("test"))
          .when(col("bucket") === 1, lit("val"))
          .otherwise(lit("train")).as("split"))
      .orderBy(col("doc_id").asc)

  /** `fn_cond` — CASE WHEN / coalesce / nullif. */
  def fnCond(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, lit("large"))
          .when(col("o_totalprice") > 100000.0, lit("medium"))
          .otherwise(lit("small")).as("size_class"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("NOT_P"))
          .as("status_np"),
        when(col("o_orderpriority") === "1-URGENT", lit(1))
          .otherwise(lit(0)).as("is_urgent"))
      .orderBy(col("o_orderkey").asc)

  /** `fn_array` — array ops + higher-order functions over the embedding
    * vectors: size/slice/contains/sort + transform/filter/aggregate.
    * Float math rounded to 4dp for cross-engine comparability.
    */
  def fnArray(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        round(
          aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double")), 4).as("vec_sum"),
        round(
          aggregate(
            filter(col("embedding"), x => x > lit(0.0f)),
            lit(0.0d), (acc, x) => acc + x.cast("double")), 4)
          .as("pos_sum"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
        round(
          aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0d), (acc, x) => acc + x), 4).as("sq_norm"))
      .orderBy(col("vec_id").asc)

  /** `fn_json` — JSON extraction from `events.props` (verified shape
    * {"k": <int>} — FIXTURES.md): get_json_object / from_json / to_json.
    */
  def fnJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", IntegerType))))
          .getField("k").as("k_parsed"),
        to_json(struct(col("event_type").as("t"))).as("rejson"))
      .orderBy(col("event_id").asc)

  /** `fn_variant` — Spark 4's VARIANT semi-structured type
    * (`parse_json` → `variant_get` / `try_variant_get`), the
    * schema-on-read path that replaces string-walking
    * `get_json_object` at scale: the JSON parses ONCE into a binary
    * variant and every extraction is an offset walk, not a re-parse —
    * on a 100 TB telemetry column that is the difference between one
    * parse per row and one per extracted field. Variant values
    * themselves never surface to the comparator (engine-specific
    * binary): only extracted primitives do; a missing path through
    * `try_variant_get` must yield NULL, not an error.
    */
  def fnVariant(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')")
          .as("k_val"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')")
          .multiply(2).as("k_doubled"),
        expr("try_variant_get(parse_json(props), '$.missing', 'bigint')")
          .as("absent"))
      .orderBy(col("event_id").asc)

  /** `fn_map` — map construction and access over parsed props. Keys and
    * entries are serialized to sorted CSV strings: that makes the output
    * deterministic regardless of map entry order AND oracle-declarable
    * (DuckDB computes the same strings from the same source columns —
    * map entry order itself is engine-specific, SURVEY.md §2.H; the
    * driver comparator also can't hash map/array columns, VERDICT r1 #1).
    */
  def fnMap(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        map(lit("type"), col("event_type"), lit("k"),
          coalesce(get_json_object(col("props"), "$.k"), lit("")))
          .as("m"))
      .select(
        col("event_id"),
        array_join(array_sort(map_keys(col("m"))), ",").as("ks"),
        array_join(array_sort(transform(map_entries(col("m")),
          e => concat(e.getField("key"), lit("="), e.getField("value")))),
          ",").as("entries"),
        element_at(col("m"), "type").as("etype"))
      .orderBy(col("event_id").asc)

  /** `fn_hash` — hashing for dedup keys: md5 is oracle-comparable
    * (DuckDB md5 matches); xxhash64/crc32/sha2 are engine-specific and
    * unit-tested for stability instead (SURVEY.md §2.H).
    */
  def fnHash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        md5(col("text")).as("text_md5"),
        sha2(col("text"), 256).as("text_sha256"),
        xxhash64(col("text")).as("text_xx64"),
        crc32(col("text")).as("text_crc"))
      .orderBy(col("doc_id").asc)

  /** `fn_hash_md5` — the oracle-comparable subset of fn_hash. */
  def fnHashMd5(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id").asc)

  /** `fn_hash_props` — cardinality + value shadow of `fn_hash` (VERDICT
    * r6 #6): sha256 hex matches DuckDB's sha256 bit-for-bit (min/max of
    * the column are value-level cross-checks; the distinct count is the
    * cardinality check), while the engine-specific xxhash64/crc32
    * columns are checked by CARDINALITY — distinct-hash count must
    * equal distinct-text count. Collision-free on the fixed fixtures
    * (expected collisions ≈ n²/2³³ for crc32 at n=500 docs ≈ 1.5e-5),
    * so the check is deterministic per fixture. crc_in_range pins
    * crc32's unsigned-32-bit contract.
    */
  def fnHashProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_text"),
        countDistinct(xxhash64(col("text"))).as("n_xx64"),
        countDistinct(crc32(col("text"))).as("n_crc"),
        countDistinct(sha2(col("text"), 256)).as("n_sha"),
        min(sha2(col("text"), 256)).as("min_sha"),
        max(sha2(col("text"), 256)).as("max_sha"),
        (max(crc32(col("text"))) <= lit(4294967295L) &&
          min(crc32(col("text"))) >= lit(0L)).as("crc_in_range"))

  /** `fn_url` — the URL-extraction family (Presto url_extract_host/path/
    * parameter, Spark parse_url): the fixtures carry no URL column, so
    * the query synthesizes deterministic URLs from event fields first —
    * the extraction itself is the operator under test. The oracle
    * re-extracts with anchored regexes, which agree with parse_url on
    * well-formed URLs.
    */
  def fnUrl(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_id") < 500)
      .withColumn("url", concat(
        lit("https://shard"), col("user_id") % 4, lit(".example.com/"),
        col("event_type"), lit("/item?id="), col("event_id"),
        lit("&ref=home")))
      .select(col("event_id"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("id")).as("qid"))
      .orderBy(col("event_id").asc)
}
